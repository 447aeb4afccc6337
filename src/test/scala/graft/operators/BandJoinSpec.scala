package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class BandJoinSpec extends SparkSpecBase {
  import spark.implicits._

  test("bandJoin ≡ naive inequality join, boundaries inclusive, no dup pairs") {
    val l = Seq((1L, 0.0), (2L, 5.0), (3L, 9.99), (4L, -3.2)).toDF("lid", "lv")
    val r = Seq((10L, 1.0), (11L, 4.2), (12L, 10.99), (13L, -3.2)).toDF("rid", "rv")
    val banded = BandJoin.bandJoin(l, r, "lv", "rv", delta = 1.0)
      .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
    val naive = l.crossJoin(r).filter(abs($"lv" - $"rv") <= 1.0)
      .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
    assert(banded === naive)
    assert(banded.distinct === banded)              // replication never duplicates
    assert(banded.contains((1L, 10L)))              // |0 − 1| == delta: inclusive
    assert(banded.contains((3L, 12L)))              // cross-bucket neighbor match
    assert(banded.contains((4L, 13L)))              // negative values bucket correctly
  }

  test("bandJoin plans an equi join on the bucket, not a nested loop") {
    val l = Seq((1L, 0.0)).toDF("lid", "lv")
    val r = Seq((10L, 1.0)).toDF("rid", "rv")
    val plan = BandJoin.bandJoin(l, r, "lv", "rv", 1.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("property: bandJoin ≡ naive on random inputs and deltas") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      n <- Gen.choose(0, 30); m <- Gen.choose(0, 30)
      lv <- Gen.listOfN(n, Gen.choose(-50.0, 50.0))
      rv <- Gen.listOfN(m, Gen.choose(-50.0, 50.0))
      delta <- Gen.choose(0.5, 10.0)
    } yield (lv, rv, delta)
    (1 to 5).foreach { i =>
      val (lv, rv, delta) = gen.pureApply(Gen.Parameters.default, Seed(7L + i))
      val l = lv.zipWithIndex.map { case (v, j) => (j.toLong, v) }.toDF("lid", "lv")
      val r = rv.zipWithIndex.map { case (v, j) => (j.toLong, v) }.toDF("rid", "rv")
      val banded = BandJoin.bandJoin(l, r, "lv", "rv", delta)
        .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
      val naive = l.crossJoin(r).filter(abs($"lv" - $"rv") <= delta)
        .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
      assert(banded === naive, s"delta=$delta")
    }
  }
}
