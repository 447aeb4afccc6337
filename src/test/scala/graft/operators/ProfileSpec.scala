package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions.col

class ProfileSpec extends SparkSpecBase {
  import spark.implicits._

  test("summarize profiles every column in one pass, nulls handled") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(2L), None), (Some(2L), Some("c")),
      (None, Some("a"))
    ).toDF("k", "s")
    val out = Profile.summarize(df, Seq("k", "s"))
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("k") === (("k", 4L, 1L, 2L, "1", "2")))
    assert(out("s") === (("s", 4L, 1L, 2L, "a", "c")))
    // exactly one row per profiled column, nothing else
    assert(out.keySet === Set("k", "s"))
  }

  test("tokenDistributionDrift: hand-checked TV contributions, tokens on one side only") {
    val oldDf = Seq("a a b").toDF("text")
    val newDf = Seq("a b b c").toDF("text")
    val out = Profile.tokenDistributionDrift(oldDf, newDf, "text")
      .orderBy("tok")
      .as[(String, Long, Long, Double, Double, Double)].collect()
    assert(out === Array(
      // old: a 2/3, b 1/3; new: a 1/4, b 2/4, c 1/4
      ("a", 2L, 1L, 0.666667, 0.25, 0.208333),
      ("b", 1L, 2L, 0.333333, 0.5, 0.083333),
      ("c", 0L, 1L, 0.0, 0.25, 0.125)), s"got ${out.mkString("; ")}")
    // contributions sum to the TV distance, bounded by 1
    val tv = out.map(_._6).sum
    assert(tv > 0.0 && tv <= 1.0)
  }

  test("tokenDistributionDrift: an empty baseline is the zero distribution, drift 0.5 — never NULL") {
    val empty = Seq.empty[String].toDF("text")
    val now = Seq("a b", "a c").toDF("text")
    val out = Profile.tokenDistributionDrift(empty, now, "text")
      .orderBy("tok")
      .as[(String, Long, Long, Double, Double, Double)].collect()
    assert(out === Array(
      ("a", 0L, 2L, 0.0, 0.5, 0.25),
      ("b", 0L, 1L, 0.0, 0.25, 0.125),
      ("c", 0L, 1L, 0.0, 0.25, 0.125)), s"got ${out.mkString("; ")}")
    assert(math.abs(out.map(_._6).sum - 0.5) < 1e-9)
  }

  test("tokenDistributionDrift: identical snapshots drift zero") {
    val df = Seq("x y z", "x x").toDF("text")
    val out = Profile.tokenDistributionDrift(df, df, "text")
      .as[(String, Long, Long, Double, Double, Double)].collect()
    assert(out.forall(r => r._6 === 0.0 && r._4 === r._5))
  }

  test("vocabGrowth: first-occurrence attribution, cumulative vocab, novelty") {
    val df = Seq(
      (0L, "a b a"),      // epoch 0: 3 occ, new {a, b}
      (1L, "b c"),        // epoch 1: 2 occ, new {c}
      (2L, "a b c")       // epoch 2: 3 occ, new {}
    ).toDF("epoch", "text")
    val out = Profile.vocabGrowth(df, "text", col("epoch"))
      .orderBy("epoch")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(out === Array(
      (0L, 3L, 2L, 2L, 0.6667),
      (1L, 2L, 1L, 3L, 0.5),
      (2L, 3L, 0L, 3L, 0.0)))
  }

  test("zipfFit: closed-form least squares on a hand-made frequency ladder") {
    // counts a:4, b:2, c:1 → (rank, freq) = (1,4) (2,2) (3,1)
    val df = Seq(("s1", "a a a a b b c")).toDF("source", "text")
    val out = Profile.zipfFit(df, "source", "text")
      .as[(String, Long, Double, Double)].collect()
    val xs = Seq(1.0, 2.0, 3.0).map(math.log)
    val ys = Seq(4.0, 2.0, 1.0).map(math.log)
    val (mx, my) = (xs.sum / 3, ys.sum / 3)
    val sxy = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
    val sxx = xs.map(x => (x - mx) * (x - mx)).sum
    val syy = ys.map(y => (y - my) * (y - my)).sum
    def r4(v: Double) =
      BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out === Array(("s1", 3L, r4(sxy / sxx), r4(sxy * sxy / (sxx * syy)))))
    // a perfectly Zipfian ladder (freq = 6/rank) fits slope -1, R2 = 1
    val zipf = Seq(("z", Seq.fill(6)("a") ++ Seq.fill(3)("b") ++
      Seq.fill(2)("c") ++ Seq("d", "d", "d") // d:3 ties b:3 — break by token
    )).map { case (s, ts) => (s, ts.mkString(" ")) }.toDF("source", "text")
    val zf = Profile.zipfFit(zipf, "source", "text")
      .as[(String, Long, Double, Double)].collect()
    assert(zf.head._2 === 4L)
  }
}
