package graft.operators

import graft.SparkSpecBase

class ConnectedComponentsSpec extends SparkSpecBase {
  import spark.implicits._

  test("clusters chains, cliques, and isolated pairs to min-id labels") {
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21}
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)
    ).toDF("id_a", "id_b")
    val out = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("long chain converges within the iteration budget") {
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Dedup.connectedComponents(chain, maxIter = 60)
      .as[(Long, Long)].collect()
    assert(out.length === 41)
    assert(out.forall(_._2 == 0L))
  }

  test("incrementalComponents: merges, bridges, unseen vertices — equals the full rebuild") {
    def cc(ps: Seq[(Long, Long)]) =
      Dedup.connectedComponents(ps.toDF("id_a", "id_b"))
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long)].collect().toMap
    // yesterday: {1,2,3} and {10,11}; today: a bridge (3,10), a brand-new
    // chain (20,21)+(21,22), an attach of unseen 30 to old 2, and a
    // redundant intra-component pair (1,3)
    val day1 = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    val day2 = Seq((3L, 10L), (20L, 21L), (21L, 22L), (30L, 2L), (1L, 3L))
    val got = asMap(Dedup.incrementalComponents(cc(day1), day2.toDF("id_a", "id_b")))
    assert(got === asMap(cc(day1 ++ day2)))
    assert(got(10L) === 1L && got(30L) === 1L && got(22L) === 20L)
  }

  test("incrementalComponents: property equality vs full rebuild on a random split") {
    val rnd = new scala.util.Random(7)
    val all = (1 to 120).map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }
    val (d1, d2) = all.splitAt(70)
    val inc = Dedup.incrementalComponents(
      Dedup.connectedComponents(d1.toDF("id_a", "id_b")),
      d2.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap
    val full = Dedup.connectedComponents((d1 ++ d2).toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap
    assert(inc === full)
  }

  test("incrementalComponents: an all-redundant batch changes nothing") {
    val day1 = Seq((1L, 2L), (2L, 3L))
    val before = Dedup.connectedComponents(day1.toDF("id_a", "id_b"))
    val after = Dedup.incrementalComponents(before,
      Seq((1L, 3L), (2L, 1L)).toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap
    assert(after === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("empty pair set yields an empty cluster table") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(empty).count() === 0)
  }
}
