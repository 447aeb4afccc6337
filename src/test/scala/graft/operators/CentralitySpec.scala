package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class CentralitySpec extends SparkSpecBase {
  import spark.implicits._

  // 1→2→3→1 ring, 4 fans into 1 and 2, 5 dangles
  private val vs = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
  private val es = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L), (4L, 2L))
    .toDF("src", "dst")

  /** The operator's exact integer arithmetic, replayed in plain Scala. */
  private def replay(iters: Int, scale: Long): Map[Long, Long] = {
    val n = 5L
    val out = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L)
    val in: Map[Long, Seq[Long]] =
      Map(1L -> Seq(3L, 4L), 2L -> Seq(1L, 4L), 3L -> Seq(2L))
    val base = scale / n
    var pr = (1L to 5L).map(_ -> base).toMap
    (1 to iters).foreach { _ =>
      val dang = pr.collect { case (v, p) if !out.contains(v) => p }.sum
      val contrib = pr.collect { case (v, p) if out.contains(v) => v -> p / out(v) }
      pr = (1L to 5L).map { v =>
        val insum = in.getOrElse(v, Nil).map(contrib).sum
        v -> ((15L * base) / 100L + (85L * (insum + dang / n)) / 100L)
      }.toMap
    }
    pr
  }

  test("fixed-point ranks match the closed-form integer replay exactly") {
    for (iters <- Seq(1, 3)) {
      val got = Centrality.pageRankFixedPoint(vs, es, iters)
        .as[(Long, Long)].collect().toMap
      assert(got === replay(iters, 1000000000000L),
        s"iters=$iters: got $got")
    }
  }

  test("rank mass is conserved up to truncation loss; the fan-in hub outranks the dangler") {
    val scale = 1000000000000L
    val got = Centrality.pageRankFixedPoint(vs, es, 4)
      .as[(Long, Long)].collect().toMap
    val total = got.values.sum
    // each division truncates < 1 unit; a handful of divisions per
    // vertex per iteration keeps the loss tiny relative to scale
    assert(total <= scale && total > scale - 1000L,
      s"mass $total drifted from $scale")
    // 1 and 2 have two in-edges each; 5 has none — but still holds
    // base + dangling share, never zero
    assert(got(1L) > got(5L) && got(2L) > got(5L))
    assert(got(5L) > 0L)
  }

  /** Personalized replay: teleport and dangling mass to seeds only. */
  private def replayPpr(seeds: Set[Long], iters: Int,
                        scale: Long): Map[Long, Long] = {
    val out = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L)
    val in: Map[Long, Seq[Long]] =
      Map(1L -> Seq(3L, 4L), 2L -> Seq(1L, 4L), 3L -> Seq(2L))
    val ns = seeds.size.toLong
    def base(v: Long) = if (seeds(v)) scale / ns else 0L
    var pr = (1L to 5L).map(v => v -> base(v)).toMap
    (1 to iters).foreach { _ =>
      val dang = pr.collect { case (v, p) if !out.contains(v) => p }.sum
      val contrib = pr.collect { case (v, p) if out.contains(v) => v -> p / out(v) }
      pr = (1L to 5L).map { v =>
        val insum = in.getOrElse(v, Nil).map(contrib).sum
        val seedShare = if (seeds(v)) dang / ns else 0L
        v -> ((15L * base(v)) / 100L + (85L * (insum + seedShare)) / 100L)
      }.toMap
    }
    pr
  }

  test("personalized ranks match the closed-form replay; mass stays near the seeds") {
    val seeds = Set(1L, 4L)
    val seedDf = seeds.toSeq.toDF("id")
    for (iters <- Seq(1, 3)) {
      val got = Centrality.personalizedPageRankFixedPoint(vs, es, seedDf, iters)
        .as[(Long, Long)].collect().toMap
      assert(got === replayPpr(seeds, iters, 1000000000000L),
        s"iters=$iters: got $got")
    }
    val got3 = Centrality.personalizedPageRankFixedPoint(vs, es, seedDf, 3)
      .as[(Long, Long)].collect().toMap
    // 5 is unreachable from the seeds and not a seed: exactly zero —
    // the personalization property the global variant cannot express
    assert(got3(5L) === 0L)
    assert(got3(1L) > 0L && got3(2L) > 0L)
  }

  test("triangleCount: closed-form graphs; dup/directed/self-loop edges canonicalize") {
    def tri(es: Seq[(Long, Long)]): (Long, Long, Long) =
      Centrality.triangleCount(es.toDF("src", "dst"))
        .as[(Long, Long, Long)].head()
    // one triangle
    assert(tri(Seq((1L, 2L), (2L, 3L), (1L, 3L))) === ((3L, 3L, 1L)))
    // K4: C(4,3) = 4 triangles
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    assert(tri(k4) === ((4L, 6L, 4L)))
    // 4-cycle: no triangles
    assert(tri(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))) === ((4L, 4L, 0L)))
    // duplicates, reversals and self-loops change nothing
    assert(tri(Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L),
      (1L, 1L), (1L, 2L))) === ((3L, 3L, 1L)))
  }

  test("incrementalTriangles: closed forms, multi-fresh dedup, idempotent re-delivery") {
    def inc(base: Seq[(Long, Long)], batch: Seq[(Long, Long)]): (Long, Long) =
      Centrality.incrementalTriangles(
        base.toDF("src", "dst"), batch.toDF("src", "dst"))
        .as[(Long, Long)].head()
    // triangle closed by two fresh edges (k = 2 incidences dedup to 1)
    assert(inc(Seq((1L, 2L), (2L, 3L), (1L, 3L)), Seq((1L, 4L), (3L, 4L)))
      === ((2L, 1L)))
    // fully fresh triangle (k = 3) on a disjoint base
    assert(inc(Seq((5L, 6L)), Seq((1L, 2L), (2L, 3L), (1L, 3L)))
      === ((3L, 1L)))
    // one fresh edge closing two triangles over base wedges (k = 1 each)
    assert(inc(Seq((1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L)), Seq((1L, 2L)))
      === ((1L, 2L)))
    // batch edges already in the base are dropped: nothing new
    assert(inc(Seq((1L, 2L), (2L, 3L), (1L, 3L)), Seq((2L, 1L), (3L, 2L)))
      === ((0L, 0L)))
  }

  test("incrementalTriangles: T(base) + delta equals the full recount, exactly") {
    // K10 plus a sparse outer ring — plenty of triangles on both
    // sides of the edge-wise base/batch split
    val all = (for (i <- 0L until 10L; j <- (i + 1) until 10L) yield (i, j)) ++
      (10L until 30L).map(i => (i, (i * 7 + 3) % 30))
        .filter { case (a, b) => a != b }
    val (batch, base) = all.partition { case (a, b) => (a * 7 + b) % 5 == 0 }
    def tri(es: Seq[(Long, Long)]): Long =
      Centrality.triangleCount(es.toDF("src", "dst"))
        .select("n_triangles").as[Long].head()
    val (_, delta) = Centrality.incrementalTriangles(
      base.toDF("src", "dst"), batch.toDF("src", "dst"))
      .as[(Long, Long)].head()
    assert(tri(base) + delta === tri(all), s"delta=$delta")
    assert(delta > 0L, "the split should create at least one new triangle")
  }

  test("warm start from stored ranks is bit-equal to from-scratch; missing ranks refuse") {
    val full = Centrality.pageRankFixedPoint(vs, es, 4)
      .as[(Long, Long)].collect().toMap
    val stored = Centrality.pageRankFixedPoint(vs, es, 3)
    val resumed = Centrality.pageRankFixedPoint(vs, es, 1,
      initRanks = Some(stored)).as[(Long, Long)].collect().toMap
    assert(resumed === full)
    // a warm start missing a vertex must refuse, not restart it at 0
    val partial = stored.filter($"id" =!= 5L)
    val e = intercept[Exception] {
      Centrality.pageRankFixedPoint(vs, es, 1, initRanks = Some(partial))
        .collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("no stored rank"),
      e.getMessage)
  }

  test("graph-census store: appends maintain the exact count; replays and compaction change nothing") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-census").toString + "/store"
    val base = (for (i <- 0L until 8L; j <- (i + 1) until 8L) yield (i, j))
      .filter { case (a, b) => (a + b) % 3 != 0 }
    val batch1 = (for (i <- 0L until 8L; j <- (i + 1) until 8L) yield (i, j))
      .filter { case (a, b) => (a + b) % 3 == 0 }
    val batch2 = Seq((0L, 9L), (1L, 9L), (0L, 1L), (5L, 9L)) // (0,1) dup of base
    def census(): (Long, Long) =
      Centrality.triangleCensusRead(spark, root).as[(Long, Long)].head()
    def full(es: Seq[(Long, Long)]): (Long, Long) =
      Centrality.triangleCount(es.toDF("src", "dst"))
        .select("n_edges", "n_triangles").as[(Long, Long)].head()
    Centrality.triangleCensusWrite(base.toDF("src", "dst"), root)
    Centrality.triangleCensusAppend(spark, root, batch1.toDF("src", "dst"), "day-2")
    Centrality.triangleCensusAppend(spark, root, batch2.toDF("src", "dst"), "day-3")
    val expect = full(base ++ batch1 ++ batch2)
    assert(census() === expect)
    // replayed epoch: same partial rewrites in place, census unchanged
    Centrality.triangleCensusAppend(spark, root, batch2.toDF("src", "dst"), "day-3")
    assert(census() === expect)
    val stats = Maintenance.compactStore(spark, root)
    assert(stats.folded.toSet === Set("base", "day-2", "day-3"))
    assert(census() === expect)
  }

  test("every vertex appears in the output, including isolated ones") {
    val lonely = Seq(1L, 2L, 9L).toDF("id")
    val e1 = Seq((1L, 2L)).toDF("src", "dst")
    val got = Centrality.pageRankFixedPoint(lonely, e1, 2)
      .as[(Long, Long)].collect().toMap
    assert(got.keySet === Set(1L, 2L, 9L))
    assert(got.values.forall(_ > 0))
  }
}
