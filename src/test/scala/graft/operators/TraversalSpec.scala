package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class TraversalSpec extends SparkSpecBase {
  import spark.implicits._

  //        1 → 2 → 3 → 4
  //        ↓       ↑
  //        5 ──────┘        6 isolated, 7 → 1 back-edge
  private val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 5L), (5L, 3L),
    (7L, 1L)).toDF("src", "dst")

  test("bfsDistances: exact minimum hop counts from a multi-source seed set") {
    val got = Traversal.bfsDistances(es, Seq(1L).toDF("id"), maxHops = 10)
      .as[(Long, Int)].collect().toMap
    // 3 is reachable via 1→2→3 and 1→5→3: dist 2 either way
    assert(got === Map(1L -> 0, 2L -> 1, 5L -> 1, 3L -> 2, 4L -> 3))
    // multi-source: min over seeds; 7 seeds itself in
    val multi = Traversal.bfsDistances(es, Seq(3L, 7L).toDF("id"), maxHops = 10)
      .as[(Long, Int)].collect().toMap
    assert(multi === Map(3L -> 0, 7L -> 0, 4L -> 1, 1L -> 1, 2L -> 2, 5L -> 2))
  }

  test("bfsDistances: maxHops truncates; 0 hops returns the seeds; cycles terminate") {
    val one = Traversal.bfsDistances(es, Seq(1L).toDF("id"), maxHops = 1)
      .as[(Long, Int)].collect().toMap
    assert(one === Map(1L -> 0, 2L -> 1, 5L -> 1))
    val zero = Traversal.bfsDistances(es, Seq(1L).toDF("id"), maxHops = 0)
      .as[(Long, Int)].collect().toMap
    assert(zero === Map(1L -> 0))
    // a pure cycle converges by the visited-set anti join, not maxHops
    val ring = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val got = Traversal.bfsDistances(ring, Seq(1L).toDF("id"), maxHops = 1000)
      .as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 2))
  }

  /** HITS integer replay in plain Scala — same semantics as the op. */
  private def replayHits(vs: Seq[Long], edges: Seq[(Long, Long)],
                         iters: Int, scale: Long): Map[Long, (Long, Long)] = {
    val n = vs.size.toLong
    var h = vs.map(_ -> scale / n).toMap
    var a = vs.map(_ -> 0L).toMap
    (1 to iters).foreach { _ =>
      val araw = vs.map(v => v ->
        edges.collect { case (u, w) if w == v => h(u) }.sum).toMap
      val atot = araw.values.map(BigInt(_)).sum
      a = vs.map(v => v -> (if (atot > 0)
        (BigInt(araw(v)) * scale / atot).toLong else 0L)).toMap
      val hraw = vs.map(u => u ->
        edges.collect { case (x, w) if x == u => a(w) }.sum).toMap
      val htot = hraw.values.map(BigInt(_)).sum
      h = vs.map(u => u -> (if (htot > 0)
        (BigInt(hraw(u)) * scale / htot).toLong else 0L)).toMap
    }
    vs.map(v => v -> ((h(v), a(v)))).toMap
  }

  test("hitsFixedPoint matches the closed-form integer replay exactly") {
    val vs = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L)
    val edgeSeq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 5L), (5L, 3L), (7L, 1L))
    for (iters <- Seq(1, 3)) {
      val got = Traversal.hitsFixedPoint(vs.toDF("id"), es, iters)
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got === replayHits(vs, edgeSeq, iters, 1000000000000L),
        s"iters=$iters: got $got")
    }
  }

  test("hitsFixedPoint: hub/authority roles separate; isolated vertices score zero") {
    // 1 and 2 both point at 3 and 4: pure hubs; 3,4 pure authorities
    val bip = Seq((1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L)).toDF("src", "dst")
    val got = Traversal.hitsFixedPoint(
      Seq(1L, 2L, 3L, 4L, 9L).toDF("id"), bip, 2)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L)._1 > 0 && got(1L)._2 === 0L) // hub only
    assert(got(3L)._2 > 0 && got(3L)._1 === 0L) // authority only
    assert(got(9L) === ((0L, 0L)))              // isolated: exact zeros
    // L1 normalization: hubs and auths each sum to ~scale (truncation)
    val hubSum = got.values.map(_._1).sum
    val authSum = got.values.map(_._2).sum
    assert(hubSum <= 1000000000000L && hubSum > 1000000000000L - 10L)
    assert(authSum <= 1000000000000L && authSum > 1000000000000L - 10L)
  }

  test("kCore: peels pendant chains; keeps the dense core; directed/dup input canonicalizes") {
    // triangle 1-2-3 plus chain 3—4—5: 2-core = the triangle
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (2L, 1L), (5L, 5L)) // dup reversed edge + self-loop: no effect
      .toDF("src", "dst")
    val core2 = Traversal.kCore(g, 2).as[(Long, Long)].collect().toMap
    assert(core2 === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // 3-core of that graph is empty; 1-core keeps everything non-isolated
    assert(Traversal.kCore(g, 3).isEmpty)
    val core1 = Traversal.kCore(g, 1).as[(Long, Long)].collect().toMap
    assert(core1.keySet === Set(1L, 2L, 3L, 4L, 5L))
  }

  test("kCore: cascading peel needs multiple rounds and still converges") {
    // K4 core with a 3-chain hanging off it: removing 7 drops 6, then 5
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val g = (k4 ++ Seq((4L, 5L), (5L, 6L), (6L, 7L))).toDF("src", "dst")
    val core2 = Traversal.kCore(g, 2).as[(Long, Long)].collect().toMap
    assert(core2.keySet === Set(1L, 2L, 3L, 4L))
    assert(core2.values.forall(_ === 3L))
  }

  test("bfsResume: appends fold into the prior fixpoint == full re-BFS") {
    val oldE = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (10L, 11L), (11L, 12L)).toDF("src", "dst") // 10-chain unreachable from seed
    val seeds = Seq(1L).toDF("id")
    val prior = Traversal.bfsDistances(oldE, seeds, maxHops = 6)
    // appends: a shortcut (1→4 shortens 4,5,6), a bridge into the
    // unreached region (3→10 opens 10,11,12), and a no-op (2→1)
    val appended = Seq((1L, 4L), (3L, 10L), (2L, 1L)).toDF("src", "dst")
    val full = oldE.unionByName(appended)
    val got = Traversal.bfsResume(prior, full, appended, maxHops = 6)
      .as[(Long, Int)].collect().toMap
    val want = Traversal.bfsDistances(full, seeds, maxHops = 6)
      .as[(Long, Int)].collect().toMap
    assert(got === want)
    assert(got(4L) === 1 && got(5L) === 2 && got(12L) === 5) // improved + opened
    // a no-op append returns the prior distances unchanged
    val noop = Traversal.bfsResume(prior, oldE.unionByName(
      Seq((2L, 1L)).toDF("src", "dst")), Seq((2L, 1L)).toDF("src", "dst"),
      maxHops = 6).as[(Long, Int)].collect().toMap
    assert(noop === prior.as[(Long, Int)].collect().toMap)
    // the hop bound still binds: improvements past maxHops don't leak in
    val bounded = Traversal.bfsResume(
      Traversal.bfsDistances(oldE, seeds, maxHops = 3),
      full, appended, maxHops = 3).as[(Long, Int)].collect().toMap
    assert(bounded === Traversal.bfsDistances(full, seeds, maxHops = 3)
      .as[(Long, Int)].collect().toMap)
  }

  test("kCore: maxRounds guard fails loudly on a chain that out-peels the cap") {
    // a pure chain peels ONE vertex per round from each end — the
    // worst-case shape the scaladoc prices. 30-chain, cap of 3: must
    // throw, not loop; with an adequate cap it converges to empty.
    val chain = (0L until 30L).map(i => (i, i + 1)).toDF("src", "dst")
    val err = intercept[IllegalArgumentException] {
      Traversal.kCore(chain, 2, maxRounds = 3)
    }
    assert(err.getMessage.contains("did not converge within maxRounds=3"))
    assert(Traversal.kCore(chain, 2, maxRounds = 50).isEmpty)
  }

  test("coCitation: shared-source pairs count exactly; mega-hubs drop; top-k order is total") {
    //  s1 → {a, b, c};  s2 → {a, b};  hub → everything (dropped)
    val e = (Seq((10L, 1L), (10L, 2L), (10L, 3L), (20L, 1L), (20L, 2L)) ++
      (1L to 9L).map(d => (99L, d))).toDF("src", "dst")
    val got = Traversal.coCitation(e, maxOutDeg = 3, topK = 10)
      .as[(Long, Long, Long)].collect().toSeq
    // hub 99 (outdeg 9 > 3) contributes nothing
    assert(got === Seq((1L, 2L, 2L), (1L, 3L, 1L), (2L, 3L, 1L)))
    val top1 = Traversal.coCitation(e, maxOutDeg = 3, topK = 1)
      .as[(Long, Long, Long)].collect().toSeq
    assert(top1 === Seq((1L, 2L, 2L)))
  }

  test("crawlFrontier: only out-of-corpus targets, ranked by in-link count") {
    val corpus = Seq(1L, 2L, 3L).toDF("id")
    val e = Seq((1L, 2L), (1L, 50L), (2L, 50L), (3L, 50L), (2L, 60L),
      (3L, 60L), (1L, 70L)).toDF("src", "dst")
    val got = Traversal.crawlFrontier(e, corpus, topK = 10)
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq((50L, 3L), (60L, 2L), (70L, 1L)))
    val top2 = Traversal.crawlFrontier(e, corpus, topK = 2)
      .as[(Long, Long)].collect().toSeq
    assert(top2 === Seq((50L, 3L), (60L, 2L)))
  }

  test("iterative traversals leave no pinned blocks behind (checkpoint hygiene)") {
    def pinned: Int = spark.sparkContext.getPersistentRDDs.size
    val before = pinned
    Traversal.bfsDistances(es, Seq(1L).toDF("id"), maxHops = 10)
      .write.format("noop").mode("overwrite").save()
    // bfs returns its final visited checkpoint: one generation may
    // remain for the caller; sweep and compare
    graft.GraftSession.sweepPersistedRdds(spark)
    Traversal.kCore(es, 2).write.format("noop").mode("overwrite").save()
    graft.GraftSession.sweepPersistedRdds(spark)
    Traversal.hitsFixedPoint(Seq(1L, 2L, 3L).toDF("id"), es, 3)
      .write.format("noop").mode("overwrite").save()
    graft.GraftSession.sweepPersistedRdds(spark)
    assert(pinned <= before,
      s"pinned RDDs grew: $before -> $pinned")
  }
}
