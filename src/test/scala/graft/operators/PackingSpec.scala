package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = (0L until 200L).map(i => (i, 10 + (i % 7) * 5))
    .toDF("id", "n_tok")

  test("packGreedy: deterministic, shard-local, bins filled in hash order") {
    val a = Packing.packGreedy(docs, "id", "n_tok", ctxLen = 100, shards = 4)
      .orderBy("doc_id").collect()
    val b = Packing.packGreedy(docs, "id", "n_tok", ctxLen = 100, shards = 4)
      .orderBy("doc_id").collect()
    assert(a.toSeq === b.toSeq)                      // deterministic
    val rows = a.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4)))
    assert(rows.map(_._2).distinct.sorted === Seq(0L, 1L, 2L, 3L))
    // within a shard: seq_in_shard is 1..n, cum_tokens strictly grows,
    // bins are non-decreasing and start at the doc's first token
    rows.groupBy(_._2).foreach { case (_, rs) =>
      val byOrder = rs.sortBy(_._3)
      assert(byOrder.map(_._3).toSeq === (1L to byOrder.length).toSeq)
      assert(byOrder.map(_._4).toSeq === byOrder.map(_._4).sorted.toSeq)
      // explicit recompute of the packing from scratch
      var running = 0L
      byOrder.foreach { case (id, _, _, cum, bin) =>
        val n = docs.filter($"id" === id).head().getLong(1)
        assert(cum === running + n, s"cum for doc $id")
        assert(bin === running / 100, s"bin for doc $id")
        running += n
      }
    }
  }

  test("packGreedy bins respect the token budget at the assignment grain") {
    // ctx larger than total tokens → everything lands in bin 0
    val one = Packing.packGreedy(docs, "id", "n_tok", ctxLen = 1 << 20, shards = 2)
    assert(one.filter($"bin" =!= 0).count() === 0)
  }

  test("lengthBatches ≡ naive global row_number batching; pads correct; batches full") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(9)
    val docs = (0L until 137L).map(i => (i, 1L + rnd.nextInt(200)))
      .toDF("id", "n_tok")
    val out = Packing.lengthBatches(docs, "id", "n_tok", batchSize = 8)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val naive = docs
      .withColumn("rn", row_number().over(Window.orderBy(
        $"n_tok", md5($"id".cast("string").cast("binary")), $"id")))
      .withColumn("batch_id", (($"rn" - 1) / 8).cast("long"))
      .withColumn("pad",
        max($"n_tok").over(Window.partitionBy($"batch_id")) - $"n_tok")
      .select($"id", $"batch_id", $"n_tok", $"pad")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out === naive)
    // every batch except the last is exactly full; pad ≥ 0 everywhere
    val sizes = out.groupBy(_._2).view.mapValues(_.size).toMap
    val lastBatch = sizes.keys.max
    assert(sizes.forall { case (b, n) => if (b == lastBatch) n <= 8 else n == 8 })
    assert(out.forall(_._4 >= 0L))
    // length bucketing beats random batching on padding waste (the
    // operator's reason to exist) — id-order batches as the baseline
    val randomPad = docs
      .withColumn("batch_id", (($"id") / 8).cast("long"))
      .withColumn("pad",
        max($"n_tok").over(Window.partitionBy($"batch_id")) - $"n_tok")
      .agg(sum($"pad")).as[Long].head()
    assert(out.map(_._4).sum < randomPad,
      s"sorted padding ${out.map(_._4).sum} not below random $randomPad")
  }

  test("curriculumInterleave: pos = (rank-1)*n_sources + source_index, round-robin by difficulty") {
    import org.apache.spark.sql.expressions.Window
    // 3 sources, uneven sizes, difficulty with duplicates (id tiebreak)
    val rows = Seq(
      ("b", 10L, 30L), ("b", 11L, 10L), ("b", 12L, 30L), ("b", 13L, 5L),
      ("a", 20L, 7L), ("a", 21L, 7L), ("a", 22L, 100L),
      ("c", 30L, 1L))
    val df = rows.toDF("src", "id", "difficulty")
    val out = Packing.curriculumInterleave(df, "src", "id",
      difficulty = $"difficulty", bucket = expr("difficulty div 20"))
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    // reference: rank = row_number per source in (difficulty, id) order
    val wantRank = rows.groupBy(_._1).flatMap { case (_, rs) =>
      rs.sortBy(r => (r._3, r._2)).zipWithIndex
        .map { case ((s, id, _), i) => id -> (i + 1L, s) }
    }
    val sidx = Map("a" -> 0L, "b" -> 1L, "c" -> 2L)
    out.foreach { case (id, src, rank, pos) =>
      assert(rank === wantRank(id)._1, s"rank of $id")
      assert(pos === (rank - 1) * 3 + sidx(src), s"pos of $id")
    }
    // pos is a total order (all distinct), easy-first within each source
    assert(out.map(_._4).distinct.length === out.length)
    // first full round-robin cycle: rank-1 docs of each source, source order a,b,c
    val firstCycle = out.sortBy(_._4).take(3).map(_._2).toSeq
    assert(firstCycle === Seq("a", "b", "c"))
    // sharded rank equals the single-window reference for a bigger corpus
    val big = (0L until 400L).map(i =>
      (s"s${i % 4}", i, (i * 37 % 91))).toDF("src", "id", "difficulty")
    val bigOut = Packing.curriculumInterleave(big, "src", "id",
      difficulty = $"difficulty", bucket = expr("difficulty div 10"))
    val ref = big.withColumn("rank", row_number().over(
        Window.partitionBy($"src").orderBy($"difficulty", $"id")).cast("long"))
      .select($"id", $"rank")
    val diverged = bigOut.select($"id", $"rank").exceptAll(ref).count()
    assert(diverged === 0L, s"sharded rank diverges from single-window reference")
  }

  test("packedPayloads: every blob round-trips through the reference decoder in pack order") {
    val corpus = (0L until 40L).map(i => (i, s"doc $i body ${"x" * (i % 5).toInt}"))
      .toDF("doc_id", "text")
      .withColumn("n_tok", graft.functions.TextFunctions.tokenCount($"text").cast("long"))
    val packed = Packing.packWithOffsets(corpus, "doc_id", "n_tok",
      ctxLen = 12, shards = 3)
    val blobs = Packing.packedPayloads(packed, corpus, "doc_id", "text")
      .as[(Long, Long, Long, Array[Byte])].collect()
    val want = packed.select($"doc_id", $"shard", $"bin", $"offset")
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(r => (r._2, r._3))
      .map { case (k, rs) => k -> rs.sortBy(r => (r._4, r._1)).map(_._1).toSeq }
    val texts = corpus.select($"doc_id", $"text")
      .as[(Long, String)].collect().toMap
    assert(blobs.map(b => (b._1, b._2)).toSet === want.keySet)
    blobs.foreach { case (shard, bin, nDocs, payload) =>
      val decoded = Packing.readPackedPayload(payload)
      assert(decoded.length.toLong === nDocs)
      assert(decoded.map(_._1) === want((shard, bin)), s"order in ($shard,$bin)")
      decoded.foreach { case (id, text) => assert(text === texts(id)) }
      // layout is exactly self-describing: no trailing bytes
      assert(payload.length === 4 + decoded.map(d => 12 + d._2.getBytes("UTF-8").length).sum)
    }
    // every input doc lands in exactly one blob
    val allIds = blobs.flatMap(b => Packing.readPackedPayload(b._4).map(_._1))
    assert(allIds.sorted === (0L until 40L).toArray)
  }

  test("packWithOffsets: offsets agree with packGreedy bins and tile the windows") {
    val out = Packing.packWithOffsets(docs, "id", "n_tok", ctxLen = 100, shards = 4)
      .as[(Long, Long, Long, Long, Long)].collect()
    val bins = Packing.packGreedy(docs, "id", "n_tok", ctxLen = 100, shards = 4)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._5).toMap // doc_id -> bin
    out.foreach { case (id, _, bin, offset, n) =>
      assert(bin === bins(id), s"bin mismatch for $id")
      assert(offset >= 0 && offset < 100, s"offset out of window: $offset")
      assert(n === docs.filter($"id" === id).head().getLong(1))
    }
    // within a (shard, bin), consecutive docs tile exactly:
    // offset_{i+1} = offset_i + n_i (starts advance by token count,
    // and same-bin starts all lie inside one window)
    out.groupBy(r => (r._2, r._3)).foreach { case (key, rs) =>
      rs.sortBy(_._4).sliding(2).foreach {
        case Array(a, b) =>
          assert(b._4 === a._4 + a._5, s"gap inside bin $key: $a -> $b")
        case _ =>
      }
    }
    // the whole shard tiles from zero: offsets reconstruct from the
    // shard's own cumulative token stream
    out.groupBy(_._2).foreach { case (_, rs) =>
      val inOrder = rs.sortBy(r => (r._3, r._4)) // (bin, offset) = scan order
      var cum = 0L
      inOrder.foreach { case (_, _, bin, offset, n) =>
        assert(bin === cum / 100 && offset === cum % 100)
        cum += n
      }
    }
  }

  test("annealedOrder: alpha endpoints recover curriculum and shuffle; blend is a permutation") {
    import org.apache.spark.sql.expressions.Window
    val df = (0L until 300L).map(i => (i, (i * 37) % 91)).toDF("id", "difficulty")
    def order(alpha: Int) = Packing.annealedOrder(df, "id", $"difficulty",
      expr("difficulty div 10"), "epoch-1", alpha)
      .as[(Long, Long, Long)].collect().sortBy(_._3).map(_._1).toSeq
    // alpha = 10000: pure curriculum (difficulty asc, id tiebreak)
    val curriculum = df.orderBy($"difficulty", $"id").as[(Long, Long)]
      .collect().map(_._1).toSeq
    assert(order(10000) === curriculum)
    // alpha = 0: exactly the epoch shuffle's order
    val shuffle = Packing.epochShuffle(df.select("id"), "id", "epoch-1")
      .as[(Long, Long)].collect().sortBy(_._2).map(_._1).toSeq
    assert(order(0) === shuffle)
    // a real blend is a full permutation distinct from both endpoints
    val blend = order(3000)
    assert(blend.sorted === (0L until 300L))
    assert(blend !== curriculum)
    assert(blend !== shuffle)
    // rank-sum reference: key ordering matches a direct window replay
    val got = Packing.annealedOrder(df, "id", $"difficulty",
      expr("difficulty div 10"), "epoch-1", 3000)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val want = df
      .withColumn("rc", row_number().over(Window.orderBy($"difficulty", $"id")).cast("long"))
      .withColumn("rs", row_number().over(Window.orderBy(
        md5(concat(lit("epoch-1:"), $"id".cast("string")).cast("binary")), $"id")).cast("long"))
      .withColumn("key", lit(3000L) * $"rc" + lit(7000L) * $"rs")
      .withColumn("pos", row_number().over(Window.orderBy($"key", $"id")).cast("long") - 1L)
      .select($"id", $"key", $"pos")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got === want)
  }

  test("epochShuffle: exact 0..n-1 permutation, seed-dependent, run-stable, matches global sort") {
    import org.apache.spark.sql.expressions.Window
    val ids = spark.range(0, 1000).toDF("id")
    val e1 = Packing.epochShuffle(ids, "id", "epoch-1")
      .as[(Long, Long)].collect().sortBy(_._1)
    // gap-free permutation
    assert(e1.map(_._2).sorted.toSeq === (0L until 1000L).toSeq)
    // bit-stable across runs
    val again = Packing.epochShuffle(ids, "id", "epoch-1")
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(e1.toSeq === again.toSeq)
    // a different seed is a different permutation
    val e2 = Packing.epochShuffle(ids, "id", "epoch-2")
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(e1.map(_._2).toSeq !== e2.map(_._2).toSeq)
    // sharded rank == single-window reference
    val ref = ids.withColumn("pos", row_number().over(Window.orderBy(
        md5(concat(lit("epoch-1:"), $"id".cast("string")).cast("binary")), $"id"))
        .cast("long") - 1L)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(e1.toSeq === ref.toSeq)
  }

  test("curriculumInterleave: skew guard trips BY DEFAULT on a degenerate difficulty band") {
    // 12k rows, one source, 90% in difficulty band 0 (all n_chars < 100):
    // that band would be ONE window task at scale
    val degenerate = (0L until 12000L)
      .map(i => ("web", i, if (i % 10 != 0) i % 90 else 100L + i % 900))
      .toDF("src", "id", "n_chars")
    // no skewGuardFrac argument: the DEFAULT must fail loudly — the
    // silent one-task stall is never the out-of-the-box behavior
    val guarded = Packing.curriculumInterleave(degenerate, "src", "id",
      difficulty = $"n_chars", bucket = expr("n_chars div 100"))
    val e = intercept[Throwable] { guarded.collect() }
    val msg = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msg.contains("bucket skew"), s"expected bucket-skew error, got: $msg")
    // explicitly DISARMED (None) computes the same corpus fine — the
    // caller's reviewed opt-out, not the default
    assert(Packing.curriculumInterleave(degenerate, "src", "id",
      difficulty = $"n_chars", bucket = expr("n_chars div 100"),
      skewGuardFrac = None)
      .count() === 12000L)
    // a small (< 10k rows) equally-degenerate source is exempt under
    // the armed default — one healthy task, not skew
    val small = (0L until 5000L)
      .map(i => ("web", i, i % 90)).toDF("src", "id", "n_chars")
    assert(Packing.curriculumInterleave(small, "src", "id",
      difficulty = $"n_chars", bucket = expr("n_chars div 100"))
      .count() === 5000L)
  }

  test("annealedOrder: supplied totalCount runs no job at build time and keeps the order") {
    val df = (0L until 300L).map(i => (i, (i * 37) % 91)).toDF("id", "difficulty")
    val base = Packing.annealedOrder(df, "id", $"difficulty",
      expr("difficulty div 10"), "epoch-2", 4000)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    // drain events from the base collect() above BEFORE registering,
    // so a backlogged async bus can't deliver stale job-starts inside
    // the measurement window (false failure)
    org.apache.spark.graftspark.TestListenerBus.waitUntilEmpty(spark.sparkContext)
    spark.sparkContext.addSparkListener(listener)
    val cached =
      try {
        val plan = Packing.annealedOrder(df, "id", $"difficulty",
          expr("difficulty div 10"), "epoch-2", 4000,
          totalCount = Some(300L))
        // deterministic drain: if construction ran ANY job, its event
        // has been delivered by the time this returns (a fixed sleep
        // could also miss a late delivery — false pass)
        org.apache.spark.graftspark.TestListenerBus.waitUntilEmpty(spark.sparkContext)
        assert(jobs === 0,
          s"construction with totalCount supplied must not run the count job (saw $jobs)")
        plan.as[(Long, Long, Long)].collect().sortBy(_._1)
      } finally spark.sparkContext.removeSparkListener(listener)
    assert(cached.toSeq === base.toSeq)
    // an approximate count only re-sizes shards — order is unchanged
    val approx = Packing.annealedOrder(df, "id", $"difficulty",
      expr("difficulty div 10"), "epoch-2", 4000, totalCount = Some(10L))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(approx.toSeq === base.toSeq)
  }
}
