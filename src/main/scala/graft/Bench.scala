package graft
import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal
/** Benchmark main: runs every catalog query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line of per-query wall-clock seconds.
  * A full untimed warmup pass runs first so the timed pass measures
  * steady-state execution (codegen compiled, parquet footers cached)
  * rather than JVM cold start.
  *
  * Each query is driven by a noop-sink write, not `.count()`: under
  * count Catalyst prunes every unreferenced column, so a projection-
  * only query (q2/q4/q11/q18/q25/q26/q43) would be timed as little
  * more than a row-count scan with its expression cost never executed.
  * The noop sink materializes every output column through the full
  * plan — the same work Verify pays — while writing nothing.
  *
  * Failures are NOT silently timed as ~0s: a failing query is reported
  * on stderr and in the JSON's "failed" list (fatal errors — OOM,
  * linkage — propagate; timings from a corrupted JVM are worthless).
  */
object Bench {
  private def run(spark: SparkSession, name: String, sfDir: String): Boolean =
    try {
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      true
    } catch {
      case NonFatal(e) =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        false
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    val names = SparkEntry.queries.keys.toSeq.sorted
    // a prefix collision would silently overwrite per-query timings in
    // the parsed map — fail loudly before spending bench time
    require(names.map(shortKey).distinct.size == names.size,
      s"duplicate qNN prefixes: ${names.groupBy(shortKey).filter(_._2.size > 1)}")
    // warmup (untimed)
    names.foreach(run(spark, _, sfDir))
    // timed: two passes, min per query — single-pass numbers carry ±2s
    // host-noise spikes (GC, page cache) that read as false regressions
    var failed = List.empty[String]
    def timedPass(): Map[String, Double] = names.map { name =>
      val t0 = System.nanoTime()
      if (!run(spark, name, sfDir)) failed ::= name
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    val p1 = timedPass()
    val p2 = timedPass()
    // failed queries go to the "failed" list ONLY — summing their
    // ~0s fast-fail timings into the headline total would read as a
    // speedup exactly when something broke
    val failedSet = failed.toSet
    val results = names.filterNot(failedSet).map(n => n -> math.min(p1(n), p2(n)))

    // q42 internal stage split (LSH / exact verify / connected
    // components), isolated via localCheckpoint barriers — persisted
    // every run so the largest bench line item's internal drift is
    // visible round-over-round without a Scratch rerun
    val q42Stages: Seq[(String, Double)] = try {
      import graft.operators.Dedup
      val docs = graft.sources.Tables.documents(spark, sfDir)
      def timed[T](f: => T): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      var cands: org.apache.spark.sql.DataFrame = null
      val tLsh = timed {
        cands = Dedup.minHashLsh(docs, "doc_id", "text",
          numHashes = 64, bands = 32, shingleK = 1, threshold = 0.0,
          maxBucket = 10000, blockCol = Some("source")).localCheckpoint(true)
      }
      var pairs: org.apache.spark.sql.DataFrame = null
      val tVerify = timed {
        pairs = Dedup.ngramJaccardVerify(docs, cands, "doc_id", "text",
          k = 1, threshold = 0.5).localCheckpoint(true)
      }
      val tCc = timed(Dedup.connectedComponents(pairs).write
        .format("noop").mode("overwrite").save())
      Seq("q42_stage_lsh" -> tLsh, "q42_stage_verify" -> tVerify,
        "q42_stage_cc" -> tCc)
    } catch { case NonFatal(e) =>
      System.err.println(s"[bench] q42 stage split failed: ${e.getMessage}")
      Seq.empty
    }

    // secondary scale factor: the same catalog timed at a second SF
    // gives the per-query scaling slope — the closest local[32] proxy
    // for "would this survive 100×" that numbers (not plans) provide.
    // Per-query results go to the details FILE; only the total rides
    // the metric line (a second 90-entry map would overflow the
    // driver's ~2000-char tail parse window).
    val sf2Dir = sys.env.get("SPARK_GRAFT_SF2_DIR").orElse {
      val sibling = "/root/testdata/sf0.01"
      if (sibling != sfDir && new java.io.File(sibling).isDirectory) Some(sibling)
      else None
    }
    // a query that FAILS at the second SF must not be summed as a
    // ~0s timing (it would read as a massive scaling speedup); track
    // failures and mark them in the details file instead
    var failedSf2 = Set.empty[String]
    val results2: Seq[(String, Double)] = sf2Dir.toSeq.flatMap { d2 =>
      names.foreach(run(spark, _, d2)) // warmup (plans recompile per path)
      def pass(): Map[String, Double] = names.map { n =>
        val t0 = System.nanoTime()
        if (!run(spark, n, d2)) failedSf2 += n
        n -> (System.nanoTime() - t0) / 1e9
      }.toMap
      val q1 = pass(); val q2 = pass()
      names.filterNot(failedSf2).map(n => n -> math.min(q1(n), q2(n)))
    }
    // The driver captures only the LAST ~2000 chars of output and parses the
    // metric line from that window. Rounds 1-3 all came back "parsed": null:
    // r1/r2 because the line itself overflowed the window, r3 because the
    // per-query stderr dump (~3.3 KB) flushed AFTER stdout under sbt's
    // logger interleaving and pushed the metric line out of the tail. So:
    // the full-name full-precision map goes to a FILE (target/), never a
    // console stream, and the compact metric JSON (qNN prefix keys,
    // 3-decimal seconds) is the LAST line this process emits — printed to
    // both stdout and stderr after spark.stop(), so no shutdown logging can
    // land after it on either stream.
    val qs = results.map { case (k, v) => Json.str(shortKey(k)) + ":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val failedJson =
      if (failed.isEmpty) ""
      else s""","failed":${failed.distinct.sorted.map(n => Json.str(shortKey(n))).mkString("[", ",", "]")}"""
    val detailPath = java.nio.file.Paths.get("target", "bench_details.txt")
    java.nio.file.Files.createDirectories(detailPath.getParent)
    val detailLines =
      results.map { case (k, v) => s"$k $v" } ++
        q42Stages.map { case (k, v) => f"$k $v%.3f" } ++
        sf2Dir.toSeq.map(d2 => s"sf2 $d2") ++
        results2.map { case (k, v) => s"$k@sf2 $v" } ++
        failedSf2.toSeq.sorted.map(n => s"$n@sf2 FAILED")
    java.nio.file.Files.write(detailPath,
      detailLines.mkString("", "\n", "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sf2Json = sf2Dir
      .map(d2 => f""","sf2":${Json.str(d2)},"value_sf2":${results2.map(_._2).sum}%.3f""")
      .getOrElse("")
    val metricLine =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":${Json.str(sfDir)}$failedJson$sf2Json}"""
    spark.stop()
    System.out.println(metricLine)
    System.out.flush()
    System.err.println(metricLine)
    System.err.flush()
  }

  private def shortKey(name: String): String = name.takeWhile(_ != '_')
}
