package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{Sketches, TextFunctions}
import graft.operators.{Similarity => Sim}
import org.apache.spark.sql.graftbridge.Bridge

/** Deduplication operator family for training-data pipelines:
  * exact, MinHash+LSH, SimHash, and exact n-gram Jaccard.
  *
  * Scale design notes (the part that matters at 100 TB):
  *  - exactDedup: one hash-partition shuffle on the dedup key. Group
  *    on a 128-bit md5 of the canonical text (TextFunctions
  *    .fingerprint), not the text itself, so shuffle rows carry 16
  *    bytes + id instead of full documents.
  *  - minHashLsh: signatures are computed scan-side by the native
  *    MinHashShingled expression (tokens hashed once, shingle hashes
  *    derived polynomially inside a compiled loop — no UDF, no
  *    interpreted HOF, no shuffle); banding shuffles small fixed-width
  *    (id, [block,] band, hash) rows into per-bucket sorted id lists,
  *    and identical-membership buckets collapse before any quadratic
  *    step. Buckets above `maxBucket` are dropped (degenerate /
  *    boilerplate content — standard practice — that would otherwise
  *    produce O(n²) pairs in a single task: the skew bomb).
  *  - simHash: pure per-row bit arithmetic, then a self-join on 4×16-
  *    bit band keys of the 64-bit signature (pigeonhole ⇒ full recall
  *    for Hamming distance ≤ 3).
  *  - ngramJaccard: exact verifier — run it on candidate pairs (LSH
  *    output) or within small blocks, never all-pairs.
  */
object Dedup {

  /** Unique observed-metric suffixes: one query plan may hold several
    * guarded bucket stages (q93 runs the full LSH, the index build,
    * and the batch probe in a single query) and Spark requires
    * distinct CollectMetrics names within a plan. */
  private val metricSeq = new java.util.concurrent.atomic.AtomicLong()

  /** The mega-bucket skew guard, with its drop count OBSERVED: every
    * banded family (MinHash, SimHash, SRP — full runs and index
    * builds alike) funnels its `size(list) <= maxBucket` filter
    * through here, so the count of dropped buckets lands in the
    * executed query's observed metrics as
    * `<family>_dropped_buckets_<n>`. That makes the one documented
    * divergence window of the incremental paths — near the guard
    * boundary the full run sees combined bucket sizes while each
    * incremental side guards alone — measurable in production
    * ([[droppedBuckets]]) instead of only documented in scaladoc. */
  private def guardBuckets(df: DataFrame, listCol: String, maxBucket: Int,
                           family: String,
                           dropSingletons: Boolean): DataFrame = {
    val sz = size(col(listCol))
    val observed = df.observe(
      s"${family}_dropped_buckets_${metricSeq.incrementAndGet()}",
      count(when(sz > maxBucket, lit(1))).as("dropped_buckets"))
    observed.filter(if (dropSingletons) sz <= maxBucket && sz > 1
                    else sz <= maxBucket)
  }

  /** Total buckets dropped by every skew guard that executed in `df`'s
    * plan, summed across families and stages. Observed metrics exist
    * only post-execution and attach to the QueryExecution that RAN:
    * call this after an action that executes `df`'s own plan
    * (`collect`/`foreach`/`toLocalIterator`). Actions that wrap the
    * plan in a new one (`count`, `write`) accumulate onto their own
    * QueryExecution — capture those through a QueryExecutionListener
    * matching `*_dropped_buckets_*` instead. Zero both means "no
    * degenerate content" and "the incremental ≡ full equivalence
    * contract is airtight here" — a nonzero count near a tight
    * `maxBucket` is the signal to raise the guard. */
  def droppedBuckets(df: DataFrame): Long =
    // Bridge.observedMetrics, not queryExecution.observedMetrics: the
    // stock accessor loses metrics whose stage AQE replaced with an
    // empty relation after it ran — i.e. exactly the all-buckets-
    // dropped case this counter exists to expose
    Bridge.observedMetrics(df).collect {
      case (name, row) if name.contains("_dropped_buckets_") =>
        row.getAs[Long]("dropped_buckets")
    }.sum

  /** Exact dedup: one representative (min `idCol`) per distinct value
    * of `key`, with multiplicity. */
  def exactDedupStats(df: DataFrame, key: Column, idCol: Column): DataFrame =
    df.groupBy(key.as("dedup_key"))
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exact dedup keeping entire representative rows: the row with the
    * smallest `idCol` per key survives. Single shuffle on the key. */
  def exactDedup(df: DataFrame, key: Column, idCol: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(idCol.asc)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Corpus-level boilerplate line removal (the RefinedWeb / CCNet
    * cleaning stage): split every document into lines on the literal
    * `sep`, drop each line that occurs VERBATIM in at least `minDocs`
    * distinct documents (headers, footers, nav chrome, license
    * banners), and reassemble the survivors in original order —
    * all-boilerplate and NULL-text documents come back with empty
    * text, never silently dropped. Lines shorter than `minLineLen`
    * characters are EXEMPT from detection and always kept: with the
    * default 1, blank lines (paragraph breaks, which recur in every
    * real corpus) are never stripped — the same floor CCNet-style
    * line dedup applies.
    *
    * Scale shape: lines are keyed by md5 fingerprint, so the
    * frequency count and the boilerplate join shuffle 16-byte keys +
    * line payloads once each — never whole documents — and the
    * reassembly is one hash aggregation on the doc id
    * (order restored via array_sort on (pos, line), no window sort).
    *
    * @return (idCol, clean_text, n_removed) — one row per input doc
    */
  def removeBoilerplateLines(df: DataFrame, idCol: String, textCol: String,
                             sep: String, minDocs: Int,
                             minLineLen: Int = 1): DataFrame = {
    val segs = lineSegs(df, idCol, textCol, sep)
    val boiler = lineCounts(segs, idCol, minLineLen)
      .filter(col("n_docs") >= minDocs)
      .select(col("fp"), lit(true).as("_boiler"))
    reassembleLines(segs.join(boiler, Seq("fp"), "left"), idCol, sep)
  }

  /** One (idCol, pos, seg, fp) row per line of every document — THE
    * segmentation all boilerplate paths share, so full, index-build
    * and incremental runs fingerprint byte-identically (the same
    * single-definition rule the MinHash band keys follow). NULL text
    * reads as empty: the doc still yields its one (empty) segment, so
    * it survives to the output row contract. */
  private def lineSegs(df: DataFrame, idCol: String, textCol: String,
                       sep: String): DataFrame =
    df.select(col(idCol), posexplode(
        split(coalesce(col(textCol), lit("")),
          java.util.regex.Pattern.quote(sep))).as(Seq("pos", "seg")))
      .withColumn("fp", md5(col("seg")))

  /** Distinct-document frequency per line fingerprint (lines under
    * `minLineLen` excluded — they are exempt from detection). */
  private def lineCounts(segs: DataFrame, idCol: String,
                         minLineLen: Int): DataFrame =
    segs.filter(length(col("seg")) >= minLineLen)
      .groupBy(col("fp"))
      .agg(count_distinct(col(idCol)).as("n_docs"))

  /** Reassemble marked segments: `_boiler` NULL survives, in original
    * order, one hash aggregation on the doc id. */
  private def reassembleLines(marked: DataFrame, idCol: String,
                              sep: String): DataFrame =
    marked.groupBy(col(idCol))
      .agg(
        array_join(
          transform(
            // collect_list skips nulls: only non-boilerplate survives
            array_sort(collect_list(when(col("_boiler").isNull,
              struct(col("pos"), col("seg"))))),
            x => x.getField("seg")),
          sep).as("clean_text"),
        count(col("_boiler")).as("n_removed"))

  /** Cross-corpus line/paragraph dedup (the MassiveText "exact
    * paragraph dedup" stage): every line that occurred EARLIER in the
    * corpus — in a lower (doc_id, pos) — is removed; the globally
    * first occurrence survives. Distinct from
    * [[removeBoilerplateLines]] (threshold frequency: ALL copies of a
    * boilerplate line go) — here exactly one copy of every repeated
    * line survives, so no content is lost corpus-wide. Lines shorter
    * than `minLineLen` are exempt (blank paragraph breaks survive in
    * every doc), same floor as the boilerplate family.
    *
    * Scale shape: "first occurrence" is a MIN aggregation per line
    * fingerprint — partial (map-side) aggregated, so a line repeated
    * in a billion documents shuffles one candidate per scan partition,
    * never a window partition holding all copies. The keep decision
    * joins the 16-byte fingerprint + (doc_id, pos) winner back to the
    * segments; reassembly is the shared one-aggregation path.
    *
    * @return (idCol, clean_text, n_removed) — one row per input doc
    */
  def dedupLinesAcrossCorpus(df: DataFrame, idCol: String, textCol: String,
                             sep: String, minLineLen: Int = 1): DataFrame = {
    val segs = lineSegs(df, idCol, textCol, sep)
    val firstOcc = segsFirstOcc(segs, idCol, minLineLen)
      .select(col("fp"), col("wid").as("_wid"), col("wpos").as("_wpos"))
    val marked = segs.join(firstOcc, Seq("fp"), "left")
      .withColumn("_boiler", when(
        col("_wid").isNotNull &&
          (col("_wid") =!= col(idCol) || col("_wpos") =!= col("pos")),
        lit(true)))
      .drop("_wid", "_wpos")
    reassembleLines(marked, idCol, sep)
  }

  /** Earliest (doc, pos) per line fingerprint over a [[lineSegs]]
    * stream — THE first-occurrence definition the full run, the
    * persisted index and the incremental probe all share (the same
    * single-definition rule as [[lineSegs]]: a tie-break or filter
    * drift between copies would silently diverge full vs incremental
    * results). Lines under `minLineLen` are exempt and never appear. */
  private def segsFirstOcc(segs: DataFrame, idCol: String,
                           minLineLen: Int): DataFrame =
    segs.filter(length(col("seg")) >= minLineLen)
      .groupBy(col("fp"))
      .agg(min(struct(col(idCol), col("pos"))).as("w"))
      .select(col("fp"), col(s"w.$idCol").as("wid"), col("w.pos").as("wpos"))

  /** Proof-carrying batch partial for the incremental line cleaners:
    * only [[lineFirstOccPartial]] / [[boilerplateCountsPartial]] mint
    * one, so a partial handed to [[incrementalDedupLines]] /
    * [[incrementalRemoveBoilerplate]] is guaranteed to be THE same-
    * definition build — and the cleaners verify family/sep/minLineLen
    * against their own parameters, refusing loudly instead of
    * silently mis-cleaning (the in-memory sibling of the
    * `_GRAFT_META` manifest check on stored indexes). */
  final class LinePartial private[operators] (
      val frame: DataFrame,
      private[operators] val family: String,
      private[operators] val sep: String,
      private[operators] val minLineLen: Int) {
    private[graft] def localCheckpoint(eager: Boolean): LinePartial =
      new LinePartial(frame.localCheckpoint(eager), family, sep, minLineLen)
    // Bridge.unpersistCheckpoint, not Dataset.unpersist: the latter
    // only consults the CacheManager, which never sees the checkpoint
    // RDD a localCheckpoint'd partial pins (a sink releasing partials
    // through this in foreachBatch would otherwise leak one pinned
    // RDD per micro-batch). No-op on a never-checkpointed partial.
    private[graft] def unpersist(): Unit =
      org.apache.spark.sql.graftbridge.Bridge.unpersistCheckpoint(frame)
    private[operators] def requireMatches(expFamily: String, expSep: String,
                                          expMinLineLen: Int): Unit =
      require(family == expFamily && sep == expSep &&
        minLineLen == expMinLineLen,
        s"batch partial was built as $family(sep='$sep', " +
          s"minLineLen=$minLineLen) but this run cleans with " +
          s"$expFamily(sep='$expSep', minLineLen=$expMinLineLen) — it " +
          "would silently mis-clean; mint it with the matching builder " +
          "under the SAME parameters")
  }

  /** Mint a batch's first-occurrence partial (see [[LinePartial]]). */
  def lineFirstOccPartial(batch: DataFrame, idCol: String, textCol: String,
                          sep: String, minLineLen: Int = 1): LinePartial =
    new LinePartial(
      lineFirstOccIndex(batch, idCol, textCol, sep, minLineLen),
      LineFamily, sep, minLineLen)

  /** Mint a batch's line-count partial (see [[LinePartial]]). */
  def boilerplateCountsPartial(batch: DataFrame, idCol: String,
                               textCol: String, sep: String,
                               minLineLen: Int = 1): LinePartial =
    new LinePartial(
      boilerplateIndex(batch, idCol, textCol, sep, minLineLen),
      BoilerFamily, sep, minLineLen)

  /** Persisted first-occurrence index for [[dedupLinesAcrossCorpus]]
    * — (fp, wid, wpos): the earliest (doc, pos) each distinct line was
    * seen at, one fixed-width row per DISTINCT line, never the text.
    * The incremental probe and the streaming shape both resolve
    * keep/drop against this table without re-reading the corpus. */
  def lineFirstOccIndex(df: DataFrame, idCol: String, textCol: String,
                        sep: String, minLineLen: Int = 1): DataFrame =
    segsFirstOcc(lineSegs(df, idCol, textCol, sep), idCol, minLineLen)

  /** Incremental keep-first line dedup — the daily-batch shape for
    * [[dedupLinesAcrossCorpus]]: clean ONLY the batch against the
    * stored corpus index + the batch's own first occurrences. A batch
    * line drops iff the corpus already holds its line (any corpus
    * occurrence precedes the whole batch) or an earlier batch
    * position holds it. Equals the full run over corpus ∪ batch
    * restricted to the batch's documents — PROVIDED every corpus id
    * precedes every batch id (the append-only contract; ingest order
    * IS the id order in this family) and sep/minLineLen match the
    * index build — stored indexes record them in the `_GRAFT_META`
    * manifest (checked by the path-taking read), and an in-memory
    * batch partial carries them in its [[LinePartial]] token.
    * Spec-pinned.
    *
    * @param batchIndex the batch's own first occurrences, if the
    *        caller already built them — a [[LinePartial]] minted by
    *        [[lineFirstOccPartial]], whose recorded parameters are
    *        verified against this call's (a mismatched partial would
    *        silently mis-dedup). The streaming sink passes its
    *        checkpointed partial so the batch is line-exploded once,
    *        not twice.
    * @return (idCol, clean_text, n_removed) — one row per batch doc
    */
  def incrementalDedupLines(batch: DataFrame, idCol: String, textCol: String,
                            index: DataFrame, sep: String,
                            minLineLen: Int = 1,
                            batchIndex: Option[LinePartial] = None): DataFrame = {
    batchIndex.foreach(_.requireMatches(LineFamily, sep, minLineLen))
    val segs = lineSegs(batch, idCol, textCol, sep)
    val batchFirst = batchIndex.map(_.frame)
      .getOrElse(lineFirstOccIndex(batch, idCol, textCol, sep, minLineLen))
      .select(col("fp"), col("wid").as("_bwid"), col("wpos").as("_bwpos"))
    val marked = segs
      .join(index.select(col("fp"), lit(true).as("_inCorpus")), Seq("fp"), "left")
      .join(batchFirst, Seq("fp"), "left")
      .withColumn("_boiler", when(
        col("_inCorpus").isNotNull ||
          (col("_bwid").isNotNull &&
            (col("_bwid") =!= col(idCol) || col("_bwpos") =!= col("pos"))),
        lit(true)))
      .drop("_inCorpus", "_bwid", "_bwpos")
    reassembleLines(marked, idCol, sep)
  }

  /** Fold a LATER batch's first occurrences into an existing index:
    * the stored (earlier) occurrence wins every collision — under the
    * append-only id contract the stored side is always earlier, so
    * this equals rebuilding over the union (spec-pinned). */
  def lineFirstOccIndexMerge(index: DataFrame, batchIndex: DataFrame): DataFrame =
    index.select(col("fp"), col("wid"), col("wpos"), lit(0).as("_src"))
      .unionByName(batchIndex.select(col("fp"), col("wid"), col("wpos"),
        lit(1).as("_src")))
      .groupBy(col("fp"))
      .agg(min(struct(col("_src"), col("wid"), col("wpos"))).as("w"))
      .select(col("fp"), col("w.wid").as("wid"), col("w.wpos").as("wpos"))

  /** THE first-occurrence fold — min (wid, wpos) per fingerprint over
    * any union of partials. Shared by the epoch-scoped read AND
    * [[lineFirstOccIndexCompact]] (associative, so a compacted base
    * re-entering this fold next to later epochs gives exactly the
    * all-epochs answer — the equivalence q143 oracle-pins). */
  private def firstOccFold(partials: DataFrame): DataFrame =
    partials.groupBy(col("fp"))
      .agg(min(struct(col("wid"), col("wpos"))).as("w"))
      .select(col("fp"), col("w.wid").as("wid"), col("w.wpos").as("wpos"))

  private val LineFamily = "line_first_occ"
  private[graft] def lineIndexMeta(sep: String, minLineLen: Int): IndexMeta =
    IndexMeta(LineFamily, "sep" -> sep, "minLineLen" -> minLineLen)

  /** Read a LOG-STRUCTURED stored first-occurrence index: epoch
    * partitions (plus the compacted base, if [[lineFirstOccIndexCompact]]
    * has run) each hold a (fp, wid, wpos) partial; the min (wid, wpos)
    * per fingerprint is the corpus-wide first occurrence (exact under
    * the append-only id-order contract — ids never interleave across
    * epochs). `excludeEpoch` drops one epoch's partial before
    * aggregating — the replay-idempotency hook the streaming sink
    * needs. A flat index written directly from [[lineFirstOccIndex]]
    * (no `_epoch` column) reads through the same call. */
  def lineFirstOccIndexRead(spark: org.apache.spark.sql.SparkSession,
                            path: String,
                            excludeEpoch: Option[String] = None): DataFrame =
    firstOccFold(EpochIndex.read(spark, path, excludeEpoch,
      bootstrapName = "lineFirstOccIndexWrite"))

  /** Checked read: refuses loudly (via the `_GRAFT_META` manifest)
    * if the stored index was built under a different sep/minLineLen —
    * the silent-divergence class [[incrementalDedupLines]]'s contract
    * used to delegate to the caller. */
  def lineFirstOccIndexRead(spark: org.apache.spark.sql.SparkSession,
                            path: String, excludeEpoch: Option[String],
                            sep: String, minLineLen: Int): DataFrame = {
    IndexMeta.check(spark, path, lineIndexMeta(sep, minLineLen))
    lineFirstOccIndexRead(spark, path, excludeEpoch)
  }

  /** Bootstrap a STORED first-occurrence index in the layout the
    * streaming sink appends to (an `_epoch=base` partition — same
    * convention as the boilerplate/IVF index writers), recording the
    * build parameters in the `_GRAFT_META` manifest every checked
    * read verifies. */
  def lineFirstOccIndexWrite(index: DataFrame, path: String,
                             sep: String, minLineLen: Int = 1): Unit = {
    EpochIndex.bootstrap(index, path)
    IndexMeta.write(index.sparkSession, path, lineIndexMeta(sep, minLineLen))
  }

  /** Append one batch's first-occurrence partial as a new epoch —
    * the batch-job sibling of the streaming sink's index write
    * (idempotent: a retry under the same epoch name replaces its own
    * partition). Parameters are manifest-checked: appending a
    * different-sep partial would poison every later read. */
  def lineFirstOccIndexAppend(spark: org.apache.spark.sql.SparkSession,
                              path: String, partial: DataFrame,
                              epoch: String, sep: String,
                              minLineLen: Int = 1): Unit = {
    IndexMeta.check(spark, path, lineIndexMeta(sep, minLineLen))
    EpochIndex.append(partial, path, epoch)
  }

  /** Fold accumulated epochs into a compacted base published with the
    * atomic `_CURRENT` pointer flip — bounds the probe-side scan of a
    * store that would otherwise grow one partial per batch forever
    * (see [[EpochIndex.compact]] for the snapshot/GC contract; q143
    * oracle-pins probe-after ≡ probe-before). */
  def lineFirstOccIndexCompact(spark: org.apache.spark.sql.SparkSession,
                               path: String,
                               keepVersions: Int = 2): EpochIndex.CompactionStats = {
    IndexMeta.requireFamily(spark, path, LineFamily)
    EpochIndex.compact(spark, path, firstOccFold, keepVersions = keepVersions)
  }

  /** ERASURE form for the first-occurrence store — a REBUILD, not a
    * filter (the cc_labels precedent): compaction's min-fold already
    * discarded every LATER occurrence of a line whose first holder is
    * now a victim, so dropping the victim's rows would lose lines the
    * retained corpus still contains — the only exact erased state is
    * recomputed from the retained corpus. Callers build it with
    * [[lineFirstOccIndex]] over the corpus minus the victims and pass
    * it here; the constant fold rides [[EpochIndex.eraseRewrite]] so
    * no epoch directory or retained version still names a victim as
    * a first-occurrence witness. */
  def lineFirstOccIndexRebuild(spark: org.apache.spark.sql.SparkSession,
                               path: String, rebuilt: DataFrame,
                               sep: String,
                               minLineLen: Int = 1): EpochIndex.CompactionStats = {
    IndexMeta.check(spark, path, lineIndexMeta(sep, minLineLen))
    EpochIndex.eraseRewrite(spark, path,
      _ => rebuilt.select(col("fp"), col("wid"), col("wpos")))
  }

  /** Persisted line-frequency index for boilerplate removal — the
    * table a 100 TB pipeline writes once at corpus-build time:
    * (fp, n_docs), one fixed-width row per DISTINCT line, never the
    * corpus text. [[incrementalRemoveBoilerplate]] probes it;
    * [[boilerplateIndexMerge]] folds a new batch's counts in. */
  def boilerplateIndex(df: DataFrame, idCol: String, textCol: String,
                       sep: String, minLineLen: Int = 1): DataFrame =
    lineCounts(lineSegs(df, idCol, textCol, sep), idCol, minLineLen)

  /** Fold a (disjoint-doc) batch's line counts into an existing
    * index: frequencies ADD because no document is counted twice.
    * Associative — building per-shard indexes and merging equals one
    * corpus-wide build (spec-pinned). */
  def boilerplateIndexMerge(index: DataFrame, batchIndex: DataFrame): DataFrame =
    index.unionByName(batchIndex)
      .groupBy(col("fp"))
      .agg(sum(col("n_docs")).as("n_docs"))

  /** THE line-count fold — counts ADD across partials (disjoint doc
    * sets). Shared by the epoch-scoped read and
    * [[boilerplateIndexCompact]]. */
  private def countsFold(partials: DataFrame): DataFrame =
    partials.groupBy(col("fp")).agg(sum(col("n_docs")).as("n_docs"))

  private val BoilerFamily = "boilerplate_counts"
  private[graft] def boilerplateIndexMeta(sep: String, minLineLen: Int): IndexMeta =
    IndexMeta(BoilerFamily, "sep" -> sep, "minLineLen" -> minLineLen)

  /** Read a LOG-STRUCTURED stored line-frequency index: epoch
    * partitions (plus the compacted base, if [[boilerplateIndexCompact]]
    * has run) each hold a (fp, n_docs) partial
    * (`Streaming.boilerplateIngestSink` writes them); summing per
    * fingerprint yields the corpus-wide counts. `excludeEpoch` drops
    * one epoch's partial before aggregating — the replay-idempotency
    * hook the streaming sink needs (its scaladoc explains why).
    * A flat index written directly from [[boilerplateIndex]] (no
    * `_epoch` column) reads through the same call. */
  def boilerplateIndexRead(spark: org.apache.spark.sql.SparkSession,
                           path: String,
                           excludeEpoch: Option[String] = None): DataFrame =
    countsFold(EpochIndex.read(spark, path, excludeEpoch,
      bootstrapName = "boilerplateIndexWrite"))

  /** Checked read: manifest-verifies sep/minLineLen before probing
    * (a mismatched probe silently under- or over-removes). */
  def boilerplateIndexRead(spark: org.apache.spark.sql.SparkSession,
                           path: String, excludeEpoch: Option[String],
                           sep: String, minLineLen: Int): DataFrame = {
    IndexMeta.check(spark, path, boilerplateIndexMeta(sep, minLineLen))
    boilerplateIndexRead(spark, path, excludeEpoch)
  }

  /** Bootstrap a STORED line-frequency index from a batch-built one
    * ([[boilerplateIndex]]) in the layout the streaming sink appends
    * to — an `_epoch=base` partition, the same convention as
    * `Similarity.ivfIndexWrite`, so later epoch-scoped dynamic
    * overwrites coexist with the seed instead of corrupting partition
    * discovery. Records sep/minLineLen in the `_GRAFT_META` manifest. */
  def boilerplateIndexWrite(index: DataFrame, path: String,
                            sep: String, minLineLen: Int = 1): Unit = {
    EpochIndex.bootstrap(index, path)
    IndexMeta.write(index.sparkSession, path, boilerplateIndexMeta(sep, minLineLen))
  }

  /** Append one disjoint batch's count partial as a new epoch
    * (manifest-checked; idempotent under a repeated epoch name). */
  def boilerplateIndexAppend(spark: org.apache.spark.sql.SparkSession,
                             path: String, partial: DataFrame,
                             epoch: String, sep: String,
                             minLineLen: Int = 1): Unit = {
    IndexMeta.check(spark, path, boilerplateIndexMeta(sep, minLineLen))
    EpochIndex.append(partial, path, epoch)
  }

  /** Fold accumulated count epochs into a compacted base (atomic
    * `_CURRENT` publish — see [[EpochIndex.compact]]). */
  def boilerplateIndexCompact(spark: org.apache.spark.sql.SparkSession,
                              path: String,
                              keepVersions: Int = 2): EpochIndex.CompactionStats = {
    IndexMeta.requireFamily(spark, path, BoilerFamily)
    EpochIndex.compact(spark, path, countsFold, keepVersions = keepVersions)
  }

  /** Erase documents from a persisted line-frequency index — exact
    * count subtraction (the [[gramFreqIndexErase]] discipline at line
    * granularity): after it returns the store equals
    * [[boilerplateIndex]] over the corpus WITHOUT the victims, and
    * lines unique to the victims survive in no retained version or
    * epoch. Victim documents (id + text) are required because their
    * count partial must be recomputed to be subtracted. */
  def boilerplateIndexErase(spark: org.apache.spark.sql.SparkSession,
                            path: String, victimDocs: DataFrame,
                            idCol: String, textCol: String, sep: String,
                            minLineLen: Int = 1): EpochIndex.CompactionStats = {
    IndexMeta.check(spark, path, boilerplateIndexMeta(sep, minLineLen))
    countSubtractErase(spark, path,
      boilerplateIndex(victimDocs, idCol, textCol, sep, minLineLen),
      "fp", "n_docs", "boilerplateIndexErase")
  }

  /** Incremental boilerplate removal — the daily-batch shape
    * completing the same persisted-index family as the near-dup
    * probes (q93/q97/q98/q99): clean ONLY the batch, against
    * corpus-wide line frequencies = stored index counts + the
    * batch's own counts (document sets disjoint, so the sum IS the
    * union's frequency). The corpus text is never touched — the join
    * ships 16-byte fingerprints against the index. Equals
    * [[removeBoilerplateLines]] over corpus ∪ batch restricted to the
    * batch's documents (spec-pinned) — PROVIDED `sep` and
    * `minLineLen` match the index build's: a mismatched probe
    * silently under- or over-removes, which is why stored indexes
    * record them in `_GRAFT_META` (the path-taking read checks it)
    * and in-memory partials carry them in the [[LinePartial]] token.
    *
    * @param batchCounts the batch's own line counts, if the caller
    *        already built them — a [[LinePartial]] minted by
    *        [[boilerplateCountsPartial]], parameter-verified against
    *        this call's. The streaming sink passes its checkpointed
    *        partial here so the batch is line-exploded and
    *        count-aggregated once, not twice. */
  def incrementalRemoveBoilerplate(batch: DataFrame, idCol: String,
                                   textCol: String, index: DataFrame,
                                   sep: String, minDocs: Int,
                                   minLineLen: Int = 1,
                                   batchCounts: Option[LinePartial] = None): DataFrame = {
    batchCounts.foreach(_.requireMatches(BoilerFamily, sep, minLineLen))
    val segs = lineSegs(batch, idCol, textCol, sep)
    val boiler = batchCounts.map(_.frame)
      .getOrElse(lineCounts(segs, idCol, minLineLen))
      .join(index.select(col("fp"), col("n_docs").as("_stored")),
        Seq("fp"), "left")
      .filter(col("n_docs") + coalesce(col("_stored"), lit(0L)) >= minDocs)
      .select(col("fp"), lit(true).as("_boiler"))
    reassembleLines(segs.join(boiler, Seq("fp"), "left"), idCol, sep)
  }

  /** Exact-substring repeated-span detection (the Lee et al. 2022,
    * arXiv:2107.06499 "Deduplicating Training Data" technique, at the
    * token-window grain): every `k`-token window whose token sequence
    * occurs at least `minCount` times in the corpus — any document,
    * any offset, self-repeats included — is flagged, and flagged
    * windows that overlap OR touch end-to-start merge into MAXIMAL
    * repeated regions per document (a span can therefore be the
    * union of several independent repeats that abut). The caller
    * excises or down-weights the spans; this operator reports them.
    *
    * Scale shape: windows are fingerprinted (md5) in the scan stage
    * and the global occurrence count shuffles 16-byte keys with
    * map-side partial counts — never the window text twice. The span
    * merge is two windows + an aggregate all partitioned by document,
    * so partition sizes are bounded by document length. Documents
    * shorter than `k` tokens yield no windows (not an error).
    *
    * @return (idCol, span_start, span_end, n_windows) — token
    *         offsets, [start, end) — one row per maximal span
    */
  def repeatedSpans(df: DataFrame, idCol: String, textCol: String,
                    k: Int, minCount: Int = 2): DataFrame = {
    require(k >= 2 && minCount >= 2, s"k >= 2, minCount >= 2: $k, $minCount")
    val grams = positionedGramFps(df, idCol, textCol, k)
    val rep = grams.groupBy(col("_fp"))
      .agg(count(lit(1)).as("_n"))
      .filter(col("_n") >= minCount)
      .select("_fp")
    val flagged = grams.join(rep, Seq("_fp"), "left_semi")
    mergeWindowIslands(flagged, k)
      .select(col("_doc").as(idCol), col("span_start"), col("span_end"),
        col("n_windows"))
  }

  /** (_doc, _pos, _fp): every positional k-token window of every doc,
    * fingerprinted. Codegen'd WordNgrams, NOT a transform() lambda
    * closing over the tokenizer: ArrayTransform interprets its body
    * per element and would re-tokenize the whole document once per
    * window — the O(n²) trap word_ngrams exists to kill (its
    * scaladoc, q50). dedup=false keeps one gram per position (the
    * array index IS the window offset); emptyIfShort covers docs
    * under k tokens. */
  private def positionedGramFps(df: DataFrame, idCol: String,
                                textCol: String, k: Int): DataFrame =
    df.select(col(idCol).as("_doc"),
      posexplode(Sketches.word_ngrams(TextFunctions.tokens(col(textCol)),
        k, dedup = false, emptyIfShort = true)).as(Seq("_pos", "_gram")))
      .select(col("_doc"), col("_pos"), md5(col("_gram")).as("_fp"))

  /** Merge flagged (_doc, _pos) windows of width k that overlap or
    * abut into maximal [span_start, span_end) islands per document.
    * Two windows + an aggregate, all partitioned by document —
    * partition sizes bounded by document length. */
  private def mergeWindowIslands(flagged: DataFrame, k: Int): DataFrame = {
    val wDoc = Window.partitionBy(col("_doc")).orderBy(col("_pos"))
    flagged
      .withColumn("_prev_end", max(col("_pos") + k)
        .over(wDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("_island", sum(
        when(col("_prev_end").isNull || col("_pos") > col("_prev_end"), 1)
          .otherwise(0)).over(wDoc))
      .groupBy(col("_doc"), col("_island"))
      .agg(
        min(col("_pos")).cast("long").as("span_start"),
        (max(col("_pos")) + k).cast("long").as("span_end"),
        count(lit(1)).as("n_windows"))
      .select(col("_doc"), col("span_start"), col("span_end"), col("n_windows"))
  }

  /** Exact-substring repeated-span REMOVAL — [[repeatedSpans]]'s
    * excision counterpart (the apply step of Lee et al. 2022): every
    * occurrence of a ≥`minCount`-times-repeated k-token window is cut
    * from its document EXCEPT the globally first occurrence (minimal
    * (doc, pos) — so exactly one copy of every duplicated passage
    * survives the corpus, deterministically), and surviving tokens
    * reassemble in order. Output text is at the token grain (the
    * tokenizer's lowercase alphanumeric stream — the same contract as
    * chunking/packing), since that is the grain the windows are
    * defined on.
    *
    * Scale shape: the keep-first decision is a count + min(struct)
    * aggregate per fingerprint — map-side partial, skew-safe (a
    * million-fold-repeated gram never lands in one window-sort task,
    * unlike a row_number-per-gram plan). Removed windows then merge
    * into maximal disjoint spans per document BEFORE reassembly, so
    * the per-token kept/cut test is `exists` over a handful of merged
    * spans (a fully-duplicated document is ONE span), not per bad
    * window; the document table joins the span lists once and rebuilds
    * text row-local — the corpus token stream itself never shuffles.
    *
    * @return (idCol, clean_text, n_removed) — every input doc, removed
    *         token count at the window-union grain
    */
  def removeRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
                          k: Int, minCount: Int = 2): DataFrame = {
    require(k >= 2 && minCount >= 2, s"k >= 2, minCount >= 2: $k, $minCount")
    val grams = positionedGramFps(df, idCol, textCol, k)
    val stats = grams.groupBy(col("_fp"))
      .agg(count(lit(1)).as("_n"),
        min(struct(col("_doc"), col("_pos"))).as("_first"))
    val bad = grams
      .join(stats.filter(col("_n") >= minCount).select("_fp", "_first"),
        Seq("_fp"))
      .filter(struct(col("_doc"), col("_pos")) =!= col("_first"))
      .select(col("_doc"), col("_pos"))
    val perDoc = mergeWindowIslands(bad, k)
      .groupBy(col("_doc"))
      .agg(sort_array(collect_list(
        struct(col("span_start"), col("span_end")))).as("_spans"))
    val toks = TextFunctions.tokens(coalesce(col(textCol), lit("")))
    val spans = coalesce(col("_spans"),
      array().cast("array<struct<span_start:bigint,span_end:bigint>>"))
    val kept = filter(toks, (_, i) =>
      !exists(spans, s =>
        i >= s.getField("span_start") && i < s.getField("span_end")))
    df.join(perDoc, col(idCol) === col("_doc"), "left")
      .select(col(idCol),
        concat_ws(" ", kept).as("clean_text"),
        (size(toks) - size(kept)).cast("long").as("n_removed"))
  }

  /** Incremental exact dedup — the daily-production shape: keep only
    * rows of `newDocs` whose canonical fingerprint is absent from the
    * EXISTING corpus' fingerprint index. Never re-fingerprints the
    * corpus: at scale `existingFingerprints` is the stored 16-byte-key
    * index (one column), and the anti join shuffles fingerprints, not
    * documents. Within-batch duplicates collapse first (min id wins),
    * mirroring exactDedup. */
  def incrementalExactDedup(newDocs: DataFrame, textCol: String, idCol: String,
                            existingFingerprints: DataFrame): DataFrame = {
    val fp = TextFunctions.fingerprint(col(textCol))
    val withFp = newDocs.withColumn("fingerprint", fp)
    exactDedup(withFp, col("fingerprint"), col(idCol))
      .join(existingFingerprints.select(col("fingerprint")),
        Seq("fingerprint"), "left_anti")
  }

  /** Bloom-prefiltered incremental exact dedup — identical result to
    * [[incrementalExactDedup]], different 100 TB shape. The plain
    * form's anti join shuffles BOTH sides on fingerprint: the new
    * batch (small) and the corpus index (at scale, billions of rows —
    * the dominant cost, repaid in full every daily batch). Here the
    * corpus index is folded ONCE into a broadcast bloom filter (one
    * map-side-combined aggregate; only the ~n·ln(1/p)/ln²2-bit filter
    * crosses the wire), the batch probes it at scan speed, and rows
    * the filter rejects are DEFINITIVELY new — they skip the join
    * entirely. Only the "maybe" rows (true dups + the fpp share of
    * false positives) reach the exact anti join, so the corpus-side
    * shuffle still happens but the batch side shrinks to the dup
    * rate, and with AQE the join often degrades gracefully further.
    * Exactness is preserved by construction: the bloom can only err
    * toward sending a row to the verifying join, never toward
    * dropping one.
    *
    * This is Spark's own runtime-filter machinery applied where the
    * optimizer can't see it (`InjectRuntimeFilter` only rewrites
    * equi-join shapes, not anti-join-as-dedup pipelines).
    *
    * @param expectedItems corpus index cardinality (at scale: the
    *                      stored table's row-count stat, not a count())
    * @param fpp           target false-positive rate; sizes the filter
    */
  def bloomIncrementalExactDedup(newDocs: DataFrame, textCol: String, idCol: String,
                                 existingFingerprints: DataFrame,
                                 expectedItems: Long,
                                 fpp: Double = 0.01): DataFrame = {
    import graft.functions.Sketches
    import org.apache.spark.sql.graftbridge.Bridge
    // might_contain requires its filter operand to be a constant or a
    // scalar subquery (a joined column fails analysis) — the same
    // attachment InjectRuntimeFilter uses; ReuseSubquery executes the
    // build once even though both branches below reference it
    val bloomCol = Bridge.scalarSubquery(existingFingerprints
      .agg(Sketches.bloom_agg(col("fingerprint"), expectedItems, fpp).as("_bloom")))
    val withFp = newDocs.withColumn("fingerprint",
      TextFunctions.fingerprint(col(textCol)))
    val probed = exactDedup(withFp, col("fingerprint"), col(idCol))
    // An empty corpus builds a zero-cardinality bloom that evaluates to
    // null; might_contain null-propagates and a null predicate is dropped
    // by BOTH branches below, which would silently lose the whole first
    // batch. coalesce to true so "unknown" routes rows through the exact
    // anti join, which is always correct.
    val mightHit = coalesce(
      Sketches.bloom_might_contain(bloomCol, col("fingerprint")), lit(true))
    // two branches over one subtree: the dedup window's exchange is
    // physically reused, so the batch is scanned, not recomputed
    val definitelyNew = probed.filter(!mightHit)
    val verified = probed.filter(mightHit)
      .join(existingFingerprints.select(col("fingerprint")),
        Seq("fingerprint"), "left_anti")
    definitelyNew.unionByName(verified)
  }

  /** Distinct word k-shingles of the token stream — the MinHash input
    * unit. Documents shorter than k tokens yield their whole token
    * stream as a single shingle.
    *
    * Built by the codegen'd WordNgrams expression — one compiled pass
    * over the token array. The earlier zip_with-over-shifted-slices
    * formulation, while already avoiding the O(n²) trap of closing
    * over the token regex inside a lambda, still paid an interpreted
    * lambda evaluation per gram; the compiled loop removes that too. */
  def shingles(text: Column, k: Int = 3): Column =
    Sketches.word_ngrams(TextFunctions.tokens(text), k,
      dedup = true, emptyIfShort = false)

  /** MinHash signature via the custom codegen'd expression
    * (graft.functions.MinHashSignature) — computed in the scan stage,
    * no shuffle, tight compiled loop instead of interpreted HOFs. */
  def minHashSignature(shinglesCol: Column, numHashes: Int): Column =
    Sketches.minhash_signature(shinglesCol, numHashes)

  /** Estimated Jaccard from two equal-length signatures: fraction of
    * agreeing positions (codegen'd SigAgreement expression). */
  def estimatedJaccard(sigA: Column, sigB: Column): Column =
    Sketches.sig_agreement(sigA, sigB)

  /** MinHash + LSH near-duplicate candidate pairs.
    *
    * COST MODEL — read before trusting a wall-clock number: the
    * quadratic step below enumerates pairs inside each band bucket,
    * so total candidate work is Σ over buckets of |bucket|² (after
    * the identical-membership collapse and the `maxBucket` skew
    * guard). That sum is NOT linear in corpus size: buckets are
    * near-dup cliques, and if clique sizes grow with the corpus —
    * planted duplicates at a fixed RATE, the common synthetic and
    * crawl shape — doubling the corpus quadruples Σ|bucket|². The
    * q93 benchmark measures a ~36× time slope for 10× data at
    * shingleK=1 for exactly this reason; that is the model working,
    * not a regression. At 100 TB the knobs, in order: raise
    * `shingleK` (smaller, more specific buckets), block with
    * `blockCol`, and keep `maxBucket` tight — a bucket at the cap
    * contributes maxBucket² no matter how the corpus grows, making
    * the guard the hard ceiling on per-bucket cost. Bench emits a
    * per-query SF slope and flags super-linear jumps
    * (`slope_flags` in bench_stats.json) so a cost-model breach
    * surfaces as a named flag, not a mystery headline number.
    *
    * @param blockCol  optional blocking column: when set, the band key
    *                  includes it, so candidates are same-block BY
    *                  CONSTRUCTION. When the dedup unit is a block
    *                  (e.g. per-source), blocking here — not filtering
    *                  after pair generation — is the scale decision:
    *                  it keeps cross-block moderate-similarity pairs
    *                  from ever entering the candidate set.
    * @param threshold minimum estimated Jaccard. Pass 0.0 to skip
    *                  signature scoring entirely (est_jaccard comes
    *                  back null): banding is then the only filter and
    *                  the caller is expected to verify candidates
    *                  exactly (ngramJaccardVerify) — two whole join
    *                  stages cheaper when an exact verifier follows
    *                  anyway.
    * @return (id_a, id_b, est_jaccard) with id_a < id_b, distinct,
    *         filtered to est_jaccard >= threshold (when scoring).
    */
  def minHashLsh(df: DataFrame, idCol: String, textCol: String,
                 numHashes: Int = 64, bands: Int = 16,
                 shingleK: Int = 3, threshold: Double = 0.5,
                 maxBucket: Int = 200,
                 blockCol: Option[String] = None): DataFrame = {
    val blockKey = blockCol.toSeq

    // Signatures and band keys come from the SAME helpers the
    // persisted index build and the incremental probe use
    // ([[minHashSigs]]/[[bandKeysOf]]) — byte-identical band keys
    // across all three paths is what the q93 incremental-equals-full
    // contract rests on; sigs are kept separately here because the
    // threshold > 0 tail re-joins them for scoring.
    val sigs = minHashSigs(df, idCol, textCol, numHashes, shingleK, blockCol)
    val banded = bandKeysOf(sigs, numHashes, bands, blockCol)

    // Bucket membership as a sorted id list (one shuffle), with the
    // skew guard (degenerate mega-buckets) and singleton drop applied
    // on list size. Then collapse buckets with IDENTICAL membership
    // before the quadratic step: near-identical documents agree on
    // most of their bands, so without this each clique's pair set is
    // regenerated once per agreeing band — measured ~30× redundant
    // pre-distinct volume on a near-dup-heavy corpus. distinct() on
    // (block, ids) costs one shuffle of O(#buckets) list rows instead
    // of O(Σ bucket²) pair rows.
    val bucketKey = blockKey ++ Seq("band", "bh")
    val buckets = guardBuckets(
      banded.groupBy(bucketKey.map(col): _*)
        .agg(sort_array(collect_list(col("id"))).as("ids")),
      "ids", maxBucket, "minhash_lsh", dropSingletons = true)
      .select(blockKey.map(col) :+ col("ids"): _*)
      .distinct()

    // candidate pair IDs from each distinct bucket (ids sorted ⇒
    // id_a < id_b by construction), deduped across overlapping
    // buckets BEFORE scoring — each surviving pair is scored (or
    // verified) exactly once
    val pairs = buckets
      .select(posexplode(col("ids")).as(Seq("i", "id_a")), col("ids"))
      .select(col("id_a"),
        explode(slice(col("ids"), col("i") + lit(2), size(col("ids")))).as("id_b"))
      .distinct()

    if (threshold <= 0.0)
      return pairs.select(col("id_a"), col("id_b"),
        lit(null).cast("double").as("est_jaccard"))

    // fetch both signatures by id (small enough to auto-broadcast at
    // bench scale; AQE picks a shuffle join when the corpus outgrows
    // the broadcast threshold) and score once per pair
    pairs
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        estimatedJaccard(col("sig_a"), col("sig_b")).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** The persisted corpus-side state for INCREMENTAL MinHash-LSH:
    * one row per (block?, band, bh, id) bucket membership, with
    * degenerate mega-buckets (boilerplate content) dropped at BUILD
    * time so every later probe inherits the skew guard. At 100 TB
    * this is the band table a daily pipeline writes once per corpus
    * rebuild and range-reads per batch — the index is O(docs · bands)
    * fixed-width rows, and probing it never re-tokenizes, re-hashes,
    * or re-shuffles the corpus itself.
    *
    * Hash seeds are deterministic (the MinHashSignature expression is
    * seed-stable), so signatures computed in a LATER job line up with
    * the persisted index — the property incrementality depends on. */
  def minHashBandIndex(df: DataFrame, idCol: String, textCol: String,
                       numHashes: Int = 64, bands: Int = 16,
                       shingleK: Int = 3, maxBucket: Int = 200,
                       blockCol: Option[String] = None): DataFrame = {
    val banded = bandedKeys(df, idCol, textCol, numHashes, bands, shingleK, blockCol)
    val blockKey = blockCol.toSeq
    val bucketKey = blockKey ++ Seq("band", "bh")
    guardBuckets(
      banded.groupBy(bucketKey.map(col): _*)
        .agg(collect_list(col("id")).as("ids")),
      "ids", maxBucket, "minhash_index", dropSingletons = false)
      .select((bucketKey.map(col) :+ explode(col("ids")).as("id")): _*)
  }

  /** Near-dup candidate pairs for a NEW batch against an already-
    * indexed corpus — the incremental sibling of [[minHashLsh]] (and
    * the MinHash twin of [[bloomIncrementalExactDedup]]'s shape):
    * batch-internal pairs come from LSH over the batch alone,
    * batch-vs-corpus pairs from an equi join of the batch's band keys
    * against the persisted index. The corpus pays nothing per batch.
    *
    * With a shared `maxBucket` comfortably above the largest real
    * clique, the output equals the full-corpus [[minHashLsh]]
    * candidate set restricted to pairs touching the batch (q93 pins
    * this in-engine; DedupSpec proves it on real data) — near the
    * guard boundary the two can differ, because the full run sees
    * combined bucket sizes while the incremental run guards each side
    * separately. That divergence is OBSERVABLE, not just documented:
    * every guard stage (batch-internal, index build, full run) emits a
    * dropped-bucket counter into the executed query's observed metrics
    * — read the total with [[droppedBuckets]]; nonzero on either side
    * near a tight `maxBucket` means candidates were lost asymmetrically.
    *
    * Cost model: the batch-internal half inherits [[minHashLsh]]'s
    * Σ|bucket|² (over BATCH buckets only — the incremental win); the
    * cross half is one equi join on band keys whose output is bounded
    * by batch-bucket × corpus-bucket co-membership, again capped by
    * `maxBucket` per side. Batch cost therefore scales with the
    * BATCH's clique structure, not the corpus's — see the
    * [[minHashLsh]] cost-model paragraph for the knobs.
    *
    * @param bandIndex output of [[minHashBandIndex]] built with the
    *                  SAME numHashes/bands/shingleK/blockCol
    */
  def incrementalMinHashLsh(newDocs: DataFrame, idCol: String, textCol: String,
                            bandIndex: DataFrame,
                            numHashes: Int = 64, bands: Int = 16,
                            shingleK: Int = 3, maxBucket: Int = 200,
                            blockCol: Option[String] = None): DataFrame = {
    val internal = minHashLsh(newDocs, idCol, textCol, numHashes, bands,
      shingleK, threshold = 0.0, maxBucket, blockCol)
      .select(col("id_a"), col("id_b"))
    val batchBanded = bandedKeys(newDocs, idCol, textCol, numHashes, bands,
      shingleK, blockCol)
    internal.unionByName(minHashCross(batchBanded, bandIndex, blockCol))
      .distinct()
  }

  /** The batch×corpus half of [[incrementalMinHashLsh]] — one
    * definition for the in-memory and store-backed probes. */
  private def minHashCross(batchBanded: DataFrame, bandIndex: DataFrame,
                           blockCol: Option[String],
                           keepSelf: Boolean = false): DataFrame =
    batchBanded
      .join(bandIndex.withColumnRenamed("id", "corpus_id"),
        blockCol.toSeq ++ Seq("band", "bh"))
      .filter(if (keepSelf) lit(true) else col("id") =!= col("corpus_id"))
      .select(least(col("id"), col("corpus_id")).as("id_a"),
        greatest(col("id"), col("corpus_id")).as("id_b"))
      .distinct()

  private[graft] def minHashBandsMeta(numHashes: Int, bands: Int,
                                      shingleK: Int, maxBucket: Int,
                                      blockCol: Option[String]): IndexMeta =
    IndexMeta("minhash_bands", "numHashes" -> numHashes, "bands" -> bands,
      "shingleK" -> shingleK, "maxBucket" -> maxBucket,
      "blockCol" -> blockCol.getOrElse("-"))

  /** Persist a [[minHashBandIndex]] to the bucketed band store — the
    * disk form the daily-batch probe ([[incrementalMinHashLshFromStore]])
    * reads with a parquet partition filter. */
  def minHashBandIndexWrite(corpus: DataFrame, idCol: String, textCol: String,
                            path: String, numHashes: Int = 64,
                            bands: Int = 16, shingleK: Int = 3,
                            maxBucket: Int = 200,
                            blockCol: Option[String] = None,
                            buckets: Int = 64): Unit =
    bandIndexStoreWrite(
      minHashBandIndex(corpus, idCol, textCol, numHashes, bands, shingleK,
        maxBucket, blockCol),
      path, minHashBandsMeta(numHashes, bands, shingleK, maxBucket, blockCol),
      buckets)

  /** [[incrementalMinHashLsh]] against the PERSISTED store: the
    * batch's band keys are computed once (pinned), their bucket set
    * becomes the store read's parquet partition filter, and the
    * manifest check refuses a probe banded differently. Scan cost is
    * ∝ the batch's bucket set — at 100 TB the corpus index is never
    * scanned whole per batch. */
  def incrementalMinHashLshFromStore(
      spark: org.apache.spark.sql.SparkSession, path: String,
      newDocs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16, shingleK: Int = 3,
      maxBucket: Int = 200, blockCol: Option[String] = None,
      buckets: Int = 64, excludeEpoch: Option[String] = None): DataFrame =
    incrementalMinHashLshFromStorePinned(spark, path, newDocs, idCol,
      textCol, numHashes, bands, shingleK, maxBucket, blockCol, buckets,
      excludeEpoch)._1

  /** [[incrementalMinHashLshFromStore]] with caller-managed release
    * of the internal band-key checkpoint — for foreachBatch callers
    * with no harness sweep (see [[incrementalSimHashFromStore]]'s
    * pin-lifecycle note). */
  private[graft] def incrementalMinHashLshFromStorePinned(
      spark: org.apache.spark.sql.SparkSession, path: String,
      newDocs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16, shingleK: Int = 3,
      maxBucket: Int = 200, blockCol: Option[String] = None,
      buckets: Int = 64, excludeEpoch: Option[String] = None,
      keepSelf: Boolean = false): (DataFrame, () => Unit) = {
    val batchBanded = Bridge.freshLeaf(
      bandedKeys(newDocs, idCol, textCol, numHashes, bands, shingleK,
        blockCol).localCheckpoint(true))
    val idx = bandIndexStoreProbeRead(spark, path,
      minHashBandsMeta(numHashes, bands, shingleK, maxBucket, blockCol),
      batchBanded, excludeEpoch, buckets)
    val internal = minHashLsh(newDocs, idCol, textCol, numHashes, bands,
      shingleK, threshold = 0.0, maxBucket, blockCol)
      .select(col("id_a"), col("id_b"))
    (internal.unionByName(minHashCross(batchBanded, idx, blockCol,
        keepSelf))
      .distinct(),
      () => Bridge.unpersistCheckpoint(batchBanded))
  }

  /** Shared banding front end: (id, [block,] band, bh) keys from the
    * codegen'd scan-side signatures — used by [[minHashLsh]], the
    * index build, and the batch probe, so all three produce
    * byte-identical band keys by construction. */
  private def bandedKeys(df: DataFrame, idCol: String, textCol: String,
                         numHashes: Int, bands: Int, shingleK: Int,
                         blockCol: Option[String]): DataFrame =
    bandKeysOf(minHashSigs(df, idCol, textCol, numHashes, shingleK, blockCol),
      numHashes, bands, blockCol)

  /** (id, sig, [block]) MinHash signatures, computed at full width:
    * the exchange sits BELOW the signature projection ([[Par.widen]],
    * scale-adaptive — a no-op on a scan with enough splits), so the
    * expensive sketch runs on every core instead of serially on a
    * narrow scan, and nothing re-shuffles the computed signatures.
    * Recompute safety without the old post-projection barrier:
    * CollapseProject's cheapness guard refuses to duplicate a
    * non-trivial expression into multiple consumers, and the single
    * downstream consumer (banding) references `sig` through one
    * explode — plan-gated by [[graft.PlanAuditSpec]]'s single-
    * signature-node checks. */
  private def minHashSigs(df: DataFrame, idCol: String, textCol: String,
                          numHashes: Int, shingleK: Int,
                          blockCol: Option[String]): DataFrame =
    Par.widen(df, col(idCol)).select(
      col(idCol).as("id") +: Sketches.minhash_shingled(
        TextFunctions.tokens(col(textCol)), shingleK, numHashes).as("sig") +:
        blockCol.toSeq.map(col): _*)

  /** Band keys from materialized signatures. Signatures are dropped
    * immediately: every shuffle from here to pair generation carries
    * only (id, [block,] band, bh) — small fixed-width rows, not
    * 8·numHashes-byte signature arrays. */
  private def bandKeysOf(sigs: DataFrame, numHashes: Int, bands: Int,
                         blockCol: Option[String]): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val blockKey = blockCol.toSeq
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)).as("bh"))
    }
    sigs
      .select(col("id") +: explode(array(bandStructs: _*)).as("bk") +:
        blockKey.map(col): _*)
      .select(col("id") +: col("bk.band") +: col("bk.bh") +:
        blockKey.map(col): _*)
  }

  /** 64-bit SimHash of the token stream: bit j of the result is the
    * sign of Σ_tokens (±1 by bit j of xxhash64(token)). Codegen'd
    * SimHash64 expression — no UDF, no shuffle. */
  def simHash(text: Column): Column =
    Sketches.simhash64(array_distinct(TextFunctions.tokens(text)))

  /** SimHash near-dup pairs via 4×16-bit band blocking (any pair with
    * Hamming ≤ 3 shares at least one of 4 bands).
    *
    * `maxBucket` is the same degenerate-content skew guard as
    * minHashLsh's: a constant simhash (e.g. 0 for every empty/
    * boilerplate document) puts its whole cohort into one (band, bh)
    * key, whose self-join would emit O(m²) rows in a single task. */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, maxBucket: Int = 5000): DataFrame =
    hammingPairs64(textSigs(df, idCol, textCol),
      maxHamming, maxBucket, family = "simhash")

  /** Near-dup pairs over PRE-COMPUTED 64-bit signatures (id, sig) —
    * the banding/bucketing engine under [[simHashPairs]], exposed so
    * any 64-bit Hamming signature (SimHash, perceptual image hashes,
    * SRP) reuses the same single-shuffle plan. With `maxHamming` ≤ 3
    * the output is EXACTLY every pair at Hamming ≤ maxHamming
    * (4×16-bit pigeonhole: ≤3 flipped bits leave ≥1 band intact), so
    * a brute-force oracle can pin it; beyond 3 it is recall-bounded
    * like any banded LSH.
    *
    * `maxBucket` is the same degenerate-content skew guard as
    * minHashLsh's: a constant signature (e.g. 0 for every empty/
    * boilerplate document) puts its whole cohort into one (band, bh)
    * key, whose self-join would emit O(m²) rows in a single task. */
  def hammingPairs64(sigs: DataFrame, maxHamming: Int = 3,
                     maxBucket: Int = 5000,
                     family: String = "hamming64"): DataFrame = {
    val banded = band64(sigs, carry = Nil)
    // bucket membership as a sorted (id, sig) list — one shuffle, same
    // shape as minHashLsh: the skew guard applies on list size,
    // identical-membership buckets collapse before the quadratic step
    // (near-identical docs agree on most bands), and pair generation
    // emits id_a < id_b by construction instead of filtering half of a
    // self-join's output away
    val buckets = guardBuckets(
      banded.groupBy("band", "bh")
        .agg(sort_array(collect_list(struct(col("id"), col("sig")))).as("xs")),
      "xs", maxBucket, family, dropSingletons = true)
      .select(col("xs"))
      .distinct()
    buckets
      .select(posexplode(col("xs")).as(Seq("i", "x")), col("xs"))
      .select(col("x.id").as("id_a"), col("x.sig").as("sig_a"),
        explode(slice(col("xs"), col("i") + lit(2), size(col("xs")))).as("y"))
      .select(col("id_a"), col("y.id").as("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("y.sig"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Persisted SimHash band index — the SimHash twin of
    * [[minHashBandIndex]]: one (band, bh, id, sig) row per document ×
    * 4 bands, written once at corpus build. The signature rides along
    * so the probe can Hamming-verify without touching corpus text. */
  def simHashBandIndex(df: DataFrame, idCol: String, textCol: String,
                       maxBucket: Int = 5000): DataFrame =
    hamming64BandIndex(textSigs(df, idCol, textCol), maxBucket,
      family = "simhash_index")

  /** Probe a new batch against a persisted [[simHashBandIndex]] —
    * within-batch pairs plus batch×corpus pairs, the corpus never
    * re-tokenized or re-signatured. Same contract as
    * [[incrementalMinHashLsh]]: with the skew guard above the largest
    * real clique, equals the full-corpus [[simHashPairs]] run
    * restricted to pairs touching the batch (q97 pins it). */
  def incrementalSimHash(newDocs: DataFrame, idCol: String, textCol: String,
                         bandIndex: DataFrame, maxHamming: Int = 3,
                         maxBucket: Int = 5000): DataFrame =
    incrementalHamming64(textSigs(newDocs, idCol, textCol), bandIndex,
      maxHamming, maxBucket, family = "simhash")

  /** Persisted band index over PRE-COMPUTED 64-bit signatures — the
    * signature-level engine under [[simHashBandIndex]], exposed so
    * every Hamming family (SimHash text, dHash images, SRP
    * embeddings) gets the same probe-a-stored-index incremental
    * shape. One (band, bh, id, sig) row per item × 4 bands.
    * Build-time skew guard: a degenerate constant-signature cohort
    * (empty/boilerplate content) would otherwise hand every future
    * batch an O(cohort) join fan-out on its bucket. */
  def hamming64BandIndex(sigs: DataFrame, maxBucket: Int = 5000,
                         family: String = "hamming64_index"): DataFrame = {
    val banded = band64(sigs, carry = Nil)
    guardBuckets(
      banded.groupBy("band", "bh")
        .agg(collect_list(struct(col("id"), col("sig"))).as("xs")),
      "xs", maxBucket, family, dropSingletons = false)
      .select(col("band"), col("bh"), explode(col("xs")).as("x"))
      .select(col("band"), col("bh"), col("x.id").as("id"), col("x.sig").as("sig"))
  }

  /** Probe batch signatures against a persisted [[hamming64BandIndex]]
    * — within-batch pairs plus batch×corpus pairs; corpus items are
    * touched only through the index's bounded band buckets. With the
    * skew guard above the largest real clique, equals the full-corpus
    * [[hammingPairs64]] run restricted to pairs touching the batch
    * (q97 pins the text family, q124 the image family). */
  def incrementalHamming64(batchSigs: DataFrame, bandIndex: DataFrame,
                           maxHamming: Int = 3, maxBucket: Int = 5000,
                           family: String = "hamming64",
                           keepSelf: Boolean = false): DataFrame = {
    val internal = hammingPairs64(batchSigs, maxHamming, maxBucket, family)
      .select("id_a", "id_b")
    val cross = band64(batchSigs, carry = Nil)
      .join(bandIndex
          .withColumnRenamed("id", "corpus_id")
          .withColumnRenamed("sig", "corpus_sig"),
        Seq("band", "bh"))
      .filter((if (keepSelf) lit(true)
               else col("id") =!= col("corpus_id")) &&
        bit_count(col("sig").bitwiseXOR(col("corpus_sig"))) <= maxHamming)
      .select(least(col("id"), col("corpus_id")).as("id_a"),
        greatest(col("id"), col("corpus_id")).as("id_b"))
      .distinct()
    internal.unionByName(cross).distinct()
  }

  private[graft] def hamming64BandsMeta(family: String,
                                        maxBucket: Int): IndexMeta =
    IndexMeta(family, "maxBucket" -> maxBucket)

  /** Persist a [[simHashBandIndex]] to the bucketed band store. */
  def simHashBandIndexWrite(corpus: DataFrame, idCol: String,
                            textCol: String, path: String,
                            maxBucket: Int = 5000, buckets: Int = 64): Unit =
    bandIndexStoreWrite(simHashBandIndex(corpus, idCol, textCol, maxBucket),
      path, hamming64BandsMeta("simhash_bands", maxBucket), buckets)

  /** [[incrementalSimHash]] against the PERSISTED store: batch
    * signatures computed once (pinned), the store read pruned to the
    * batch's band-key buckets by parquet partition filter.
    *
    * The internal signature pin outlives the call (it backs the
    * returned plan); batch/bench callers rely on the harness sweep to
    * free it. A caller inside a LONG-LIVED loop with no sweep — a
    * streaming sink's foreachBatch — must use the `Pinned` variant
    * and release the pin itself, or it leaks one pinned RDD per
    * batch for the session lifetime. */
  def incrementalSimHashFromStore(
      spark: org.apache.spark.sql.SparkSession, path: String,
      newDocs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucket: Int = 5000, buckets: Int = 64,
      excludeEpoch: Option[String] = None): DataFrame =
    incrementalSimHashFromStorePinned(spark, path, newDocs, idCol, textCol,
      maxHamming, maxBucket, buckets, excludeEpoch)._1

  /** [[incrementalSimHashFromStore]] with caller-managed release: the
    * second element frees the internal batch-signature checkpoint
    * (call it only after the pairs are consumed or themselves
    * pinned — the pin backs the returned plan). */
  private[graft] def incrementalSimHashFromStorePinned(
      spark: org.apache.spark.sql.SparkSession, path: String,
      newDocs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucket: Int = 5000, buckets: Int = 64,
      excludeEpoch: Option[String] = None,
      keepSelf: Boolean = false): (DataFrame, () => Unit) =
    incrementalHamming64FromStorePinned(spark, path,
      textSigs(newDocs, idCol, textCol), "simhash_bands", maxHamming,
      maxBucket, buckets, excludeEpoch, family = "simhash",
      keepSelf = keepSelf)

  /** Store-backed [[incrementalHamming64]] — the signature-level
    * engine under the SimHash and image-hash probes. Pin lifecycle:
    * see [[incrementalSimHashFromStore]]. */
  def incrementalHamming64FromStore(
      spark: org.apache.spark.sql.SparkSession, path: String,
      batchSigs: DataFrame, metaFamily: String, maxHamming: Int = 3,
      maxBucket: Int = 5000, buckets: Int = 64,
      excludeEpoch: Option[String] = None,
      family: String = "hamming64"): DataFrame =
    incrementalHamming64FromStorePinned(spark, path, batchSigs, metaFamily,
      maxHamming, maxBucket, buckets, excludeEpoch, family)._1

  private[graft] def incrementalHamming64FromStorePinned(
      spark: org.apache.spark.sql.SparkSession, path: String,
      batchSigs: DataFrame, metaFamily: String, maxHamming: Int = 3,
      maxBucket: Int = 5000, buckets: Int = 64,
      excludeEpoch: Option[String] = None,
      family: String = "hamming64",
      keepSelf: Boolean = false): (DataFrame, () => Unit) = {
    val sigs = Bridge.freshLeaf(batchSigs.localCheckpoint(true))
    val idx = bandIndexStoreProbeRead(spark, path,
      hamming64BandsMeta(metaFamily, maxBucket), band64(sigs, carry = Nil),
      excludeEpoch, buckets)
    (incrementalHamming64(sigs, idx, maxHamming, maxBucket, family,
      keepSelf),
      () => Bridge.unpersistCheckpoint(sigs))
  }

  // --------------------------------------------- persisted band stores
  /** Inner-partition bucket of a band key: every band-store row and
    * every probe derive it from the SAME expression, so the probe's
    * candidate-bucket set is a valid parquet partition filter by
    * construction. */
  private[graft] def bandBucket(buckets: Int): Column =
    pmod(xxhash64(col("band"), col("bh")), lit(buckets.toLong)).cast("int")

  /** The stored manifest carries the bucket count alongside the
    * caller's banding geometry — a probe at a different bucketing
    * refuses instead of silently scanning partitions that cannot
    * match its filter expression. */
  private[graft] def bandMetaWithBuckets(meta: IndexMeta,
                                         buckets: Int): IndexMeta =
    IndexMeta(meta.family, meta.params + ("bb_buckets" -> buckets.toString))

  /** Persisted, epoch-structured store for the banding families'
    * indexes ([[minHashBandIndex]], [[simHashBandIndex]],
    * [[srpBandIndex]], [[hamming64BandIndex]]): band-key rows are
    * DISJOINT across append-only batches, so the epoch fold is
    * identity — compaction's value here is file count and partition-
    * listing latency, not row reduction (an identity fold can never
    * corrupt, so no family gate is needed on compact). The caller
    * supplies the family manifest with the banding geometry
    * (`IndexMeta("minhash_bands", "numHashes" -> 64, "bands" -> 16,
    * "shingleK" -> 3, "maxBucket" -> 200)`, …): reads and appends
    * check it, so a probe banded differently refuses loudly instead
    * of silently missing candidates — the persisted-level enforcement
    * of the byte-identical-band-keys contracts (q93/q97/q98).
    *
    * Layout (round 16 — the cert-store discipline applied here): rows
    * are inner-partitioned by `bb = pmod(xxhash64(band, bh), buckets)`
    * so a batch probe reads ONLY its own band keys' buckets as a
    * parquet partition filter ([[bandIndexStoreProbeRead]]) — at
    * 100 TB the probe's scan cost is ∝ the batch's bucket set, not
    * the corpus index. FORMAT BREAK vs rounds ≤ 15: the old flat
    * layout (no `bb`, no `bb_buckets` manifest key) is refused by the
    * manifest check with no migration path — rebuild the store with
    * [[bandIndexStoreWrite]]; nothing long-lived used the old layout. */
  /** One exchange on the bucket key before the partitioned write:
    * without it every input task writes a file into every bucket
    * directory (tasks × buckets small files — listing and probe-read
    * poison at scale); with it each bucket is one task's output, and
    * the within-partition (band, bh) sort gives the probe's equi-join
    * key row-group min/max pruning inside each bucket file — the
    * certTextParts postings discipline. */
  private def bandBucketed(index: DataFrame, buckets: Int): DataFrame =
    index.withColumn("bb", bandBucket(buckets))
      .repartition(col("bb"))
      .sortWithinPartitions(col("bb"), col("band"), col("bh"))

  def bandIndexStoreWrite(index: DataFrame, path: String,
                          meta: IndexMeta, buckets: Int = 64): Unit = {
    EpochIndex.bootstrap(bandBucketed(index, buckets),
      path, innerPartCols = Seq("bb"))
    IndexMeta.write(index.sparkSession, path,
      bandMetaWithBuckets(meta, buckets))
  }

  def bandIndexStoreRead(spark: org.apache.spark.sql.SparkSession,
                         path: String, meta: IndexMeta,
                         excludeEpoch: Option[String] = None,
                         buckets: Int = 64): DataFrame = {
    IndexMeta.check(spark, path, bandMetaWithBuckets(meta, buckets))
    EpochIndex.read(spark, path, excludeEpoch,
      innerPartCols = Seq("bb"),
      bootstrapName = "bandIndexStoreWrite")
      .drop(EpochIndex.EpochCol).drop("bb")
  }

  /** Partition-pruned probe read: only the buckets the batch's own
    * band keys hash into are scanned — `batchBands` carries (band,
    * bh) rows (any extra columns ignored), the distinct bucket set is
    * bounded by `buckets` (driver-read under that bound), and the
    * returned frame is exactly [[bandIndexStoreRead]] restricted to
    * those buckets — which, joined on the full band key, loses no
    * candidate because every index row a batch key can match carries
    * the batch key's own bucket. */
  def bandIndexStoreProbeRead(spark: org.apache.spark.sql.SparkSession,
                              path: String, meta: IndexMeta,
                              batchBands: DataFrame,
                              excludeEpoch: Option[String] = None,
                              buckets: Int = 64): DataFrame = {
    IndexMeta.check(spark, path, bandMetaWithBuckets(meta, buckets))
    val bbs = BoundedRead.boundedDriverRead(
      batchBands.select(bandBucket(buckets).as("bb")).distinct(),
      buckets, "bandIndexStoreProbeRead buckets",
      s"distinct pmod values are bounded by buckets = $buckets")
      .map(_.getInt(0))
    // observed = false: the probe's whole value is the bucket-pruned
    // scan, and a CollectMetrics barrier above the store read would
    // block the bb filter from reaching partition pruning (the
    // ivfIndexRead precedent — see EpochIndex.read's scaladoc)
    EpochIndex.read(spark, path, excludeEpoch,
      innerPartCols = Seq("bb"),
      bootstrapName = "bandIndexStoreWrite", observed = false)
      .filter(col("bb").isin(bbs: _*))
      .drop(EpochIndex.EpochCol).drop("bb")
  }

  def bandIndexStoreAppend(spark: org.apache.spark.sql.SparkSession,
                           path: String, partial: DataFrame, epoch: String,
                           meta: IndexMeta, buckets: Int = 64): Unit = {
    IndexMeta.check(spark, path, bandMetaWithBuckets(meta, buckets))
    EpochIndex.append(bandBucketed(partial, buckets),
      path, epoch, innerPartCols = Seq("bb"))
  }

  def bandIndexStoreCompact(spark: org.apache.spark.sql.SparkSession,
                            path: String,
                            keepVersions: Int = 2): EpochIndex.CompactionStats =
    EpochIndex.compact(spark, path, identity,
      innerPartCols = Seq("bb"), keepVersions = keepVersions)

  /** Erase documents from a band-index store — disk-level (the q237
    * discipline extended to the legacy band families): band rows are
    * per-document, so the erased store is exactly the retained
    * documents' index, and after the rewrite no retained version,
    * epoch directory or marker holds an erased id (q238 pins
    * post-erase probe ≡ never-ingested against a from-scratch index
    * over the retained corpus). Total erasure tears the store down
    * ([[EpochIndex.eraseRewrite]]'s empty-keep path).
    *
    * @param ids one-column frame of victim ids (any column name) */
  def bandIndexStoreErase(spark: org.apache.spark.sql.SparkSession,
                          path: String, ids: DataFrame, meta: IndexMeta,
                          buckets: Int = 64): EpochIndex.CompactionStats = {
    IndexMeta.check(spark, path, bandMetaWithBuckets(meta, buckets))
    val victims = ids.select(col(ids.columns.head).as("_vid")).distinct()
    EpochIndex.eraseRewrite(spark, path,
      p => p.join(victims.select(col("_vid").as("id")), Seq("id"),
        "left_anti"),
      innerPartCols = Seq("bb"))
  }

  /** [[bandIndexStoreErase]] under the MinHash family manifest. */
  def minHashBandIndexErase(spark: org.apache.spark.sql.SparkSession,
                            path: String, ids: DataFrame,
                            numHashes: Int = 64, bands: Int = 16,
                            shingleK: Int = 3, maxBucket: Int = 200,
                            blockCol: Option[String] = None,
                            buckets: Int = 64): EpochIndex.CompactionStats =
    bandIndexStoreErase(spark, path, ids,
      minHashBandsMeta(numHashes, bands, shingleK, maxBucket, blockCol),
      buckets)

  /** [[bandIndexStoreErase]] under the SimHash family manifest. */
  def simHashBandIndexErase(spark: org.apache.spark.sql.SparkSession,
                            path: String, ids: DataFrame,
                            maxBucket: Int = 5000,
                            buckets: Int = 64): EpochIndex.CompactionStats =
    bandIndexStoreErase(spark, path, ids,
      hamming64BandsMeta("simhash_bands", maxBucket), buckets)

  /** [[bandIndexStoreErase]] under the SRP family manifest. */
  def srpBandIndexErase(spark: org.apache.spark.sql.SparkSession,
                        path: String, ids: DataFrame,
                        maxBucket: Int = 5000,
                        buckets: Int = 64): EpochIndex.CompactionStats =
    bandIndexStoreErase(spark, path, ids,
      hamming64BandsMeta("srp_bands", maxBucket), buckets)

  /** 4×16-bit banding of a materialized 64-bit `sig` column — the ONE
    * implementation behind SimHash and SRP banding, so the
    * index-build/probe/full-run byte-identical-band-keys contracts
    * (q97, q98) hold by construction instead of by parallel edits.
    * Output: (id, sig, carry…, band, bh). */
  private def band64(sigs: DataFrame, carry: Seq[String]): DataFrame = {
    val bandStructs = (0 until 4).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("sig"), 16 * b).bitwiseAND(lit(0xFFFFL)).as("bh"))
    }
    val keep = col("id") +: col("sig") +: carry.map(col)
    sigs
      .select(keep :+ explode(array(bandStructs: _*)).as("bk"): _*)
      .select(keep :+ col("bk.band") :+ col("bk.bh"): _*)
  }

  /** Shared SimHash signature front end: codegen'd signature computed
    * at full width (exchange below the projection, [[Par.widen]] —
    * scale-adaptive no-op on a wide scan), in the (id, sig) shape the
    * signature-level Hamming engine consumes. */
  private def textSigs(df: DataFrame, idCol: String,
                       textCol: String): DataFrame =
    Par.widen(df, col(idCol))
      .select(col(idCol).as("id"), simHash(col(textCol)).as("sig"))

  /** Connected components over a near-duplicate pair list: the final
    * dedup stage that turns pairwise matches into clusters with one
    * representative (the minimum id) per cluster.
    *
    * Contraction algorithm: each round every vertex of the CURRENT
    * graph computes L(v) = min(v, min over neighbors), the vertex→
    * cluster mapping is composed through L, and the edge list is
    * contracted to (L(s), L(d)) with self-loops dropped — so round
    * r+1 runs on the CONTRACTED graph, not the original one. On
    * near-dup graphs (dense cliques, the shape LSH emits) round one
    * collapses each clique to its minimum and the surviving edge set
    * is orders of magnitude smaller; plain min-label propagation —
    * the previous implementation — re-joined the FULL edge list every
    * round. A component always contracts to its minimum vertex
    * (L(min) = min is a fixed point, and contraction preserves
    * connectedness), so labels are exact min-ids, not approximations.
    *
    * One driver action per round (the emptiness probe) materializes
    * that round's L and contracted edges; the vertex→cluster mapping
    * is NOT materialized per round — it is composed as a lazy join
    * chain over the (cached) per-round L tables and executes ONCE, at
    * the final eager checkpoint after convergence. Checkpointing the
    * mapping each round would re-execute the whole chain from scratch
    * every time (the lazy checkpoint is only cached by an action,
    * which never came) — O(rounds²) join executions; measured as a
    * multi-minute stall on a 40-round chain graph. The final
    * materialization also lets the operator FREE every per-round
    * checkpoint before returning: only the returned mapping's blocks
    * outlive the call (callers running many CC invocations in one
    * session previously accumulated O(rounds) pinned block-manager
    * entries per call).
    *
    * @return (id, cluster_id) for every vertex that appears in a pair
    */
  /** Canonical-copy selection per near-dup cluster — the keep policy
    * that follows clustering: real pipelines keep the BEST member of
    * each duplicate cluster (longest, highest-quality), not the
    * arbitrary first. `clusters` is [[connectedComponents]] output
    * (id, cluster_id); `scored` carries (idCol, scoreCol). The winner
    * is max score with ties to the SMALLER id, computed as one MAX
    * aggregate over (score, −id) structs — partial-aggregated and
    * skew-safe, never a per-cluster window sort (a viral duplicate
    * cluster holds millions of members at corpus scale). Ids must be
    * non-negative (the −id tiebreak trick; a loud require, not a
    * silent wrong winner).
    *
    * @return (cluster_id, keep_id, keep_score, n_members, n_dropped)
    */
  def selectRepresentatives(clusters: DataFrame, scored: DataFrame,
                            idCol: String, scoreCol: String): DataFrame = {
    val j = clusters.select(col("id"), col("cluster_id"))
      .join(scored.select(col(idCol).cast("long").as("id"),
        col(scoreCol).as("_score")), Seq("id"))
      .withColumn("_nid",
        when(col("id") < 0, raise_error(lit(
          "selectRepresentatives requires non-negative ids")))
          .otherwise(-col("id")))
    j.groupBy(col("cluster_id"))
      .agg(max(struct(col("_score").as("s"), col("_nid").as("ni"))).as("_best"),
        count(lit(1)).as("n_members"))
      .select(col("cluster_id"),
        (-col("_best.ni")).as("keep_id"),
        col("_best.s").as("keep_score"),
        col("n_members"),
        (col("n_members") - 1).as("n_dropped"))
  }

  def connectedComponents(pairs: DataFrame, idA: String = "id_a",
                          idB: String = "id_b", maxIter: Int = 30): DataFrame = {
    // every per-round checkpoint goes through Bridge.freshLeaf: a bare
    // localCheckpoint leaf inherits the origin plan's size stats, which
    // compound exponentially across contraction rounds (see freshLeaf).
    // Every checkpoint is HELD and freed before return: the final
    // mapping materializes eagerly below, after which the per-round
    // L/edge blocks are dead — leaving them pinned leaked O(rounds)
    // block-manager entries per call for the session lifetime
    // (round 8's bench inflation mechanism).
    val held = scala.collection.mutable.ListBuffer.empty[DataFrame]
    def cp(df: DataFrame, eager: Boolean): DataFrame = {
      val ck = df.localCheckpoint(eager)
      held += ck
      Bridge.freshLeaf(ck)
    }
    var edges = cp(pairs.select(col(idA).as("s"), col(idB).as("d"))
      .unionByName(pairs.select(col(idB).as("s"), col(idA).as("d")))
      .distinct(), eager = true)
    var mapping = cp(edges.select(col("s").as("id"))
      .distinct()
      .withColumn("label", col("id")), eager = true)
    var done = edges.isEmpty
    var i = 0
    while (!done && i < maxIter) {
      // L(v) = min(v, min over neighbors). Every current-graph vertex
      // appears on the s side (edges are stored in both directions),
      // so l covers the whole contracted vertex set.
      val l = cp(edges.groupBy("s")
        .agg(least(col("s"), min(col("d"))).as("l")), eager = false)
      // compose the original-id mapping through this round's L (lazy —
      // l is cached below, so the chain executes once, at the end);
      // left join: vertices whose component already fully contracted
      // (label no longer in the current graph) keep their label
      mapping = mapping.as("m")
        .join(l.select(col("s").as("v"), col("l")), col("m.label") === col("v"), "left")
        .select(col("id"), coalesce(col("l"), col("label")).as("label"))
      // long-chain guard: an unboundedly deep lazy join plan blows up
      // Catalyst's BigInteger size estimates (sizes multiply per join
      // level). Dedup graphs converge in 2-4 rounds and never hit
      // this; pathological chain graphs get an eager truncation — one
      // O(vertices) job — every 8 rounds.
      if ((i + 1) % 8 == 0) mapping = cp(mapping, eager = true)
      // contract: edges between vertices that chose different labels
      // survive (in both directions — symmetric by construction of
      // the input), intra-cluster edges become self-loops and drop.
      // No per-round distinct: duplicate contracted edges collapse in
      // the NEXT round's map-side partial agg (groupBy s) at zero
      // extra shuffles, each original edge contributes at most one
      // row per round (so rows stay bounded by the symmetrized |E|),
      // and l-joins cannot fan out (l is unique per vertex) — the
      // distinct bought earlier shrinkage for a full extra exchange
      // per round, the wrong trade at any scale
      edges = cp(edges
        .join(l.select(col("s"), col("l").as("ls")), Seq("s"))
        .join(l.select(col("s").as("d"), col("l").as("ld")), Seq("d"))
        .filter(col("ls") =!= col("ld"))
        .select(col("ls").as("s"), col("ld").as("d")), eager = false)
      done = edges.isEmpty // the round's single driver action
      i += 1
    }
    // returning silently-unconverged labels would hand the caller
    // SPLIT clusters (several cluster_ids inside one real duplicate
    // group) with nothing flagging it — fail loudly instead
    if (!done) throw new IllegalStateException(
      s"connectedComponents did not converge within $maxIter rounds — " +
        "the graph has components whose contraction needs more rounds " +
        "(long near-dup chains); raise maxIter")
    // materialize the composed mapping ONCE (the same single execution
    // the caller's first action used to pay), then release every
    // per-round checkpoint — the result is self-contained, so the
    // only blocks that outlive the call are the returned mapping's
    val out = mapping.select(col("id"), col("label").as("cluster_id"))
      .localCheckpoint(true)
    held.foreach(Bridge.unpersistCheckpoint(_))
    Bridge.freshLeaf(out)
  }

  /** Exact INCREMENTAL connected components: fold a batch of new
    * match pairs into yesterday's labeling without re-clustering
    * history — the general graph-level answer to "today's near-dup
    * pairs arrived; update the clusters" (q174's block-scoped ER is
    * the blocked special case; this one needs no blocking column).
    *
    * Correctness rests on component contraction: replace each pair
    * endpoint by its stored label (itself for unseen vertices) and
    * the stored components become SUPER-VERTICES of a graph whose
    * size is O(batch). Running [[connectedComponents]] on that mini
    * graph and composing labels through it yields EXACTLY the full
    * rebuild's labeling: any path through old+new edges collapses to
    * a path over super-vertices, and because stored labels are the
    * min ids of their components, the merged label
    * min(labels, unseen ids) IS the global min id. Pairs wholly
    * inside one existing component drop before the mini CC (both
    * endpoints share a label — nothing to merge).
    *
    * Scale shape: two broadcast-or-shuffle equi joins to map
    * endpoints, one [[connectedComponents]] bounded by the BATCH's
    * structure (never the corpus's), and one label-composition join
    * over the stored labeling — the only corpus-sized operation, and
    * it is a co-partitioned equi join, not an iteration. A year of
    * daily batches pays a year of O(batch) minis, never a second
    * full-history contraction.
    *
    * @param storedLabels [[connectedComponents]] output over all
    *                     previous pairs: (id, cluster_id), min-id
    *                     labels — the labeling this call updates
    * @param pairs        today's (idA, idB) match pairs
    * @return the updated complete labeling (id, cluster_id) over
    *         stored ∪ batch vertices */
  def incrementalComponents(storedLabels: DataFrame, pairs: DataFrame,
                            idA: String = "id_a",
                            idB: String = "id_b"): DataFrame = {
    val lab = storedLabels.select(col("id"), col("cluster_id"))
    val mapped = pairs
      .join(lab.select(col("id").as(idA), col("cluster_id").as("_la")),
        Seq(idA), "left")
      .join(lab.select(col("id").as(idB), col("cluster_id").as("_lb")),
        Seq(idB), "left")
      .select(coalesce(col("_la"), col(idA)).as("id_a"),
        coalesce(col("_lb"), col(idB)).as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
    val mini = connectedComponents(mapped)
      .select(col("id").as("_sv"), col("cluster_id").as("_nl"))
    val updatedStored = lab
      .join(mini, lab("cluster_id") === col("_sv"), "left")
      .select(col("id"), coalesce(col("_nl"), col("cluster_id")).as("cluster_id"))
    // vertices the batch introduced: they participated in the mini
    // graph as themselves (or, pair-partnered into an existing
    // component, took its merged label); isolated-by-filter ones
    // keep their own id
    val newIds = pairs.select(col(idA).as("id"))
      .unionByName(pairs.select(col(idB).as("id")))
      .distinct()
      .join(lab.select(col("id")), Seq("id"), "left_anti")
    val newLabels = newIds
      .join(mini, newIds("id") === col("_sv"), "left")
      .select(col("id"), coalesce(col("_nl"), col("id")).as("cluster_id"))
    updatedStored.unionByName(newLabels)
  }

  /** Embedding-cosine near-duplicate pairs: all pairs within a
    * blocking key whose cosine similarity clears `threshold`.
    * Brute force within blocks — the exact verifier; at corpus scale
    * run it on LSH/IVF candidate cells instead of raw blocks. The
    * repartition is the same co-partition + materialization barrier
    * as the other pair generators. */
  def embeddingNearDup(df: DataFrame, idCol: String, vecCol: String,
                       blockCol: String, threshold: Double,
                       roundTo: Int = 4): DataFrame = {
    val v = df.select(col(blockCol).as("block"), col(idCol).as("id"),
      col(vecCol).as("vec")).repartition(col("block"))
    val a = v.select(col("block"), col("id").as("id_a"), col("vec").as("vec_a"))
    val b = v.select(col("block"), col("id").as("id_b"), col("vec").as("vec_b"))
    a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(Sim.cosine(col("vec_a"), col("vec_b")), roundTo).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the corpus by nearest centroid
    * ([[graft.operators.Similarity.assignCells]] — the IVF coarse
    * quantizer, so a pipeline that already built an IVF index reuses
    * its cells for free), then inside each cluster greedily drop
    * every vector that has an EARLIER-id clustermate with cosine
    * ≥ `tau` — the same deterministic keep-earliest rule the text
    * near-dup stages use (no rand(), replayable).
    *
    * Scale shape: pair scoring is block-local brute force, but the
    * blocks are the IVF cells — |cell| ≈ corpus/nCells by
    * construction, so cost is Σ|cell|² ≈ n²/nCells, and a denser
    * centroid set buys the quadratic down linearly. Degenerate cells
    * (mass collapse onto one centroid) hit the same observed skew
    * guard as the banded LSH families: cells over `maxCell` rows are
    * excluded from pair scoring — their rows all SURVIVE, never a
    * silent drop — and the count lands in [[droppedBuckets]].
    *
    * @return one row per surviving vector: (idCol, cell)
    */
  def semanticDedup(df: DataFrame, centroids: DataFrame, idCol: String,
                    vecCol: String, tau: Double, roundTo: Int = 4,
                    maxCell: Int = 100000): DataFrame =
    // the assignment feeds three lineages below (size aggregate, pair
    // scoring, final anti join) — checkpoint it so the corpus-×-
    // centroids pass runs ONCE, not three times (eager, so the job
    // runs at construction; the connectedComponents/q99 pattern)
    semanticDedupAssigned(
      Bridge.freshLeaf(
        Sim.assignCells(df, centroids, idCol, vecCol).localCheckpoint(true)),
      idCol, vecCol, tau, roundTo, maxCell)

  /** [[semanticDedup]] over PRE-ASSIGNED cells — the 100 TB entry
    * point: a corpus with a stored IVF index
    * ([[graft.operators.Similarity.ivfIndexRead]]) already holds
    * (id, vec, cell) assignments on disk; pass them here and the
    * corpus is never re-assigned at all. `cells` must carry `idCol`,
    * `vecCol` and a `cell` column. */
  def semanticDedupAssigned(cells: DataFrame, idCol: String,
                            vecCol: String, tau: Double, roundTo: Int = 4,
                            maxCell: Int = 100000): DataFrame = {
    // cell-size skew guard: |sizes| = |centroids| (small), broadcast
    // back onto the rows so every lineage below carries its cell's
    // size. The drop counter must ride the FINAL output lineage, not
    // the guard's filter branch: when every cell is oversized the
    // scoring branch collapses to empty and AQE's empty-relation
    // propagation discards any metric observed there (the exact loss
    // mode Bridge.observedMetrics documents). Oversized cells keep
    // all their rows, so counting their distinct cells among the
    // SURVIVORS — a subtree that always executes — is exact.
    val sized = broadcast(cells.groupBy(col("cell")).agg(count(lit(1)).as("_n")))
    val flagged = cells.join(sized, Seq("cell"))
    val drops = embeddingNearDup(flagged.filter(col("_n") <= maxCell),
      idCol, vecCol, "cell", tau, roundTo)
      .select(col("id_b").as(idCol)).distinct()
    flagged.join(drops, Seq(idCol), "left_anti")
      .observe(s"semdedup_dropped_buckets_${metricSeq.incrementAndGet()}",
        size(collect_set(when(col("_n") > maxCell, col("cell"))))
          .cast("long").as("dropped_buckets"))
      .select(col(idCol), col("cell"))
  }

  /** Certified-REPAIR semantic dedup: close the cross-cell recall gap
    * [[semanticDedup]] trades away, using the certification join's
    * own output. SemDeDup's keep rule is cell-LOCAL, so pairs whose
    * members landed in different IVF cells survive it — the exact
    * residual [[exactCosineJoin]] measures (the corpus-card
    * `sem_residual_cross` number). This operator CONSUMES that
    * certification: the residual edges over the survivors feed
    * [[connectedComponents]] (min-id labels, the q42 machinery), one
    * canonical member (the component min id — deterministic,
    * replayable) is kept per component, and the returned survivor set
    * provably contains NO pair ≥ `threshold` at all — re-certifying
    * it returns zero rows, cross-cell included.
    *
    * Scale shape: one exact cosine join over the (already-deduped)
    * survivors — banded, adaptively re-blocked, tripwired — plus a CC
    * whose graph is the RESIDUAL (near-empty when the cell blocking
    * was dense enough; the iteration is bounded by residual cluster
    * diameter, not corpus size), and one anti join back. The corpus
    * never shuffles beyond the certification join it was already
    * paying for the audit.
    *
    * @param survivors one row per surviving vector, carrying `idCol`
    *                  and `vecCol` (any other columns ride through)
    * @return `survivors` minus every non-canonical member of each
    *         residual component */
  def semanticRepair(survivors: DataFrame, idCol: String, vecCol: String,
                     threshold: Double, nPivots: Int = 4,
                     maxCell: Long = 100000L, roundTo: Int = 4): DataFrame = {
    val edges = exactCosineJoin(survivors, idCol, vecCol, threshold,
      nPivots, maxCell, roundTo).select(col("id_a"), col("id_b"))
    val drops = connectedComponents(edges)
      .filter(col("id") =!= col("cluster_id"))
      .select(col("id").as(idCol))
    survivors.join(drops, Seq(idCol), "left_anti")
  }

  /** The repair KEEP rule over a component labeling — the second half
    * of [[semanticRepair]], exposed for the INCREMENTAL loop: given
    * min-id labels over every certified pair so far
    * ([[connectedComponents]] at bootstrap,
    * [[incrementalComponents]] folded with each batch's
    * [[certVecIndexProbe]]/[[certTextIndexProbe]] cross pairs + self
    * join), the repaired survivor set is every ingested id whose
    * label is ITSELF — non-canonical members drop, ids that never
    * appeared in a pair are kept by construction (absent from the
    * labeling). Because the incremental labeling provably equals the
    * full rebuild's (the super-vertex contraction argument), the
    * survivor set of an ever-GROWING corpus stays equal to
    * [[semanticRepair]]-over-everything at batch cost — q234 pins the
    * equality against a full-rebuild oracle.
    *
    * Scale shape: one anti equi-join of the id set against the
    * labeling's non-canonical rows. */
  def repairSurvivors(ids: DataFrame, labels: DataFrame,
                      idCol: String): DataFrame =
    ids.join(labels.filter(col("id") =!= col("cluster_id"))
      .select(col("id").as(idCol)), Seq(idCol), "left_anti")

  /** Embedding near-duplicate pairs via SRP-LSH — the sub-quadratic
    * scale path embeddingNearDup's block-local brute force documents
    * as missing: 64-bit signed-random-projection signatures (codegen'd
    * SrpSignature, deterministic hyperplanes — no stored matrix),
    * Hamming-banded into 4×16-bit buckets exactly like simHashPairs,
    * then candidates are verified with EXACT cosine — the estimate
    * never decides, only blocks. Shuffle volume per doc is 4 rows of
    * (band key, id, vector); pair scoring touches only same-bucket
    * candidates. Recall: a pair survives iff its signatures agree on
    * one 16-bit band; for near-dups (angle → 0) band-agreement
    * probability approaches 1 (spec-bounded on planted duplicates).
    *
    * @return (id_a, id_b, cos) with id_a < id_b, cos >= threshold
    */
  def embeddingLshPairs(df: DataFrame, idCol: String, vecCol: String,
                        threshold: Double, maxBucket: Int = 5000,
                        roundTo: Int = 4): DataFrame = {
    val banded = srpBanded(df, idCol, vecCol)
    val buckets = guardBuckets(
      banded.groupBy("band", "bh")
        .agg(sort_array(collect_list(struct(col("id"), col("vec")))).as("xs")),
      "xs", maxBucket, "srp", dropSingletons = true)
      .select(col("xs"))
      .distinct()
    buckets
      .select(posexplode(col("xs")).as(Seq("i", "x")), col("xs"))
      .select(col("x.id").as("id_a"), col("x.vec").as("vec_a"),
        explode(slice(col("xs"), col("i") + lit(2), size(col("xs")))).as("y"))
      .select(col("id_a"), col("y.id").as("id_b"),
        round(Sim.cosine(col("vec_a"), col("y.vec")), roundTo).as("cos"))
      .filter(col("cos") >= threshold)
      .distinct()
  }

  /** Persisted SRP band index — the embedding-family twin of
    * [[simHashBandIndex]]: (band, bh, id, vec) per vector × 4 bands
    * of its 64-bit signed-random-projection signature, written once
    * at corpus build. Vectors ride in the index (what a real ANN
    * index stores) so the probe cosine-verifies without re-reading
    * the corpus table. */
  def srpBandIndex(df: DataFrame, idCol: String, vecCol: String,
                   maxBucket: Int = 5000): DataFrame = {
    val banded = srpBanded(df, idCol, vecCol)
    guardBuckets(
      banded.groupBy("band", "bh")
        .agg(collect_list(struct(col("id"), col("vec"))).as("xs")),
      "xs", maxBucket, "srp_index", dropSingletons = false)
      .select(col("band"), col("bh"), explode(col("xs")).as("x"))
      .select(col("band"), col("bh"), col("x.id").as("id"), col("x.vec").as("vec"))
  }

  /** Probe new vectors against a persisted [[srpBandIndex]]:
    * within-batch pairs plus batch×corpus pairs cosine-verified at
    * `threshold`, corpus vectors never re-read. Same contract as the
    * other two families (q98 pins the full-run equivalence). */
  def incrementalEmbeddingLsh(newDocs: DataFrame, idCol: String, vecCol: String,
                              bandIndex: DataFrame, threshold: Double,
                              maxBucket: Int = 5000,
                              roundTo: Int = 4): DataFrame = {
    val internal = embeddingLshPairs(newDocs, idCol, vecCol, threshold,
      maxBucket, roundTo).select("id_a", "id_b", "cos")
    internal.unionByName(
      srpCross(srpBanded(newDocs, idCol, vecCol), bandIndex, threshold,
        roundTo)).distinct()
  }

  /** The batch×corpus half of [[incrementalEmbeddingLsh]] — one
    * definition for the in-memory and store-backed probes. */
  private def srpCross(batchBanded: DataFrame, bandIndex: DataFrame,
                       threshold: Double, roundTo: Int,
                       keepSelf: Boolean = false): DataFrame =
    batchBanded
      .join(bandIndex
          .withColumnRenamed("id", "corpus_id")
          .withColumnRenamed("vec", "corpus_vec"),
        Seq("band", "bh"))
      .filter(if (keepSelf) lit(true) else col("id") =!= col("corpus_id"))
      .select(least(col("id"), col("corpus_id")).as("id_a"),
        greatest(col("id"), col("corpus_id")).as("id_b"),
        round(Sim.cosine(col("vec"), col("corpus_vec")), roundTo).as("cos"))
      .filter(col("cos") >= threshold)
      .distinct()

  /** Persist an [[srpBandIndex]] to the bucketed band store. */
  def srpBandIndexWrite(corpus: DataFrame, idCol: String, vecCol: String,
                        path: String, maxBucket: Int = 5000,
                        buckets: Int = 64): Unit =
    bandIndexStoreWrite(srpBandIndex(corpus, idCol, vecCol, maxBucket),
      path, hamming64BandsMeta("srp_bands", maxBucket), buckets)

  /** [[incrementalEmbeddingLsh]] against the PERSISTED store: batch
    * SRP banding computed once (pinned), store read pruned to the
    * batch's band-key buckets by parquet partition filter. */
  def incrementalEmbeddingLshFromStore(
      spark: org.apache.spark.sql.SparkSession, path: String,
      newDocs: DataFrame, idCol: String, vecCol: String,
      threshold: Double, maxBucket: Int = 5000, buckets: Int = 64,
      roundTo: Int = 4, excludeEpoch: Option[String] = None): DataFrame =
    incrementalEmbeddingLshFromStorePinned(spark, path, newDocs, idCol,
      vecCol, threshold, maxBucket, buckets, roundTo, excludeEpoch)._1

  /** [[incrementalEmbeddingLshFromStore]] with caller-managed release
    * of the internal SRP-banding checkpoint — for foreachBatch
    * callers with no harness sweep (see
    * [[incrementalSimHashFromStore]]'s pin-lifecycle note). */
  private[graft] def incrementalEmbeddingLshFromStorePinned(
      spark: org.apache.spark.sql.SparkSession, path: String,
      newDocs: DataFrame, idCol: String, vecCol: String,
      threshold: Double, maxBucket: Int = 5000, buckets: Int = 64,
      roundTo: Int = 4, excludeEpoch: Option[String] = None,
      keepSelf: Boolean = false): (DataFrame, () => Unit) = {
    val batchBanded = Bridge.freshLeaf(
      srpBanded(newDocs, idCol, vecCol).localCheckpoint(true))
    val idx = bandIndexStoreProbeRead(spark, path,
      hamming64BandsMeta("srp_bands", maxBucket), batchBanded,
      excludeEpoch, buckets)
    val internal = embeddingLshPairs(newDocs, idCol, vecCol, threshold,
      maxBucket, roundTo).select("id_a", "id_b", "cos")
    (internal.unionByName(srpCross(batchBanded, idx, threshold, roundTo,
        keepSelf))
      .distinct(),
      () => Bridge.unpersistCheckpoint(batchBanded))
  }

  /** Shared SRP banding front end ([[band64]] carrying the vector for
    * downstream cosine verification). */
  private def srpBanded(df: DataFrame, idCol: String,
                        vecCol: String): DataFrame =
    band64(Par.widen(df, col(idCol))
      .select(col(idCol).as("id"), col(vecCol).as("vec"),
        Sketches.srp_signature(col(vecCol)).as("sig")),
      carry = Seq("vec"))

  /** Exact n-gram Jaccard over an EXPLICIT candidate pair list — the
    * scale-safe verifier stage: candidates come from a sub-quadratic
    * generator (minHashLsh / simHashPairs), never from within-block
    * brute force. Each document's shingle set is hashed once into a
    * sorted long array; the two joins then ship 8-byte hash arrays to
    * the (sparse) candidate pairs, and scoring is a codegen'd linear
    * merge. Cost: O(docs) prep + O(candidates) scoring — the shape
    * that survives 100 TB, vs the O(Σ block²) of ngramJaccardPairs.
    *
    * @param candidates (id_a, id_b) pairs, id_a < id_b
    * @return (id_a, id_b, jaccard) filtered to jaccard >= threshold
    */
  def ngramJaccardVerify(df: DataFrame, candidates: DataFrame,
                         idCol: String, textCol: String,
                         k: Int = 1, threshold: Double = 0.5): DataFrame = {
    val shingleCol =
      if (k == 1) TextFunctions.tokens(col(textCol))
      else shingles(col(textCol), k)
    // same materialization barrier as the other generators: hash each
    // doc's shingle set once, not once per candidate pair it appears
    // in — the exchange is REUSED by both joins below, so it stays
    // (unlike the single-consumer sig front ends); widen below it so
    // the hashing itself runs at full width on a narrow scan
    val toks = Par.widen(df, col(idCol))
      .select(col(idCol).as("id"),
        Sketches.hashed_token_set(shingleCol).as("sh"))
      .repartition(col("id"))
    candidates.select("id_a", "id_b")
      .join(toks.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(toks.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        Sketches.jaccard_sorted_long(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** EXACT all-pairs similarity join via prefix filtering (the
    * AllPairs/PPJoin family, Bayardo et al., WWW 2007): every pair of
    * documents with token-set Jaccard ≥ `threshold` is returned —
    * zero false negatives, the guarantee [[minHashLsh]] trades away
    * for speed. This is the join a DEDUP CERTIFICATION pass runs
    * (prove the shipped corpus has no surviving pair above t);
    * banded LSH remains the right candidate generator when a
    * bounded miss rate is acceptable.
    *
    * Candidate generation: tokens get a GLOBAL order (document
    * frequency ASC, token — rarest first); a doc whose distinct-token
    * set has size n indexes only its first n − ⌈t·n⌉ + 1 tokens in
    * that order (its PREFIX). The prefix-filter lemma: two sets with
    * Jaccard ≥ t must share at least one token inside both prefixes,
    * so the equi-join on prefix tokens loses nothing. The PPJoin
    * length filter (t·|A| ≤ |B| ≤ |A|/t) rides the join; exact
    * verification is the codegen'd sorted-hash merge
    * ([[ngramJaccardVerify]]'s scorer). The ⌈·⌉ computes with a 1e-9
    * slack so binary rounding of t·n can only LENGTHEN a prefix
    * (more candidates — safe), never shorten it (false negatives).
    *
    * Scale shape: prefixes hold the RAREST tokens, so candidate
    * buckets are small by construction on natural text — that
    * df-ascending order is the entire trick; cost is
    * O(Σ prefix-bucket²), not O(docs²). A pathological token (a
    * boilerplate string shared corpus-wide that survives into
    * prefixes) still explodes a bucket, so `maxBucket` arms an
    * in-plan tripwire (raise_error naming the token, the
    * sequenceByKey discipline) — it FAILS rather than silently
    * dropping candidates, because dropping would break the exactness
    * contract this operator exists to provide.
    *
    * Degenerate docs: documents with ZERO tokens certify nothing and
    * are excluded at EVERY shingle granularity — one convention for
    * all k, so certification counts never shift with `shingleK` on
    * empty/whitespace docs (at k ≥ 2 the short-doc fallback shingle
    * would otherwise pair two empty docs at jaccard 1.0 while k = 1
    * dropped them).
    *
    * @return (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥
    *         threshold (filtered unrounded, displayed at 4dp)
    */
  def exactJaccardJoin(df: DataFrame, idCol: String, textCol: String,
                       threshold: Double = 0.5, shingleK: Int = 3,
                       maxBucket: Int = 100000): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1]: $threshold")
    require(maxBucket >= 1, s"maxBucket must be >= 1: $maxBucket")
    import org.apache.spark.sql.expressions.Window
    // the shingle granularity is the selectivity dial: unigram sets
    // (k=1) treat every same-vocabulary template as a near-dup;
    // k-shingles demand shared WORD ORDER (the q20/q21 convention)
    val shingleCol =
      if (shingleK == 1) array_distinct(TextFunctions.tokens(col(textCol)))
      else shingles(col(textCol), shingleK)
    val sets = Par.widen(df, col(idCol))
      .filter(size(TextFunctions.tokens(col(textCol))) > 0)
      .select(col(idCol).as("id"), shingleCol.as("_s"))
      .filter(size(col("_s")) > 0)
      .repartition(col("id"))
    val toks = sets.select(col("id"), size(col("_s")).cast("long").as("_n"),
      explode(col("_s")).as("_t"))
    val dfreq = toks.groupBy(col("_t")).agg(count(lit(1)).as("_df"))
    def neededOverlap(n: Column) =
      ceil(n.cast("double") * lit(threshold) - lit(1e-9))
    val wDoc = Window.partitionBy(col("id")).orderBy(col("_df"), col("_t"))
    val prefix = toks.join(dfreq, Seq("_t"))
      .withColumn("_pos", row_number().over(wDoc))
      .filter(col("_pos") <= col("_n") - neededOverlap(col("_n")) + 1)
    // bucket tripwire: counted on the (small) prefix table, evaluated
    // in-plan on the carried length column — zero extra actions
    val guarded = prefix
      .withColumn("_bkt", count(lit(1)).over(Window.partitionBy(col("_t"))))
      .withColumn("_gn",
        when(col("_bkt") > maxBucket, raise_error(concat(
          lit("exactJaccardJoin prefix bucket overflow: token '"),
          col("_t"),
          lit("' appears in "), col("_bkt").cast("string"),
          lit(s" prefixes (> $maxBucket) — quadratic candidate blow-up; " +
            "raise maxBucket only with the cost understood, or strip the " +
            "offending boilerplate token upstream"))).cast("long"))
          .otherwise(col("_n")))
    val ca = guarded.select(col("id").as("id_a"), col("_t"),
      col("_gn").as("_na"))
    val cb = guarded.select(col("id").as("id_b"), col("_t"),
      col("_gn").as("_nb"))
    val cand = ca.join(cb, Seq("_t"))
      .filter(col("id_a") < col("id_b"))
      .filter(col("_nb") >= neededOverlap(col("_na")) &&
        col("_na") >= neededOverlap(col("_nb")))
      .select("id_a", "id_b").distinct()
    ngramJaccardVerify(df, cand, idCol, textCol, k = shingleK,
      threshold = threshold)
      .select(col("id_a"), col("id_b"),
        round(col("jaccard"), 4).as("jaccard"))
  }

  /** EXACT all-pairs cosine join — [[exactJaccardJoin]]'s twin on the
    * EMBEDDING side: every pair of vectors with cosine ≥ `threshold`
    * is returned, zero false negatives. This is the join a SEMANTIC
    * dedup certification pass runs (prove the shipped corpus has no
    * surviving pair above τ — the guarantee [[semanticDedup]]'s
    * cell-blocked scoring and [[embeddingLshPairs]]'s SRP banding
    * trade away for speed; q200 measures their recall against
    * sampled queries, this operator CERTIFIES the whole corpus).
    *
    * Blocking is pivot-angle banding (the generalized-hyperplane /
    * pivot bound of the metric-space join literature — Jacox & Samet
    * TODS 2008, MRSimJoin ICDE 2012 — specialized to the sphere):
    * `nPivots` deterministic pivots come from the md5 rule
    * ([[graft.operators.Similarity.pickCentroids]] — blocking choice
    * never affects the RESULT, which is what the oracle replays);
    * every vector gets, per pivot, the band
    * ⌊angle(vec, pivot) / θ⌋ with θ = acos(threshold) + 1e-3. The
    * spherical triangle inequality |angle(x,p) − angle(y,p)| ≤
    * angle(x,y) ≤ acos(threshold) < θ means a qualifying pair's
    * bands differ by AT MOST 1 on every pivot — the 1e-3 widening
    * absorbs float noise in the band boundary, turning "≤" into "<"
    * (a wider band only ever ADDS candidates: safe). Each vector
    * replicates to {b, b+1} on the first two pivots (4×, fixed);
    * a qualifying pair then meets at EXACTLY the canonical cell
    * (max(b0ₐ,b0ᵦ), max(b1ₐ,b1ᵦ)) — one equi-join match per pair,
    * no post-hoc distinct. Remaining pivots prune as in-plan
    * |Δband| ≤ 1 integer checks before the exact cosine verify,
    * which alone decides membership (round to `roundTo` dp — the
    * q34 engine/oracle convention — then ≥ threshold).
    *
    * Pruning power is θ-bound: π/θ bands per pivot, so a τ = 0.9
    * certification (θ ≈ 0.45) blocks the sphere into ~7² cells per
    * key pair while τ ≤ 0.5 (θ > 1 rad) degrades toward all-pairs —
    * inherent to EXACT joins at wide angles, not a defect; the
    * certification thresholds that matter sit high. Cost is
    * O(Σ cell²), and a mass-collapsed cell (every vector at the same
    * angle to both blocking pivots — the concentration shape of very
    * high dimensions) is handled by ADAPTIVE RE-BLOCKING: pairs whose
    * canonical meet cell exceeds `maxCell` are re-joined one level
    * deeper, on pivots 2/3 as extra {b, b+1}-replicated key columns
    * (exactness preserved — more pivots only ever NARROW candidates,
    * and the deeper canonical cell is still a single meet). Only the
    * overflow cells' rows pay the extra 4× replication; healthy cells
    * never notice. A cell that STILL overflows at the deeper key
    * (mass-collapsed on all four pivots, or nPivots = 2 with no
    * spare pivots to split on) trips the in-plan `maxCell`
    * raise_error backstop (groupBy+join-back on the cell key, NOT a
    * window — the q205 hot-key lesson) rather than silently
    * degrading: failing is the final contract for a certification
    * op, but it now takes a collapse the re-blocking cannot spread.
    *
    * Degenerate vectors: zero-norm vectors have no defined angle and
    * certify nothing — excluded, the [[exactJaccardJoin]]
    * empty-doc convention.
    *
    * @return (id_a, id_b, cos) with id_a < id_b, round(cos, roundTo)
    *         ≥ threshold */
  def exactCosineJoin(df: DataFrame, idCol: String, vecCol: String,
                      threshold: Double, nPivots: Int = 4,
                      maxCell: Long = 100000L,
                      roundTo: Int = 4): DataFrame = {
    require(threshold > -1.0 && threshold < 1.0,
      s"threshold must be in (-1, 1): $threshold")
    require(nPivots >= 2 && nPivots <= 16,
      s"nPivots must be in [2, 16] (two block the join, the rest prefilter): $nPivots")
    // band width covers the ROUNDED contract, not just true cos ≥ τ:
    // the output filter admits any pair with round(cos, roundTo) ≥ τ,
    // i.e. true cos ≥ τ − 0.5·10^-roundTo — the bands must too, or
    // the borderline pairs the brute-force oracle returns would be
    // exactly the ones the blocking loses
    val theta = math.acos(math.max(-1.0,
      threshold - 0.5 * math.pow(10, -roundTo))) + 1e-3
    // bounded metadata read: the pivot VECTORS become plan literals,
    // so band assignment is pure codegen'd row math — the corpus
    // never shuffles (or broadcasts) for it
    // zero-norm rows are excluded from the pick as from banding below,
    // so the degrade message counts exactly the bandable population
    val pivots = BoundedRead.boundedDriverRead(
      Sim.pickCentroids(
        df.filter(Sim.cosine(col(vecCol), col(vecCol)) > 0.0),
        idCol, vecCol, nPivots).orderBy("cell"),
      nPivots, "exactCosineJoin pivots",
      s"pickCentroids emits at most nPivots = $nPivots rows")
      .map(_.getSeq[Float](1).toArray)
    // a corpus smaller than nPivots yields fewer pivots — degrade to
    // what exists (more pivots only ever NARROW candidates, so fewer
    // is still exact; < 2 cannot block the join at all)
    val nP = pivots.length
    require(nP >= 2,
      s"exactCosineJoin needs >= 2 pivot vectors to block the join; " +
        s"the corpus supplied only $nP nonzero-norm vectors — a corpus " +
        "this small certifies faster by brute force (crossJoin + filter)")
    def band(p: Array[Float]) =
      floor(acos(greatest(lit(-1.0), least(lit(1.0),
        Sim.cosine(col("_v"), typedLit(p))))) / lit(theta)).cast("int")
    val bandCols = pivots.zipWithIndex.map { case (p, i) => band(p).as(s"_b$i") }
    // widen the scan before the per-row band math: every self-join
    // branch below re-derives from this lineage, so a narrow scan
    // would run the acos banding serially once per branch
    val pts = Par.widen(df, col(idCol))
      .select(col(idCol).as("_id"), col(vecCol).as("_v"))
      // cosine(v, v) is 1 for any nonzero vector and 0 (the engine's
      // zero-denominator convention) for a zero-norm one — the
      // degenerate-vector exclusion as one codegen'd predicate
      .filter(Sim.cosine(col("_v"), col("_v")) > 0.0)
      .select(col("_id") +: col("_v") +: bandCols: _*)
    val rep = pts
      .withColumn("_k0", explode(array(col("_b0"), col("_b0") + 1)))
      .withColumn("_k1", explode(array(col("_b1"), col("_b1") + 1)))
    // cell counts via groupBy (map-side partials crush a hot cell; a
    // window could not), joined back on the key ints. Cell COUNT is
    // θ-bounded (≤ (π/θ + 2)²) — the count table broadcasts whatever
    // the corpus size.
    val sizes = broadcast(rep.groupBy(col("_k0"), col("_k1"))
      .agg(count(lit(1)).as("_cn")))
    val flagged = rep.join(sizes, Seq("_k0", "_k1"))
    // the canonical-meet self-join over one replicated key set: each
    // qualifying pair joins exactly once, at the cell where every key
    // column equals the pairwise band max. `canonical` holds the key
    // indices the join equates (and therefore implies |Δband| ≤ 1
    // for); every OTHER pivot prunes as an explicit |Δ| ≤ 1 check.
    def pairJoin(side: DataFrame, key: Seq[String],
                 canonical: Seq[Int]): DataFrame = {
      val checks = (2 until nP).filterNot(canonical.contains).map(i =>
        abs(col(s"_b$i") - col(s"_xb$i")) <= 1)
      val rightCols = key.map(col) ++ Seq(
        col("_id").as("_xid"), col("_v").as("_xv"),
        col("_g").as("_xg")) ++
        (0 until nP).map(i => col(s"_b$i").as(s"_xb$i"))
      side.join(side.select(rightCols: _*), key)
        .filter(col("_id") < col("_xid"))
        .filter(canonical.map(i =>
          col(s"_k$i") === greatest(col(s"_b$i"), col(s"_xb$i")))
          .foldLeft(lit(true))(_ && _))
        .filter(checks.foldLeft(lit(true))(_ && _))
        // the guard columns are load-bearing (always-true on healthy
        // cells): column pruning must not drop the raise_error branch
        .filter(col("_g") > 0L && col("_xg") > 0L)
        .select(col("_id").as("id_a"), col("_xid").as("id_b"),
          round(Sim.cosine(col("_v"), col("_xv")), roundTo).as("cos"))
        .filter(col("cos") >= threshold)
    }
    def overflowError(key: Seq[String], what: String) = {
      val cell = key.flatMap(k => Seq(col(k).cast("string"), lit(","))).init
      raise_error(concat(
        (Seq(lit(s"exactCosineJoin cell overflow: ${what}band cell (")) ++
          cell ++ Seq(lit(") holds "), col("_cn").cast("string"),
          lit(s" replicas (> $maxCell) — quadratic pair blow-up; raise " +
            "maxCell only with the O(cell²) cost understood, or certify " +
            "at a tighter threshold (more, narrower bands)"))): _*))
    }
    // pivots 2/3 (those that exist) are the re-blocking reserve
    val deepPivots = Seq(2, 3).filter(_ < nP)
    if (deepPivots.isEmpty) {
      // nPivots = 2: nothing to split on — the tripwire is the guard
      val guarded = flagged
        .withColumn("_g", when(col("_cn") > maxCell,
          overflowError(Seq("_k0", "_k1"), "nPivots=2 ").cast("long"))
          .otherwise(col("_cn")))
        .drop("_cn")
      pairJoin(guarded, Seq("_k0", "_k1"), canonical = Seq(0, 1))
    } else {
      // pass A: pairs whose canonical meet cell is healthy — both
      // members' replicas in an overflow cell route to pass B, so the
      // split is BY PAIR (each pair has exactly one meet cell) and
      // the union below is disjoint by construction
      val healthy = flagged.filter(col("_cn") <= maxCell)
        .withColumn("_g", col("_cn")).drop("_cn")
      val passA = pairJoin(healthy, Seq("_k0", "_k1"),
        canonical = Seq(0, 1))
      // pass B: overflow cells re-block one level deeper — the same
      // {b, b+1} replication on the reserve pivots, the same
      // canonical-max single meet, now on 3-4 key ints
      val ovRep = deepPivots.foldLeft(
        flagged.filter(col("_cn") > maxCell).drop("_cn")) {
        case (d, i) => d.withColumn(s"_k$i",
          explode(array(col(s"_b$i"), col(s"_b$i") + 1)))
      }
      val deepKey = Seq("_k0", "_k1") ++ deepPivots.map(i => s"_k$i")
      val deepSizes = broadcast(ovRep.groupBy(deepKey.map(col): _*)
        .agg(count(lit(1)).as("_cn")))
      val ovGuarded = ovRep.join(deepSizes, deepKey)
        .withColumn("_g", when(col("_cn") > maxCell,
          overflowError(deepKey, "re-blocked ").cast("long"))
          .otherwise(col("_cn")))
        .drop("_cn")
      val passB = pairJoin(ovGuarded, deepKey,
        canonical = Seq(0, 1) ++ deepPivots)
      passA.unionByName(passB)
    }
  }

  /** Batch-vs-corpus EXACT Jaccard join — the INCREMENTAL form of
    * [[exactJaccardJoin]]: every (corpus doc, batch doc) pair with
    * token-set Jaccard ≥ `threshold`, zero false negatives. This is
    * how certification stays affordable on a growing corpus: the
    * corpus×corpus pass ([[exactJaccardJoin]]) runs once, then every
    * arriving batch certifies R×S against the corpus — cost scales
    * with the BATCH, not with corpus², and a clean result plus the
    * batch's own self-join certifies the merged corpus by induction.
    *
    * Same prefix-filter machinery (Bayardo et al., WWW 2007): one
    * global token order (document frequency ASC over corpus ∪ batch —
    * the order only shapes bucket sizes, never the result), prefixes
    * of length n − ⌈t·n⌉ + 1 on BOTH sides, candidates from the
    * prefix-token equi-join, PPJoin length filter both ways, exact
    * codegen'd sorted-hash verify. The corpus-side prefix buckets
    * carry the `maxBucket` raise_error tripwire (groupBy+join-back on
    * the token — the q205 hot-key shape, NOT a window: the corpus
    * prefix table is corpus-scale). Degenerate (zero-token) docs are
    * excluded on both sides at every `shingleK`, the
    * [[exactJaccardJoin]] convention.
    *
    * PRODUCTION STEERING: this one-shot form re-reads, re-tokenizes
    * and re-df-counts the CORPUS on every call — right for an
    * acceptance query or a once-ever audit where the corpus frame is
    * already in hand (q230's induction proof is exactly that shape),
    * wrong for a recurring ingest loop. The production path is the
    * persisted store: [[certTextIndexWrite]] fingerprints the corpus
    * ONCE, [[certTextIndexProbe]] answers every later batch from
    * `(id, n, hset)` + postings rows without touching corpus text,
    * and [[certTextIndexAppend]] folds the batch in — O(batch) text
    * work per batch, the contract this per-call re-scan cannot make.
    *
    * @return (id_corpus, id_batch, jaccard), jaccard ≥ threshold
    *         (filtered unrounded, displayed at 4dp); a doc present on
    *         both sides pairs with itself at 1.0 — that IS the
    *         re-ingestion signal a certification exists to raise */
  def exactJaccardJoinAgainst(corpus: DataFrame, batch: DataFrame,
                              idCol: String, textCol: String,
                              threshold: Double, shingleK: Int = 1,
                              maxBucket: Int = 100000): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1]: $threshold")
    require(shingleK >= 1, s"shingleK must be >= 1: $shingleK")
    def sets(df: DataFrame) = {
      val shingleCol =
        if (shingleK == 1) array_distinct(TextFunctions.tokens(col(textCol)))
        else shingles(col(textCol), shingleK)
      Par.widen(df, col(idCol))
        .filter(size(TextFunctions.tokens(col(textCol))) > 0)
        .select(col(idCol).as("id"), shingleCol.as("_s"))
        .filter(size(col("_s")) > 0)
        .repartition(col("id"))
    }
    def toks(s: DataFrame) = s.select(col("id"),
      size(col("_s")).cast("long").as("_n"), explode(col("_s")).as("_t"))
    val cSets = sets(corpus); val bSets = sets(batch)
    val cToks = toks(cSets); val bToks = toks(bSets)
    // ONE global order for both sides' prefixes (the lemma needs a
    // consistent total order, nothing more)
    val dfreq = cToks.unionByName(bToks)
      .groupBy(col("_t")).agg(count(lit(1)).as("_df"))
    def neededOverlap(n: Column) =
      ceil(n.cast("double") * lit(threshold) - lit(1e-9))
    def prefix(t: DataFrame) = {
      val w = Window.partitionBy(col("id")).orderBy(col("_df"), col("_t"))
      t.join(dfreq, Seq("_t"))
        .withColumn("_pos", row_number().over(w))
        .filter(col("_pos") <= col("_n") - neededOverlap(col("_n")) + 1)
        .select(col("id"), col("_t"), col("_n"))
    }
    val cPrefix = prefix(cToks)
    // corpus-side bucket tripwire via groupBy + equi-join back — the
    // corpus prefix table is the big side, a count window over it
    // would colocate a boilerplate token's whole bucket in one task
    val buckets = cPrefix.groupBy(col("_t")).agg(count(lit(1)).as("_bkt"))
    val cGuarded = cPrefix.join(buckets, Seq("_t"))
      .withColumn("_gn",
        when(col("_bkt") > maxBucket, raise_error(concat(
          lit("exactJaccardJoinAgainst corpus prefix bucket overflow: " +
            "token '"), col("_t"),
          lit("' appears in "), col("_bkt").cast("string"),
          lit(s" corpus prefixes (> $maxBucket) — quadratic candidate " +
            "blow-up; strip the boilerplate token upstream or raise " +
            "maxBucket with the cost understood"))).cast("long"))
          .otherwise(col("_n")))
    val cand = cGuarded.select(col("id").as("id_corpus"), col("_t"),
        col("_gn").as("_nc"))
      .join(prefix(bToks).select(col("id").as("id_batch"), col("_t"),
        col("_n").as("_nb")), Seq("_t"))
      .filter(col("_nb") >= neededOverlap(col("_nc")) &&
        col("_nc") >= neededOverlap(col("_nb")))
      .select("id_corpus", "id_batch").distinct()
    // exact verify: hash each side's shingle set once, linear merge
    val cHash = cSets.select(col("id").as("id_corpus"),
      Sketches.hashed_token_set(col("_s")).as("_ha"))
    val bHash = bSets.select(col("id").as("id_batch"),
      Sketches.hashed_token_set(col("_s")).as("_hb"))
    cand.join(cHash, Seq("id_corpus")).join(bHash, Seq("id_batch"))
      .select(col("id_corpus"), col("id_batch"),
        Sketches.jaccard_sorted_long(col("_ha"), col("_hb")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_corpus"), col("id_batch"),
        round(col("jaccard"), 4).as("jaccard"))
  }

  /** Batch-vs-corpus EXACT cosine join — [[exactCosineJoin]]'s
    * incremental form and [[exactJaccardJoinAgainst]]'s embedding
    * twin: every (corpus vector, batch vector) pair with cosine ≥
    * `threshold`, zero false negatives, at batch-proportional cost.
    *
    * Same pivot-angle bands (pivots from the CORPUS md5 rule — the
    * blocking choice never affects the result). The asymmetry does
    * the scaling work: the CORPUS keys by its own (b0, b1) bands,
    * unreplicated — only the BATCH replicates, to the 3×3
    * {b−1, b, b+1}² neighborhood (9×, trivial on a batch) — so every
    * |Δband| ≤ 1 pair meets at the corpus row's own cell exactly
    * once, no dedup pass, and the corpus never explodes. Remaining
    * pivots prune as |Δband| ≤ 1 integer checks before the exact
    * verify; the corpus-side cell tripwire (groupBy + join-back)
    * fails loudly on mass collapse.
    *
    * PRODUCTION STEERING: this one-shot form RE-PICKS pivots from the
    * current corpus and re-bands every corpus vector on every call —
    * right for an acceptance query over a corpus frame already in
    * hand (the q231 induction proof), wrong for a recurring ingest
    * loop, where per-call pivot re-picks also mean no two calls'
    * bands line up. The production path is the persisted store:
    * [[certVecIndexWrite]] freezes the pivot geometry into the
    * manifest and bands the corpus ONCE, [[certVecIndexProbe]]
    * answers every later batch from the stored band rows, and
    * [[certVecIndexAppend]] folds the batch in under the same frozen
    * geometry — O(batch) banding per batch, mutually consistent
    * epochs, the contract this per-call re-scan cannot make.
    *
    * @return (id_corpus, id_batch, cos), round(cos, roundTo) ≥
    *         threshold; zero-norm vectors excluded on both sides */
  def exactCosineJoinAgainst(corpus: DataFrame, batch: DataFrame,
                             idCol: String, vecCol: String,
                             threshold: Double, nPivots: Int = 4,
                             maxCell: Long = 100000L,
                             roundTo: Int = 4): DataFrame = {
    require(threshold > -1.0 && threshold < 1.0,
      s"threshold must be in (-1, 1): $threshold")
    require(nPivots >= 2 && nPivots <= 16,
      s"nPivots must be in [2, 16]: $nPivots")
    // same rounded-contract band widening as exactCosineJoin
    val theta = math.acos(math.max(-1.0,
      threshold - 0.5 * math.pow(10, -roundTo))) + 1e-3
    val pivots = BoundedRead.boundedDriverRead(
      Sim.pickCentroids(
        corpus.filter(Sim.cosine(col(vecCol), col(vecCol)) > 0.0),
        idCol, vecCol, nPivots).orderBy("cell"),
      nPivots, "exactCosineJoinAgainst pivots",
      s"pickCentroids emits at most nPivots = $nPivots rows")
      .map(_.getSeq[Float](1).toArray)
    // degrade to the pivots the corpus can supply — the
    // exactCosineJoin convention (fewer pivots = fewer prefilters,
    // never a missed pair); zero-norm rows are excluded from the pick
    // as from banding, so the count below is the bandable population
    val nP = pivots.length
    require(nP >= 2,
      s"exactCosineJoinAgainst needs >= 2 corpus pivot vectors; the " +
        s"corpus supplied only $nP nonzero-norm vectors — a corpus " +
        "this small certifies faster by brute force (crossJoin + filter)")
    def band(p: Array[Float]) =
      floor(acos(greatest(lit(-1.0), least(lit(1.0),
        Sim.cosine(col("_v"), typedLit(p))))) / lit(theta)).cast("int")
    def pts(df: DataFrame, side: String) = df
      .select(col(idCol).as(s"_id$side"), col(vecCol).as("_v"))
      .filter(Sim.cosine(col("_v"), col("_v")) > 0.0)
      .select(col(s"_id$side") +: col("_v").as(s"_v$side") +:
        pivots.zipWithIndex.map { case (p, i) => band(p).as(s"_b$i$side") }: _*)
    val cPts = pts(corpus, "c")
    // corpus-side cell tripwire on the UNREPLICATED (b0, b1) key
    val sizes = broadcast(cPts.groupBy(col("_b0c"), col("_b1c"))
      .agg(count(lit(1)).as("_cn")))
    val cGuarded = cPts.join(sizes, Seq("_b0c", "_b1c"))
      .withColumn("_g",
        when(col("_cn") > maxCell, raise_error(concat(
          lit("exactCosineJoinAgainst corpus cell overflow: band cell ("),
          col("_b0c").cast("string"), lit(","),
          col("_b1c").cast("string"), lit(") holds "),
          col("_cn").cast("string"),
          lit(s" corpus vectors (> $maxCell) — certify at a tighter " +
            "threshold (narrower bands) or raise maxCell with the " +
            "O(cell × batch-neighborhood) cost understood"))).cast("long"))
          .otherwise(col("_cn")))
      .drop("_cn")
    // batch replicates to the 3×3 band neighborhood — the batch is
    // the small side by contract, 9× of small is still small
    val bRep = pts(batch, "b")
      .withColumn("_b0c", explode(array(col("_b0b") - 1, col("_b0b"),
        col("_b0b") + 1)))
      .withColumn("_b1c", explode(array(col("_b1b") - 1, col("_b1b"),
        col("_b1b") + 1)))
    val prefixChecks = (2 until nP).map(i =>
      abs(col(s"_b${i}c") - col(s"_b${i}b")) <= 1)
    cGuarded.join(bRep, Seq("_b0c", "_b1c"))
      .filter(prefixChecks.foldLeft(lit(true))(_ && _))
      .filter(col("_g") > 0L)
      .select(col("_idc").as("id_corpus"), col("_idb").as("id_batch"),
        round(Sim.cosine(col("_vc"), col("_vb")), roundTo).as("cos"))
      .filter(col("cos") >= threshold)
  }

  // -------------------------------------------------- certification ledger

  private val CertFamily = "cert_pairs"
  private[graft] def certLedgerMeta(metric: String,
                                    threshold: Double): IndexMeta =
    IndexMeta(CertFamily, "metric" -> metric,
      "threshold" -> f"$threshold%.4f")

  /** Bootstrap a certification ledger with the one-time full
    * corpus×corpus pass ([[exactJaccardJoin]] / [[exactCosineJoin]]
    * output — any `(id_a, id_b, <score>)` pair frame). The ledger is
    * the OPERATIONAL form of the incremental certification story:
    * after this bootstrap, every arriving batch appends its
    * batch-vs-corpus pairs ([[exactJaccardJoinAgainst]], canonicalized
    * to `id_a < id_b`) plus its own self-join, and by induction the
    * ledger always equals the full join over everything ingested —
    * the release-audit artifact ("these, exactly, are the surviving
    * ≥ τ pairs of shipped corpus N") without ever re-running
    * corpus². Rows are disjoint across epochs BY CONSTRUCTION (a
    * batch's pairs all touch that batch's ids; one epoch per
    * certified batch is the caller's append contract), so compaction
    * is the identity fold and reads are epoch-unions. The manifest
    * records metric + threshold: appending cosine pairs into a
    * Jaccard ledger — or τ = 0.8 pairs into a τ = 0.85 ledger — is
    * refused, not merged. */
  def certLedgerWrite(pairs: DataFrame, path: String, metric: String,
                      threshold: Double): Unit = {
    EpochIndex.bootstrap(pairs, path)
    IndexMeta.write(pairs.sparkSession, path,
      certLedgerMeta(metric, threshold))
  }

  /** Append one certified batch's pairs as one epoch (an
    * at-least-once replay of the same epoch name rewrites its own
    * partition — idempotent). */
  def certLedgerAppend(spark: org.apache.spark.sql.SparkSession,
                       path: String, pairs: DataFrame, epoch: String,
                       metric: String, threshold: Double): Unit = {
    IndexMeta.check(spark, path, certLedgerMeta(metric, threshold))
    EpochIndex.append(pairs, path, epoch)
  }

  /** Manifest-checked read of the full ledger (base ∪ live epochs). */
  def certLedgerRead(spark: org.apache.spark.sql.SparkSession,
                     path: String, metric: String,
                     threshold: Double): DataFrame = {
    IndexMeta.check(spark, path, certLedgerMeta(metric, threshold))
    EpochIndex.read(spark, path, bootstrapName = "certLedgerWrite")
      .drop(EpochIndex.EpochCol)
  }

  /** Identity-fold compaction (disjoint rows — see the class doc). */
  def certLedgerCompact(spark: org.apache.spark.sql.SparkSession,
                        path: String,
                        keepVersions: Int = 2): EpochIndex.CompactionStats = {
    IndexMeta.requireFamily(spark, path, CertFamily)
    EpochIndex.compact(spark, path, identity, keepVersions = keepVersions)
  }

  /** Erase every pair touching `ids` from a certification ledger —
    * disk-level removal ([[EpochIndex.eraseRewrite]]: after it
    * returns, no retained version, epoch directory or marker holds a
    * pair referencing an erased id). The ledger then equals the full
    * exact join over the corpus WITHOUT the erased documents — the
    * induction restarts from the erased state, so run the store
    * erasers ([[certTextIndexErase]]/[[certVecIndexErase]]) in the
    * same maintenance window or the next probe would re-certify
    * against fingerprints of documents the ledger no longer admits.
    *
    * @param ids one-column frame of ids to erase (any column name) */
  def certLedgerErase(spark: org.apache.spark.sql.SparkSession,
                      path: String, ids: DataFrame, metric: String,
                      threshold: Double): EpochIndex.CompactionStats = {
    IndexMeta.check(spark, path, certLedgerMeta(metric, threshold))
    val victims = ids.select(col(ids.columns.head).as("_vid")).distinct()
    EpochIndex.eraseRewrite(spark, path, p => p
      .join(victims.select(col("_vid").as("id_a")), Seq("id_a"), "left_anti")
      .join(victims.select(col("_vid").as("id_b")), Seq("id_b"), "left_anti"))
  }

  /** Rebuild the labeling from scratch over `pairs` (normally the
    * post-erasure ledger read) — the ERASURE form for `cc_labels`:
    * a filter cannot erase an id from a labeling, because min-id
    * LABELS are identifiers too (an erased id that was its
    * component's min would survive as every other member's
    * cluster_id). The only erased-state labeling is the one recomputed
    * from the erased edge set; [[EpochIndex.eraseRewrite]] with a
    * constant fold makes the rewrite disk-clean (no delta epoch or
    * retained base version still names the erased ids). */
  def ccLabelsRebuild(spark: org.apache.spark.sql.SparkSession,
                      path: String, pairs: DataFrame, metric: String,
                      threshold: Double): DataFrame = {
    IndexMeta.check(spark, path, ccLabelsMeta(metric, threshold))
    val labels = connectedComponents(pairs)
    EpochIndex.eraseRewrite(spark, path,
      _ => labels.select(col("id"), col("cluster_id")))
    labels
  }

  /** Erase documents from the text certification store — all three
    * substores, disk-level: fingerprints and postings drop the ids'
    * rows through [[EpochIndex.eraseRewrite]]'s filtering fold, and
    * the stats partials are REBUILT from the retained postings (a
    * count cannot be filtered per-document — it must be recomputed;
    * the rebuild rides the same two-pass rewrite so no stale count
    * survives on disk and the substores stay epoch-aligned). After
    * this, every probe answers exactly as if the documents had never
    * been ingested — q237 pins that against brute force over the
    * retained corpus. */
  def certTextIndexErase(spark: org.apache.spark.sql.SparkSession,
                         path: String, ids: DataFrame, threshold: Double,
                         shingleK: Int = 1, maxBucket: Int = 100000,
                         buckets: Int = 64): Unit = {
    IndexMeta.check(spark, path,
      certTextMeta(threshold, shingleK, maxBucket, buckets))
    val victims = ids.select(col(ids.columns.head).as("_vid")).distinct()
    def keepIds(p: DataFrame) = p.join(
      victims.select(col("_vid").as("id")), Seq("id"), "left_anti")
    EpochIndex.eraseRewrite(spark, s"$path/$CertTextFps", keepIds,
      innerPartCols = Seq("ib"))
    val post = EpochIndex.eraseRewrite(spark, s"$path/$CertTextPostings",
      keepIds, innerPartCols = Seq("pb"))
    // TOTAL erasure (every document a victim): the postings store was
    // torn down, so there is nothing to rebuild counts from — tear
    // the stats substore down the same way (a schema-preserving empty
    // keep takes eraseRewrite's teardown path) instead of reading a
    // store that no longer exists
    if (post.version == EpochIndex.TornDownVersion)
      EpochIndex.eraseRewrite(spark, s"$path/$CertTextStats",
        _.limit(0), innerPartCols = Seq("pb"))
    else {
      val rebuilt = EpochIndex.read(spark, s"$path/$CertTextPostings",
        innerPartCols = Seq("pb"), bootstrapName = "certTextIndexWrite",
        observed = false)
        .drop(EpochIndex.EpochCol)
        .groupBy(col("pb"), col("pt")).agg(count(lit(1)).as("cnt"))
      EpochIndex.eraseRewrite(spark, s"$path/$CertTextStats",
        _ => rebuilt, innerPartCols = Seq("pb"))
      ()
    }
  }

  /** [[certTextIndexErase]]'s cosine twin: band rows drop by id, the
    * cell-count stats rebuild from the retained bands. The frozen
    * pivot geometry is untouched — pivots are aggregate directions,
    * not records of any document, and keeping them is what lets
    * already-banded epochs stay consistent. */
  def certVecIndexErase(spark: org.apache.spark.sql.SparkSession,
                        path: String, ids: DataFrame, threshold: Double,
                        maxCell: Long = 100000L, roundTo: Int = 4): Unit = {
    certVecPivots(spark, path, threshold, roundTo, maxCell)
    val victims = ids.select(col(ids.columns.head).as("_vid")).distinct()
    val bands = EpochIndex.eraseRewrite(spark, s"$path/$CertVecBands",
      p => p.join(victims.select(col("_vid").as("id")), Seq("id"),
        "left_anti"),
      innerPartCols = Seq("b0", "b1"))
    // total erasure: band store torn down → tear the stats down too
    // (certTextIndexErase's branch, cosine twin)
    if (bands.version == EpochIndex.TornDownVersion)
      EpochIndex.eraseRewrite(spark, s"$path/$CertVecStats", _.limit(0))
    else {
      val rebuilt = EpochIndex.read(spark, s"$path/$CertVecBands",
        innerPartCols = Seq("b0", "b1"),
        bootstrapName = "certVecIndexWrite", observed = false)
        .drop(EpochIndex.EpochCol)
        .groupBy(col("b0"), col("b1")).agg(count(lit(1)).as("cnt"))
      EpochIndex.eraseRewrite(spark, s"$path/$CertVecStats", _ => rebuilt)
      ()
    }
  }

  // ------------------------------------------- persisted repair labels

  private val CcLabelsFamily = "cc_labels"
  private[graft] def ccLabelsMeta(metric: String,
                                  threshold: Double): IndexMeta =
    IndexMeta(CcLabelsFamily, "metric" -> metric,
      "threshold" -> f"$threshold%.4f")

  /** Persisted connected-component labeling over everything the
    * certification ledger has certified — the state
    * [[incrementalComponents]] maintains, made a STORE so a production
    * ingest loop never re-derives bootstrap labels per run (the
    * verdict-named gap: every other incremental family persists its
    * state; the labeling is what [[repairSurvivors]] reads).
    *
    * THE FOLD IS MIN, AND THAT IS A THEOREM, NOT A CONVENTION: labels
    * are component MIN-IDS, and components only ever MERGE as new
    * certified pairs arrive — a merge relabels every member to the
    * min of the merged labels, so an id's label is monotonically
    * NON-INCREASING across folds. The store therefore keeps per-epoch
    * DELTA rows `(id, cluster_id)` (changed + new ids only) and reads
    * back `min(cluster_id)` per id: min over all deltas IS the latest
    * label, with no sequence numbers, no ordering requirement across
    * epochs, and replay idempotency for free (re-appending any old
    * delta cannot change a min). Compaction is the same min fold —
    * associative, so base-as-one-partial stays exact.
    *
    * Scale shape: the labeling holds only ids that ever appeared in a
    * certified pair (never the corpus); each fold's delta is bounded
    * by the batch's structure; reads are one co-partitioned
    * aggregation over delta rows. Manifest pins metric + τ so labels
    * derived from one certification can never silently absorb folds
    * from another. */
  def ccLabelsWrite(labels: DataFrame, path: String, metric: String,
                    threshold: Double): Unit = {
    require(!labels.isEmpty,
      s"ccLabelsWrite at $path: refusing to bootstrap from an EMPTY " +
        "labeling (a zero-row bootstrap bricks later reads); for a " +
        "pipeline with no certified pairs yet, start folding with " +
        "ccLabelsFold — it bootstraps from the first nonempty fold")
    EpochIndex.bootstrap(labels.select(col("id"), col("cluster_id")), path)
    IndexMeta.write(labels.sparkSession, path,
      ccLabelsMeta(metric, threshold))
  }

  /** Append one fold's label DELTA as one epoch (manifest-checked,
    * idempotent per epoch name; empty deltas are a no-op). Callers
    * normally use [[ccLabelsFold]], which computes the delta. */
  def ccLabelsAppend(spark: org.apache.spark.sql.SparkSession,
                     path: String, delta: DataFrame, epoch: String,
                     metric: String, threshold: Double): Unit = {
    IndexMeta.check(spark, path, ccLabelsMeta(metric, threshold))
    EpochIndex.append(delta.select(col("id"), col("cluster_id")),
      path, epoch)
  }

  /** The current complete labeling: min per id over every delta ever
    * folded (see the class doc's monotonicity argument) —
    * (id, cluster_id), directly consumable by [[repairSurvivors]]. */
  def ccLabelsRead(spark: org.apache.spark.sql.SparkSession,
                   path: String, metric: String, threshold: Double,
                   excludeEpoch: Option[String] = None): DataFrame = {
    IndexMeta.check(spark, path, ccLabelsMeta(metric, threshold))
    EpochIndex.read(spark, path, excludeEpoch,
      bootstrapName = "ccLabelsWrite")
      .groupBy(col("id")).agg(min(col("cluster_id")).as("cluster_id"))
  }

  /** Fold one batch of certified pairs into the stored labeling — the
    * production loop's one call: read the store, run the super-vertex
    * contraction ([[incrementalComponents]] — O(batch) mini-CC, never
    * a corpus recontraction), append only the CHANGED/NEW rows as this
    * epoch's delta, and return the updated complete labeling.
    *
    * An EMPTY store bootstraps from this fold's own
    * [[connectedComponents]] (the first nonempty fold IS the
    * bootstrap — no separate empty-store write that would brick
    * reads). `excludeEpoch = Some(epoch)` makes an at-least-once
    * replay recompute against exactly the standing labels the first
    * attempt saw and rewrite the identical delta. */
  def ccLabelsFold(spark: org.apache.spark.sql.SparkSession,
                   path: String, pairs: DataFrame, epoch: String,
                   metric: String, threshold: Double): DataFrame = {
    // manifest-first (the streaming-sink discipline): the first fold
    // records build parameters before any delta lands; every later
    // fold verifies them — folding τ=0.8 pairs into a τ=0.85 labeling
    // refuses, never merges
    IndexMeta.writeIfAbsent(spark, path, ccLabelsMeta(metric, threshold))
    IndexMeta.check(spark, path, ccLabelsMeta(metric, threshold))
    if (!EpochIndex.nonEmpty(spark, path)) {
      val labels = connectedComponents(pairs)
      ccLabelsAppend(spark, path, labels, epoch, metric, threshold)
      labels
    } else {
      val stored = ccLabelsRead(spark, path, metric, threshold,
        excludeEpoch = Some(epoch))
      val updated = Bridge.freshLeaf(
        incrementalComponents(stored, pairs).localCheckpoint(true))
      val delta = updated
        .join(stored.withColumnRenamed("cluster_id", "_old"),
          Seq("id"), "left")
        .filter(col("_old").isNull || col("_old") =!= col("cluster_id"))
        .select(col("id"), col("cluster_id"))
      ccLabelsAppend(spark, path, delta, epoch, metric, threshold)
      updated
    }
  }

  /** The live certified-repair view FROM the store:
    * [[repairSurvivors]] over [[ccLabelsRead]] — every ingested id
    * whose stored label is itself (or that never certified a pair).
    * What a release pipeline reads instead of recomputing q232's CC. */
  def repairSurvivorsFromStore(spark: org.apache.spark.sql.SparkSession,
                               ids: DataFrame, idCol: String,
                               labelsPath: String, metric: String,
                               threshold: Double): DataFrame =
    repairSurvivors(ids,
      ccLabelsRead(spark, labelsPath, metric, threshold), idCol)

  /** Min-fold compaction (the family merge — see the class doc). */
  def ccLabelsCompact(spark: org.apache.spark.sql.SparkSession,
                      path: String,
                      keepVersions: Int = 2): EpochIndex.CompactionStats = {
    IndexMeta.requireFamily(spark, path, CcLabelsFamily)
    EpochIndex.compact(spark, path,
      p => p.groupBy(col("id")).agg(min(col("cluster_id")).as("cluster_id")),
      keepVersions = keepVersions)
  }

  // ------------------------------------------- certification index stores

  private val CertTextFamily = "cert_text"
  private[graft] def certTextMeta(threshold: Double, shingleK: Int,
                                  maxBucket: Int, buckets: Int): IndexMeta =
    IndexMeta(CertTextFamily, "threshold" -> f"$threshold%.4f",
      "shingleK" -> shingleK, "maxBucket" -> maxBucket,
      "buckets" -> buckets)

  /** The three substores of a text certification root — the bm25
    * multi-subdir layout, manifest at the root:
    *  - `postings/`: exploded prefix rows `(pb, pt, id, n)`, inner-
    *    partitioned by `pb = pmod(pt, buckets)` so a probe's batch
    *    bucket set becomes a PARQUET PARTITION FILTER (the q151
    *    `term IN (…)` shape), and best-effort sorted by `pt` within
    *    files for row-group skipping;
    *  - `stats/`: per-epoch `(pb, pt, cnt)` prefix-bucket-count
    *    partials, sum-folded — the maxBucket guard reads THESE (a
    *    one-row-per-distinct-token table) instead of re-aggregating
    *    the postings per probe;
    *  - `fps/`: `(ib, id, n, hset)` fingerprint rows, the exact-verify
    *    side, inner-partitioned by `ib = pmod(xxhash64(id), buckets)`
    *    so the verify scan prunes to the CANDIDATES' id buckets —
    *    with postings and bands pruned too, no probe path scans any
    *    substore whole. */
  private val CertTextPostings = "postings"
  private val CertTextStats = "stats"
  private val CertTextFps = "fps"

  /** Refuse loudly when a certification root's substores disagree on
    * which epochs they hold — the torn-append shape (a crash between
    * substore writes) that would otherwise mis-count guards or
    * silently drop verify rows. Re-running the append for the missing
    * epoch repairs it (appends are idempotent per epoch name). */
  private def requireAlignedCertEpochs(
      spark: org.apache.spark.sql.SparkSession, root: String,
      subs: Seq[(String, Seq[String])]): Unit = {
    val sets = subs.map { case (s, inner) =>
      s -> EpochIndex.committedEpochNames(spark, s"$root/$s", inner).toSet }
    require(sets.map(_._2).distinct.size == 1,
      s"certification store at $root has mis-aligned substores: " +
        sets.map { case (s, e) =>
          s"$s=${e.toSeq.sorted.mkString("[", ",", "]")}" }
          .mkString("; ") +
        " — a torn append left index/stats partials inconsistent; " +
        "re-run the append for the missing epoch (idempotent) or " +
        "remove the torn directory")
  }

  /** One document slice → its certification substore frames
    * (fps, postings, stats) — fingerprints only: none carries text,
    * so a probe never re-reads or re-tokenizes the corpus.
    *
    * The prefix is the first `n − ⌈t·n⌉ + 1` shingles under a
    * document-frequency-ascending order over THIS slice. Any total
    * order keeps the prefix-filter lemma exact (see
    * [[certTextIndexProbe]] — the probe matches corpus prefixes
    * against batch FULL sets, which is order-free); df-ascending is
    * purely the bucket-size optimization, so append epochs ordering
    * by their own slice's df — the corpus-wide order is long frozen —
    * cost at most extra candidates, never a missed pair.
    *
    * The returned frames share eagerly-checkpointed parents (`sets`,
    * the prefix cut) so the THREE substore writes tokenize and
    * df-order the slice once, not three times. */
  private def certTextParts(df: DataFrame, idCol: String, textCol: String,
                            threshold: Double, shingleK: Int,
                            buckets: Int): (DataFrame, DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val shingleCol =
      if (shingleK == 1) array_distinct(TextFunctions.tokens(col(textCol)))
      else shingles(col(textCol), shingleK)
    val sets = Bridge.freshLeaf(df
      .filter(size(TextFunctions.tokens(col(textCol))) > 0)
      .select(col(idCol).as("id"), shingleCol.as("_s"))
      .filter(size(col("_s")) > 0)
      .repartition(col("id"))
      .localCheckpoint(true))
    val toks = sets.select(col("id"), size(col("_s")).cast("long").as("_n"),
      explode(col("_s")).as("_t"))
    val dfreq = toks.groupBy(col("_t")).agg(count(lit(1)).as("_df"))
    def needed(n: Column) =
      ceil(n.cast("double") * lit(threshold) - lit(1e-9))
    val w = Window.partitionBy(col("id")).orderBy(col("_df"), col("_t"))
    val pref = Bridge.freshLeaf(toks.join(dfreq, Seq("_t"))
      .withColumn("_pos", row_number().over(w))
      .filter(col("_pos") <= col("_n") - needed(col("_n")) + 1)
      .select(col("id"), col("_n").as("n"), xxhash64(col("_t")).as("pt"))
      .localCheckpoint(true))
    val postings = pref
      .select(pmod(col("pt"), lit(buckets.toLong)).cast("int").as("pb"),
        col("pt"), col("id"), col("n"))
      .repartition(col("pb"))
      .sortWithinPartitions(col("pb"), col("pt"))
    val stats = pref
      .groupBy(pmod(col("pt"), lit(buckets.toLong)).cast("int").as("pb"),
        col("pt"))
      .agg(count(lit(1)).as("cnt"))
    val fps = sets.select(
      pmod(xxhash64(col("id")), lit(buckets.toLong)).cast("int").as("ib"),
      col("id"), size(col("_s")).cast("long").as("n"),
      Sketches.hashed_token_set(col("_s")).as("hset"))
    (fps, postings, stats)
  }

  /** Bootstrap the persisted Jaccard certification index — the store
    * that makes [[exactJaccardJoinAgainst]]'s "cost ∝ batch" claim
    * true for SCANS, not just joins: the corpus is tokenized, df-
    * ordered, and prefix-cut exactly ONCE, here; every later batch
    * probes partition-pruned postings + `(id, n, hset)` fingerprint rows
    * ([[certTextIndexProbe]]) and appends its own
    * ([[certTextIndexAppend]]), so an ingest lifetime of N batches
    * pays O(N · batch) text work instead of O(N · corpus) — the
    * q93/q97/q107 incremental contract, extended to the EXACT
    * certification family. The manifest pins threshold + shingleK +
    * maxBucket: a probe at a different τ or granularity refuses
    * loudly (prefix lengths are τ-specific — probing across τ would
    * silently miss pairs). */
  def certTextIndexWrite(corpus: DataFrame, idCol: String, textCol: String,
                         path: String, threshold: Double, shingleK: Int = 1,
                         maxBucket: Int = 100000, buckets: Int = 64): Unit = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1]: $threshold")
    require(shingleK >= 1, s"shingleK must be >= 1: $shingleK")
    require(buckets >= 1, s"buckets must be >= 1: $buckets")
    val (fps, postings, stats) =
      certTextParts(corpus, idCol, textCol, threshold, shingleK, buckets)
    EpochIndex.bootstrap(stats, s"$path/$CertTextStats",
      innerPartCols = Seq("pb"))
    EpochIndex.bootstrap(postings, s"$path/$CertTextPostings",
      innerPartCols = Seq("pb"))
    EpochIndex.bootstrap(fps, s"$path/$CertTextFps",
      innerPartCols = Seq("ib"))
    IndexMeta.write(corpus.sparkSession, path,
      certTextMeta(threshold, shingleK, maxBucket, buckets))
  }

  /** Append one certified batch's index rows as one epoch (idempotent
    * under at-least-once replay — the EpochIndex append unit; all
    * three substores get the SAME epoch name, and a crash between the
    * substore writes is caught by the probe's epoch-alignment check,
    * repaired by re-running this append). The caller's contract is
    * the ledger's: probe first, then append, so by induction the
    * store always mirrors everything certified. */
  def certTextIndexAppend(spark: org.apache.spark.sql.SparkSession,
                          path: String, batch: DataFrame, idCol: String,
                          textCol: String, epoch: String, threshold: Double,
                          shingleK: Int = 1, maxBucket: Int = 100000,
                          buckets: Int = 64): Unit = {
    IndexMeta.check(spark, path,
      certTextMeta(threshold, shingleK, maxBucket, buckets))
    val (fps, postings, stats) =
      certTextParts(batch, idCol, textCol, threshold, shingleK, buckets)
    EpochIndex.append(stats, s"$path/$CertTextStats", epoch,
      innerPartCols = Seq("pb"))
    EpochIndex.append(postings, s"$path/$CertTextPostings", epoch,
      innerPartCols = Seq("pb"))
    EpochIndex.append(fps, s"$path/$CertTextFps", epoch,
      innerPartCols = Seq("ib"))
  }

  /** Batch-vs-corpus EXACT Jaccard join THROUGH the persisted index —
    * [[exactJaccardJoinAgainst]]'s store-backed form, same output
    * contract (every (corpus, batch) pair with Jaccard ≥ τ, zero
    * false negatives), but the corpus side is postings + `(id, n, hset)`
    * fingerprint rows read from `path`: corpus TEXT is never re-read,
    * re-tokenized, or re-df-counted per batch.
    *
    * Exactness under a one-sided prefix: candidates are corpus
    * PREFIX hashes equi-joined against the batch's FULL shingle-hash
    * sets. For any qualifying pair, |A∩B| ≥ ⌈t·|A|⌉ while A's
    * non-prefix suffix holds only ⌈t·|A|⌉ − 1 shingles — so some
    * shared shingle lands in A's prefix, whatever total order cut it
    * (Bayardo et al. WWW 2007, the R×S corollary). One-sided means
    * the store needs no frozen global token order to stay exact
    * across appends; the PPJoin length filter still applies both ways
    * (carried `n` vs batch `n`). xxhash64 candidate keys can collide
    * — a collision only ADDS a candidate, and the exact sorted-hash
    * verify decides membership.
    *
    * PRUNED probe scan: the candidate join reads the postings store
    * through a `pb IN (batch's buckets)` PARTITION FILTER (`pb` is a
    * store partition column; the bucket list is a bounded driver read
    * — at most `buckets` values by construction), so a small batch
    * touches only its own buckets' files instead of the whole
    * fingerprint index — the q151 postings-pushdown shape. The
    * `maxBucket` tripwire reads the PERSISTED stats substore (summed
    * `(pt, cnt)` partials — one row per distinct prefix token, folded
    * at write/compact time) instead of re-aggregating the postings
    * per probe, checked driver-side at probe construction as a
    * one-row bounded metadata read: it fails loudly on a corpus-wide
    * boilerplate token for EVERY probe, touched or not — the
    * poisoned-index signal must not wait for a batch that happens to
    * hit the hot token.
    *
    * @param excludeEpoch the streaming replay hook: drop one live
    *                     epoch's rows ([[EpochIndex.read]] refuses if
    *                     it was already compacted into the base)
    * @return (id_corpus, id_batch, jaccard), jaccard ≥ threshold
    *         (filtered unrounded, displayed at 4dp) */
  def certTextIndexProbe(spark: org.apache.spark.sql.SparkSession,
                         path: String, batch: DataFrame, idCol: String,
                         textCol: String, threshold: Double,
                         shingleK: Int = 1, maxBucket: Int = 100000,
                         buckets: Int = 64,
                         excludeEpoch: Option[String] = None): DataFrame = {
    IndexMeta.check(spark, path,
      certTextMeta(threshold, shingleK, maxBucket, buckets))
    requireAlignedCertEpochs(spark, path, Seq(
      CertTextFps -> Seq("ib"), CertTextPostings -> Seq("pb"),
      CertTextStats -> Seq("pb")))
    def needed(n: Column) =
      ceil(n.cast("double") * lit(threshold) - lit(1e-9))
    // batch side: FULL shingle-hash sets (the one-sided lemma needs no
    // batch prefix, hence no order agreement with the store);
    // checkpointed once — it feeds the driver-side bucket list, the
    // candidate join and the verify join
    val shingleCol =
      if (shingleK == 1) array_distinct(TextFunctions.tokens(col(textCol)))
      else shingles(col(textCol), shingleK)
    val bSets = Bridge.freshLeaf(batch
      .filter(size(TextFunctions.tokens(col(textCol))) > 0)
      .select(col(idCol).as("id_batch"), shingleCol.as("_s"))
      .filter(size(col("_s")) > 0)
      .repartition(col("id_batch"))
      .localCheckpoint(true))
    val bToks = bSets.select(col("id_batch"),
      size(col("_s")).cast("long").as("_nb"),
      explode(col("_s")).as("_tt"))
      .select(col("id_batch"), col("_nb"), xxhash64(col("_tt")).as("pt"))
    // the batch's bucket list — bounded by the manifest constant, so
    // the collect is a metadata read, never corpus-shaped
    val pbs = BoundedRead.boundedDriverRead(
      bToks.select(pmod(col("pt"), lit(buckets.toLong)).cast("int").as("pb"))
        .distinct(),
      buckets, "certTextIndexProbe batch buckets",
      s"pb = pmod(hash, $buckets) has at most $buckets distinct values")
      .map(_.getInt(0))
    // postings, partition-pruned to the batch's buckets (observed =
    // false: a CollectMetrics barrier would block the partition
    // filter — EpochIndex.read's scaladoc)
    val postings = EpochIndex.read(spark, s"$path/$CertTextPostings",
      excludeEpoch, innerPartCols = Seq("pb"),
      bootstrapName = "certTextIndexWrite", observed = false)
      .drop(EpochIndex.EpochCol)
      .filter(col("pb").isin(pbs.map(Int.box).toIndexedSeq: _*))
    // corpus-wide hottest prefix bucket from the PERSISTED stats —
    // summed partials over a one-row-per-token table, never a re-scan
    // of the postings. Checked DRIVER-SIDE at probe construction (a
    // one-row bounded metadata read of a pre-aggregated store, not
    // corpus work): the poisoned-index refusal fires for EVERY probe,
    // empty batches and untouched buckets included, and the candidate
    // plan stays guard-free.
    val hot = BoundedRead.boundedDriverRead(
      EpochIndex.read(spark, s"$path/$CertTextStats", excludeEpoch,
        innerPartCols = Seq("pb"), bootstrapName = "certTextIndexWrite")
        .drop(EpochIndex.EpochCol)
        .groupBy(col("pt")).agg(sum(col("cnt")).as("_bkt"))
        .agg(max(struct(col("_bkt"), col("pt"))).as("_hot"))
        .select(col("_hot._bkt").as("bkt"), col("_hot.pt").as("pt")),
      1, "certTextIndexProbe hottest bucket",
      "a global aggregate emits exactly one row")
    hot.filterNot(_.isNullAt(0)).foreach { r =>
      require(r.getLong(0) <= maxBucket,
        s"certTextIndexProbe corpus prefix bucket overflow: hash " +
          s"${r.getLong(1)} appears in ${r.getLong(0)} corpus prefixes " +
          s"(> $maxBucket) — quadratic candidate blow-up; strip the " +
          "boilerplate token upstream or rebuild the index with the " +
          "cost understood")
    }
    // candidates, materialized ONCE (they were always computed once;
    // the checkpoint additionally lets the verify scan below prune):
    // their id buckets are ≤ `buckets` distinct values by construction,
    // so the fingerprint read becomes a partition-filtered scan too —
    // no probe path scans any substore whole
    val cand = Bridge.freshLeaf(postings
      .select(col("pt"), col("id").as("id_corpus"), col("n").as("_nc"))
      .join(bToks, Seq("pt"))
      .filter(col("_nb") >= needed(col("_nc")) &&
        col("_nc") >= needed(col("_nb")))
      .select("id_corpus", "id_batch").distinct()
      .localCheckpoint(true))
    val ibs = BoundedRead.boundedDriverRead(
      cand.select(pmod(xxhash64(col("id_corpus")), lit(buckets.toLong))
        .cast("int").as("ib")).distinct(),
      buckets, "certTextIndexProbe candidate id buckets",
      s"ib = pmod(hash, $buckets) has at most $buckets distinct values")
      .map(_.getInt(0))
    val bHash = bSets.select(col("id_batch"),
      Sketches.hashed_token_set(col("_s")).as("_hb"))
    val fps = EpochIndex.read(spark, s"$path/$CertTextFps", excludeEpoch,
      innerPartCols = Seq("ib"),
      bootstrapName = "certTextIndexWrite", observed = false)
      .filter(col("ib").isin(ibs.map(Int.box).toIndexedSeq: _*))
      .drop(EpochIndex.EpochCol)
    cand.join(fps.select(col("id").as("id_corpus"), col("hset").as("_ha")),
        Seq("id_corpus"))
      .join(bHash, Seq("id_batch"))
      .select(col("id_corpus"), col("id_batch"),
        Sketches.jaccard_sorted_long(col("_ha"), col("_hb")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_corpus"), col("id_batch"),
        round(col("jaccard"), 4).as("jaccard"))
  }

  /** Does the text certification store hold any index data (a live
    * epoch or a compacted base)? The gate the streaming sink probes
    * through — a single definition so a layout change cannot silently
    * diverge from what [[certTextIndexProbe]] actually reads. */
  def certTextIndexNonEmpty(spark: org.apache.spark.sql.SparkSession,
                            path: String): Boolean =
    EpochIndex.nonEmpty(spark, s"$path/$CertTextFps",
      innerPartCols = Seq("ib"))

  /** Does `corpus` hold at least one row the text certification index
    * would carry — a non-empty shingle set at this granularity (the
    * exact [[certTextParts]] filters)? The activation predicate that
    * lets the streaming sink tell a WRONGLY-empty index under a
    * standing indexable corpus (refuse — probes would silently miss
    * pairs) from a LEGITIMATELY empty one (every ingested text empty
    * at this shingleK: no probe could ever match, and the suggested
    * repair `certTextIndexWrite` cannot produce index rows from such
    * a corpus either — refusing would brick the pipeline forever).
    * `limit(1)` under the filter: the scan stops at the first
    * indexable row, so the common refusal check stays cheap even when
    * this rare empty-index branch is taken. */
  def certTextHasIndexable(corpus: DataFrame, textCol: String,
                           shingleK: Int = 1): Boolean = {
    val shingleCol =
      if (shingleK == 1) array_distinct(TextFunctions.tokens(col(textCol)))
      else shingles(col(textCol), shingleK)
    !corpus
      .filter(size(TextFunctions.tokens(col(textCol))) > 0)
      .filter(size(shingleCol) > 0)
      .limit(1).isEmpty
  }

  /** [[certTextHasIndexable]]'s cosine twin: any non-zero-norm vector
    * ([[certVecRows]] drops zero-norm rows — they cannot band, so a
    * corpus of only zero-norm vectors legitimately yields an empty
    * band store). */
  def certVecHasIndexable(corpus: DataFrame, vecCol: String): Boolean =
    !corpus.filter(Sim.cosine(col(vecCol), col(vecCol)) > 0.0)
      .limit(1).isEmpty

  /** Compaction: fingerprint and postings rows are disjoint across
    * epochs (identity fold — one row per document/prefix token,
    * documents partitioned by arrival batch); the stats partials
    * SUM-fold per (pb, pt). Returns the fps fold's stats (the
    * document-count-shaped substore). */
  def certTextIndexCompact(spark: org.apache.spark.sql.SparkSession,
                           path: String,
                           keepVersions: Int = 2): EpochIndex.CompactionStats = {
    IndexMeta.requireFamily(spark, path, CertTextFamily)
    EpochIndex.compact(spark, s"$path/$CertTextStats",
      p => p.groupBy(col("pb"), col("pt")).agg(sum(col("cnt")).as("cnt")),
      innerPartCols = Seq("pb"), keepVersions = keepVersions)
    EpochIndex.compact(spark, s"$path/$CertTextPostings", identity,
      innerPartCols = Seq("pb"), keepVersions = keepVersions)
    EpochIndex.compact(spark, s"$path/$CertTextFps", identity,
      innerPartCols = Seq("ib"), keepVersions = keepVersions)
  }

  private val CertVecFamily = "cert_vec"
  /** Substores of a cosine certification root: `bands/` (the banded
    * vector rows, inner-partitioned by the (b0, b1) blocking key) and
    * `stats/` (per-epoch (b0, b1, cnt) cell-count partials, sum-folded
    * — geometry-bounded, so always broadcast-sized). */
  private val CertVecBands = "bands"
  private val CertVecStats = "stats"
  private[graft] def certVecMeta(threshold: Double, roundTo: Int,
                                 maxCell: Long,
                                 pivots: Seq[Array[Float]]): IndexMeta =
    IndexMeta(CertVecFamily, "threshold" -> f"$threshold%.4f",
      "roundTo" -> roundTo, "maxCell" -> maxCell,
      "nPivots" -> pivots.length,
      "pivots" -> pivots.map(_.mkString(",")).mkString(";"))

  /** Manifest check for the cosine certification store that also
    * RETURNS the frozen pivot geometry: scalar parameters must match
    * the probe's exactly (refuse loudly), while the pivots are read
    * back from the manifest — they were frozen at bootstrap and are
    * not the caller's to supply. Float round-trip via
    * `Float.toString`/`toFloat` is exact, so the parsed pivots are
    * bit-identical to the frozen ones. */
  private def certVecPivots(spark: org.apache.spark.sql.SparkSession,
                            path: String, threshold: Double, roundTo: Int,
                            maxCell: Long): Array[Array[Float]] = {
    val stored = IndexMeta.read(spark, path).getOrElse(
      throw new IllegalStateException(
        s"cosine certification store at $path has no _GRAFT_META " +
          "manifest — bootstrap it with certVecIndexWrite"))
    require(stored.family == CertVecFamily,
      s"index family mismatch at $path: stored '${stored.family}', " +
        s"probe expects '$CertVecFamily' — wrong index path?")
    val pivots = stored.params.getOrElse("pivots", sys.error(
      s"manifest at $path records no frozen pivots — not a " +
        "certVecIndexWrite store"))
      .split(";").map(_.split(",").map(_.toFloat))
    IndexMeta.check(spark, path, certVecMeta(threshold, roundTo, maxCell,
      pivots.toIndexedSeq))
    pivots
  }

  private def certVecTheta(threshold: Double, roundTo: Int): Double =
    math.acos(math.max(-1.0,
      threshold - 0.5 * math.pow(10, -roundTo))) + 1e-3

  /** `(id, vec, b0..b{p-1})` band rows under a FIXED pivot set — the
    * shared front end of the cosine store's bootstrap and appends, so
    * every epoch's bands are byte-identical by construction. */
  private def certVecRows(df: DataFrame, idCol: String, vecCol: String,
                          pivots: Array[Array[Float]],
                          theta: Double): DataFrame = {
    def band(p: Array[Float]) =
      floor(acos(greatest(lit(-1.0), least(lit(1.0),
        Sim.cosine(col("_v"), typedLit(p))))) / lit(theta)).cast("int")
    df.select(col(idCol).as("id"), col(vecCol).as("_v"))
      .filter(Sim.cosine(col("_v"), col("_v")) > 0.0)
      .select(col("id") +: col("_v").as("vec") +:
        pivots.zipWithIndex.toIndexedSeq
          .map { case (p, i) => band(p).as(s"b$i") }: _*)
  }

  /** Bootstrap the persisted cosine certification index —
    * [[certTextIndexWrite]]'s embedding twin: corpus vectors banded
    * ONCE under pivots FROZEN into the manifest. Freezing is what
    * makes appends sound: [[exactCosineJoinAgainst]] re-picks pivots
    * from the current corpus per call, so bands computed yesterday
    * would not line up with a probe computed today — here the
    * geometry is a manifest constant, every epoch's bands are
    * mutually consistent, and a probe reads pivots back instead of
    * re-deriving them from data. Pivot QUALITY never affects
    * exactness (bands only block; the cosine verify decides), so a
    * frozen, gradually-staler pivot set costs at most candidate
    * counts. */
  def certVecIndexWrite(corpus: DataFrame, idCol: String, vecCol: String,
                        path: String, threshold: Double, nPivots: Int = 4,
                        maxCell: Long = 100000L, roundTo: Int = 4): Unit = {
    require(threshold > -1.0 && threshold < 1.0,
      s"threshold must be in (-1, 1): $threshold")
    require(nPivots >= 2 && nPivots <= 16,
      s"nPivots must be in [2, 16]: $nPivots")
    val spark = corpus.sparkSession
    // zero-norm vectors cannot band (certVecRows drops them) and make
    // degenerate pivots (acos against them is undefined) — exclude
    // them from the pick so the pivot set reflects bandable rows and
    // the degrade message below counts what it claims to count
    val pivots = BoundedRead.boundedDriverRead(
      Sim.pickCentroids(
        corpus.filter(Sim.cosine(col(vecCol), col(vecCol)) > 0.0),
        idCol, vecCol, nPivots).orderBy("cell"),
      nPivots, "certVecIndexWrite pivots",
      s"pickCentroids emits at most nPivots = $nPivots rows")
      .map(_.getSeq[Float](1).toArray)
    require(pivots.length >= 2,
      s"certVecIndexWrite needs >= 2 pivot vectors; the corpus " +
        s"supplied only ${pivots.length} nonzero-norm vectors")
    val theta = certVecTheta(threshold, roundTo)
    // bands inner-partitioned by the (b0, b1) blocking key: the probe's
    // 3×3 neighborhood cell set becomes a parquet partition filter.
    // The banding runs once (eager checkpoint) and feeds both the
    // band store and its per-cell count partials — the stats substore
    // the probe's maxCell guard reads instead of re-aggregating bands.
    val bands = Bridge.freshLeaf(
      certVecRows(corpus, idCol, vecCol, pivots, theta)
        .localCheckpoint(true))
    EpochIndex.bootstrap(bands, s"$path/$CertVecBands",
      innerPartCols = Seq("b0", "b1"))
    EpochIndex.bootstrap(
      bands.groupBy(col("b0"), col("b1")).agg(count(lit(1)).as("cnt")),
      s"$path/$CertVecStats")
    IndexMeta.write(spark, path,
      certVecMeta(threshold, roundTo, maxCell, pivots.toIndexedSeq))
  }

  /** Freeze the cosine certification manifest WITHOUT a bootstrap
    * base — the streaming sink's first-batch hook: a store born under
    * `certVecIngestSink` has no corpus yet, so the pivots freeze from
    * the FIRST batch (the deterministic md5 rule — an at-least-once
    * replay of that batch re-derives the identical pivots, and
    * writeIfAbsent semantics make the record idempotent) and every
    * epoch append then bands under them. An existing manifest is
    * checked, never clobbered. Pivot QUALITY never affects exactness
    * (bands only block); a skewed first batch costs candidates, not
    * pairs — bootstrap with [[certVecIndexWrite]] over a real corpus
    * when one exists. */
  private[graft] def certVecMetaWriteIfAbsent(
      spark: org.apache.spark.sql.SparkSession, path: String,
      firstBatch: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nPivots: Int, maxCell: Long,
      roundTo: Int): Unit = {
    if (IndexMeta.read(spark, path).isEmpty) {
      val pivots = BoundedRead.boundedDriverRead(
        Sim.pickCentroids(
          firstBatch.filter(Sim.cosine(col(vecCol), col(vecCol)) > 0.0),
          idCol, vecCol, nPivots).orderBy("cell"),
        nPivots, "certVecMetaWriteIfAbsent pivots",
        s"pickCentroids emits at most nPivots = $nPivots rows")
        .map(_.getSeq[Float](1).toArray)
      require(pivots.length >= 2,
        s"cannot freeze a cosine certification geometry from a " +
          s"${pivots.length}-nonzero-norm-vector first batch — " +
          "bootstrap the store with certVecIndexWrite over a real " +
          "corpus first")
      // ATOMIC publish (IndexMeta.writeIfAbsent: unique temp +
      // rename-without-replace, winner decided by content read-back):
      // two concurrent first activations can no longer both freeze —
      // exactly one geometry survives, and the loser falls through to
      // verify (and thereafter band under) the WINNER's manifest
      IndexMeta.writeIfAbsent(spark, path,
        certVecMeta(threshold, roundTo, maxCell, pivots.toIndexedSeq))
      certVecPivots(spark, path, threshold, roundTo, maxCell)
      ()
    } else {
      certVecPivots(spark, path, threshold, roundTo, maxCell)
      ()
    }
  }

  /** Append one certified batch's band rows as one epoch, banded
    * under the manifest's FROZEN pivots (never re-picked). */
  def certVecIndexAppend(spark: org.apache.spark.sql.SparkSession,
                         path: String, batch: DataFrame, idCol: String,
                         vecCol: String, epoch: String, threshold: Double,
                         maxCell: Long = 100000L, roundTo: Int = 4): Unit = {
    val pivots = certVecPivots(spark, path, threshold, roundTo, maxCell)
    val bands = Bridge.freshLeaf(
      certVecRows(batch, idCol, vecCol, pivots,
        certVecTheta(threshold, roundTo)).localCheckpoint(true))
    EpochIndex.append(
      bands.groupBy(col("b0"), col("b1")).agg(count(lit(1)).as("cnt")),
      s"$path/$CertVecStats", epoch)
    EpochIndex.append(bands, s"$path/$CertVecBands", epoch,
      innerPartCols = Seq("b0", "b1"))
  }

  /** Batch-vs-corpus EXACT cosine join THROUGH the persisted index —
    * [[exactCosineJoinAgainst]]'s store-backed form, same output
    * contract, but the corpus side is `(id, vec, bands)` rows read
    * from `path/bands` and the pivots come frozen from the manifest:
    * no per-batch corpus banding, no per-batch pivot re-pick. The
    * corpus stays unreplicated; the batch carries the 3×3 band
    * neighborhood; remaining pivots prune as |Δband| ≤ 1 integer
    * checks before the exact verify.
    *
    * PRUNED probe scan: the band store is partitioned by (b0, b1),
    * and the batch's distinct neighborhood cells — a bounded driver
    * read, ≤ (⌈π/θ⌉+3)² values by geometry, never corpus-shaped —
    * become a PARTITION FILTER on the scan: the probe reads only the
    * ≤ 9·|batch cells| band partitions it can possibly pair with.
    * The maxCell tripwire reads the PERSISTED stats substore (summed
    * (b0, b1, cnt) partials, geometry-bounded rows) instead of
    * re-aggregating the band store per probe, checked driver-side at
    * probe construction as a one-row bounded metadata read — it fails
    * loudly on ANY oversized corpus cell for every probe, probed or
    * not (the mass-collapse signal must not wait for a batch that
    * happens to land in the collapsed cell). */
  def certVecIndexProbe(spark: org.apache.spark.sql.SparkSession,
                        path: String, batch: DataFrame, idCol: String,
                        vecCol: String, threshold: Double,
                        maxCell: Long = 100000L, roundTo: Int = 4,
                        excludeEpoch: Option[String] = None): DataFrame = {
    val pivots = certVecPivots(spark, path, threshold, roundTo, maxCell)
    val nP = pivots.length
    val theta = certVecTheta(threshold, roundTo)
    requireAlignedCertEpochs(spark, path, Seq(
      CertVecBands -> Seq("b0", "b1"), CertVecStats -> Nil))
    val bRows = Bridge.freshLeaf(
      certVecRows(batch, idCol, vecCol, pivots, theta)
        .localCheckpoint(true))
    val bPts = bRows.select(col("id").as("_idb") +: col("vec").as("_vb") +:
      (0 until nP).map(i => col(s"b$i").as(s"_b${i}b")): _*)
    val bRep = bPts
      .withColumn("_b0c", explode(array(col("_b0b") - 1, col("_b0b"),
        col("_b0b") + 1)))
      .withColumn("_b1c", explode(array(col("_b1b") - 1, col("_b1b"),
        col("_b1b") + 1)))
    // the probed cell set, collected under a GEOMETRY bound: bands
    // are floor(acos/θ) ∈ [0, ⌈π/θ⌉], so the 3×3 neighborhood spans
    // at most (⌈π/θ⌉ + 3)² distinct (b0, b1) values whatever the
    // batch or corpus size. Encoded b0·2²⁰ + b1 (bands ≪ 2¹⁹ because
    // θ ≥ 1e-3) so one isin over an arithmetic expression of the two
    // partition columns is the whole filter.
    val maxBands = (math.Pi / theta).toInt + 3
    val cellCap = maxBands * maxBands
    val cellKey = 1L << 20
    val cells = BoundedRead.boundedDriverRead(
      bRep.select(col("_b0c"), col("_b1c")).distinct(), cellCap,
      "certVecIndexProbe probe cells",
      s"bands lie in [0, π/θ] so the 3×3 neighborhood has at most " +
        s"$cellCap distinct cells")
      .map(r => r.getInt(0).toLong * cellKey + r.getInt(1))
    // observed = false: the partition filter must reach the scan
    // (CollectMetrics is a pushdown barrier — EpochIndex.read's doc)
    val idx = EpochIndex.read(spark, s"$path/$CertVecBands", excludeEpoch,
      innerPartCols = Seq("b0", "b1"),
      bootstrapName = "certVecIndexWrite", observed = false)
      .filter((col("b0").cast("long") * lit(cellKey) +
        col("b1").cast("long")).isin(cells.map(Long.box).toIndexedSeq: _*))
      .drop(EpochIndex.EpochCol)
      .withColumn("b0", col("b0").cast("int"))
      .withColumn("b1", col("b1").cast("int"))
    val cPts = idx.select(col("id").as("_idc") +: col("vec").as("_vc") +:
      (0 until nP).map(i => col(s"b$i").as(s"_b${i}c")): _*)
    // hottest-cell guard from the persisted stats partials (summed,
    // geometry-bounded rows) — checked DRIVER-SIDE at probe
    // construction like certTextIndexProbe's: fires for every probe,
    // independent of which cells the batch touches, and keeps the
    // candidate plan guard-free
    val hot = BoundedRead.boundedDriverRead(
      EpochIndex.read(spark, s"$path/$CertVecStats", excludeEpoch,
        bootstrapName = "certVecIndexWrite")
        .drop(EpochIndex.EpochCol)
        .groupBy(col("b0"), col("b1")).agg(sum(col("cnt")).as("_cn"))
        .agg(max(struct(col("_cn"), col("b0"), col("b1"))).as("_hot"))
        .select(col("_hot._cn").as("cn"), col("_hot.b0").as("b0"),
          col("_hot.b1").as("b1")),
      1, "certVecIndexProbe hottest cell",
      "a global aggregate emits exactly one row")
    hot.filterNot(_.isNullAt(0)).foreach { r =>
      require(r.getLong(0) <= maxCell,
        s"certVecIndexProbe corpus cell overflow: band cell " +
          s"(${r.getInt(1)},${r.getInt(2)}) holds ${r.getLong(0)} " +
          s"corpus vectors (> $maxCell) — certify at a tighter " +
          "threshold (narrower bands) or rebuild with the " +
          "O(cell × batch-neighborhood) cost understood")
    }
    val prefixChecks = (2 until nP).map(i =>
      abs(col(s"_b${i}c") - col(s"_b${i}b")) <= 1)
    cPts.join(bRep, Seq("_b0c", "_b1c"))
      .filter(prefixChecks.foldLeft(lit(true))(_ && _))
      .select(col("_idc").as("id_corpus"), col("_idb").as("id_batch"),
        round(Sim.cosine(col("_vc"), col("_vb")), roundTo).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** [[certTextIndexNonEmpty]]'s cosine twin. */
  def certVecIndexNonEmpty(spark: org.apache.spark.sql.SparkSession,
                           path: String): Boolean =
    EpochIndex.nonEmpty(spark, s"$path/$CertVecBands",
      innerPartCols = Seq("b0", "b1"))

  /** Compaction: band rows are disjoint across epochs (identity fold
    * — bounds the per-cell file count); the cell-count partials
    * SUM-fold per (b0, b1). Returns the band fold's stats. */
  def certVecIndexCompact(spark: org.apache.spark.sql.SparkSession,
                          path: String,
                          keepVersions: Int = 2): EpochIndex.CompactionStats = {
    IndexMeta.requireFamily(spark, path, CertVecFamily)
    EpochIndex.compact(spark, s"$path/$CertVecStats",
      p => p.groupBy(col("b0"), col("b1")).agg(sum(col("cnt")).as("cnt")),
      keepVersions = keepVersions)
    EpochIndex.compact(spark, s"$path/$CertVecBands", identity,
      innerPartCols = Seq("b0", "b1"), keepVersions = keepVersions)
  }

  /** Exact n-gram (word-shingle) Jaccard for all pairs within a
    * blocking key — the exact verifier for LSH candidates. Pair
    * scoring uses the codegen'd JaccardStr expression (hash-set
    * intersection, O(n+m) per pair) — the interpreted array_intersect
    * chain was the sf0.1 bench hot spot. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        blockCol: String, k: Int = 1,
                        threshold: Double = 0.5): DataFrame = {
    // hash each shingle set ONCE per document into a sorted long
    // array: pair scoring is then a linear merge with no hashing and
    // the join shuffles 8-byte hashes instead of shingle strings.
    // The repartition on the block key both co-partitions the self-
    // join (no broadcast of the corpus) and acts as the barrier that
    // stops CollapseProject from re-tokenizing per PAIR (measured 13s
    // → sub-second per-doc cost at sf0.1 without it).
    // k == 1 shingles ARE the tokens — skip the interpreted
    // shingle-building HOF on that fast path.
    val shingleCol =
      if (k == 1) TextFunctions.tokens(col(textCol))
      else shingles(col(textCol), k)
    val toks = df.select(col(blockCol).as("block"), col(idCol).as("id"),
      Sketches.hashed_token_set(shingleCol).as("sh"))
      .repartition(col("block"))
    val a = toks.select(col("block"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = toks.select(col("block"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Sketches.jaccard_sorted_long(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // -------------------------------------------------------------------
  // Cross-document gram repetition: corpus-level duplicated n-gram signal

  /** Cross-document duplicated n-gram fraction — the corpus-level twin
    * of the within-document repetition signals (q51): for every
    * document, the share of its DISTINCT word n-grams that also occur
    * in at least one OTHER document. High values mark templated /
    * boilerplate-heavy content that survives exact and near-dup
    * removal (every copy differs somewhere) yet still floods training
    * with repeated text — the MassiveText-style repetition filters
    * applied ACROSS documents instead of within one.
    *
    * Shape: grams explode per doc (DISTINCT within a doc, so a gram's
    * row count IS its document frequency), md5-fingerprinted so every
    * shuffle carries fixed-width 16-byte keys however long the grams
    * are. Corpus df comes from `groupBy(gram_fp).count()` + an
    * equi-join back on the fingerprint — NOT a
    * `count over (partition by gram_fp)` window. The distinction is
    * the whole 100 TB contract: a corpus-wide boilerplate gram
    * (df ≈ N docs) physically colocates all N of its rows in ONE
    * window task that nothing can split, whereas the groupBy's
    * map-side partials crush the hot key to one row per input
    * partition, and the residual join-side skew is exactly the shape
    * AQE's skew-join splitter handles. The join re-derives the gram
    * frame on both sides (two scans of the text) — deliberately: at
    * corpus scale, persisting the exploded gram table to avoid a
    * second pass costs far more than the rescan. The per-doc rollup
    * after it is map-side partial, so its exchange moves one small
    * row per (doc, partition), never the grams.
    *
    * @return one row per doc: n_grams, n_shared (corpus df >= 2),
    *         shared_frac (rounded to 4 decimals) */
  def dupGramFraction(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 8): DataFrame = {
    val grams = docs.select(col(idCol).as("doc_id"),
        explode(shingles(col(textCol), n)).as("_ng"))
      .select(col("doc_id"), md5(col("_ng").cast("binary")).as("gram_fp"))
    val dfCounts = grams.groupBy(col("gram_fp"))
      .agg(count(lit(1)).as("_df"))
    grams.join(dfCounts, Seq("gram_fp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("_df") >= 2, 1L).otherwise(0L)).as("n_shared"))
      .withColumn("shared_frac",
        round(col("n_shared").cast("double") / col("n_grams"), 4))
  }

  /** Persisted corpus gram-frequency index: (gram_fp, n_docs), one
    * fixed-width row per DISTINCT n-gram in the corpus — md5
    * fingerprints, never text (the gram-granularity sibling of
    * [[boilerplateIndex]]). [[incrementalDupGramFraction]] probes it;
    * [[gramFreqIndexMerge]] folds a disjoint batch's counts in. */
  def gramFreqIndex(df: DataFrame, idCol: String, textCol: String,
                    n: Int = 8): DataFrame =
    df.select(col(idCol).as("doc_id"),
        explode(shingles(col(textCol), n)).as("_ng"))
      .select(md5(col("_ng").cast("binary")).as("gram_fp"))
      .groupBy(col("gram_fp"))
      .agg(count(lit(1)).as("n_docs"))

  /** Counts ADD across disjoint-doc batches (grams are per-doc
    * DISTINCT, so no document is counted twice). Associative:
    * per-shard builds merged equal one corpus-wide build
    * (spec-pinned). */
  def gramFreqIndexMerge(index: DataFrame, batchIndex: DataFrame): DataFrame =
    index.unionByName(batchIndex)
      .groupBy(col("gram_fp")).agg(sum(col("n_docs")).as("n_docs"))

  /** Batch novelty probe against a persisted corpus gram index — the
    * daily-batch shape of [[dupGramFraction]]: for each incoming doc,
    * the share of its distinct n-grams ALREADY present in the corpus.
    * seen_frac ≈ 1 means the doc is assembled from text the corpus
    * already has even if no single existing document near-dups it —
    * the remix/boilerplate case banded LSH is blind to.
    *
    * The index does NOT broadcast: unlike a benchmark gram index
    * (thousands of eval docs), the corpus index is the BIG side, so
    * this is a shuffled equi-join on 16-byte fingerprints with the
    * batch as the small side — AQE picks the cheap build side.
    * Same loud-failure contract as [[Contamination.incrementalNgramOverlap]]:
    * an empty or mis-pathed index would report seen_frac = 0 for
    * every doc — the silent "everything is novel" verdict a curation
    * gate must never emit. */
  private val GramFamily = "gram_freq"
  private[graft] def gramFreqIndexMeta(n: Int): IndexMeta =
    IndexMeta(GramFamily, "n" -> n)

  /** THE gram-count fold — counts ADD across disjoint-doc partials
    * (same contract as [[gramFreqIndexMerge]]); shared by the stored
    * read and [[gramFreqIndexCompact]]. */
  private def gramCountsFold(partials: DataFrame): DataFrame =
    partials.groupBy(col("gram_fp")).agg(sum(col("n_docs")).as("n_docs"))

  /** Bootstrap a STORED corpus gram-frequency index from a batch-built
    * one ([[gramFreqIndex]]) in the epoch-partitioned layout the
    * whole store family shares (`_epoch=base` + later appends, atomic
    * `_CURRENT` compaction) — the gram-granularity sibling of
    * [[boilerplateIndexWrite]]. Records the gram size `n` in the
    * `_GRAFT_META` manifest: probing an n=8 index with n=5 grams
    * would silently report near-zero seen_frac for everything. */
  def gramFreqIndexWrite(index: DataFrame, path: String, n: Int): Unit = {
    EpochIndex.bootstrap(index, path)
    IndexMeta.write(index.sparkSession, path, gramFreqIndexMeta(n))
  }

  /** Append one disjoint batch's gram-count partial as a new epoch
    * (manifest-checked; idempotent under a repeated epoch name). */
  def gramFreqIndexAppend(spark: org.apache.spark.sql.SparkSession,
                          path: String, partial: DataFrame,
                          epoch: String, n: Int): Unit = {
    IndexMeta.check(spark, path, gramFreqIndexMeta(n))
    EpochIndex.append(partial, path, epoch)
  }

  /** Read a stored gram-frequency index: epoch partials (plus the
    * compacted base, if any) summed per fingerprint. `excludeEpoch`
    * is the replay-idempotency hook the store family shares. */
  def gramFreqIndexRead(spark: org.apache.spark.sql.SparkSession,
                        path: String,
                        excludeEpoch: Option[String] = None): DataFrame =
    gramCountsFold(EpochIndex.read(spark, path, excludeEpoch,
      bootstrapName = "gramFreqIndexWrite"))

  /** Checked read: manifest-verifies the gram size before probing. */
  def gramFreqIndexRead(spark: org.apache.spark.sql.SparkSession,
                        path: String, excludeEpoch: Option[String],
                        n: Int): DataFrame = {
    IndexMeta.check(spark, path, gramFreqIndexMeta(n))
    gramFreqIndexRead(spark, path, excludeEpoch)
  }

  /** Fold accumulated gram-count epochs into a compacted base (atomic
    * `_CURRENT` publish — see [[EpochIndex.compact]]). */
  def gramFreqIndexCompact(spark: org.apache.spark.sql.SparkSession,
                           path: String,
                           keepVersions: Int = 2): EpochIndex.CompactionStats = {
    IndexMeta.requireFamily(spark, path, GramFamily)
    EpochIndex.compact(spark, path, gramCountsFold, keepVersions = keepVersions)
  }

  /** Shared count-subtraction erase fold for the additive count
    * stores (gram_freq, boilerplate line counts): counts ADD over
    * disjoint-doc partials, so erasing documents = folding in the
    * victims' OWN partial negated — exact (the partial is a
    * deterministic function of the victim text, so it is bitwise the
    * contribution ingest added) and O(victims), not O(corpus). Rows
    * whose count reaches zero leave the disk (grams/lines unique to
    * the victims survive nowhere); a NEGATIVE count refuses loudly —
    * it means a "victim" was never ingested (or was ingested with
    * different text), and dropping the row would silently erase a
    * retained document's contribution too. */
  private[graft] def countSubtractErase(
      spark: org.apache.spark.sql.SparkSession, path: String,
      victimPartial: DataFrame, keyCol: String,
      cntCol: String, op: String): EpochIndex.CompactionStats = {
    val negated = victimPartial.select(col(keyCol),
      (-col(cntCol)).as(cntCol))
    EpochIndex.eraseRewrite(spark, path, p =>
      p.unionByName(negated)
        .groupBy(col(keyCol)).agg(sum(col(cntCol)).as(cntCol))
        .filter(col(cntCol) =!= 0L)
        .withColumn(cntCol,
          when(col(cntCol) < 0L,
            raise_error(concat(
              lit(s"$op: negative $cntCol for "), col(keyCol).cast("string"),
              lit(" — a victim document was never ingested here (or was " +
                "ingested with different text); erase only documents " +
                "this store actually indexed"))).cast("long"))
          .otherwise(col(cntCol)))
        .select(col(keyCol), col(cntCol)))
  }

  /** Erase documents from a persisted gram-frequency index —
    * disk-level, by exact count subtraction ([[countSubtractErase]]):
    * after it returns the store equals [[gramFreqIndex]] over the
    * corpus WITHOUT the victims, and grams unique to the victims
    * survive in no retained version or epoch.
    *
    * @param victimDocs the victim documents (id + text — the RTBF
    *                   request payload; their gram partial must be
    *                   recomputable to be subtractable) */
  def gramFreqIndexErase(spark: org.apache.spark.sql.SparkSession,
                         path: String, victimDocs: DataFrame,
                         idCol: String, textCol: String,
                         n: Int = 8): EpochIndex.CompactionStats = {
    IndexMeta.check(spark, path, gramFreqIndexMeta(n))
    countSubtractErase(spark, path,
      gramFreqIndex(victimDocs, idCol, textCol, n),
      "gram_fp", "n_docs", "gramFreqIndexErase")
  }

  def incrementalDupGramFraction(batch: DataFrame, index: DataFrame,
                                 idCol: String, textCol: String,
                                 n: Int = 8): DataFrame = {
    require(!index.isEmpty,
      "incrementalDupGramFraction: corpus gram index is EMPTY — a " +
        "missing or mis-pathed persisted index must fail loudly, not " +
        "report seen_frac=0 for every batch document")
    batch.select(col(idCol).as("doc_id"),
        explode(shingles(col(textCol), n)).as("_ng"))
      .select(col("doc_id"), md5(col("_ng").cast("binary")).as("gram_fp"))
      .join(index.select(col("gram_fp"), lit(1).as("_hit")),
        Seq("gram_fp"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), count(col("_hit")).as("n_seen"))
      .withColumn("seen_frac",
        round(col("n_seen").cast("double") / col("n_grams"), 4))
  }
}
