package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** One maintenance entry point for every persisted index family —
  * the operational closure over the engine's log-structured stores.
  * Each family ships its own `*IndexCompact`, but a real deployment
  * runs maintenance from ONE scheduled job over a storage tree it
  * does not hand-enumerate; this discovers stores by their
  * `_GRAFT_META` manifests and dispatches each to its family's fold
  * (the manifest's `family` field is the dispatch key — the same
  * single-definition contract that makes probes refuse wrong
  * parameters now routes compaction).
  *
  * Failure posture: maintenance keeps going past a failing store
  * (one poisoned root must not starve every other index of
  * compaction) but FINISHES loudly — after the sweep, any failure or
  * unknown family raises with the full list. Silent skips are the
  * forbidden failure class; partial progress plus a thrown summary
  * is the operational compromise.
  *
  * Reference scope: the reference schedules one daily dbt build; a
  * 100 TB pipeline schedules THIS between ingest batches — the
  * probe-side scan of every store stays O(base + recent epochs)
  * instead of O(all epochs ever) ([[EpochIndex]]).
  */
object Maintenance {

  /** One store's maintenance outcome. `stats` is None when the store
    * held nothing to compact (fresh manifest, no partials) — counted
    * as skipped, not failed. */
  final case class StoreResult(root: String, family: String,
                               stats: Option[EpochIndex.CompactionStats],
                               error: Option[String]) {
    def failed: Boolean = error.isDefined
  }

  /** Compact ONE store, dispatching on its manifest's family. IVF /
    * IVF-PQ roots hold their epochs under `assignments`/`codes`
    * subdirectories — the family compactors know; this dispatcher
    * only needs the root the manifest sits at. */
  def compactStore(spark: SparkSession, root: String,
                   keepVersions: Int = 2): EpochIndex.CompactionStats = {
    val meta = IndexMeta.read(spark, root).getOrElse(sys.error(
      s"no _GRAFT_META manifest at $root — not a graft index store " +
        "(every index writer records one); refusing to guess a fold"))
    meta.family match {
      case "line_first_occ" =>
        Dedup.lineFirstOccIndexCompact(spark, root, keepVersions)
      case "boilerplate_counts" =>
        Dedup.boilerplateIndexCompact(spark, root, keepVersions)
      case "domain_cap_counts" =>
        Curation.capCountIndexCompact(spark, root, keepVersions)
      case "sample_sketch" =>
        SampleSketch.sampleSketchIndexCompact(spark, root, keepVersions)
      case "hll_registers" =>
        Cardinality.hllIndexCompact(spark, root, keepVersions)
      case "kmv_bottom_k" =>
        Cardinality.kmvIndexCompact(spark, root, keepVersions)
      case "graph_census" =>
        Centrality.triangleCensusCompact(spark, root, keepVersions)
      case "cms_counts" =>
        HeavyHitters.cmsIndexCompact(spark, root, keepVersions)
      case "table_digest" =>
        Audit.digestIndexCompact(spark, root, keepVersions)
      case "interval_islands" =>
        IntervalExpand.islandsIndexCompact(spark, root, keepVersions)
      case "dsir_buckets" =>
        Splits.dsirIndexCompact(spark, root, keepVersions)
      case "gram_freq" =>
        Dedup.gramFreqIndexCompact(spark, root, keepVersions)
      case "lm_bigram" =>
        LmFilter.lmIndexCompact(spark, root, keepVersions)
      case "bm25_postings" =>
        Relevance.bm25IndexCompact(spark, root, keepVersions)
      case "ivf" =>
        Similarity.ivfIndexCompact(spark, root, keepVersions)
      case "ivf_pq" =>
        Similarity.ivfPqIndexCompact(spark, root, keepVersions)
      case "cert_pairs" =>
        Dedup.certLedgerCompact(spark, root, keepVersions)
      case "cert_text" =>
        Dedup.certTextIndexCompact(spark, root, keepVersions)
      case "cert_vec" =>
        Dedup.certVecIndexCompact(spark, root, keepVersions)
      case "cc_labels" =>
        Dedup.ccLabelsCompact(spark, root, keepVersions)
      case "quality_cuts" =>
        // versioned calibration snapshot, not an epoch-additive store:
        // each freeze IS a compacted base (publishVersion retention
        // GCs superseded versions) — the typed skip compactAll counts
        // as benign
        throw new NothingToCompact(s"nothing to compact at $root: " +
          "quality_cuts is a versioned calibration snapshot with no " +
          "epoch partials; retention is publishVersion's keepVersions " +
          "at freeze time")
      case f if f.endsWith("_bands") =>
        // banding families (minhash/simhash/srp/hamming64) share the
        // identity fold — disjoint rows, compaction bounds file count
        Dedup.bandIndexStoreCompact(spark, root, keepVersions)
      case other => sys.error(
        s"unknown index family '$other' at $root — a store this engine " +
          "did not write, or a family added without a Maintenance " +
          "dispatch arm; add the arm rather than skipping the store")
    }
  }

  /** One epoch subroot's operational state: what a scheduled job or
    * an operator reads BEFORE deciding to compact — live epoch count
    * climbing means probes are re-aggregating more partials
    * (compaction due); `uncommitted` nonEmpty means a torn append
    * needs its writer re-run or the directory removed; the retained
    * versions are the [[EpochIndex.readAsOf]] time-travel window. */
  final case class EpochStoreState(subdir: String, liveEpochs: Seq[String],
                                   uncommitted: Seq[String],
                                   retainedVersions: Seq[String],
                                   currentVersion: Option[String])

  /** One discovered store: manifest identity plus per-subroot state.
    * `erasures` is the per-subroot `_ERASURES` history (oldest first,
    * subroot-prefixed when the family has several) — the operational
    * view of the right-to-be-forgotten rewrites this store has
    * absorbed, the same record `Audit.cardFromStores` cites. */
  final case class StoreInfo(root: String, family: String,
                             params: Map[String, String],
                             states: Seq[EpochStoreState],
                             erasures: Seq[String] = Nil)

  /** Where each family keeps its epoch data relative to the manifest
    * root — the same knowledge the compaction dispatch encodes. */
  private def epochSubroots(family: String): Seq[(String, Seq[String])] =
    family match {
      case "bm25_postings" => Seq("postings" -> Nil, "stats" -> Nil)
      case "graph_census" => Seq("edges" -> Nil, "census" -> Nil)
      case "ivf" => Seq("assignments" -> Seq("cell"))
      case "ivf_pq" => Seq("assignments" -> Seq("cell"), "codes" -> Seq("cell"))
      case "cert_text" => Seq("fps" -> Seq("ib"), "postings" -> Seq("pb"),
        "stats" -> Seq("pb"))
      case "cert_vec" => Seq("bands" -> Seq("b0", "b1"), "stats" -> Nil)
      case f if f.endsWith("_bands") => Seq("" -> Seq("bb"))
      case _ => Seq("" -> Nil)
    }

  /** Read-only sweep: the operational state of every store under
    * `treeRoot` — live/uncommitted epochs and the retained base
    * versions per subroot. The observability half of [[compactAll]]:
    * run it first, compact what the numbers say needs it, and surface
    * torn appends without touching any data. */
  def describeStores(spark: SparkSession, treeRoot: String,
                     maxDepth: Int = 4): Seq[StoreInfo] =
    discoverStores(spark, treeRoot, maxDepth).map { root =>
      val meta = IndexMeta.read(spark, root).getOrElse(
        sys.error(s"manifest vanished under sweep at $root"))
      val states = epochSubroots(meta.family).flatMap { case (sub, inner) =>
        val p = if (sub.isEmpty) root else s"$root/$sub"
        val fs = new Path(p)
          .getFileSystem(spark.sessionState.newHadoopConf())
        if (!fs.exists(new Path(p))) None
        else {
          val (retained, current) = EpochIndex.versions(spark, p)
          Some(EpochStoreState(sub,
            EpochIndex.committedEpochNames(spark, p, inner),
            EpochIndex.uncommittedEpochNames(spark, p, inner),
            retained, current))
        }
      }
      val erasures = epochSubroots(meta.family).flatMap { case (sub, _) =>
        val p = if (sub.isEmpty) root else s"$root/$sub"
        EpochIndex.erasures(spark, p)
          .map(v => if (sub.isEmpty) v else s"$sub:$v")
      }
      StoreInfo(root, meta.family, meta.params, states, erasures)
    }

  /** Discover every store under `treeRoot` (a directory whose
    * descendants hold `_GRAFT_META` manifests, up to `maxDepth`
    * levels down) and compact each. Descent stops at a manifest: a
    * store's INTERNALS (epoch partitions, `_base` versions, IVF
    * `assignments`/`codes` subdirs) are the family compactor's
    * business, never independently discovered stores. */
  def discoverStores(spark: SparkSession, treeRoot: String,
                     maxDepth: Int = 4): Seq[String] = {
    val p = new Path(treeRoot)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return Nil
    def walk(dir: Path, depth: Int): Seq[String] =
      if (fs.exists(new Path(dir, IndexMeta.FileName))) Seq(dir.toString)
      else if (depth == 0) Nil
      else fs.listStatus(dir).toSeq.filter(_.isDirectory)
        .filterNot(st => st.getPath.getName.startsWith("_") ||
          st.getPath.getName.startsWith("."))
        .flatMap(st => walk(st.getPath, depth - 1))
    walk(p, maxDepth).sorted
  }

  /** Sweep: compact every discovered store; return per-store results
    * and THROW a summary if any failed (after the rest compacted).
    * Stores with nothing to compact are reported, not failed. */
  def compactAll(spark: SparkSession, treeRoot: String,
                 keepVersions: Int = 2,
                 maxDepth: Int = 4): Seq[StoreResult] = {
    val results = discoverStores(spark, treeRoot, maxDepth).map { root =>
      val family = IndexMeta.read(spark, root).map(_.family).getOrElse("?")
      try StoreResult(root, family,
        Some(compactStore(spark, root, keepVersions)), None)
      catch {
        case _: NothingToCompact =>
          StoreResult(root, family, None, None) // fresh store: skip, not fail
        case scala.util.control.NonFatal(e) =>
          StoreResult(root, family, None, Some(e.getMessage))
      }
    }
    val failed = results.filter(_.failed)
    if (failed.nonEmpty) sys.error(
      s"maintenance sweep over $treeRoot: ${failed.size} of " +
        s"${results.size} stores FAILED — " +
        failed.map(r => s"${r.root} (${r.family}): ${r.error.get}")
          .mkString("; "))
    results
  }

  // ------------------------------------------------- erasure audit

  /** One surviving victim reference found by [[erasureAudit]]: the
    * store, the schema group of files it was read from, the id
    * column it appeared in (`column` is the partition-directory
    * column when the reference lives in a path segment, see
    * [[erasureAudit]]), and how many rows carry it. */
  final case class ErasureHit(root: String, subroot: String,
                              column: String, nRows: Long)

  /** An id-NAMED column the sweep could NOT verify — surfaced so the
    * RTBF certificate names its blind spots instead of silently
    * narrowing. Two shapes today: an id-named column whose type is
    * not integral (a string or hashed id — `isin` over victim longs
    * would be vacuous, so the sweep refuses to pretend), and a
    * partition-directory value that does not parse as a long. A
    * store surfacing here needs either integral ids (the
    * `xxhash64`-keying recipe the ingest sinks' refusals print) or a
    * store-specific audit the caller runs itself. */
  final case class UnverifiedIdColumn(root: String, subroot: String,
                                      column: String, dataType: String)

  /** Everything one [[erasureAudit]] sweep learned: surviving victim
    * references, the id-named columns it could NOT verify, and how
    * many of the tree's parquet files the footer-stats pruning let it
    * skip (`filesScanned` ≤ `filesTotal`; both count every parquet
    * file of every discovered store, retained versions and torn
    * epochs included). The certificate an RTBF pipeline records is
    * this whole object — "0 hits over N files (M read), 0
    * unverifiable columns", not a bare boolean. */
  final case class ErasureAuditReport(hits: Seq[ErasureHit],
                                      unverified: Seq[UnverifiedIdColumn],
                                      filesTotal: Long,
                                      filesScanned: Long) {
    def clean: Boolean = hits.isEmpty
  }

  /** Id-bearing columns the audit scans when present — the engine's
    * store schemas' id vocabulary. A store whose schema carries none
    * of these (count stores keyed by fingerprints, calibration
    * tables) is skipped: it holds no per-document identifiers. */
  val ErasureAuditIdCols: Seq[String] = Seq(
    "id", "doc_id", "vec_id", "id_a", "id_b", "corpus_id", "keep_id",
    "cluster_id", "bench_id", "node", "src", "dst")

  /** Directories where [[discoverStores]]' bounded descent ran out:
    * no `_GRAFT_META` manifest by `maxDepth` levels down, but
    * subdirectories still below — a store any deeper would be
    * invisible to every sweep that starts from this discovery.
    * [[compactAll]] and [[describeStores]] simply leave such trees
    * untouched (maintenance of what was found is still correct);
    * [[erasureAudit]] REFUSES when this is nonempty, because a
    * completeness certificate over a partially-explored tree would
    * be a lie. */
  def unexploredDirs(spark: SparkSession, treeRoot: String,
                     maxDepth: Int = 4): Seq[String] = {
    val p = new Path(treeRoot)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return Nil
    def walk(dir: Path, depth: Int): Seq[String] =
      if (fs.exists(new Path(dir, IndexMeta.FileName))) Nil
      else {
        val subs = fs.listStatus(dir).toSeq.filter(_.isDirectory)
          .filterNot(st => st.getPath.getName.startsWith("_") ||
            st.getPath.getName.startsWith("."))
        if (depth == 0) { if (subs.nonEmpty) Seq(dir.toString) else Nil }
        else subs.flatMap(st => walk(st.getPath, depth - 1))
      }
    walk(p, maxDepth).sorted
  }

  /** Right-to-be-forgotten VERIFICATION sweep — the operational
    * closure after the erasers run: walk EVERY parquet file under
    * every discovered store (including `_base` version trees and
    * torn epoch directories Spark readers skip — exactly where a
    * stale copy of an erased row would hide) and report every row
    * that still carries a victim id in any known id column. A clean
    * report = the request is certifiably complete across the store
    * tree, WITH its limits stated: the report also lists every
    * id-named column the sweep could not check (non-integral types,
    * unparseable partition values) — disclosure, never a silent
    * skip. The disk-walk contract `EraseSpec` pins per family,
    * productized as the single call an auditor runs.
    *
    * Completeness guards, each loud:
    *  - store DISCOVERY is bounded by `maxDepth`; if the walk bottoms
    *    out with unexplored directories below ([[unexploredDirs]])
    *    the audit refuses outright rather than certify a subtree;
    *  - id values encoded in partition DIRECTORY names never appear
    *    in an explicit-file parquet read, so the sweep audits them
    *    from the path segments themselves (`col=value`), counting the
    *    files' footer row counts as the surviving rows; a partition
    *    value that does not parse as a long is reported unverified;
    *  - an id-NAMED column of non-integral type (string/hashed ids)
    *    is reported in `unverified`, with the integral-keying recipe
    *    in the case class doc;
    *  - each (store, subroot) file group is read with `mergeSchema`,
    *    so an id column added in a later epoch is audited across ALL
    *    the group's files, not just the schema-sample's.
    *
    * Cost model: one parquet-FOOTER read per file (metadata-scale,
    * same order as the directory listing itself) plus a distributed
    * scan of only the files whose footer min/max over some audited
    * id column can contain a victim — on a store tree where erasure
    * already ran, typically a small fraction of the bytes (the
    * report's `filesTotal`/`filesScanned` states the ratio). Only
    * the id columns are projected from the scanned files
    * (column-pruned at the parquet footer). Files are enumerated
    * from the LISTING, not the store's own read path, so
    * torn/retained/stale data cannot hide behind a `_CURRENT`
    * pointer. `footerPrune = false` forces the full-bytes scan — the
    * comparison surface the pruning's own tests use.
    *
    * Caveat an auditor must know: this proves no ROW carries a
    * victim ID. Derived state without ids (count deltas, digest
    * residues, calibration thresholds) is covered by the family
    * erasers' own contracts (subtract-exactness, re-freeze), not by
    * this scan — the audit is the id-level half of the proof. */
  def erasureAudit(spark: SparkSession, treeRoot: String,
                   victimIds: Seq[Long],
                   idCols: Seq[String] = ErasureAuditIdCols,
                   maxDepth: Int = 4,
                   footerPrune: Boolean = true): ErasureAuditReport = {
    import org.apache.spark.sql.functions.{col, count, lit, when}
    import scala.jdk.CollectionConverters._
    require(victimIds.nonEmpty, "erasureAudit needs at least one victim id")
    val victimSet = victimIds.toSet
    val conf = spark.sessionState.newHadoopConf()
    val truncated = unexploredDirs(spark, treeRoot, maxDepth)
    require(truncated.isEmpty,
      s"erasureAudit at $treeRoot: store discovery bottomed out at " +
        s"maxDepth=$maxDepth with unexplored directories below — a store " +
        "any deeper would silently fall outside the certificate. Raise " +
        "maxDepth past the tree's store depth. Unexplored: " +
        truncated.mkString(", "))
    def files(dir: Path): Seq[Path] = {
      val fs = dir.getFileSystem(conf)
      fs.listStatus(dir).toSeq.flatMap { st =>
        if (st.isDirectory) files(st.getPath)
        else if (st.getPath.getName.endsWith(".parquet")) Seq(st.getPath)
        else Nil
      }
    }
    // per-file footer facts: row count + per-column row-group ranges.
    // None = stats unusable (must scan); absent key = column not in
    // this file (reads as null under mergeSchema — nothing to find)
    case class Footer(nRows: Long,
                      ranges: Map[String, Option[Seq[(Long, Long)]]])
    def readFooter(f: Path): Footer = {
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
      try {
        val blocks = reader.getFooter.getBlocks.asScala.toSeq
        val nRows = blocks.map(_.getRowCount).sum
        val names = blocks.headOption.toSeq.flatMap(_.getColumns.asScala
          .map(_.getPath.toDotString)).filter(idCols.contains)
        val ranges = names.map { c =>
          val perChunk = blocks.map { b =>
            val cc = b.getColumns.asScala
              .find(_.getPath.toDotString == c).get
            val integral = cc.getPrimitiveType.getPrimitiveTypeName match {
              case org.apache.parquet.schema.PrimitiveType
                .PrimitiveTypeName.INT32 |
                org.apache.parquet.schema.PrimitiveType
                .PrimitiveTypeName.INT64 => true
              case _ => false
            }
            val st = cc.getStatistics
            if (!integral || st == null) None // no usable stats: scan
            else if (st.hasNonNullValue)
              Some(Seq((st.genericGetMin.asInstanceOf[Number].longValue,
                st.genericGetMax.asInstanceOf[Number].longValue)))
            else if (st.isNumNullsSet && st.getNumNulls == cc.getValueCount)
              Some(Nil) // all-null chunk: contributes no id values
            else None
          }
          c -> (if (perChunk.contains(None)) None
                else Some(perChunk.flatten.flatten))
        }.toMap
        Footer(nRows, ranges)
      } finally reader.close()
    }
    def mayHoldVictim(ft: Footer, c: String): Boolean =
      ft.ranges.get(c) match {
        case None => false // column absent from this file
        case Some(None) => true // no usable stats — must scan
        case Some(Some(rs)) =>
          rs.exists { case (lo, hi) =>
            victimIds.exists(v => v >= lo && v <= hi) }
      }
    val hits = scala.collection.mutable.ListBuffer.empty[ErasureHit]
    val unverified =
      scala.collection.mutable.LinkedHashSet.empty[UnverifiedIdColumn]
    var filesTotal = 0L
    var filesScanned = 0L
    discoverStores(spark, treeRoot, maxDepth).foreach { root =>
      val rootPath = new Path(root)
      // schema group = path segments below the store root before the
      // first partition (`c=v`) or version (`_base`) component: one
      // family writer per subroot, so each group reads as one schema
      def subrootOf(f: Path): String = {
        val rel = f.toString.stripPrefix(rootPath.toString).stripPrefix("/")
        rel.split('/').dropRight(1)
          .takeWhile(s => !s.contains("=") && s != "_base")
          .mkString("/")
      }
      def partSegs(f: Path): Seq[(String, String)] = {
        val rel = f.toString.stripPrefix(rootPath.toString).stripPrefix("/")
        rel.split('/').dropRight(1).toSeq.filter(_.contains("="))
          .map { s =>
            val i = s.indexOf('=')
            (s.substring(0, i), s.substring(i + 1))
          }
      }
      files(rootPath).groupBy(subrootOf).toSeq.sortBy(_._1)
        .foreach { case (sub, fs) =>
          filesTotal += fs.size
          val footers = fs.map(f => f -> readFooter(f)).toMap
          // ---- partition-directory audit: values an explicit-file
          // read never materializes live in the path itself
          val partHits = scala.collection.mutable.Map.empty[String, Long]
          fs.foreach { f =>
            partSegs(f).filter(kv => idCols.contains(kv._1))
              .foreach { case (k, raw) =>
                if (raw == "__HIVE_DEFAULT_PARTITION__") ()
                else scala.util.Try(raw.toLong).toOption match {
                  case Some(v) =>
                    if (victimSet(v))
                      partHits(k) = partHits.getOrElse(k, 0L) +
                        footers(f).nRows
                  case None =>
                    unverified += UnverifiedIdColumn(root, sub, k,
                      "partition-dir(non-long values)")
                }
              }
          }
          partHits.toSeq.sortBy(_._1).foreach { case (k, n) =>
            if (n > 0) hits += ErasureHit(root, sub, k, n)
          }
          // ---- in-file audit over the group's MERGED schema
          val df = spark.read.option("mergeSchema", "true")
            .parquet(fs.map(_.toString): _*)
          val (present, nonIntegral) = idCols
            .flatMap(c => df.schema.fields.find(_.name == c))
            .partition(f => Seq("byte", "short", "int", "bigint")
              .contains(f.dataType.simpleString))
          nonIntegral.foreach(f => unverified +=
            UnverifiedIdColumn(root, sub, f.name, f.dataType.simpleString))
          if (present.nonEmpty) {
            val scanFs =
              if (footerPrune)
                fs.filter(f => present.exists(p =>
                  mayHoldVictim(footers(f), p.name)))
              else fs
            filesScanned += scanFs.size
            if (scanFs.nonEmpty) {
              val scanDf = spark.read.option("mergeSchema", "true")
                .parquet(scanFs.map(_.toString): _*)
              // a present column can vanish from the scan subset's
              // schema when every file carrying it was pruned — its
              // surviving rows are then provably victim-free
              val cols = present.map(_.name)
                .filter(c => scanDf.schema.fieldNames.contains(c))
              if (cols.nonEmpty) {
                val aggs = cols.map(c => count(when(
                  col(c).isin(victimIds.map(Long.box): _*), lit(1))).as(c))
                val row = scanDf.agg(aggs.head, aggs.tail: _*).head()
                cols.zipWithIndex.collect {
                  case (c, i) if row.getLong(i) > 0 =>
                    hits += ErasureHit(root, sub, c, row.getLong(i))
                }
              }
            }
          }
        }
    }
    ErasureAuditReport(hits.toList, unverified.toList,
      filesTotal, filesScanned)
  }

  /** [[erasureAudit]] that REFUSES on any surviving reference — the
    * form an automated RTBF pipeline calls between "erasers ran" and
    * "request closed". Returns the full report so the caller can
    * RECORD the certificate: files walked vs read, and every
    * id-named column the sweep could not verify (the refusal message
    * names them too — an incomplete-erasure failure should state its
    * blind spots alongside its hits). A nonempty `unverified` does
    * NOT fail the call: those columns are disclosed, and closing
    * them needs either integral keying at ingest or a caller-side
    * audit — see [[UnverifiedIdColumn]]. */
  def requireErased(spark: SparkSession, treeRoot: String,
                    victimIds: Seq[Long],
                    idCols: Seq[String] = ErasureAuditIdCols,
                    maxDepth: Int = 4): ErasureAuditReport = {
    val report = erasureAudit(spark, treeRoot, victimIds, idCols, maxDepth)
    val blind = if (report.unverified.isEmpty) ""
      else report.unverified.map(u => s"${u.root}${if (u.subroot.isEmpty) ""
        else "/" + u.subroot}.${u.column} (${u.dataType})")
        .mkString("; additionally NOT VERIFIABLE (non-integral ids): ",
          "; ", "")
    require(report.hits.isEmpty,
      s"erasure INCOMPLETE under $treeRoot: " +
        report.hits.map(h => s"${h.root}${if (h.subroot.isEmpty) ""
          else "/" + h.subroot}.${h.column} still holds ${h.nRows} " +
          "victim row(s)").mkString("; ") +
        " — a family eraser was skipped, or ran before a torn epoch " +
        "was repaired; re-run the missing erasers and audit again" + blind)
    report
  }
}
