package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Sinks

/** Keyed upsert ("MERGE") — the reference's universal incremental sink.
  *
  * Re-expresses dbt's `materialized="incremental",
  * incremental_strategy="merge"` (reference:
  * dbt/stripe/models/curated/invoices.sql:1-7 and every other model
  * config; semantics README.md:110-129) as a pure DataFrame transform:
  * rows from `updates` win over rows from `target` with the same key;
  * keys only in either side pass through. When several update rows
  * share a key, the highest `versionCol` wins (ties broken by source
  * priority, which is already deterministic per key because keys are
  * unique within each side in the reference's contract).
  *
  * Physical shape: ONE hash-partition shuffle of target ∪ updates on
  * the key columns, then a per-partition window dedupe — the same cost
  * profile as a shuffle-hash MERGE in a warehouse. At 100 TB the win
  * comes from `mergeWrite`: the merged result is written with dynamic
  * partition overwrite so only date partitions that actually received
  * updates are rewritten; untouched partitions are never read or
  * written. Combined with a high-water-mark filter on the updates side
  * (see Incremental.highWaterMark) a daily run touches only recent
  * partitions regardless of total table size.
  *
  * Idempotency contract (README.md:93-129): merge(merge(t,u),u) ==
  * merge(t,u) — covered by MergeSpec property tests.
  */
object Merge {

  private val PRIO = "_graft_src_prio"
  private val RN   = "_graft_rn"

  /** Schema-drift policy for mergeInto — the reference's dbt
    * `on_schema_change` knob (incremental models). */
  sealed trait SchemaChange
  /** Updates are conformed to the target's schema: extra update
    * columns are dropped, missing ones error (dbt's default). */
  case object IgnoreSchemaChange extends SchemaChange
  /** Additive evolution: new update columns join the output schema
    * (null for pre-existing rows); update rows missing a target
    * column carry null (dbt `on_schema_change='append_new_columns'`,
    * the policy that lets a 100 TB mart grow a column without a
    * rebuild). */
  case object AppendNewColumns extends SchemaChange

  /** Upsert `updates` into `target` by `keys`.
    *
    * @param versionCol optional column ordering rows within a key;
    *                   highest wins (e.g. a `_loaded_at` timestamp).
    *                   Updates always beat target rows at equal version.
    */
  def mergeInto(target: DataFrame, updates: DataFrame, keys: Seq[String],
                versionCol: Option[String] = None,
                onSchemaChange: SchemaChange = IgnoreSchemaChange): DataFrame = {
    require(keys.nonEmpty, "merge requires at least one key column")
    val unioned = onSchemaChange match {
      case IgnoreSchemaChange =>
        val cols = target.columns.toSeq
        target.select(cols.map(col): _*).withColumn(PRIO, lit(0))
          .unionByName(updates.select(cols.map(col): _*).withColumn(PRIO, lit(1)))
      case AppendNewColumns =>
        target.withColumn(PRIO, lit(0))
          .unionByName(updates.withColumn(PRIO, lit(1)),
            allowMissingColumns = true)
    }
    val ordering: Seq[Column] =
      versionCol.map(v => Seq(col(v).desc_nulls_last, col(PRIO).desc))
        .getOrElse(Seq(col(PRIO).desc))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    unioned
      .withColumn(RN, row_number().over(w))
      .filter(col(RN) === 1)
      .drop(RN, PRIO)
  }

  /** Partition-pruned merge + persist: the O(delta) daily merge.
    *
    * 1. Collect the distinct partition values present in `updates`
    *    (a handful of dates — driver-side list, not data).
    * 2. Read ONLY those partitions of the target (directory pruning —
    *    untouched partitions are never opened).
    * 3. Merge the slice with the updates, write it to a staging dir
    *    (never read and overwrite the same path in one job), then
    *    commit with DYNAMIC partition overwrite — only the touched
    *    partition directories are replaced; everything else on disk is
    *    untouched bytes.
    *
    * Daily cost is therefore proportional to the updated partitions,
    * not the table: the property that keeps a 100 TB mart's daily run
    * constant-time. Rows are sorted within partitions by `clusterCols`
    * for parquet min/max data skipping (the reference's `cluster_by`,
    * invoice_line_items.sql:5-6).
    *
    * Precondition (same as any partitioned MERGE): a key's partition
    * value is stable — updates to a key arrive in the partition that
    * already holds it.
    */
  def mergeWrite(spark: org.apache.spark.sql.SparkSession, path: String,
                 updates: DataFrame, keys: Seq[String], partitionCol: String,
                 clusterCols: Seq[String] = Nil,
                 versionCol: Option[String] = None): Unit = {
    val touched = updates.select(col(partitionCol)).distinct()
      .collect().map(_.get(0)).toSeq
    if (touched.isEmpty) return
    // NULL is a legal partition value (__HIVE_DEFAULT_PARTITION__) but
    // isin() never matches it — without the explicit isNull branch the
    // target's null-partition rows would be excluded from the merge
    // and then dynamic-overwritten away: silent data loss.
    val nonNull = touched.filter(_ != null)
    val touchedPred = {
      val base = if (nonNull.nonEmpty) col(partitionCol).isin(nonNull: _*) else lit(false)
      if (touched.contains(null)) base || col(partitionCol).isNull else base
    }
    // Existence is probed explicitly (Hadoop FS — works on HDFS/S3 too);
    // a read failure on an EXISTING table must propagate, or the merge
    // would silently replace touched partitions with updates-only.
    val targetSlice =
      if (graft.sources.Fs.exists(spark, path)) {
        // Partition-directory names re-infer as the WRONG type for
        // string values that look numeric ('00123' → int 123, which
        // would rewrite into a different directory and duplicate every
        // key). Read them uninferred (strings), then cast to the
        // updates' declared type — deterministic for dates/ints,
        // identity for strings.
        val conf = "spark.sql.sources.partitionColumnTypeInference.enabled"
        val saved = spark.conf.get(conf)
        val raw =
          try { spark.conf.set(conf, "false"); spark.read.parquet(path) }
          finally spark.conf.set(conf, saved)
        raw.withColumn(partitionCol,
          col(partitionCol).cast(updates.schema(partitionCol).dataType))
          .filter(touchedPred)
      } else updates.limit(0)
    val merged = mergeInto(targetSlice, updates, keys, versionCol)
    // Unique staging dir (never read-and-overwrite one path in a job):
    // concurrent merges into the same target must not share a stage,
    // and the stage is deleted after the commit — a fixed leftover
    // sibling would double the touched partitions' storage forever.
    val stage = path + "_merge_stage_" + java.util.UUID.randomUUID().toString
    try {
      Sinks.stagePartitioned(merged, stage, partitionCol, clusterCols)
      spark.read.parquet(stage).write
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partitionCol)
        .parquet(path)
    } finally graft.sources.Fs.deleteRecursively(spark, stage)
  }

  /** One [[deleteWrite]] run's outcome: partitions rewritten (still
    * holding survivors), partition directories removed outright
    * (every row deleted), and partitions never touched. */
  final case class DeleteStats(rewritten: Seq[String], removed: Seq[String],
                               untouched: Long)

  /** Targeted key deletion over a partitioned table — the
    * right-to-be-forgotten primitive (GDPR/CCPA erasure, takedown
    * propagation): remove every row matching `deleteKeys` and rewrite
    * ONLY the partitions that held matches. The reference's answer is
    * a full rebuild; at 100 TB the difference is rewriting the 3 date
    * partitions a user touched versus the whole table.
    *
    * Shape: one columnar probe scan (key + partition columns only —
    * column pruning makes this cheap) finds the affected partitions;
    * those partitions re-read, anti-join the key set (broadcast — an
    * erasure batch is small; for bulk deletes run several batches),
    * and land via the staged dynamic overwrite [[mergeWrite]] uses.
    * Dynamic overwrite only replaces partitions PRESENT in the
    * written data, so a partition whose every row died would silently
    * SURVIVE — exactly the failure an erasure tool cannot have; those
    * directories are deleted explicitly (Hive-escaped names, NULL →
    * `__HIVE_DEFAULT_PARTITION__`), and the stats report them.
    *
    * Idempotent: re-running with the same keys finds no matches and
    * touches nothing.
    *
    * A zone map built over this table is STALE after the rewrite (the
    * rewritten partitions' file names changed — [[Layout.zoneMapRead]]
    * refuses on it); rebuild it in one call with
    * [[Layout.zoneMapRebuild]]. */
  def deleteWrite(spark: org.apache.spark.sql.SparkSession, path: String,
                  deleteKeys: DataFrame, keyCols: Seq[String],
                  partitionCol: String,
                  clusterCols: Seq[String] = Nil): DeleteStats = {
    require(keyCols.nonEmpty, "deleteWrite needs at least one key column")
    val keys = deleteKeys.select(keyCols.map(col): _*).distinct()
    val conf = "spark.sql.sources.partitionColumnTypeInference.enabled"
    val saved = spark.conf.get(conf)
    val target =
      try { spark.conf.set(conf, "false"); spark.read.parquet(path) }
      finally spark.conf.set(conf, saved)
    val touched = target
      .join(broadcast(keys), keyCols, "left_semi")
      .select(col(partitionCol)).distinct()
      .collect().map(r => Option(r.get(0)).map(_.toString).orNull).toSeq
    // partition census from the DIRECTORY LISTING, not a second table
    // scan — the same metadata the emptied-directory deletion below
    // relies on; the one probe scan above is the only data read
    val nParts = {
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(spark.sessionState.newHadoopConf())
        .listStatus(p).count(st => st.isDirectory &&
          st.getPath.getName.startsWith(s"$partitionCol="))
        .toLong
    }
    if (touched.isEmpty) return DeleteStats(Nil, Nil, nParts)
    val nonNull = touched.filter(_ != null)
    val touchedPred = {
      val base =
        if (nonNull.nonEmpty) col(partitionCol).isin(nonNull: _*)
        else lit(false)
      if (touched.contains(null)) base || col(partitionCol).isNull else base
    }
    val kept = target.filter(touchedPred)
      .join(broadcast(keys), keyCols, "left_anti")
    val keptParts = kept.select(col(partitionCol)).distinct()
      .collect().map(r => Option(r.get(0)).map(_.toString).orNull).toSet
    if (keptParts.nonEmpty) {
      val stage = path + "_delete_stage_" + java.util.UUID.randomUUID().toString
      try {
        Sinks.stagePartitioned(kept, stage, partitionCol, clusterCols)
        spark.read.parquet(stage).write
          .mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy(partitionCol)
          .parquet(path)
      } finally graft.sources.Fs.deleteRecursively(spark, stage)
    }
    // partitions whose every row died: dynamic overwrite never saw
    // them — remove their directories explicitly
    val emptied = touched.filterNot(keptParts)
    val hive = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    emptied.foreach { v =>
      val dirName =
        if (v == null) s"$partitionCol=__HIVE_DEFAULT_PARTITION__"
        else s"$partitionCol=${hive.escapePathName(v)}"
      graft.sources.Fs.deleteRecursively(spark, s"$path/$dirName")
    }
    def nsort(xs: Seq[String]) = xs.sortBy(Option(_).getOrElse(""))
    DeleteStats(nsort(touched.filter(keptParts)), nsort(emptied),
      nParts - touched.size)
  }
}

/** High-water-mark incremental pattern (reference: the
  * `is_incremental()` scalar-subquery filters, invoices.sql:11-13,
  * and the extraction-side probe extract_stripe_data.py:43-59).
  */
object Incremental {
  /** `SELECT MAX(col) FROM df` as a driver-side scalar; None on empty
    * input (the reference defaults the extraction HWM to 0). One job,
    * one row to the driver — not a collect() of data. */
  def highWaterMark(df: DataFrame, c: String): Option[Any] = {
    val r = df.agg(max(col(c)).as("hwm")).head()
    if (r.isNullAt(0)) None else Some(r.get(0))
  }

  /** Keep only rows strictly above the target's high-water mark —
    * the `WHERE x > (SELECT MAX(x) FROM {{this}})` pattern. On a
    * partition column this prunes file partitions at scan time. */
  def newerThan(updates: DataFrame, target: DataFrame, c: String): DataFrame =
    highWaterMark(target, c) match {
      case Some(hwm) => updates.filter(col(c) > lit(hwm))
      case None      => updates
    }
}
