package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 history construction — the
  * warehouse-native versioned-dimension pattern (dbt's `snapshot`
  * materialization is the reference-ecosystem analog; the reference
  * itself rebuilds dims in full, so this is beyond-reference
  * completeness for users who need attribute history).
  *
  * Input is a change log: one row per observed state of an entity,
  * ordered by an event time plus an explicit same-timestamp tiebreak
  * column. Output is one row per VERSION — consecutive observations
  * with identical tracked attributes collapse into a single validity
  * interval [valid_from, valid_to), with valid_to = NULL marking the
  * current version.
  *
  * Plan shape at scale: a single shuffle on the entity key serves
  * both window passes (run-start detection and the lead() that closes
  * intervals) — the filter between them preserves partitioning and
  * sort order, so Catalyst plans exactly one exchange. Window
  * partitions are per-entity (bounded by an entity's change count),
  * never table-sized.
  */
object Scd {

  /** Collapse a change log into SCD2 version intervals.
    *
    * @param changes  change log, one row per observation
    * @param keyCols  entity natural key
    * @param tsCol    observation time (any orderable type)
    * @param seqCol   deterministic tiebreak for equal timestamps
    *                 (e.g. a source sequence number or record id)
    * @param attrCols tracked attributes: a new version starts whenever
    *                 any of them changes (null-safe comparison — a
    *                 NULL attribute value is a real state, and
    *                 NULL → NULL is "unchanged")
    * @return keyCols ++ attrCols ++ (valid_from, valid_to, is_current)
    */
  def scd2FromChangeLog(changes: DataFrame, keyCols: Seq[String], tsCol: String,
                        seqCol: String, attrCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(seqCol))
    val attrs = struct(attrCols.map(col): _*)
    // run starts: first observation per key, or any attribute change
    // (<=> makes the comparison null-safe in both positions)
    val starts = changes
      .withColumn("_unchanged", lag(attrs, 1).over(w) <=> attrs)
      .filter(!col("_unchanged"))
    starts.select(
      (keyCols ++ attrCols).map(col) :+
        col(tsCol).as("valid_from") :+
        lead(col(tsCol), 1).over(w).as("valid_to"): _*)
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Incrementally maintain an SCD2 history from a
    * [[Diff.cdcDelta]] changefeed — the standard warehouse pattern:
    * nightly snapshots diff into (op, key, payload) rows, and the
    * history table absorbs them WITHOUT re-deriving itself from the
    * full change log. Per delta row at effective time `ts`:
    *
    *  - `upsert`: the key's current version (if any) closes at `ts`,
    *    and a new open version `[ts, null)` with the new payload
    *    opens;
    *  - `delete`: the key's current version closes at `ts` — and,
    *    unlike [[scd2FromChangeLog]] (which cannot see
    *    disappearances, only observations), the key ends with NO
    *    current row. This is the capability the delta adds.
    *
    * Contract: `ts` is strictly later than every touched key's
    * `valid_from` (snapshots are monotone), and the delta is the
    * exactly-once diff of two snapshots — [[Diff.cdcDelta]]
    * guarantees both one row per changed key and upserts that
    * really changed, so no zero-length or duplicate versions arise.
    *
    * Scale shape: closed/untouched rows split with one semi + one
    * anti join of the CURRENT rows against the delta keys (the
    * history's closed majority passes through without a join);
    * opened versions are a projection of the delta. No window, no
    * full-history rewrite beyond the union-out — at 100 TB the
    * history lands partitioned by key and the delta touches only
    * matching partitions.
    *
    * @param history keyCols ++ attrCols ++ (valid_from, valid_to,
    *                is_current) — [[scd2FromChangeLog]]'s shape
    * @param delta   (keyCols…, op, attrCols…) from [[Diff.cdcDelta]]
    * @param ts      the new snapshot's effective time
    */
  def scd2ApplyCdc(history: DataFrame, delta: DataFrame,
                   keyCols: Seq[String], attrCols: Seq[String],
                   ts: Column): DataFrame = {
    val toT = ts.cast(history.schema("valid_to").dataType)
    val fromT = ts.cast(history.schema("valid_from").dataType)
    val dKeys = delta.select(keyCols.map(col): _*)
    val current = history.filter(col("is_current"))
    val past = history.filter(!col("is_current"))
    val closed = current.join(dKeys, keyCols, "left_semi")
      .withColumn("valid_to", toT)
      .withColumn("is_current", lit(false))
    val untouched = current.join(dKeys, keyCols, "left_anti")
    val opened = delta.filter(col("op") === "upsert")
      .select((keyCols ++ attrCols).map(col): _*)
      .withColumn("valid_from", fromT)
      .withColumn("valid_to", lit(null).cast(history.schema("valid_to").dataType))
      .withColumn("is_current", lit(true))
      .select(history.columns.map(col).toIndexedSeq: _*)
    past.unionByName(untouched).unionByName(closed).unionByName(opened)
  }
}
