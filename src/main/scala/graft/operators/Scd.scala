package graft.operators

import org.apache.spark.sql.DataFrame
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
}
