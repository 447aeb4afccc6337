package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot differencing — the change-data-capture primitive of a
  * pipeline that re-lands full extracts: given yesterday's and
  * today's snapshot of a keyed table, name every key that was added,
  * removed or changed (and WHICH columns changed). The reference's
  * daily loop overwrite-lands each table and recomputes everything
  * downstream (reference: extract_stripe_data.py:143); diffing the
  * snapshots is what lets incremental consumers ([[Merge.mergeInto]],
  * the SCD2 builder in [[Scd]]) process only the delta — at 100 TB,
  * the difference between a full rebuild and touching 0.1% of rows.
  *
  * Plan shape at scale: ONE full-outer sort-merge join on the key —
  * both snapshots shuffle exactly once, co-partitioned by key, and
  * every per-column comparison happens inside the join's codegen'd
  * projection (null-safe `<=>`, so NULL→value and value→NULL edits
  * count as changes). Nothing is collected, no window, no second
  * pass. AQE splits skewed keys as usual. When only the CHANGED-KEY
  * SET is needed, [[snapshotDiffKeys]] shuffles (key, fingerprint)
  * pairs instead of full rows — the narrow-shuffle fast path for
  * wide tables (the fingerprint is xxhash64 over the compared
  * columns, computed scan-side).
  *
  * Keys must be unique per snapshot (a snapshot IS a keyed state);
  * rows with NULL keys never match in an outer join and would
  * surface as simultaneous add+remove, so they are rejected loudly
  * rather than silently mis-diffed.
  */
object Diff {

  /** Full keyed diff of two snapshots.
    *
    * @param compareCols columns to compare (default: every non-key
    *                    column of `newSnap`; both snapshots must
    *                    carry them)
    * @param includeUnchanged emit `unchanged` rows too (default
    *                    false — a diff is the delta)
    * @return (keyCols…, change, changed_cols): `change` ∈
    *         added | removed | changed (| unchanged); `changed_cols`
    *         is the comma-joined changed column names in
    *         `compareCols` order, '' for added/removed rows
    */
  /** Shared core: the one full-outer join plus the change
    * classification both surfaces read from. Returns the joined frame
    * (keys + `_old_*`/`_new_*` payloads + presence markers) with
    * `change` and `changed_cols` attached. */
  private def diffCore(oldSnap: DataFrame, newSnap: DataFrame,
                       keyCols: Seq[String],
                       cmp: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "snapshot diff needs at least one key column")
    // internal marker/output names must not collide with user columns:
    // a payload named 'present' would duplicate `_old_present`, a key
    // named 'change' would be silently overwritten by the verdict
    val reserved = Seq("change", "changed_cols", "present")
    val clash = (keyCols ++ cmp).filter(c =>
      reserved.contains(c) || c.startsWith("_old_") || c.startsWith("_new_"))
    require(clash.isEmpty,
      s"snapshotDiff: column names ${clash.mkString(", ")} collide with " +
        "the diff's internal/output names (change, changed_cols, " +
        "present, _old_*, _new_*) — rename them first")
    val missing = (keyCols ++ cmp).filterNot(newSnap.columns.contains) ++
      (keyCols ++ cmp).filterNot(oldSnap.columns.contains)
    require(missing.isEmpty,
      s"snapshotDiff: columns ${missing.distinct.mkString(", ")} absent " +
        "from one snapshot — diff the shared keyed schema")
    def side(df: DataFrame, tag: String) = df.select(
      keyCols.map(col) ++ cmp.map(c => col(c).as(s"_${tag}_$c")) :+
        lit(true).as(s"_${tag}_present"): _*)
    val keyNotNull = keyCols.map(col(_).isNotNull).reduce(_ && _)
    // NULL keys refuse loudly at execution — scan-side, before the
    // join, and inside a FILTER so column pruning can't drop the check
    def guarded(df: DataFrame, which: String) = df.filter(
      assert_true(keyNotNull, lit(
        s"snapshotDiff: NULL key in the $which snapshot — NULL keys " +
          "cannot be matched across snapshots (they would surface as " +
          "a simultaneous add+remove); filter or key them first")).isNull)
    val joined = guarded(side(oldSnap, "old"), "old")
      .join(guarded(side(newSnap, "new"), "new"), keyCols, "full_outer")
    val changedList = concat_ws(",", cmp.map(c =>
      when(!(col(s"_old_$c") <=> col(s"_new_$c")), lit(c))): _*)
    val change = when(col("_old_present").isNull, lit("added"))
      .when(col("_new_present").isNull, lit("removed"))
      .when(changedList =!= "", lit("changed"))
      .otherwise(lit("unchanged"))
    joined.withColumn("change", change)
      .withColumn("changed_cols",
        when(col("_old_present").isNotNull && col("_new_present").isNotNull,
          changedList).otherwise(lit("")))
  }

  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   keyCols: Seq[String],
                   compareCols: Seq[String] = Nil,
                   includeUnchanged: Boolean = false): DataFrame = {
    val cmp =
      if (compareCols.nonEmpty) compareCols
      else newSnap.columns.filterNot(keyCols.contains).toSeq
    val out = diffCore(oldSnap, newSnap, keyCols, cmp)
      .select(keyCols.map(col) :+ col("change") :+ col("changed_cols"): _*)
    if (includeUnchanged) out else out.filter(col("change") =!= "unchanged")
  }

  /** The snapshot diff as an APPLYABLE changefeed: one `upsert` row
    * per added-or-changed key carrying the NEW payload, one `delete`
    * row per removed key (payload NULL) — the delta a downstream
    * incremental consumer replays instead of re-reading the snapshot.
    * Same single full-outer join as [[snapshotDiff]]; unchanged rows
    * never leave the join.
    *
    * @return (keyCols…, op, payloadCols…) with op ∈ upsert | delete
    */
  def cdcDelta(oldSnap: DataFrame, newSnap: DataFrame,
               keyCols: Seq[String]): DataFrame = {
    val payload = newSnap.columns.filterNot(keyCols.contains).toSeq
    diffCore(oldSnap, newSnap, keyCols, payload)
      .filter(col("change") =!= "unchanged")
      .select((keyCols.map(col) :+
        when(col("change") === "removed", lit("delete"))
          .otherwise(lit("upsert")).as("op")) ++
        payload.map(c => col(s"_new_$c").as(c)): _*)
  }

  /** Apply a [[cdcDelta]] changefeed to a base snapshot:
    * `base ⊖ delta-keys ∪ upsert-payloads`. One anti join (narrow:
    * only delta keys broadcast/shuffle against the base) plus a
    * union — cost O(base-scan + delta), never a re-land of the new
    * snapshot. The contract, pinned by q154's oracle:
    * `cdcApply(old, cdcDelta(old, new)) ≡ new` — unchanged rows ride
    * through untouched from the base. */
  def cdcApply(base: DataFrame, delta: DataFrame,
               keyCols: Seq[String]): DataFrame = {
    val payload = base.columns.filterNot(keyCols.contains).toSeq
    val kept = base.join(delta.select(keyCols.map(col): _*),
      keyCols, "left_anti")
    kept.unionByName(
      delta.filter(col("op") === "upsert")
        .select(keyCols.map(col) ++ payload.map(col): _*)
        .select(base.columns.map(col).toIndexedSeq: _*))
  }

  /** Narrow-shuffle change detection for wide tables: compare
    * xxhash64 fingerprints of the compared columns instead of the
    * columns themselves — the shuffle carries (key, 8 bytes) however
    * wide the row. Cannot name WHICH column changed (`changed` only);
    * join the changed keys back against the snapshots when the
    * per-column detail is needed — two narrow passes still beat one
    * wide one when rows are kilobytes and deltas are rare.
    *
    * Fingerprint note: xxhash64 collisions (~2⁻⁶⁴ per changed row)
    * would mask a change; for audit-grade diffs use [[snapshotDiff]].
    * NULLs are disambiguated per column (a literal marker hashed
    * alongside each value), so value→NULL edits always change the
    * fingerprint. */
  def snapshotDiffKeys(oldSnap: DataFrame, newSnap: DataFrame,
                       keyCols: Seq[String],
                       compareCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "snapshotDiffKeys needs at least one key column")
    val cmp =
      if (compareCols.nonEmpty) compareCols
      else newSnap.columns.filterNot(keyCols.contains).toSeq
    // hash(col, isnull(col)) per column, folded left-to-right: the
    // null marker keeps NULL indistinguishable only from itself
    val keyNotNull = keyCols.map(col(_).isNotNull).reduce(_ && _)
    def fp(df: DataFrame, tag: String) = df
      // same loud NULL-key refusal as the full diff (a NULL key would
      // silently surface as simultaneous add+remove)
      .filter(assert_true(keyNotNull, lit(
        s"snapshotDiffKeys: NULL key in the $tag snapshot — NULL keys " +
          "cannot be matched across snapshots; filter or key them first"))
        .isNull)
      .select(keyCols.map(col) :+
        xxhash64(cmp.flatMap(c =>
          Seq(col(c).cast("string"), col(c).isNull.cast("string"))): _*)
          .as(s"_fp_$tag") :+ lit(true).as(s"_${tag}_present"): _*)
    val joined = fp(oldSnap, "old").join(fp(newSnap, "new"), keyCols,
      "full_outer")
    joined.select(keyCols.map(col) :+
      when(col("_old_present").isNull, lit("added"))
        .when(col("_new_present").isNull, lit("removed"))
        .when(col("_fp_old") =!= col("_fp_new"), lit("changed"))
        .otherwise(lit("unchanged")).as("change"): _*)
      .filter(col("change") =!= "unchanged")
  }
}
