package graft.operators

import org.apache.spark.sql.{DataFrame, Row}

/** The ONE sanctioned driver-side collect.
  *
  * A `.collect()` in operator code is either a bug (the operator is
  * not distributed) or a bounded metadata read (partition counts,
  * percentile boundaries, shard masses, touched-partition lists). The
  * engine's rule is that every such read must be provably bounded —
  * this helper makes that rule EXECUTABLE instead of a per-call-site
  * comment: the caller states the bound and why, the read fetches at
  * most bound+1 rows (a violation can never OOM the driver by
  * materializing the full result), and one row over the bound fails
  * loudly with the caller's justification in the message.
  *
  * At 100 TB the bound is the design review: if an operator cannot
  * state a data-independent (or explicitly parameterized) row bound
  * for its driver read, the read does not belong on the driver.
  */
object BoundedRead {

  /** Collect `df` asserting it holds at most `maxRows` rows.
    *
    * @param what     call-site label for the failure message
    * @param boundWhy why the bound holds — the justification that used
    *                 to live in a comment, now shipped in the error
    */
  def boundedDriverRead(df: DataFrame, maxRows: Int, what: String,
                        boundWhy: String): Array[Row] = {
    require(maxRows > 0, s"boundedDriverRead($what): maxRows must be positive")
    // limit(bound+1), not a bare collect: even a violated bound pulls
    // at most one extra row to the driver before the loud failure
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"boundedDriverRead($what): more than $maxRows rows reached the " +
        s"driver — the stated bound ($boundWhy) does not hold for this " +
        "input; the operator's driver-side step needs a redesign, not a " +
        "bigger bound")
    rows
  }
}
