package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series gap filling: expand each key's observation range to a
  * dense daily spine and carry the last observation forward (LOCF) —
  * the "daily balance as of any day" query the revenue marts answer
  * with interval expansion, generalized to arbitrary observations.
  *
  * Scale shape: the spine is `explode(sequence(min, max))` per key —
  * linear in output days, no calendar cross join (same argument as
  * IntervalExpand); the fill is ONE window per key ordered by date.
  * Total cost: one shuffle for the per-key bounds aggregate, one for
  * the observations join, one sort for the window — each keyed by the
  * series key, so a 1000-executor cluster spreads series evenly.
  *
  * All value columns are carried in a single struct filled by one
  * `last(_, ignoreNulls)` — the carried observation is row-atomic
  * (same reasoning as AsOfJoin: independent per-column fills could
  * mix different observations and resurrect genuinely-null fields).
  */
object GapFill {

  /** @param df        observations, at most one row per (key, date)
    * @param keyCols   series identity
    * @param dateCol   observation date (DateType)
    * @param valueCols columns to carry forward
    * @return dense (key, date) spine with LOCF-filled value columns
    */
  def ffillDaily(df: DataFrame, keyCols: Seq[String], dateCol: String,
                 valueCols: Seq[String]): DataFrame = {
    val bounds = df.groupBy(keyCols.map(col): _*)
      .agg(min(col(dateCol)).as("_lo"), max(col(dateCol)).as("_hi"))
    val spine = bounds.select(keyCols.map(col) :+
      explode(sequence(col("_lo"), col("_hi"))).as(dateCol): _*)
    // pack BEFORE the join: post-join, "no observation row" and "row
    // whose values are all null" are indistinguishable — packed here,
    // _obs is null exactly when no row existed, so an all-null
    // observation still overwrites the carried state
    val obs = df.select(keyCols.map(col) ++ Seq(col(dateCol),
      struct(valueCols.map(col): _*).as("_obs")): _*)
    val joined = spine.join(obs, keyCols :+ dateCol, "left")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(dateCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined
      .withColumn("_obs", last(col("_obs"), ignoreNulls = true).over(w))
      .select(keyCols.map(col) ++ Seq(col(dateCol)) ++
        valueCols.map(c => col(s"_obs.$c").as(c)): _*)
  }
}
