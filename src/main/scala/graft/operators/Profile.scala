package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass column profiling: row count, null count, exact distinct
  * count, min and max per column, in long format (one output row per
  * profiled column) — the data-quality summary every pipeline run
  * logs next to its marts.
  *
  * Shape: a SINGLE aggregation computes every metric for every column
  * (partial aggregation map-side; the multiple COUNT(DISTINCT)s plan
  * through Spark's Expand — one shuffle total), then the one-row
  * result explodes into long format. Never one scan per column.
  * min/max are surfaced as strings so heterogeneous columns share a
  * schema; at 100 TB swap exact distinct for approx_count_distinct —
  * same plan minus the Expand.
  */
object Profile {

  /** Zipf power-law fit of the token-frequency distribution, per
    * group (source/language): least-squares slope and R² of
    * ln(frequency) against ln(rank) over the top `maxRank` vocabulary
    * entries. Natural text sits near slope −1 (Zipf's law); a corpus
    * slice that deviates hard — too flat (template/boilerplate
    * floods) or too steep (tiny effective vocabulary, repetition) —
    * is the data-card-level smell this statistic exists to surface.
    *
    * Determinism: ranks order by (count DESC, token) — total order,
    * engine-independent; the regression inputs are therefore
    * identical everywhere and the 4dp rounding absorbs summation-
    * order ulps (the q213 oracle replays the fit in DuckDB's own
    * regr_slope/regr_r2).
    *
    * Scale shape: the token-count aggregate is map-side combined (the
    * shuffle carries ≤ partitions × vocab partial rows); the rank
    * window sorts each group's VOCABULARY table, bounded by distinct
    * tokens, never the corpus; the regression consumes ≤ maxRank rows
    * per group.
    *
    * @return (groupCol, n_distinct, zipf_slope, r2) — slope is
    *         negative for Zipf-like text */
  def zipfFit(df: DataFrame, groupCol: String, textCol: String,
              maxRank: Int = 1000, roundTo: Int = 4): DataFrame = {
    require(maxRank >= 2, s"maxRank must be >= 2 for a fit: $maxRank")
    import org.apache.spark.sql.expressions.Window
    val cnt = df.select(col(groupCol),
        explode(graft.functions.TextFunctions.tokens(col(textCol))).as("_t"))
      .groupBy(col(groupCol), col("_t"))
      .agg(count(lit(1)).as("_c"))
    val ranked = cnt
      .withColumn("_r", row_number().over(Window.partitionBy(col(groupCol))
        .orderBy(col("_c").desc, col("_t"))))
      .withColumn("_nd",
        count(lit(1)).over(Window.partitionBy(col(groupCol))))
    ranked.filter(col("_r") <= maxRank)
      .groupBy(col(groupCol))
      .agg(max(col("_nd")).as("n_distinct"),
        round(regr_slope(log(col("_c").cast("double")),
          log(col("_r").cast("double"))), roundTo).as("zipf_slope"),
        round(regr_r2(log(col("_c").cast("double")),
          log(col("_r").cast("double"))), roundTo).as("r2"))
  }

  /** Vocabulary growth curve across ingest epochs (the Heaps'-law
    * view): per epoch, token occurrences, NEW types (tokens whose
    * FIRST occurrence is that epoch), cumulative vocabulary, and the
    * novelty rate new_types / occurrences. The curve every data card
    * should carry: novelty decaying on schedule is healthy Heaps
    * behavior; novelty collapsing to ~0 early says further ingest is
    * re-buying the same vocabulary (dedup/curation should gate it);
    * a novelty SPIKE in a late epoch says the source mix shifted.
    *
    * Scale shape: one map-side-combined occurrence aggregate and one
    * first-occurrence aggregate, both keyed by token — shuffles are
    * bounded by vocabulary, never corpus size; the cumulative window
    * runs over the (tiny) per-epoch summary.
    *
    * @param epochCol the ingest-epoch key (a date, a batch number —
    *                 any orderable column)
    * @return (epoch, n_occurrences, new_types, cum_types, novelty)
    *         ordered by epoch */
  def vocabGrowth(df: DataFrame, textCol: String, epochCol: Column,
                  roundTo: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(epochCol.as("epoch"),
      explode(graft.functions.TextFunctions.tokens(col(textCol))).as("_t"))
    val occ = toks.groupBy(col("epoch"))
      .agg(count(lit(1)).as("n_occurrences"))
    val news = toks.groupBy(col("_t")).agg(min(col("epoch")).as("epoch"))
      .groupBy(col("epoch")).agg(count(lit(1)).as("new_types"))
    occ.join(news, Seq("epoch"), "left")
      .select(col("epoch"), col("n_occurrences"),
        coalesce(col("new_types"), lit(0L)).as("new_types"))
      .withColumn("cum_types",
        sum(col("new_types")).over(Window.orderBy(col("epoch"))))
      .withColumn("novelty", round(col("new_types").cast("double") /
        col("n_occurrences").cast("double"), roundTo))
      // the final orderBy makes the "ordered by epoch" return claim
      // real (collect order is otherwise engine-dependent) — free on
      // the per-epoch summary, whose row count is the epoch count
      .orderBy(col("epoch"))
  }

  def summarize(df: DataFrame, cols: Seq[String]): DataFrame = {
    val metrics = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_nulls_$c"),
        count_distinct(col(c)).as(s"_dist_$c"),
        min(col(c)).cast("string").as(s"_min_$c"),
        max(col(c)).cast("string").as(s"_max_$c"))
    }
    val one = df.agg(count(lit(1)).as("_rows"), metrics: _*)
    val structs = cols.map { c =>
      struct(lit(c).as("column_name"), col("_rows").as("n_rows"),
        col(s"_nulls_$c").as("n_nulls"), col(s"_dist_$c").as("n_distinct"),
        col(s"_min_$c").as("min_value"), col(s"_max_$c").as("max_value"))
    }
    one.select(explode(array(structs: _*)).as("p")).select("p.*")
  }

  /** Token-distribution drift between two corpus snapshots — the
    * data-quality monitor a production ingest runs per batch: compare
    * each snapshot's token relative frequencies and report the
    * per-token total-variation contribution (|p_old − p_new| / 2; the
    * contributions sum to the TV distance in [0, 1]). A drifting
    * source — new language, new boilerplate, a broken upstream
    * extractor — shows up as mass concentrating on new tokens.
    *
    * Scale shape: one token-keyed count aggregate per side (scan-side
    * partial counts), a full outer join on the token, and scalar
    * totals attached as broadcast single-row aggregates — never a
    * driver collect, never a corpus-sized shuffle beyond the two
    * token aggregations.
    *
    * @return (tok, n_old, n_new, p_old, p_new, tv_contrib) — one row
    *         per token present in either snapshot; probabilities and
    *         contribution rounded at `roundTo` for engine-stable
    *         comparison
    */
  def tokenDistributionDrift(oldDf: DataFrame, newDf: DataFrame,
                             textCol: String,
                             roundTo: Int = 6): DataFrame = {
    import graft.functions.TextFunctions
    def counts(df: DataFrame, as: String): DataFrame =
      df.select(explode(TextFunctions.tokens(col(textCol))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as(as))
    val o = counts(oldDf, "n_old")
    val n = counts(newDf, "n_new")
    val joined = o.join(n, Seq("tok"), "full_outer")
      .select(col("tok"),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
    // totals from the two aggregates directly (the q17 pattern), NOT
    // from `joined` — summing the join's subtree would execute the
    // full outer join twice. Coalesced zeros add nothing, so the sums
    // are identical.
    val totals = broadcast(
      o.agg(sum(col("n_old")).as("_to"))
        .crossJoin(n.agg(sum(col("n_new")).as("_tn"))))
    // a token-free snapshot reads as the zero distribution (p = 0
    // everywhere, drift vs a non-empty snapshot = 0.5), not as NULLs
    def p(cnt: Column, tot: Column) =
      when(tot > 0, cnt / tot).otherwise(lit(0.0))
    joined.crossJoin(totals)
      .select(col("tok"), col("n_old"), col("n_new"),
        round(p(col("n_old"), col("_to")), roundTo).as("p_old"),
        round(p(col("n_new"), col("_tn")), roundTo).as("p_new"),
        round(abs(p(col("n_old"), col("_to")) - p(col("n_new"), col("_tn"))) / 2,
          roundTo).as("tv_contrib"))
  }
}
