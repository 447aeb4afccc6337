package graft.operators

import org.apache.spark.sql.DataFrame
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
}
