package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Catalog

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is generated from graft.queries.Catalog, which co-locates
  * every Spark implementation with its DuckDB oracle SQL so the two
  * can never drift apart (the driver hash-compares them per round).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The interval-expansion query is the engine's signature
    * move: the reference's calendar cross-join range filter
    * (deferred_revenue.sql:112-122) rewritten to a linear, shuffle-
    * free explode(sequence(...)). */
  def entry(spark: SparkSession): DataFrame =
    Catalog.q8IntervalExpand.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Catalog.all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for engine-hash-dependent ops
    * (MinHash/SimHash/IVF) → driver records a rows-only check. */
  lazy val oracleSql: Map[String, String] =
    Catalog.all.collect { case q if q.oracle.isDefined => q.name -> q.oracle.get }.toMap
}
