package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-provided harness tables
  * (TESTDATA.md). One parquet file per table under `$dir/`.
  *
  * At 100 TB each "file" becomes a partitioned parquet dataset; the
  * loader shape (path + explicit name) stays identical, and Catalyst
  * handles partition pruning / predicate pushdown on the scan, so no
  * query in the catalog needs to change.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  /** The events table's `ts` physical type has varied across harness
    * testdata generations — TIMESTAMP(NANOS) (which Spark reads as a
    * nanosecond Long under spark.sql.legacy.parquet.nanosAsLong=true,
    * set in GraftSession / Verify / Bench) and TIMESTAMP(MICROS)
    * without a timezone flag (which Spark 4 reads as TIMESTAMP_NTZ).
    * Normalize both to session-zone TimestampType: the session zone is
    * pinned UTC (build.sbt), so the NTZ→TZ cast preserves the wall-
    * clock reading — exactly the naive-timestamp value DuckDB sees
    * reading the same parquet — and nanos truncate to micros, the
    * same truncation DuckDB applies. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Register every harness table as a temp view so `spark.sql` queries
    * can reference them by bare name (mirrors the DuckDB oracle setup). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}
