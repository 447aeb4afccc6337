package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic train/validation/test assignment for training-data
  * pipelines.
  *
  * The split is a pure function of the row's id — no rand(), no
  * state, no shuffle: re-running the pipeline, adding executors, or
  * reprocessing a single partition yields the identical assignment,
  * which is the property that matters when 100 TB of documents must
  * land in the same split on every run (a rand()-based split silently
  * reshuffles examples between train and test on retry — leakage).
  *
  * Bucket = first 8 hex chars of md5(id) parsed as an integer, mod
  * nBuckets. md5 is used (not xxhash64) because it is engine-portable:
  * DuckDB/BigQuery/Python produce the same digest, so the split can be
  * reproduced — and oracle-verified — outside Spark.
  */
object Splits {

  /** Uniform bucket in [0, nBuckets) from the id column. */
  def splitBucket(id: Column, nBuckets: Int = 100): Column =
    pmod(conv(substring(md5(id.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long"), lit(nBuckets))

  /** Named split from cumulative percentage cut points: bucket <
    * trainPct → "train", < trainPct+valPct → "val", else → "test". */
  def assignSplit(id: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    val b = splitBucket(id, 100)
    when(b < trainPct, lit("train"))
      .when(b < trainPct + valPct, lit("val"))
      .otherwise(lit("test"))
  }

  /** Deterministic stratified sample: per-stratum keep rates in basis
    * points (1/10000), e.g. Map("en" -> 2500) keeps 25% of English
    * rows. The rate table is integer basis points — not a Double — so
    * the cut point needs no float truncation that another engine
    * could round differently.
    *
    * The keep decision is `md5-bucket(id) < rate_bps`, the stratified
    * extension of [[splitBucket]]: a pure function of the row, so the
    * sample is reproducible across runs, retries and engines — the
    * property rand()-based `sampleBy` lacks. Rows whose stratum has no
    * configured rate get `defaultBps` (0 = drop). The rate map joins
    * in as a broadcast dimension: one scan, no shuffle of the fact.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
                       ratesBps: Map[String, Int],
                       defaultBps: Int = 0): DataFrame = {
    require(ratesBps.values.forall(r => r >= 0 && r <= 10000) &&
      defaultBps >= 0 && defaultBps <= 10000,
      "rates are basis points in [0, 10000]")
    val spark = df.sparkSession
    import spark.implicits._
    val dim = ratesBps.toSeq.toDF(strataCol, "_rate_bps")
    df.join(broadcast(dim), Seq(strataCol), "left")
      .filter(splitBucket(col(idCol), 10000) <
        coalesce(col("_rate_bps"), lit(defaultBps)))
      .drop("_rate_bps")
  }
}
