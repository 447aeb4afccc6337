package graft.operators

import org.apache.spark.sql.Column
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
}
