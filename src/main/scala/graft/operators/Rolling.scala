package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe trailing-row window computations.
  *
  * The naive form of "rolling X over the trailing N rows per key" —
  * `agg(...).over(Window.partitionBy(key).orderBy(ord).rowsBetween(-N+1, 0))`
  * — sorts the ENTIRE fact table into |distinct key| tasks. With a
  * handful of key values (event types, tenants) that is a
  * single-task-per-hot-key sort: correct at test scale, a stalled
  * stage at 100 TB.
  *
  * The scalable re-expression here runs in two bounded stages:
  *
  *  1. '''Global per-key sequence without a per-key sort'''
  *     (`sequenceByKey`): rows get a `row_number` only within
  *     `(key, bucket)` — `bucket` is a caller-chosen coarse split of
  *     the ordering column (hour/day of a timestamp) whose partitions
  *     are bounded by data density, not key cardinality. Per-bucket
  *     row counts (O(keys × buckets) rows — tiny) are prefix-summed
  *     with a window over the COUNTS table and broadcast-joined back:
  *     global_rn = bucket_offset + local_rn. This is the classic
  *     distributed zipWithIndex, expressed in Catalyst (no RDD hop,
  *     no driver collect).
  *
  *  2. '''Chunked trailing window with overlap carry'''
  *     (`rollingDistinct`): rows land in chunk `(rn-1) div C`; the
  *     last N-1 rows of each chunk are ALSO emitted into the next
  *     chunk flagged `carry=true`. Within a `(key, chunk)` partition
  *     (≤ C + N - 1 rows, bounded by construction) the trailing-N
  *     frame of every real row is exactly its global trailing-N frame
  *     — rows reaching back past the chunk boundary find the carried
  *     copies, in the right order, because ordering is by the global
  *     `rn`. Carry rows are dropped after the window. Parallelism
  *     grows with the data (one task per C rows), independent of key
  *     cardinality.
  *
  * Requires a tie-free ordering (include a unique id in `orderCols`);
  * `row_number` would otherwise be nondeterministic across runs.
  */
object Rolling {

  /** Global 1-based row number per `keyCols` group in `orderCols`
    * order, computed without ever sorting a whole key group in one
    * task. `bucket` must be a monotone function of the leading
    * ordering column (e.g. `date_trunc("hour", ts)`): rows in a
    * lower bucket must sort strictly before rows in a higher one.
    *
    * '''Skew caveat''': parallelism here is bounded by the bucket
    * histogram, not the key cardinality — a degenerate bucketing
    * (half the corpus in one bucket value) silently collapses that
    * bucket into ONE window task, the exact failure this operator
    * exists to avoid. md5-derived buckets are uniform by
    * construction; CALLER-SUPPLIED buckets (a difficulty band, an
    * hour-of-day) are not. `skewGuardFrac` arms an in-plan tripwire:
    * the run FAILS (raise_error, named bucket in the message) if any
    * bucket holds more than that fraction of its key group — checked
    * on the tiny O(keys × buckets) offsets aggregate, zero extra
    * actions, zero cost on the fact-table path. Groups smaller than
    * `skewGuardMinRows` are exempt (a 100-row group in one bucket is
    * one healthy task, not skew), which makes the ARMED default free
    * on report-scale groups — the guard only ever fires where the
    * skew would actually serialize a corpus-scale window. Pass `None`
    * to opt OUT (a caller that has proven its bucketing uniform),
    * not to opt in. [[bucketSkew]] is the read-only histogram view
    * of the same question. */
  def sequenceByKey(df: DataFrame, keyCols: Seq[String],
                    orderCols: Seq[Column], bucket: Column,
                    as: String = "rn",
                    skewGuardFrac: Option[Double] = Some(0.5),
                    skewGuardMinRows: Long = 10000L): DataFrame = {
    require(skewGuardFrac.forall(f => f > 0.0 && f <= 1.0),
      s"skewGuardFrac must be in (0, 1]: $skewGuardFrac")
    val key = keyCols.map(col)
    val withBucket = df.withColumn("_rseq_bucket", bucket)
    val wLocal = Window.partitionBy((key :+ col("_rseq_bucket")): _*)
      .orderBy(orderCols: _*)
    val local = withBucket.withColumn("_rseq_lrn", row_number().over(wLocal))
    // O(keys × buckets) rows: the only per-key-ordered window runs on
    // this aggregate, not the fact table
    val wCum = Window.partitionBy(key: _*).orderBy(col("_rseq_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val counts = withBucket.groupBy((key :+ col("_rseq_bucket")): _*)
      .agg(count(lit(1)).as("_rseq_cnt"))
    val offsetExpr = coalesce(sum("_rseq_cnt").over(wCum), lit(0L))
    val guarded = skewGuardFrac match {
      case None => offsetExpr
      case Some(frac) =>
        val total = sum("_rseq_cnt").over(Window.partitionBy(key: _*))
        when(col("_rseq_cnt").cast("double") > lit(frac) * total &&
            total >= lit(skewGuardMinRows),
          raise_error(concat(
            lit(s"sequenceByKey bucket skew: bucket "),
            col("_rseq_bucket").cast("string"),
            lit(" holds "), col("_rseq_cnt").cast("string"),
            lit(" of "), total.cast("long").cast("string"),
            lit(s" rows in its key group (> ${frac * 100}% — one " +
              "window task at scale); choose a finer bucket function"))))
          .otherwise(offsetExpr)
    }
    val offsets = counts
      .withColumn("_rseq_offset", guarded)
      .drop("_rseq_cnt")
    local
      .join(broadcast(offsets), keyCols :+ "_rseq_bucket")
      .withColumn(as, col("_rseq_offset") + col("_rseq_lrn"))
      .drop("_rseq_bucket", "_rseq_lrn", "_rseq_offset")
  }

  /** Bucket-histogram diagnostic for [[sequenceByKey]]'s skew caveat:
    * per key group, how many rows, how many distinct buckets, and the
    * largest bucket's share — the number a caller compares against a
    * task-size budget before trusting a hand-rolled bucket function.
    * One row per key group (one global row for `keyCols = Nil`);
    * cost is the same O(keys × buckets) aggregate sequenceByKey
    * builds anyway. */
  def bucketSkew(df: DataFrame, keyCols: Seq[String],
                 bucket: Column): DataFrame = {
    val key = keyCols.map(col)
    val counts = df.withColumn("_bs_bucket", bucket)
      .groupBy((key :+ col("_bs_bucket")): _*)
      .agg(count(lit(1)).as("_bs_cnt"))
    counts.groupBy(key: _*)
      .agg(sum("_bs_cnt").as("n_rows"),
        count(lit(1)).as("n_buckets"),
        max("_bs_cnt").as("max_bucket_rows"))
      .withColumn("max_bucket_frac",
        round(col("max_bucket_rows").cast("double") / col("n_rows"), 4))
  }

  /** Distinct count of `valueCol` over the trailing `n` rows
    * (inclusive of the current row) per `keyCols` group in
    * `orderCols` order — `COUNT(DISTINCT v) OVER (PARTITION BY key
    * ORDER BY ord ROWS BETWEEN n-1 PRECEDING AND CURRENT ROW)` with
    * partition sizes bounded by `chunkSize + n - 1` instead of the
    * key group size. */
  def rollingDistinct(df: DataFrame, keyCols: Seq[String],
                      orderCols: Seq[Column], bucket: Column,
                      valueCol: String, n: Int, as: String = "rolling_distinct",
                      chunkSize: Int = 10000): DataFrame = {
    require(n >= 1 && chunkSize >= n,
      s"chunkSize ($chunkSize) must be >= frame size ($n)")
    val seq = sequenceByKey(df, keyCols, orderCols, bucket, as = "_roll_rn")
    val pos0 = col("_roll_rn") - 1
    val chunk = floor(pos0 / chunkSize)
    val real = seq.withColumn("_roll_chunk", chunk)
      .withColumn("_roll_carry", lit(false))
    val carried = seq
      .filter(pos0 % chunkSize >= chunkSize - (n - 1))
      .withColumn("_roll_chunk", chunk + 1)
      .withColumn("_roll_carry", lit(true))
    val w = Window
      .partitionBy((keyCols.map(col) :+ col("_roll_chunk")): _*)
      .orderBy(col("_roll_rn"))
      .rowsBetween(-(n - 1), Window.currentRow)
    real.unionByName(carried)
      .withColumn(as, size(collect_set(col(valueCol)).over(w)).cast("long"))
      .filter(!col("_roll_carry"))
      .drop("_roll_rn", "_roll_chunk", "_roll_carry")
  }
}
