package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Rolling.sequenceByKey / rollingDistinct vs the naive
  * key-partitioned window they replace: exact agreement on data that
  * forces many buckets, many chunks, and cross-chunk carries. */
class RollingSpec extends SparkSpecBase {
  import spark.implicits._

  // 3 keys × ~400 rows; ts collides across keys, (ts, id) is unique
  // within a key; day buckets of uneven size (7, 11, 13, ... rows)
  private lazy val events = {
    val rows = for {
      k <- Seq("a", "b", "c")
      i <- 0 until (if (k == "a") 500 else 350)
    } yield (k, i.toLong, // id
      java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2024, 1, 1 + (i % 28)).atTime(i / 28, i % 60)),
      s"u${(i * 7 + k.hashCode.abs) % 40}")
    rows.toDF("key", "id", "ts", "user")
  }

  private def naiveRolling(n: Int) = {
    val w = Window.partitionBy("key").orderBy(col("ts"), col("id"))
      .rowsBetween(-(n - 1), Window.currentRow)
    events.select(col("key"), col("id"),
      size(collect_set(col("user")).over(w)).cast("long").as("rolling_distinct"))
  }

  test("sequenceByKey matches a global per-key row_number") {
    val expected = events.withColumn("rn",
      row_number().over(Window.partitionBy("key").orderBy(col("ts"), col("id"))))
      .select("key", "id", "rn").as[(String, Long, Int)].collect().toSet
    val got = Rolling.sequenceByKey(events, Seq("key"),
      Seq(col("ts"), col("id")), date_trunc("day", col("ts")))
      .select(col("key"), col("id"), col("rn").cast("int"))
      .as[(String, Long, Int)].collect().toSet
    assert(got == expected)
  }

  test("rollingDistinct matches the naive window across chunk boundaries") {
    // chunkSize 64 → ~8 chunks per key, every chunk boundary carries
    for (n <- Seq(1, 5, 64)) {
      val expected = naiveRolling(n).as[(String, Long, Long)].collect().toSet
      val got = Rolling.rollingDistinct(events, Seq("key"),
        Seq(col("ts"), col("id")), date_trunc("day", col("ts")),
        "user", n = n, chunkSize = 64)
        .select(col("key"), col("id"), col("rolling_distinct"))
        .as[(String, Long, Long)].collect().toSet
      assert(got == expected, s"mismatch at n=$n")
    }
  }

  test("rollingDistinct with frame larger than a day bucket still matches") {
    val expected = naiveRolling(150).as[(String, Long, Long)].collect().toSet
    val got = Rolling.rollingDistinct(events, Seq("key"),
      Seq(col("ts"), col("id")), date_trunc("day", col("ts")),
      "user", n = 150, chunkSize = 150)
      .select(col("key"), col("id"), col("rolling_distinct"))
      .as[(String, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("chunkSize below frame size is rejected") {
    intercept[IllegalArgumentException] {
      Rolling.rollingDistinct(events, Seq("key"),
        Seq(col("ts"), col("id")), date_trunc("day", col("ts")),
        "user", n = 100, chunkSize = 50)
    }
  }

  // one source, 1000 rows, band 5 holds 90% of them — the degenerate
  // caller-supplied bucketing the skew guard exists to catch
  private lazy val skewed = (0L until 1000L)
    .map(i => (i, if (i < 900) 5L else 50L + i % 10))
    .toDF("id", "band")

  private def rootMessages(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")

  test("skew guard: degenerate bucket fails loudly, naming the bucket") {
    val guarded = Rolling.sequenceByKey(skewed, Seq.empty,
      Seq(col("band"), col("id")), bucket = col("band"),
      skewGuardFrac = Some(0.5), skewGuardMinRows = 100)
    val e = intercept[Throwable] { guarded.collect() }
    val msg = rootMessages(e)
    assert(msg.contains("bucket skew") && msg.contains("900"),
      s"expected a named bucket-skew error, got: $msg")
  }

  test("skew guard: exempt below minRows, silent on healthy buckets, explicit opt-out computes") {
    // same distribution but group smaller than skewGuardMinRows: exempt
    val small = Rolling.sequenceByKey(skewed, Seq.empty,
      Seq(col("band"), col("id")), bucket = col("band"),
      skewGuardFrac = Some(0.5), skewGuardMinRows = 10000)
    assert(small.count() === 1000L)
    // healthy md5-prefix bucket under the same armed guard: passes,
    // and ranks are still exactly 1..n
    val h = md5(col("id").cast("string").cast("binary"))
    val healthy = Rolling.sequenceByKey(skewed.withColumn("_h", h), Seq.empty,
      Seq(col("_h"), col("id")),
      bucket = conv(substring(col("_h"), 1, 1), 16, 10).cast("long"),
      skewGuardFrac = Some(0.5), skewGuardMinRows = 100)
    assert(healthy.agg(min("rn"), max("rn"), count(lit(1)))
      .as[(Long, Long, Long)].head() === ((1L, 1000L, 1000L)))
    // explicit opt-out (None): the degenerate bucketing still
    // COMPUTES correctly — the guard is a contract, not a semantic
    val unguarded = Rolling.sequenceByKey(skewed, Seq.empty,
      Seq(col("band"), col("id")), bucket = col("band"),
      skewGuardFrac = None)
    assert(unguarded.agg(min("rn"), max("rn"), count(lit(1)))
      .as[(Long, Long, Long)].head() === ((1L, 1000L, 1000L)))
  }

  test("skew guard: armed by default — a corpus-scale degenerate bucket fails with NO opt-in") {
    // 12k rows (over the 10k default exemption), 90% in one bucket:
    // the pure-defaults call must fail loudly — the round-13 default
    // flip; before it, this silently serialized into one window task
    val big = (0L until 12000L)
      .map(i => (i, if (i < 10800) 5L else 50L + i % 10))
      .toDF("id", "band")
    val e = intercept[Throwable] {
      Rolling.sequenceByKey(big, Seq.empty,
        Seq(col("band"), col("id")), bucket = col("band")).collect()
    }
    val msg = rootMessages(e)
    assert(msg.contains("bucket skew") && msg.contains("10800"),
      s"expected the default-armed guard to fire, got: $msg")
  }

  test("bucketSkew reports the histogram the guard trips on") {
    val got = Rolling.bucketSkew(skewed, Seq.empty, col("band"))
      .as[(Long, Long, Long, Double)].head()
    assert(got === ((1000L, 11L, 900L, 0.9)))
    // per-key view over the events fixture agrees with a direct replay
    val byKey = Rolling.bucketSkew(events, Seq("key"),
      date_trunc("day", col("ts")))
      .select(col("key"), col("n_rows")).as[(String, Long)]
      .collect().toMap
    assert(byKey === Map("a" -> 500L, "b" -> 350L, "c" -> 350L))
  }
}
