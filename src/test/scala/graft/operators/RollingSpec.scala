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
}
