package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Error-bound checks for the approximate aggregates (q58): the gate
  * can't hash-compare sketches across engines, so the correctness
  * claim is a bounded relative error against the exact answers. */
class ApproxAggSpec extends SparkSpecBase {
  import spark.implicits._

  test("approx_count_distinct is within the configured rsd of exact") {
    val df = spark.range(0, 50000).select(
      (col("id") % 9973).as("k"), (col("id") % 5).as("g"))
    val exact = df.groupBy("g").agg(count_distinct($"k").as("e"))
    val approx = df.groupBy("g").agg(approx_count_distinct($"k", rsd = 0.02).as("a"))
    val joined = exact.join(approx, "g")
      .select($"e".cast("double"), $"a".cast("double")).as[(Double, Double)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (e, a) =>
      assert(math.abs(a - e) / e < 0.05, s"approx $a vs exact $e")  // 2.5σ of 2% rsd
    }
  }

  test("percentile_approx converges to the exact percentile at high accuracy") {
    val df = spark.range(0, 50000).select((col("id") % 1001).cast("double").as("v"))
    val exact = df.agg(percentile($"v", lit(0.5))).head().getDouble(0)
    val approx = df.agg(percentile_approx($"v", lit(0.5), lit(10000)))
      .head().getDouble(0)
    assert(math.abs(approx - exact) / (exact + 1) < 0.01, s"$approx vs $exact")
  }
}
