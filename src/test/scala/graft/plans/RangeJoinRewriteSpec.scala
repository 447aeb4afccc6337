package graft.plans

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import java.sql.Date

/** Plan + result equivalence for the range-join → explode rewrite.
  * The rule is injected into the shared test session via
  * experimental.extraOptimizations (same Rule object the
  * GraftExtensions entry point registers — a fresh `getOrCreate`
  * inside a suite run would silently reuse the shared session and
  * drop `withExtensions`). */
class RangeJoinRewriteSpec extends SparkSpecBase {

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RangeJoinToExplodeRule
  }

  override def afterAll(): Unit = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == RangeJoinToExplodeRule)
    super.afterAll()
  }

  private def frames = {
    import spark.implicits._
    val facts = Seq(
      (1L, "2024-01-01", "2024-01-03"),
      (2L, "2024-01-05", "2024-01-05"),
      (3L, "2024-01-30", "2024-02-05")   // extends past the spine cap
    ).toDF("id", "s", "e")
      .select($"id", to_date($"s").as("s"), to_date($"e").as("e"))
    val spine = spark.range(1).select(
      explode(sequence(
        lit(Date.valueOf("2024-01-01")), lit(Date.valueOf("2024-01-31")))).as("d"))
    (facts, spine)
  }

  test("closed range join rewrites to Generate + hash join, no BNLJ") {
    val (facts, spine) = frames
    val joined = facts.join(spine, col("d") >= col("s") && col("d") <= col("e"))
    val physical = joined.queryExecution.executedPlan.toString
    assert(physical.contains("Generate explode"), physical)
    assert(!physical.contains("BroadcastNestedLoopJoin"), physical)
  }

  test("rewritten results equal the nested-loop results (closed + half-open)") {
    val (facts, spine) = frames
    def runBoth(cond: org.apache.spark.sql.Column) = {
      val rewritten = facts.join(spine, cond)
        .select("id", "d").collect().map(_.toString).sorted.toSeq
      val reference = {
        spark.conf.set("spark.graft.rangeJoinRewrite", "false")
        try facts.join(spine, cond).select("id", "d")
          .collect().map(_.toString).sorted.toSeq
        finally spark.conf.set("spark.graft.rangeJoinRewrite", "true")
      }
      (rewritten, reference)
    }
    val (a1, b1) = runBoth(col("d") >= col("s") && col("d") <= col("e"))
    assert(a1 === b1)
    assert(a1.nonEmpty)
    val (a2, b2) = runBoth(col("d") >= col("s") && col("d") < col("e"))
    assert(a2 === b2)
    // spine cap respected: fact 3 only contributes days ≤ jan 31
    assert(!a1.exists(_.contains("2024-02")))
  }

  test("duplicate spine dates multiply output exactly like the nested loop") {
    import spark.implicits._
    val (facts, _) = frames
    // not a calendar: a date LIST with repeats (jan 2 twice, jan 5 thrice)
    val dupSpine = Seq("2024-01-01", "2024-01-02", "2024-01-02",
      "2024-01-05", "2024-01-05", "2024-01-05")
      .toDF("raw").select(to_date($"raw").as("d"))
    val cond = col("d") >= col("s") && col("d") <= col("e")
    val rewritten = facts.join(dupSpine, cond)
      .select("id", "d").collect().map(_.toString).sorted.toSeq
    val reference = {
      spark.conf.set("spark.graft.rangeJoinRewrite", "false")
      try facts.join(dupSpine, cond).select("id", "d")
        .collect().map(_.toString).sorted.toSeq
      finally spark.conf.set("spark.graft.rangeJoinRewrite", "true")
    }
    assert(rewritten === reference)
    // fact 1 spans jan 1-3: jan 1 once + jan 2 twice = 3 rows; fact 2
    // sits on jan 5 = 3 rows — duplicates preserved, not collapsed
    assert(rewritten.count(_.startsWith("[1,")) === 3)
    assert(rewritten.count(_.startsWith("[2,")) === 3)
  }

  test("non-range joins are left untouched") {
    val (facts, spine) = frames
    val eq = facts.join(spine, col("d") === col("s"))
    assert(eq.count() === 3)
    // three-conjunct condition → no rewrite, still correct
    val three = facts.join(spine,
      col("d") >= col("s") && col("d") <= col("e") && col("id") > 0)
    assert(three.count() ===
      facts.join(spine, col("d") >= col("s") && col("d") <= col("e")).count())
  }
}
