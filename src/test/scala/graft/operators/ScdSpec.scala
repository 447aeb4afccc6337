package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class ScdSpec extends SparkSpecBase {
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  private def history(rows: Seq[(Long, java.sql.Date, Long, Option[String])]) =
    Scd.scd2FromChangeLog(
      rows.toDF("k", "ts", "seq", "status"),
      keyCols = Seq("k"), tsCol = "ts", seqCol = "seq", attrCols = Seq("status"))

  test("consecutive identical states collapse into one version interval") {
    val out = history(Seq(
      (1L, d("2024-01-01"), 1L, Some("new")),
      (1L, d("2024-01-05"), 2L, Some("new")),   // unchanged — same version
      (1L, d("2024-02-01"), 3L, Some("active")),
      (1L, d("2024-03-01"), 4L, Some("new"))    // back to "new" — NEW version
    )).orderBy("valid_from")
      .as[(Long, Option[String], java.sql.Date, Option[java.sql.Date], Boolean)]
      .collect()
    assert(out === Array(
      (1L, Some("new"), d("2024-01-01"), Some(d("2024-02-01")), false),
      (1L, Some("active"), d("2024-02-01"), Some(d("2024-03-01")), false),
      (1L, Some("new"), d("2024-03-01"), None, true)))
  }

  test("NULL attribute values are real states and NULL→NULL is unchanged") {
    val out = history(Seq(
      (1L, d("2024-01-01"), 1L, None),
      (1L, d("2024-01-02"), 2L, None),          // null → null: no new version
      (1L, d("2024-01-03"), 3L, Some("set"))
    )).orderBy("valid_from")
      .as[(Long, Option[String], java.sql.Date, Option[java.sql.Date], Boolean)]
      .collect()
    assert(out === Array(
      (1L, None, d("2024-01-01"), Some(d("2024-01-03")), false),
      (1L, Some("set"), d("2024-01-03"), None, true)))
  }

  test("same-timestamp changes order by the tiebreak column") {
    val out = history(Seq(
      (1L, d("2024-01-01"), 2L, Some("b")),     // seq 2: later
      (1L, d("2024-01-01"), 1L, Some("a"))      // seq 1: first version
    )).orderBy("valid_from", "status")
      .as[(Long, Option[String], java.sql.Date, Option[java.sql.Date], Boolean)]
      .collect()
    assert(out === Array(
      (1L, Some("a"), d("2024-01-01"), Some(d("2024-01-01")), false),
      (1L, Some("b"), d("2024-01-01"), None, true)))
  }

  test("intervals chain per key: each valid_to equals the next valid_from, one current row") {
    val changes = (1 to 50).map { i =>
      (i % 5).toLong // 5 keys
    }.zipWithIndex.map { case (k, i) =>
      (k, d(f"2024-01-${i % 28 + 1}%02d"), i.toLong, Some(s"s${i % 3}"))
    }
    val h = history(changes)
    val perKey = h.groupBy("k")
      .agg(sum(when(col("is_current"), 1).otherwise(0)).as("n_current"),
        count(lit(1)).as("n_versions"))
      .as[(Long, Long, Long)].collect()
    assert(perKey.forall(_._2 == 1), "exactly one current version per key")
    // every non-current valid_to must equal some valid_from of the same key
    val dangling = h.filter(!col("is_current")).as("a")
      .join(h.as("b"),
        col("a.k") === col("b.k") && col("a.valid_to") === col("b.valid_from"),
        "left_anti")
    assert(dangling.count() === 0)
  }

  test("plans a single exchange: both window passes share one shuffle") {
    val plan = history(Seq((1L, d("2024-01-01"), 1L, Some("x"))))
      .queryExecution.executedPlan.toString()
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected 1 exchange, plan:\n$plan")
  }
}
