package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class GapFillSpec extends SparkSpecBase {
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  test("ffillDaily densifies each key's range and carries the last observation") {
    val obs = Seq(
      (1L, d("2024-01-01"), 10.0, "a"),
      (1L, d("2024-01-04"), 40.0, "b"),
      (2L, d("2024-01-03"), 99.0, "z")
    ).toDF("k", "day", "v", "tag")
    val out = GapFill.ffillDaily(obs, Seq("k"), "day", Seq("v", "tag"))
      .orderBy("k", "day")
      .as[(Long, java.sql.Date, Double, String)].collect()
    assert(out === Array(
      (1L, d("2024-01-01"), 10.0, "a"),
      (1L, d("2024-01-02"), 10.0, "a"),   // gap filled from jan 1
      (1L, d("2024-01-03"), 10.0, "a"),
      (1L, d("2024-01-04"), 40.0, "b"),
      (2L, d("2024-01-03"), 99.0, "z"))) // key 2: single-day range
  }

  test("an observation with a NULL value still overwrites carried state") {
    // jan 2's observation EXISTS but its value is null — the carried
    // row must become (null, "mid"), not keep jan 1's 10.0 (the
    // pack-before-join property; an after-join fill cannot tell
    // "no row" from "row with null value")
    val obs = Seq(
      (1L, d("2024-01-01"), Some(10.0), "a"),
      (1L, d("2024-01-02"), None: Option[Double], "mid"),
      (1L, d("2024-01-04"), Some(40.0), "b")
    ).toDF("k", "day", "v", "tag")
    val out = GapFill.ffillDaily(obs, Seq("k"), "day", Seq("v", "tag"))
      .orderBy("day")
      .as[(Long, java.sql.Date, Option[Double], String)].collect()
    assert(out === Array(
      (1L, d("2024-01-01"), Some(10.0), "a"),
      (1L, d("2024-01-02"), None, "mid"),
      (1L, d("2024-01-03"), None, "mid"),  // gap carries the null observation
      (1L, d("2024-01-04"), Some(40.0), "b")))
  }
}
