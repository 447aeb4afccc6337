package graft.operators

import graft.SparkSpecBase

class AsOfJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def quotes = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100.0),
    (1L, ts("2024-01-01 11:00:00"), 110.0),
    (2L, ts("2024-01-01 10:30:00"), 200.0)
  ).toDF("k", "qts", "price")

  private def trades = Seq(
    (1L, 101L, ts("2024-01-01 10:30:00")),  // after 10:00 quote
    (1L, 102L, ts("2024-01-01 11:00:00")),  // exactly at 11:00 quote
    (1L, 103L, ts("2024-01-01 09:00:00")),  // before any quote
    (2L, 201L, ts("2024-01-01 12:00:00")),
    (3L, 301L, ts("2024-01-01 12:00:00"))   // key with no quotes
  ).toDF("k", "trade_id", "tts")

  test("non-strict: latest quote at or before each trade; nulls when none") {
    val out = AsOfJoin.asof(trades, quotes, Seq("k"), "tts", "qts",
      Map("price" -> "quote_price"))
      .select("trade_id", "quote_price")
      .as[(Long, Option[Double])].collect().toMap
    assert(out === Map(
      101L -> Some(100.0),
      102L -> Some(110.0),   // equal timestamp matches when non-strict
      103L -> None,
      201L -> Some(200.0),
      301L -> None))
  }

  test("strict: equal-timestamp quotes are excluded") {
    val out = AsOfJoin.asof(trades, quotes, Seq("k"), "tts", "qts",
      Map("price" -> "quote_price"), strict = true)
      .select("trade_id", "quote_price")
      .as[(Long, Option[Double])].collect().toMap
    assert(out(102L) === Some(100.0))  // 11:00 quote no longer visible
    assert(out(101L) === Some(100.0))
  }

  test("left row count is preserved exactly (no multiplication, no drops)") {
    val out = AsOfJoin.asof(trades, quotes, Seq("k"), "tts", "qts",
      Map("price" -> "p", "qts" -> "matched_at"))
    assert(out.count() === trades.count())
    assert(out.columns.toSet ===
      Set("k", "trade_id", "tts", "p", "matched_at"))
  }

  test("the match is row-atomic: genuine nulls survive, columns never mix rows") {
    // most recent quote at 11:00 has a NULL price but a real venue; the
    // older 10:00 row has both. ASOF must attach the 11:00 row whole:
    // price = null (not 100.0 from the older row), venue = "B".
    val nullableQuotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), Some(100.0), Some("A")),
      (1L, ts("2024-01-01 11:00:00"), None, Some("B"))
    ).toDF("k", "qts", "price", "venue")
    val lateTrade = Seq((1L, 1L, ts("2024-01-01 12:00:00")))
      .toDF("k", "trade_id", "tts")
    val row = AsOfJoin.asof(lateTrade, nullableQuotes, Seq("k"), "tts", "qts",
      Map("price" -> "p", "venue" -> "v"))
      .select("p", "v").as[(Option[Double], Option[String])].head()
    assert(row === ((None, Some("B"))))
    // and a key with no prior right row still yields all-null payload
    val early = Seq((1L, 2L, ts("2024-01-01 09:00:00")))
      .toDF("k", "trade_id", "tts")
    val none = AsOfJoin.asof(early, nullableQuotes, Seq("k"), "tts", "qts",
      Map("price" -> "p", "venue" -> "v"))
      .select("p", "v").as[(Option[Double], Option[String])].head()
    assert(none === ((None, None)))
  }
}
