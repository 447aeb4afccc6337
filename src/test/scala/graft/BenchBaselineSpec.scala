package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the self-adjudicating bench record: the committed-baseline
  * parse, the retry/regression threshold decision, the lowered
  * SF-slope tripwire, and the metric line's regressions field. Pure
  * string/map logic — no SparkSession. Round 11's official record
  * carried a 7.5× q93 "regression" that was pure host noise; these
  * are the pieces that now adjudicate that inside the harness. */
class BenchBaselineSpec extends AnyFunSuite {

  test("parseBaseline reads make_baseline.py's exact shape (sf tag + per-query mins)") {
    val text =
      """{"sf":"/root/testdata/sf0.1","recorded":"round 12","passes":3,""" +
        """"queries":{"q1_agg":{"min":0.123,"slope":2.1},""" +
        """"q93_incremental_lsh":{"min":3.9},""" +
        """"q42_dedup_clusters":{"min":4.26,"slope":1.85}}}"""
    val (sf, mins) = Bench.parseBaseline(text)
    assert(sf === Some("/root/testdata/sf0.1"))
    assert(mins === Map("q1_agg" -> 0.123, "q93_incremental_lsh" -> 3.9,
      "q42_dedup_clusters" -> 4.26))
  }

  test("parseBaseline tolerates whitespace and ignores non-min fields") {
    val text =
      """{ "sf" : "/x/sf0.01",
        |  "queries": { "q7_fact_join": { "min" : 0.5, "slope": 9.9 } } }""".stripMargin
    val (sf, mins) = Bench.parseBaseline(text)
    assert(sf === Some("/x/sf0.01"))
    assert(mins === Map("q7_fact_join" -> 0.5))
  }

  test("overBaseline flags only >factor x base AND >absFloor excess; new queries never flag") {
    val base = Map("a" -> 1.0, "b" -> 0.05, "c" -> 2.0, "d" -> 1.0)
    val mins = Map(
      "a" -> 3.5, // 3.5x, +2.5s  -> flagged
      "b" -> 0.4, // 8x but +0.35s < floor -> NOT flagged (micro-query jitter)
      "c" -> 5.0, // 2.5x < factor -> NOT flagged
      "d" -> 1.0, // unchanged
      "e" -> 99.0) // not in baseline -> never flags
    val out = Bench.overBaseline(mins, base, factor = 3.0, absFloorSec = 0.5)
    assert(out.keySet === Set("a"))
    assert(math.abs(out("a") - 3.5) < 1e-9)
  }

  test("overBaseline boundary: exactly factor x base does not flag (strict >)") {
    val out = Bench.overBaseline(Map("a" -> 3.0), Map("a" -> 1.0),
      factor = 3.0, absFloorSec = 0.5)
    assert(out.isEmpty)
  }

  test("default gate is the judge's 2x bar: a r16-q98-shaped 2.42x line flags, 1.9x does not") {
    assert(Bench.RetryFactor === 2.0)
    // the exact shape that survived the round-16 official record
    // unflagged under the old 3.0 factor: 10.7 s vs a 4.43 s baseline
    val out = Bench.overBaseline(Map("q98" -> 10.7, "q97" -> 8.5),
      Map("q98" -> 4.43, "q97" -> 4.40))
    assert(out.keySet === Set("q98"))
    assert(math.abs(out("q98") - 10.7 / 4.43) < 1e-9)
  }

  test("flagSlopes: the 1.5x-linear tripwire catches what 3.0x let through") {
    // round 11's q93 recorded slope 17.3 at a 10x data ratio sailed
    // under the old 30x threshold; at 1.5x-linear (=15x) it flags
    val slopes = Map("q93" -> 17.3, "q189" -> 2.8, "qflat" -> 0.9, "qlin" -> 9.5)
    val out = Bench.flagSlopes(slopes, sfRatio = 10.0)
    assert(out.keySet === Set("q93"))
    // default factor is pinned at 1.5
    assert(Bench.SlopeFactor === 1.5)
    assert(Bench.flagSlopes(Map("x" -> 14.9), 10.0).isEmpty)
    assert(Bench.flagSlopes(Map("x" -> 15.1), 10.0).keySet === Set("x"))
  }

  private def queries(n: Int): Seq[(String, Double)] =
    (1 to n).map(i => f"q${i}%d_some_name" -> (0.1 + (i % 37) * 0.13))

  test("metric line: loaded baseline rides as regressions (empty and non-empty), no baseline as explicit none") {
    val none = Bench.buildMetricLine(queries(20), 1.0, "/x", Nil, baselineDiff = None)
    assert(none.contains(""""baseline":"none""""))
    assert(!none.contains(""""regressions""""))
    val clean = Bench.buildMetricLine(queries(20), 1.0, "/x", Nil,
      baselineDiff = Some(Map.empty))
    assert(clean.contains(""""regressions":{}"""))
    assert(!clean.contains(""""baseline""""))
    val hot = Bench.buildMetricLine(queries(20), 1.0, "/x", Nil,
      baselineDiff = Some(Map("q9_some_name" -> 6.488)))
    assert(hot.contains(""""regressions":{"q9":6.49}"""))
  }

  test("metric line: regressions are capped worst-first so the header can never overflow") {
    val regr = (1 to 30).map(i => f"q${i}%d_some_name" -> (1.0 + i * 0.5)).toMap
    val line = Bench.buildMetricLine(queries(198), 9.9, "/root/testdata/sf0.1",
      Nil, baselineDiff = Some(regr))
    assert(line.length <= 1950, s"overflowed: ${line.length}")
    assert(line.contains(""""regr_omitted":10"""))
    // the worst ratio is kept
    assert(line.contains(""""q30":16.00"""))
    // the mildest is folded
    assert(!line.contains(""""q1":1.50"""))
  }

  test("metric line with regressions still fits at every catalog size") {
    for (n <- Seq(90, 198, 400, 1000)) {
      val line = Bench.buildMetricLine(queries(n), 123.456, "/root/testdata/sf0.1",
        Nil, baselineDiff = Some(Map("q7_some_name" -> 4.2)))
      assert(line.length <= 1950, s"n=$n overflowed: ${line.length}")
      assert(line.contains(""""regressions":{"q7":4.20}"""))
    }
  }
}
