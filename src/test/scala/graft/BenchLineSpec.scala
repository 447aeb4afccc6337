package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench metric-line ladder: the ONE line the driver parses
  * from its 2000-char tail window must fit and stay valid JSON at ANY
  * catalog size — round 10's official bench would have failed rc=1
  * without the top-spenders stage (198 queries overflowed even
  * 1-decimal bare keys). Pure string logic: no SparkSession. */
class BenchLineSpec extends AnyFunSuite {

  private def queries(n: Int): Seq[(String, Double)] =
    (1 to n).map(i => f"q${i}%d_some_name" -> (0.1 + (i % 37) * 0.13))

  private def parseable(line: String): Boolean = {
    // minimal JSON sanity without a parser on the classpath: balanced
    // braces, no trailing comma, mandatory fields present
    line.count(_ == '{') == line.count(_ == '}') &&
      !line.contains(",}") && !line.contains(",]") &&
      line.startsWith("""{"metric":"total","value":""") &&
      line.contains(""""queries":{""") && line.contains(""""sf":""")
  }

  test("fits the 2000-char tail at every catalog size, 10..1000 queries") {
    for (n <- Seq(10, 90, 187, 198, 250, 400, 1000)) {
      val line = Bench.buildMetricLine(queries(n), 123.456, "/root/testdata/sf0.1",
        failed = Nil)
      assert(line.length <= 1950, s"n=$n overflowed: ${line.length} chars")
      assert(parseable(line), s"n=$n line malformed: $line")
      assert(line.contains(""""value":123.456"""))
    }
  }

  test("small catalogs keep full names and 3 decimals; huge ones keep the top spenders") {
    val small = Bench.buildMetricLine(queries(20), 1.0, "/x", Nil)
    assert(small.contains(""""q1":""") && !small.contains(""""keys":"qN""""))
    val huge = Bench.buildMetricLine(queries(1000), 1.0, "/x", Nil)
    assert(huge.contains(""""keys":"qN"""") && huge.contains(""""q_omitted":"""))
    // the top spender by time must be in the kept prefix
    val top = queries(1000).maxBy(_._2)
    assert(huge.contains("\"" + top._1.drop(1).takeWhile(_ != '_') + "\":"),
      s"top spender missing from $huge")
    // omitted count + kept entries == catalog size
    val omitted = """"q_omitted":(\d+)""".r.findFirstMatchIn(huge).get.group(1).toInt
    val kept = """"\d+":\d""".r.findAllIn(
      huge.substring(huge.indexOf("\"queries\":{"))).size
    assert(kept + omitted === 1000, s"kept=$kept omitted=$omitted")
  }

  test("failed list rides along and the line still fits") {
    val line = Bench.buildMetricLine(queries(198), 9.9, "/root/testdata/sf0.1",
      failed = Seq("q42_dedup_clusters", "q93_incremental_lsh"))
    assert(line.length <= 1950)
    assert(line.contains(""""failed":["q42","q93"]"""))
    assert(parseable(line))
  }
}
