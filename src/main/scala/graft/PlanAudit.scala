package graft
import graft.queries.Catalog

/** Prints the physical plan of selected catalog queries with the
  * properties worth auditing at scale: pushed filters, read schemas,
  * join strategies, exchange count, codegen spans. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    // static audit: with AQE on, executed stages print as opaque
    // QueryStage references and hide their codegen/join internals
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val interesting = Seq("q2_filter_project", "q6_broadcast_join",
      "q7_fact_join", "q8_interval_expand", "q16_topk", "q23_cosine_topk",
      "q47_ndjson_pushdown", "q50_contamination", "q51_repetition")
    for (q <- Catalog.all if interesting.contains(q.name)) {
      val df = q.fn(spark, d)
      val plan = df.queryExecution.executedPlan.toString
      // negative lookbehind: ReusedExchange is a reuse marker, not a
      // second shuffle — counting it would overstate the exchange count
      val exchanges = """(?<!Reused)Exchange""".r.findAllIn(plan).size
      // codegen stages print as "*(n) Op" in the simple plan string
      val wsc = """\*\(\d+\)""".r.findAllIn(plan).map(_.toString).toSet.size
      println(s"=== ${q.name}: exchanges=$exchanges codegenSpans=$wsc")
      plan.linesIterator
        .filter(l => l.contains("PushedFilters") || l.contains("ReadSchema") ||
          l.contains("Join") || l.contains("Generate"))
        .map(_.trim.take(180)).foreach(l => println("  " + l))
    }
    spark.stop()
  }
}
