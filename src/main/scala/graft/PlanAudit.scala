package graft
import org.apache.spark.sql.functions._
import graft.queries.Catalog

/** Prints the physical plan of selected catalog queries with the
  * properties worth auditing at scale: pushed filters, read schemas,
  * join strategies, exchange count, codegen spans. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val interesting = Seq("q2_filter_project", "q6_broadcast_join",
      "q7_fact_join", "q8_interval_expand", "q16_topk", "q23_cosine_topk")
    for (q <- Catalog.all if interesting.contains(q.name)) {
      val df = q.fn(spark, d)
      val plan = df.queryExecution.executedPlan.toString
      val exchanges = "Exchange".r.findAllIn(plan).size
      val wsc = "WholeStageCodegen".r.findAllIn(plan).size
      println(s"=== ${q.name}: exchanges=$exchanges codegenSpans=$wsc")
      plan.linesIterator
        .filter(l => l.contains("PushedFilters") || l.contains("ReadSchema") ||
          l.contains("Join") || l.contains("Generate"))
        .map(_.trim.take(180)).foreach(l => println("  " + l))
    }
    spark.stop()
  }
}
