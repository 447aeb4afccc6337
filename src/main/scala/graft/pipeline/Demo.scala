package graft.pipeline

import java.nio.file.Files
import java.time.LocalDate

import graft.GraftSession

/** Runnable end-to-end example of the revenue pipeline: raw Stripe
  * NDJSON → staging → curated → marts → the four analyst queries
  * (reference: README.md:174-213). Usage:
  *   sbt "runMain graft.pipeline.Demo <invoices.ndjson> [warehouseDir] [asOfDate]"
  * With no args, runs on a tiny built-in sample.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    import spark.implicits._

    val asOf = if (args.length > 2) LocalDate.parse(args(2)) else LocalDate.of(2024, 3, 1)
    val warehouse =
      if (args.length > 1) args(1)
      else Files.createTempDirectory("graft-demo-wh").toString

    val rawInvoices =
      if (args.nonEmpty) spark.read.schema(Schemas.invoiceSchema).json(args(0))
      else spark.read.schema(Schemas.invoiceSchema).json(spark.createDataset(Seq(
        """{"id":"inv1","customer":"cus1","subscription":"sub1","status":"paid","currency":"USD","created":1704844800,"amount_due":13000,"amount_paid":13000,"amount_remaining":0,"subtotal":12000,"total":13000,"tax":1000,"collection_method":"charge_automatically","period_start":1704067200,"period_end":1706659200,"automatic_tax":{"enabled":true,"status":"complete"},"metadata":{},"lines":{"data":[{"id":"li1","type":"subscription","description":"monthly","amount":12000,"currency":"USD","quantity":1,"subscription":null,"period":{"start":1704067200,"end":1706659200},"taxes":[{"amount":1000,"tax_behavior":"exclusive"}],"metadata":{}}]}}""",
        """{"id":"inv2","customer":"cus2","subscription":null,"status":"paid","currency":"EUR","created":1704844800,"amount_due":1000,"amount_paid":1000,"amount_remaining":0,"subtotal":1000,"total":1000,"tax":0,"collection_method":"send_invoice","period_start":1704844800,"period_end":1704844800,"automatic_tax":{"enabled":false,"status":null},"metadata":{},"lines":{"data":[{"id":"li2","type":"invoiceitem","description":"one-off","amount":1000,"currency":"EUR","quantity":2,"subscription":null,"period":{"start":1704844800,"end":1704844800},"taxes":[],"metadata":{}}]}}""")))

    val empty = spark.read.schema(Schemas.subscriptionSchema)
      .json(spark.createDataset(Seq.empty[String]))
    val emptyU = spark.read.schema(Schemas.subscriptionUpdateSchema)
      .json(spark.createDataset(Seq.empty[String]))

    val tables = new Pipeline(spark, warehouse, asOf).run(rawInvoices, empty, emptyU)

    println(s"=== warehouse: $warehouse")
    tables.foreach { case (name, df) => println(f"$name%-26s ${df.count()}%6d rows") }

    println("=== Q1 total deferred @ 2024-01-15")
    AnalystQueries.totalDeferred(tables("deferred_revenue"), LocalDate.of(2024, 1, 15)).show()
    println("=== Q2 deferred by customer @ 2024-01-15")
    AnalystQueries.deferredByCustomer(tables("deferred_revenue"), LocalDate.of(2024, 1, 15)).show()
    println("=== Q3 deferred trend (first 5 days)")
    AnalystQueries.deferredTrend(tables("deferred_revenue")).show(5)
    println("=== Q4 recognized in 2024 Q1")
    AnalystQueries.recognizedInQuarter(
      tables("recognized_revenue"), tables("calendar"), 2024, "1").show()

    println("=== quality checks")
    Checks.standardSuite(tables).foreach(r =>
      println(f"${if (r.passed) "PASS" else "FAIL"} ${r.name}%-45s ${r.detail}"))

    spark.stop()
  }
}
