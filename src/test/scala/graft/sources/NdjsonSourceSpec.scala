package graft.sources

import java.nio.file.Files

import graft.SparkSpecBase
import graft.pipeline.Schemas
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class NdjsonSourceSpec extends SparkSpecBase {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-ndjson").toString
    Files.writeString(java.nio.file.Path.of(d, "part-0.json"),
      """{"id":"a","created":100,"status":"paid","v":1.5}
        |{"id":"b","created":200,"status":"open","v":2.5}
        |""".stripMargin)
    Files.writeString(java.nio.file.Path.of(d, "part-1.json"),
      """{"id":"c","created":300,"status":"paid","v":3.5}
        |
        |{"id":"d","created":400,"status":"paid"}
        |""".stripMargin)
    d
  }

  private val schema = StructType(Seq(
    StructField("id", StringType), StructField("created", LongType),
    StructField("status", StringType), StructField("v", DoubleType)))

  private def src = spark.read.format("graft.sources.NdjsonSource")
    .schema(schema).option("path", dir).load()

  test("reads all records across files; one partition per file") {
    assert(src.count() === 4)
    assert(src.rdd.getNumPartitions === 2)
    assert(src.select("id").collect().map(_.getString(0)).sorted ===
      Array("a", "b", "c", "d"))
  }

  test("results match the built-in json reader on real invoice fixtures") {
    val d2 = Files.createTempDirectory("graft-ndjson2").toString
    val line =
      """{"id":"inv1","customer":"c1","status":"paid","currency":"USD","created":100,
        |"amount_due":1,"amount_paid":1,"amount_remaining":0,"subtotal":1,"total":1,"tax":0,
        |"collection_method":"x","period_start":1,"period_end":2,
        |"automatic_tax":{"enabled":true,"status":"ok"},"metadata":{"k":"v"},
        |"lines":{"data":[{"id":"li1","type":"t","description":"d","amount":5,"currency":"USD",
        |"quantity":1,"subscription":null,"period":{"start":1,"end":2},
        |"taxes":[{"amount":1,"tax_behavior":"exclusive"}],"metadata":{}}]}}"""
        .stripMargin.linesIterator.mkString("")
    Files.writeString(java.nio.file.Path.of(d2, "inv.json"), line + "\n")
    val viaDsv2 = spark.read.format("graft.sources.NdjsonSource")
      .schema(Schemas.invoiceSchema).option("path", d2).load()
    val viaBuiltin = spark.read.schema(Schemas.invoiceSchema).json(d2)
    assert(viaDsv2.collect().map(_.toString).sorted ===
      viaBuiltin.collect().map(_.toString).sorted)
  }

  test("filter + column pruning reach the scan (HWM pushdown pattern)") {
    val q = src.filter(col("created") >= 250 && col("status") === "paid")
      .select("id", "created")
    assert(q.collect().map(_.getString(0)).sorted === Array("c", "d"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters=[") && plan.contains("created"), plan)
    // pruned read schema: only the required columns flow out of the scan
    assert(q.queryExecution.optimizedPlan.schema.fieldNames.toSet ===
      Set("id", "created"))
  }

  test("missing fields parse as nulls; blank lines are skipped") {
    val d = src.filter(col("id") === "d").head()
    assert(d.isNullAt(d.fieldIndex("v")))
  }

  test("malformed lines: failfast by default with the line in the error") {
    val d = Files.createTempDirectory("graft-ndjson-bad").toString
    Files.writeString(java.nio.file.Path.of(d, "part-0.json"),
      """{"id":"a","created":100,"status":"paid","v":1.5}
        |{not valid json at all
        |{"id":"b","created":200,"status":"open","v":2.5}
        |""".stripMargin)
    val bad = spark.read.format("graft.sources.NdjsonSource")
      .schema(schema).option("path", d).load()
    val e = intercept[Exception] { bad.count() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("Malformed NDJSON line")), e.toString)
  }

  test("malformed lines: dropmalformed skips them and keeps the rest") {
    val d = Files.createTempDirectory("graft-ndjson-drop").toString
    Files.writeString(java.nio.file.Path.of(d, "part-0.json"),
      """{"id":"a","created":100,"status":"paid","v":1.5}
        |{not valid json at all
        |{"id":"b","created":200,"status":"open","v":2.5}
        |""".stripMargin)
    val ok = spark.read.format("graft.sources.NdjsonSource")
      .schema(schema).option("path", d).option("mode", "dropmalformed").load()
    assert(ok.select("id").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().sorted === Array("a", "b"))
  }

  test("nested directory layouts are listed recursively; hidden trees skipped") {
    val d = Files.createTempDirectory("graft-ndjson-nested").toString
    Files.createDirectories(java.nio.file.Path.of(d, "day=2024-01-01"))
    Files.createDirectories(java.nio.file.Path.of(d, "_hidden"))
    Files.writeString(java.nio.file.Path.of(d, "day=2024-01-01", "part-0.json"),
      """{"id":"a","created":100,"status":"paid","v":1.5}""" + "\n")
    Files.writeString(java.nio.file.Path.of(d, "_hidden", "part-0.json"),
      """{"id":"zz","created":1,"status":"paid","v":9.9}""" + "\n")
    val out = spark.read.format("graft.sources.NdjsonSource")
      .schema(schema).option("path", d).load()
    assert(out.select("id").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().toSeq === Seq("a"))
  }

  test("unknown mode option is rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft.sources.NdjsonSource")
        .schema(schema).option("path", dir).option("mode", "permissive").load()
    }
    assert(e.getMessage.contains("unsupported mode"))
  }
}
