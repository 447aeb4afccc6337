package graft.sources

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class EvolveSpec extends SparkSpecBase {
  import spark.implicits._

  private val canonical = StructType(Seq(
    StructField("id", LongType),
    StructField("v", StringType),
    StructField("w", DoubleType)))

  test("missing columns surface as typed NULLs; extra columns drop; int widens to long") {
    val root = java.nio.file.Files.createTempDirectory("graft-ev").toString
    // old batch: int ids, no w; plus an undeclared column
    Seq((1, "a", "junk"), (2, "b", "junk"))
      .toDF("id", "v", "undeclared").write.parquet(s"$root/b1")
    // new batch: long ids, w present
    Seq((3L, "c", 1.5)).toDF("id", "v", "w").write.parquet(s"$root/b2")
    val got = Evolve.readEvolved(spark, Seq(s"$root/b1", s"$root/b2"),
      canonical)
    assert(got.schema === canonical)
    assert(got.as[(Long, String, Option[Double])].collect().toSet ===
      Set((1L, "a", None), (2L, "b", None), (3L, "c", Some(1.5))))
  }

  test("narrowing refuses loudly in strict mode; strict=false allows it") {
    val root = java.nio.file.Files.createTempDirectory("graft-ev2").toString
    Seq((5L, "x")).toDF("id", "v").write.parquet(s"$root/b1")
    val narrow = StructType(Seq(
      StructField("id", IntegerType), StructField("v", StringType)))
    val e = intercept[IllegalArgumentException] {
      Evolve.readEvolved(spark, Seq(s"$root/b1"), narrow)
    }
    assert(e.getMessage.contains("NARROWING"), e.getMessage)
    val loose = Evolve.readEvolved(spark, Seq(s"$root/b1"), narrow,
      strict = false).as[(Int, String)].collect()
    assert(loose.toSeq === Seq((5, "x")))
  }

  test("incompatible types refuse with path and column named") {
    val root = java.nio.file.Files.createTempDirectory("graft-ev3").toString
    Seq(("notanumber", 1L)).toDF("id", "k").write.parquet(s"$root/b1")
    val want = StructType(Seq(StructField("id", ArrayType(LongType))))
    val e = intercept[IllegalArgumentException] {
      Evolve.readEvolved(spark, Seq(s"$root/b1"), want)
    }
    assert(e.getMessage.contains("'id'") && e.getMessage.contains("b1"),
      e.getMessage)
  }

  test("pushdown reaches every per-batch scan through the alignment projection") {
    val root = java.nio.file.Files.createTempDirectory("graft-ev4").toString
    Seq((1, "a")).toDF("id", "v").write.parquet(s"$root/b1")
    Seq((2L, "b", 9.0)).toDF("id", "v", "w").write.parquet(s"$root/b2")
    val plan = Evolve.readEvolved(spark, Seq(s"$root/b1", s"$root/b2"),
      canonical).filter(col("v") === "a")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(v), EqualTo(v,a)]"),
      s"filter did not reach the scans:\n$plan")
  }
}
