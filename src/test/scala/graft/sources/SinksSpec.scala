package graft.sources

import java.nio.file.Files

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SinksSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val out = {
    val dir = Files.createTempDirectory("graft-sink").toString + "/t"
    val df = spark.range(0, 10000).select(
      ($"id" % 7).cast("string").as("day"),
      ($"id" % 50).as("k"),
      $"id".as("v"))
    Sinks.writePartitioned(df, dir, "day", clusterCols = Seq("k"))
    dir
  }

  test("partitioned layout: one directory per partition value") {
    val dirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.length === 7)
    assert(dirs.forall(_.startsWith("day=")))
  }

  test("partition filter prunes directories at the scan") {
    val q = spark.read.parquet(out).filter($"day" === "3")
    assert(q.count() === 10000 / 7 + (if (3 < 10000 % 7) 1 else 0))
    val scan = q.queryExecution.executedPlan.toString
    // partition filters present and the scan reads a single directory
    assert(scan.contains("PartitionFilters"), scan)
    val files = q.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.forall(_.contains("day=3")))
  }

  test("cluster sort: rows within each file are ordered by the cluster key") {
    val oneFile = spark.read.parquet(out + "/day=1")
    val ks = oneFile.select("k").collect().map(_.getLong(0))
    // file-internal order preserved by parquet row order
    assert(ks.toSeq === ks.sorted.toSeq)
  }
}
