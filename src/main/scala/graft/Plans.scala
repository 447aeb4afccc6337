package graft

import scala.util.control.NonFatal

/** Plan-capture tool for the optimization rounds: dumps
  * `.explain("formatted")` for each named catalog query to
  * `<outDir>/<name>.txt` so before/after plan shapes can be committed
  * and diffed (`plans/rNN/<query>_before.txt` / `..._after.txt`).
  *
  * Note: store-building queries (the certification/repair family)
  * execute their store-write actions while CONSTRUCTING the DataFrame;
  * the captured plan is the final read/probe plan. The build actions'
  * plans are part of the operator code and are discussed in the
  * optimization notes instead.
  *
  * Usage: `sbt "runMain graft.Plans <outDir> [query...]"`
  * (no query names = every catalog query; slow, builds every store).
  */
object Plans {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Plans <outDir> [queryName...]")
    val outDir = args.head
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    val all = SparkEntry.queries.keys.toSeq.sorted
    val names = if (args.length > 1) args.tail.toSeq else all
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown query names: ${unknown.mkString(", ")}")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"$n.txt"),
          plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        System.err.println(s"[plans] wrote $outDir/$n.txt")
      } catch {
        case NonFatal(e) =>
          System.err.println(s"[plans] $n FAILED: ${e.getMessage}")
      }
      GraftSession.sweepPersistedRdds(spark)
    }
    spark.stop()
  }
}
