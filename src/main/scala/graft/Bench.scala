package graft
import org.apache.spark.sql.SparkSession
/** Benchmark main: runs every catalog query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line of per-query wall-clock seconds.
  * A full untimed warmup pass runs first so the timed pass measures
  * steady-state execution (codegen compiled, parquet footers cached)
  * rather than JVM cold start.
  *
  * Each query is driven by a noop-sink write, not `.count()`: under
  * count Catalyst prunes every unreferenced column, so a projection-
  * only query (q2/q4/q11/q18/q25/q26/q43) would be timed as little
  * more than a row-count scan with its expression cost never executed.
  * The noop sink materializes every output column through the full
  * plan — the same work Verify pays — while writing nothing.
  */
object Bench {
  private def run(spark: SparkSession, name: String, sfDir: String): Unit =
    try SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.queries.keys.toSeq.sorted
    // warmup (untimed)
    names.foreach(run(spark, _, sfDir))
    // timed
    val results = names.map { name =>
      val t0 = System.nanoTime()
      run(spark, name, sfDir)
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
