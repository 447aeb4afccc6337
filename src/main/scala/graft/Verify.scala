package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import scala.util.control.NonFatal
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query-name filter (local iteration)
    val (sfDir, outDir, only) = args match {
      case Array(s, o)                      => (s, o, None)
      case Array(s, o, f) if f.trim.nonEmpty => (s, o, Some(f.split(',').toSet))
      case _ =>
        System.err.println("usage: graft.Verify <sfDir> <outDir> [q1,q2,...]")
        sys.exit(2)
    }
    val spark: SparkSession = GraftSession.getOrCreate()
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        // repartition(1), not coalesce(1): a coalesce collapses the whole
        // upstream narrow plan into one task; the shuffle boundary keeps
        // the computation parallel and only the write single-file.
        // NonFatal only — an OOM must kill the run, not let later queries
        // produce bogus parquet from a corrupted JVM.
        try fn(spark, sfDir).repartition(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case NonFatal(e) =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
        finally {
          // release the query's pinned checkpoint blocks: a 175-query
          // dump in one JVM otherwise accumulates them (see
          // GraftSession.sweepPersistedRdds) and slows progressively
          GraftSession.sweepPersistedRdds(spark)
          ()
        }
      }
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${Json.str(k)}: ${Json.str(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
