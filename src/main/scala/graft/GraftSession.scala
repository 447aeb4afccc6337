package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration.
  *
  * Local testing runs `local[N]`; on a real cluster only
  * master/memory change — the SQL configs below are the ones that
  * matter for plan quality at scale:
  *  - AQE on (runtime re-plan, skew-join splitting, shuffle coalescing)
  *  - shuffle partitions sized to the core count locally (a cluster
  *    deployment would size to 2-3x total cores; AQE coalesces down)
  *  - parquet micros timestamps (interop with external readers)
  *  - UTC session time zone (deterministic date/timestamp semantics,
  *    matches the reference's BigQuery UTC behavior)
  */
object GraftSession {
  def builder(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]",
              shufflePartitions: Int =
                sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.ui.enabled", "false")

  def getOrCreate(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Unpersist every RDD still pinned in the block manager and return
    * how many there were.
    *
    * Catalog queries checkpoint intermediates (`localCheckpoint` via
    * stageBarrier / iterative operators); the FINAL result of such a
    * query stays pinned after the caller's action because nothing
    * else knows about it. A long-lived session that executes many
    * catalog queries therefore accumulates pinned blocks — round 8
    * measured an 8× slowdown on the heaviest shuffle query after ~140
    * checkpoint-heavy queries had run in the same JVM. Harnesses that
    * run queries to completion and never re-execute their plans
    * (Bench, Verify, batch jobs) should sweep between queries; the
    * swept frames fail loudly if re-executed, they do not silently
    * recompute. */
  def sweepPersistedRdds(spark: SparkSession): Int = {
    val pinned = spark.sparkContext.getPersistentRDDs
    pinned.values.foreach(_.unpersist(blocking = false))
    pinned.size
  }
}
