package graft

import org.apache.spark.scheduler._
import scala.util.control.NonFatal

/** Diagnostic main for the optimization rounds: runs named catalog
  * queries once (after a warmup) under a SparkListener and reports,
  * per query, where the wall-clock goes — number of Spark jobs,
  * stages, tasks, summed executor run time, GC time, shuffle bytes,
  * and result-serialization time. At bench scale (sf0.1 ≈ 17 MB) a
  * multi-second query is almost never data-bound: this splits
  * "scheduling/planning overhead × job count" from "actual compute"
  * so optimization effort lands on the right term.
  *
  * Usage: `sbt "runMain graft.JobProfile <query> [query...]"`
  */
object JobProfile {
  final class Acc extends SparkListener {
    /** (jobId, description-or-callsite, startNs) of running jobs. */
    private val running = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val jobLog = new java.util.concurrent.ConcurrentLinkedQueue[(String, Double)]()
    @volatile var verbose = false
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var runTimeMs = 0L
    @volatile var gcTimeMs = 0L
    @volatile var shuffleReadB = 0L
    @volatile var shuffleWriteB = 0L
    @volatile var resultSerMs = 0L
    @volatile var deserMs = 0L
    override def onJobStart(j: SparkListenerJobStart): Unit = synchronized {
      jobs += 1
      val desc = Option(j.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description")))
        .orElse(Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))))
        .getOrElse("?")
      running.put(j.jobId, (desc, System.nanoTime()))
    }
    override def onJobEnd(j: SparkListenerJobEnd): Unit = synchronized {
      Option(running.remove(j.jobId)).foreach { case (desc, t0) =>
        jobLog.add((desc, (System.nanoTime() - t0) / 1e9))
      }
    }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = synchronized {
      stages += 1
      val i = s.stageInfo
      val dt = (for {a <- i.completionTime; b <- i.submissionTime} yield (a - b) / 1e3)
        .getOrElse(0.0)
      stageLog.add((i.name.takeWhile(_ != '\n'), dt,
        stageTasks.getOrDefault(i.stageId, (0, 0L))))
    }
    val stageLog =
      new java.util.concurrent.ConcurrentLinkedQueue[(String, Double, (Int, Long))]()
    /** per-stage (task count, summed deser ms) — attributes the
      * deserialization anomaly to the stage (= call site) causing it */
    private val stageTasks =
      new java.util.concurrent.ConcurrentHashMap[Int, (Int, Long)]()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
      tasks += 1
      val m = t.taskMetrics
      if (m != null) {
        runTimeMs += m.executorRunTime
        gcTimeMs += m.jvmGCTime
        shuffleReadB += m.shuffleReadMetrics.totalBytesRead
        shuffleWriteB += m.shuffleWriteMetrics.bytesWritten
        resultSerMs += m.resultSerializationTime
        deserMs += m.executorDeserializeTime
        stageTasks.merge(t.stageId, (1, m.executorDeserializeTime),
          (a, b) => (a._1 + b._1, a._2 + b._2))
      }
    }
    def reset(): Unit = synchronized {
      jobs = 0; stages = 0; tasks = 0; runTimeMs = 0; gcTimeMs = 0
      shuffleReadB = 0; shuffleWriteB = 0; resultSerMs = 0; deserMs = 0
      jobLog.clear()
      stageLog.clear()
      stageTasks.clear()
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JobProfile <queryName...>")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    val unknown = args.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown query names: ${unknown.mkString(", ")}")
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)
    args.foreach { n =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try {
          SparkEntry.queries(n)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
        } catch { case NonFatal(e) =>
          System.err.println(s"[profile] $n FAILED: ${e.getMessage}")
        }
        val dt = (System.nanoTime() - t0) / 1e9
        GraftSession.sweepPersistedRdds(spark)
        dt
      }
      once() // warmup: codegen + footer caches, like Bench's untimed pass
      acc.reset()
      val wall = once()
      // listener bus is async; give it a beat to drain before reading
      Thread.sleep(300)
      System.err.println(
        f"[profile] $n wall=${wall}%.2fs jobs=${acc.jobs} stages=${acc.stages} " +
          f"tasks=${acc.tasks} execRun=${acc.runTimeMs / 1000.0}%.2fs " +
          f"gc=${acc.gcTimeMs / 1000.0}%.2fs " +
          f"deser=${acc.deserMs / 1000.0}%.2fs resultSer=${acc.resultSerMs / 1000.0}%.2fs " +
          f"shufR=${acc.shuffleReadB / 1024}%dKB shufW=${acc.shuffleWriteB / 1024}%dKB")
      if (sys.env.contains("GRAFT_PROFILE_JOBS")) {
        import scala.jdk.CollectionConverters._
        // aggregate stage submit→complete time by call-site name: where
        // the action count (and its fixed overhead) actually comes from
        acc.stageLog.asScala.toSeq.groupBy(_._1).toSeq
          .map { case (k, vs) =>
            (k, vs.size, vs.map(_._2).sum,
              vs.map(_._3._1).sum, vs.map(_._3._2).sum)
          }
          .sortBy(-_._3)
          .foreach { case (k, cnt, tot, nt, deser) =>
            System.err.println(
              f"[profile]   stage ${tot}%7.3fs n=$cnt%-3d tasks=$nt%-4d " +
                f"deser=${deser / 1000.0}%6.2fs $k")
          }
      }
    }
    spark.stop()
  }
}
