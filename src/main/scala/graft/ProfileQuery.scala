package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Optimization-round instrument: run one registry query `reps` times
  * (bench methodology — noop sink, cache cleared between reps) under a
  * listener that attributes wall time to Spark jobs and stages, so the
  * expensive stage of a multi-job query is identified by measurement
  * rather than guessed from the plan (guide §1.1).
  *
  * Usage: runMain graft.ProfileQuery <sfDir> <name1,name2,...> [reps]
  * Prints, for the FASTEST rep of each query: each job's wall span and
  * its stages' name / task count / total task time / shuffle bytes.
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val qnames = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class StageRec(name: String, tasks: Int, taskTimeMs: Long,
      shufReadMB: Double, shufWriteMB: Double, inputMB: Double)
    case class JobRec(id: Int, startMs: Long, var endMs: Long,
      stages: mutable.Buffer[StageRec])

    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    val stageToJob = mutable.HashMap.empty[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = synchronized {
        jobs(js.jobId) = JobRec(js.jobId, js.time, -1, mutable.Buffer.empty)
        js.stageIds.foreach(sid => stageToJob(sid) = js.jobId)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = synchronized {
        jobs.get(je.jobId).foreach(_.endMs = je.time)
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        synchronized {
          val si = sc.stageInfo
          val jid = stageToJob.getOrElse(si.stageId, -1)
          jobs.get(jid).foreach { j =>
            val m = si.taskMetrics
            j.stages += StageRec(
              si.name.take(90), si.numTasks, m.executorRunTime,
              m.shuffleReadMetrics.totalBytesRead / 1e6,
              m.shuffleWriteMetrics.bytesWritten / 1e6,
              m.inputMetrics.bytesRead / 1e6)
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)

    qnames.foreach { name =>
      val fn = SparkEntry.queries(name)
      var best = Double.MaxValue
      var bestJobs: Seq[JobRec] = Seq.empty
      for (r <- 1 to reps) {
        listener.synchronized { jobs.clear(); stageToJob.clear() }
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        println(f"[$name] rep $r: $dt%.3f s, jobs=${jobs.size}")
        if (dt < best) {
          best = dt
          bestJobs = listener.synchronized { jobs.values.map(j =>
            j.copy(stages = j.stages.clone())).toSeq }
        }
      }
      println(f"\n=== $name fastest rep: $best%.3f s, ${bestJobs.size} jobs ===")
      val t0 = bestJobs.headOption.map(_.startMs).getOrElse(0L)
      bestJobs.foreach { j =>
        val span = if (j.endMs > 0) (j.endMs - j.startMs) / 1e3 else -1.0
        println(f"job ${j.id}%3d  +${(j.startMs - t0) / 1e3}%7.3f  span $span%7.3f s")
        j.stages.sortBy(-_.taskTimeMs).foreach { s =>
          println(f"    tasks=${s.tasks}%3d taskTime=${s.taskTimeMs}%6d ms " +
            f"in=${s.inputMB}%7.2f MB sr=${s.shufReadMB}%7.2f sw=${s.shufWriteMB}%7.2f  ${s.name}")
        }
      }
      println()
    }
    spark.stop()
  }
}
