package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev profiling harness (guide §1.1 empirical loop): run named
  * registered queries once, warm, and print per-JOB wall time plus
  * per-stage task counts — the attribution the UI would give, without
  * a UI in the sandbox. Usage:
  *   graft.Profile <sfDir> <name1,name2,...> [reps]
  * Never used by the driver or the bench; timings here are diagnostic.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',').map(_.trim).filter(_.nonEmpty)
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String, Int)]()
    val stageTasks = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.put(js.jobId, (js.time,
          Option(js.properties).map(_.getProperty("spark.job.description"))
            .flatMap(Option(_)).getOrElse(""), js.stageIds.length))
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val (t0, desc, nst) = jobs.getOrDefault(je.jobId, (je.time, "?", 0))
        done.add((je.jobId, je.time - t0, desc, nst))
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stageTasks.put(sc.stageInfo.stageId, sc.stageInfo.numTasks)
        val si = sc.stageInfo
        val ms = (for (a <- si.completionTime; b <- si.submissionTime)
          yield a - b).getOrElse(-1L)
        if (ms > 100) {
          val tm = si.taskMetrics
          println(f"    stage ${si.stageId}%4d ${ms / 1e3}%7.3f s " +
            f"tasks=${si.numTasks}%3d run=${tm.executorRunTime / 1e3}%6.3f " +
            f"deser=${tm.executorDeserializeTime / 1e3}%6.3f " +
            f"gc=${tm.jvmGCTime / 1e3}%6.3f " +
            f"cpu=${tm.executorCpuTime / 1e9}%6.3f ${si.name.take(40)}")
        }
      }
    })
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      for (r <- 1 to reps) {
        done.clear()
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
        val wall = (System.nanoTime() - t0) / 1e9
        graft.operators.Materialize.releaseAll(spark)
        // give listener events a moment to drain
        Thread.sleep(300)
        import scala.jdk.CollectionConverters._
        val js = done.asScala.toSeq.sortBy(_._1)
        println(f"== $name rep $r wall $wall%.3f s, ${js.size} jobs, " +
          f"sum-job ${js.map(_._2).sum / 1e3}%.3f s")
        if (r == reps) js.foreach { case (id, ms, desc, nst) =>
          println(f"  job $id%4d ${ms / 1e3}%7.3f s  stages=$nst%2d  $desc")
        }
      }
    }
    spark.stop()
  }
}
