package graft

import org.apache.spark.sql.SparkSession

/** Dev profiling CLI (guide §7.3: driver-side planning cost): for each
  * registered query, time (a) `fn()` construction — which EXECUTES any
  * eager Materialize.pin jobs, (b) the Catalyst phases recorded by
  * QueryPlanningTracker (analysis / optimization), and (c) physical
  * planning to `executedPlan`. Nothing else is executed; the numbers
  * attribute the per-query DRIVER cost the bench pays inside its timed
  * region on every pass. Usage:
  *   graft.PlanTime <sfDir> [name1,name2,...]
  * Never used by the driver or the bench; diagnostic only.
  */
object PlanTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val only: Option[Set[String]] =
      if (args.length > 1) Some(args(1).split(',').map(_.trim).toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    val suite = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    var (tc, ta, to, tp) = (0.0, 0.0, 0.0, 0.0)
    println(f"${"query"}%-24s ${"construct"}%9s ${"analysis"}%9s ${"optimize"}%9s ${"physical"}%9s")
    suite.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val c = (System.nanoTime() - t0) / 1e9
      val qe = df.queryExecution
      val t1 = System.nanoTime()
      qe.executedPlan // forces analysis -> optimization -> physical
      val phys = (System.nanoTime() - t1) / 1e9
      import scala.jdk.CollectionConverters._
      val phases = qe.tracker.phases
      def ph(k: String) =
        phases.get(k).map(s => (s.endTimeMs - s.startTimeMs) / 1e3).getOrElse(0.0)
      val (an, op) = (ph("analysis"), ph("optimization"))
      tc += c; ta += an; to += op; tp += phys - an - op
      println(f"$name%-24s $c%9.3f $an%9.3f $op%9.3f ${phys - an - op}%9.3f")
      graft.operators.Materialize.releaseAll(spark)
    }
    println(f"${"TOTAL"}%-24s $tc%9.3f $ta%9.3f $to%9.3f $tp%9.3f")
    spark.stop()
  }
}
