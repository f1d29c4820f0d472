package graft
import org.apache.spark.sql.SparkSession

/** Dev profiler: run named SparkEntry queries repeatedly in ONE warm
  * session, interleaved, so per-query times can be A/B-compared without
  * the session-bringup and machine-noise confounds that dominate
  * single-shot bench numbers (adjacent-run noise measured >2.5x).
  *
  * Usage: Profile <name[,name...]> [reps]   (env: SPARK_GRAFT_SF_DIR)
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val reps = if (args.length > 1) args(1).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val times = scala.collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    for (r <- 1 to reps; n <- names) {
      val t0 = System.nanoTime()
      // full evaluation, NOT count(): under count() Catalyst prunes
      // projections and drops sorts, so map-only queries (t_normalize,
      // t_regex…) would time the bare scan instead of their expressions
      SparkEntry.queries(n)(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
      val dt = (System.nanoTime() - t0) / 1e9
      // drop this rep's Materialize pins (same as Bench): without this,
      // pin-using queries leak persisted blocks once per rep
      graft.operators.Materialize.releaseAll(spark)
      times(n) = dt :: times(n)
      println(f"[profile] $n%-20s rep$r%-3d $dt%7.3f s")
    }
    names.foreach { n =>
      val ts = times(n).sorted
      println(f"[profile] $n%-20s median ${ts(ts.length / 2)}%7.3f s  min ${ts.head}%7.3f s")
    }
    spark.stop()
  }
}
