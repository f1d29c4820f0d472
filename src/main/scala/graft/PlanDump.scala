package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: print the physical plan of named SparkEntry queries
  * (SimpleMode; pass --formatted for the long form, --final to execute
  * the query first and print the FINAL adaptive plan — the only place
  * runtime stage reuse / AQE re-planning is visible; the static
  * explain shows the pre-execution guess). Pairs with docs/PLANS.md's
  * "explain, then iterate" loop.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val (flags, names) = args.partition(_.startsWith("--"))
    val mode = if (flags.contains("--formatted"))
      org.apache.spark.sql.execution.FormattedMode
    else org.apache.spark.sql.execution.SimpleMode
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"===== $n =====")
      val df = SparkEntry.queries(n)(spark, sfDir)
      if (flags.contains("--final")) {
        df.queryExecution.toRdd.foreach(_ => ())
        println(df.queryExecution.executedPlan.toString)
      } else
        println(df.queryExecution.explainString(mode))
    }
    spark.stop()
  }
}
