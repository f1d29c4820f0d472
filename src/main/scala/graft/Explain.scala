package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Plan-dump CLI: write `explain("formatted")` output for registered
  * queries — the reproducible source of the plan audits curated in
  * docs/PLANS.md. Usage mirrors [[Verify]]:
  * `Explain <sfDir> <outDir> [query,query,...]` → one `<name>.txt` per
  * query. The final frame is analyzed, not executed — though queries
  * built on [[graft.operators.Materialize.pin]] do materialize their
  * pinned subframes while being constructed (the pin is eager by
  * design). AQE re-planning is exercised by PlanSpec, which asserts on
  * EXECUTED plans where it matters.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    if (args.length < 2 || args.length > 3) {
      System.err.println("Usage: Explain <sfDir> <outDir> [query,query,...]")
      sys.exit(2)
    }
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length == 3) Some(args(2).split(",").toSet) else None
    val queries = only.map(f => SparkEntry.queries.filter(kv => f(kv._1)))
      .getOrElse(SparkEntry.queries)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val mode = ExplainMode.fromString("formatted")
    queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.explainString(mode)
        Files.writeString(Paths.get(s"$outDir/$name.txt"), plan)
      } catch { case e: Throwable =>
        System.err.println(s"[explain] $name failed: ${e.getMessage}")
      } finally graft.operators.Materialize.releaseAll(spark)
    }
    spark.stop()
  }
}
