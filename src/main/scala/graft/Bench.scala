package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: session bring-up, codegen compiler, parquet
    // footer reads — keeps the first timed query comparable to the rest.
    // The dedup warmup compiles the shingle/MinHash expression classes,
    // whose first-use JIT cost otherwise lands on whichever d_* query
    // happens to sort first (measured ~3 s of pure warmup attributed to
    // d_cluster before this).
    spark.range(1000).selectExpr("sum(id)").collect()
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    try {
      // warm on the bench's own fixture dir — a hardcoded path would be
      // silently skipped on other layouts, putting the JIT cost back on
      // the first timed d_* query
      operators.Dedup.dMinhashLsh(spark, sfDir)
        .queryExecution.toRdd.foreach(_ => ())
      operators.Similarity.sCosineTopK(spark, sfDir)
        .queryExecution.toRdd.foreach(_ => ())
    } catch { case e: Throwable =>
      System.err.println(s"[bench] warmup skipped: ${e.getMessage}")
    }
    // fixed (sorted) execution order: stable warmup attribution and
    // directly comparable per-query numbers across rounds
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // full plan evaluation, NOT count(): under count() Catalyst prunes
      // projections and drops sorts, so map-only queries would time the
      // bare scan instead of the expressions they exist to measure
      val ok = try { fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ()); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
      }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // a failed query must make the round look broken, not fast: surface
    // the failures explicitly instead of folding time-to-crash into total
    val failed = results.collect { case (k, _, false) => s"\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    // stdout first — it must carry the result even if the file write
    // fails (an unwritable path must not discard a finished run).
    println(json)
    // stdout can also be mangled by a build tool's logger ("[info] "
    // prefixes broke the round-1 parse) — so best-effort persist to a
    // known file the driver (or a human) can read back unambiguously.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json + "\n")
    catch { case e: Exception =>
      System.err.println(s"[bench] could not write $outFile: ${e.getMessage}")
    }
    spark.stop()
  }
}
