package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scale curves for the flagship scale designs — the
  * measured counterpart to the structural 100 TB arguments (bounded
  * state, banded pairs, pruned scans). Blows the sf fixtures up 4x and
  * 16x by unioning SHIFTED copies (never byte-duplicates: shifted ids
  * keep keys unique where the design expects distinct entities, and
  * document text is token-interleaved per copy so copies are NOT
  * near-duplicates of each other or the original — a naive duplicate
  * blow-up would measure an adversarial dup-block census, not corpus
  * growth), writes each factor to a scratch dir with identical writer
  * settings (factor 1 included, so file layout is uniform across
  * factors), and times each flagship query twice per factor through
  * the bench's full-plan evaluation.
  *
  * Growth semantics per flagship:
  *  - `d_minhash_lsh`: corpus x N, near-dup census constant (copy 0
  *    keeps the planted dups; interleaved copies share no shingles) —
  *    banding should scale ~linear in N.
  *  - `e_asof_native` vs `e_asof_salted`: events AND orders x N with
  *    user keys UNCHANGED — per-key density grows N-fold, the skew
  *    axis the salted variant exists for.
  *  - `g_grid_served`: customer plants x N, supplier probe set FIXED —
  *    output grows ~N (denser neighborhoods), the store build + serve
  *    should track it.
  *  - `s_ivf_pq_served`: embedding corpus x N (copies perturbed so
  *    centroids spread), query set FIXED (vec_id < NumQueries lives in
  *    copy 0 only) — build (k-means passes) and serve both ~linear.
  *  - `wordscore_salted`: documents x N; each copy's interleave token
  *    is a new mega-hot word, growing both volume and skew.
  *
  * Usage: ScaleCurves <sfDir> <scratchDir> [factorsCsv, default 1,4,16]
  * Prints one JSON line per (factor, query) and a final summary JSON
  * with wall-time ratios; results are transcribed to docs/PLANS.md.
  */
object ScaleCurves {

  private val Flagships = Seq("d_minhash_lsh", "e_asof_native",
    "e_asof_salted", "g_grid_served", "s_ivf_pq_served", "wordscore_salted")

  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("Usage: ScaleCurves <sfDir> <scratchDir> [factors]")
      sys.exit(2)
    }
    val sfDir = args(0)
    val scratch = args(1)
    val factors = args.lift(2).getOrElse("1,4,16")
      .split(',').map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // untimed global warmup: one full flagship pass over the x1 dir so
    // JIT/codegen/store-build code paths are hot BEFORE any timed run —
    // without it the first factor absorbs the cold-JVM cost and the
    // ratios invert (the first harness run measured x1 g_grid_served
    // 2.4x SLOWER than x16 purely from compilation warmth)
    {
      val wdir = s"$scratch/x${factors.head}"
      blowUp(spark, sfDir, wdir, factors.head)
      Flagships.foreach { q =>
        SparkEntry.queries(q)(spark, wdir).queryExecution.toRdd.foreach(_ => ())
      }
      graft.operators.Materialize.releaseAll(spark)
    }
    val results = factors.map { n =>
      val dir = s"$scratch/x$n"
      blowUp(spark, sfDir, dir, n)
      val times = Flagships.map { q =>
        val fn = SparkEntry.queries(q)
        def once(): Double = {
          val t0 = System.nanoTime()
          fn(spark, dir).queryExecution.toRdd.foreach(_ => ())
          val t = (System.nanoTime() - t0) / 1e9
          // untimed, BETWEEN runs: run2 must not execute against run1's
          // resident pinned blocks (at x16 the leaked pins made run2 up
          // to 18x slower than run1 from memory pressure)
          graft.operators.Materialize.releaseAll(spark)
          t
        }
        val r1 = once(); val r2 = once()
        val t = math.min(r1, r2)
        println(f"""{"factor":$n,"query":"$q","sec":$t%.3f,"runs":[$r1%.3f,$r2%.3f]}""")
        q -> t
      }.toMap
      n -> times
    }
    val base = results.head._2
    val summary = Flagships.map { q =>
      val curve = results.map { case (n, t) =>
        f""""x$n":${t(q)}%.3f"""
      }.mkString(",")
      val ratios = results.map { case (n, t) =>
        f""""r$n":${t(q) / base(q)}%.2f"""
      }.mkString(",")
      s""""$q":{$curve,$ratios}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"scale_curves","factors":[${factors.mkString(",")}],"queries":$summary}""")
    spark.stop()
  }

  /** Writes the n-fold blow-up of every flagship-referenced table to
    * `dir` (copy 0 is the original rows byte-for-byte; copies 1..n-1
    * are shifted/perturbed as documented above).
    */
  private def blowUp(spark: SparkSession, src: String, dir: String,
      n: Int): Unit = {
    def copies(table: String)(mk: (DataFrame, Int) => DataFrame): Unit = {
      val basedf = spark.read.parquet(s"$src/$table.parquet")
      val union = (0 until n).map(c => mk(basedf, c)).reduce(_ unionByName _)
      union.write.mode("overwrite").parquet(s"$dir/$table.parquet")
    }
    def shifted(df: DataFrame, key: String, c: Int): DataFrame = {
      // shift by a power-of-ten stride above the base id range so copy
      // ids never collide and stay positive
      val stride = {
        val m = df.agg(max(col(key))).head().getLong(0)
        var s = 1L; while (s <= m) s *= 10; s
      }
      df.withColumn(key, col(key) + lit(stride * c))
    }
    copies("documents") { (df, c) =>
      val s = shifted(df, "doc_id", c)
      // the interleave token must be PER DOC, not per copy: a shared
      // per-copy token halves shingle diversity inside the copy and
      // manufactures giant LSH buckets (cross-doc min-shingle
      // collisions) — the first harness run measured d_minhash_lsh
      // 24x slower on 4x data purely from that artifact (the pair
      // stage stayed even-share and completed; the quadratic was in
      // the fixture, not the plan)
      if (c == 0) s
      else s
        .withColumn("text", regexp_replace(col("text"), lit(" "),
          concat(lit(s" sc${c}x"), pmod(col("doc_id"), lit(9973)), lit(" "))))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
    copies("embeddings") { (df, c) =>
      val s = shifted(df, "vec_id", c)
      if (c == 0) s
      else s.withColumn("embedding",
        transform(col("embedding"),
          x => x + lit(c.toFloat * 0.001f)))
    }
    copies("events")(shifted(_, "event_id", _))     // user_id kept: density axis
    copies("orders")(shifted(_, "o_orderkey", _))   // o_custkey kept
    copies("customer")(shifted(_, "c_custkey", _))  // new plant positions
    copies("supplier") { (df, c) =>                 // probe set FIXED
      if (c == 0) df else df.limit(0)
    }
  }
}
