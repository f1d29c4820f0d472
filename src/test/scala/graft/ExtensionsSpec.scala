package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{GraftExtensions, GraftSql}

/** The SQL function surface: every native Catalyst expression must be
  * reachable from plain SQL through BOTH registration paths — the
  * extensions injector (`spark.sql.extensions=…GraftExtensions`, the
  * cluster deployment story) and the programmatic
  * `GraftSql.ensureRegistered` — and return bit-identical results to
  * the Column API. The two paths share one description table in
  * GraftSql, so this spec mostly guards the plumbing: builder arity,
  * literal-argument extraction, generator registration, and the
  * extensions class being loadable by name from conf.
  *
  * `spark.sql.extensions` is a STATIC conf — honored only at
  * SparkContext creation — so the conf-driven path runs in a forked
  * JVM ([[ExtensionsProbe]]); the in-JVM tests exercise the same
  * injector through `Builder.withExtensions` on a fresh session over
  * the suite's shared context.
  */
class ExtensionsSpec extends SparkSpec {

  /** A fresh session with the injector applied (sharing the suite's
    * SparkContext), the suite session restored after.
    */
  private def withExtensionsSession[T](f: SparkSession => T): T = {
    val orig = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[8]")
        .withExtensions(new GraftExtensions)
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      f(s2)
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }

  private val fixtureSql =
    """SELECT array('the', 'fast', 'key', 'the', 'fast') AS toks,
      |  'Hello, World 42!' AS txt,
      |  array(CAST(0.5 AS FLOAT), CAST(-1.0 AS FLOAT),
      |        CAST(2.0 AS FLOAT), CAST(0.25 AS FLOAT)) AS vec,
      |  array(struct('alpha' AS word, CAST(1.5 AS DOUBLE) AS w),
      |        struct('beta' AS word, CAST(-2.25 AS DOUBLE) AS w),
      |        struct('gamma' AS word, CAST(0.125 AS DOUBLE) AS w)) AS sv""".stripMargin

  private def columnTwin(base: DataFrame): DataFrame =
    base.select(
      GraftSql.simHash64(col("toks")).as("h64"),
      GraftSql.simHash16(col("toks")).as("h16"),
      GraftSql.shingleSet(col("toks"), 2).as("ss"),
      GraftSql.shingleHashSet(col("toks"), 2).as("shs"),
      GraftSql.shingleMinHash(col("toks"), 2, (0 until 4).map(j => s"$j|")).as("mh"),
      GraftSql.sortedIntersectCount(
        GraftSql.shingleHashSet(col("toks"), 2),
        GraftSql.shingleHashSet(col("toks"), 2)).as("ic"),
      GraftSql.charStats(col("txt")).as("cs"),
      GraftSql.floatDot(col("vec"), col("vec")).as("fd"),
      GraftSql.signBands(col("vec"), 8, 2, 4).as("sb"),
      GraftSql.sparseDot(col("sv"), col("sv")).as("sd"))

  private val scalarCallsSql =
    """SELECT
      |  simhash64(toks) AS h64,
      |  simhash16(toks) AS h16,
      |  shingle_set(toks, 2) AS ss,
      |  shingle_hash_set(toks, 2) AS shs,
      |  shingle_minhash(toks, 2, 4) AS mh,
      |  sorted_intersect_count(shingle_hash_set(toks, 2),
      |                         shingle_hash_set(toks, 2)) AS ic,
      |  char_stats(txt) AS cs,
      |  float_dot(vec, vec) AS fd,
      |  sign_bands(vec, 8, 2, 4) AS sb,
      |  sparse_dot(sv, sv) AS sd
      |FROM fixture""".stripMargin

  test("injector session answers SQL == Column API, all scalar functions") {
    withExtensionsSession { s2 =>
      s2.sql(fixtureSql).createOrReplaceTempView("fixture")
      val viaSql = s2.sql(scalarCallsSql).collect().map(_.toString).toSeq
      val viaCols = columnTwin(s2.sql(fixtureSql)).collect().map(_.toString).toSeq
      assert(viaSql === viaCols)
      assert(viaSql.head.nonEmpty)
    }
  }

  test("pair_explode generator is SQL-callable and yields i<j pairs") {
    withExtensionsSession { s2 =>
      val rows = s2.sql("SELECT x, y FROM (SELECT pair_explode(array(1, 2, 3)))")
        .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
      assert(rows === Seq((1, 2), (1, 3), (2, 3)))
    }
  }

  test("shape parameters must be foldable int literals") {
    withExtensionsSession { s2 =>
      val err = intercept[Exception] {
        s2.sql("SELECT shingle_set(array('a', 'b'), CAST(id AS INT)) FROM range(2)")
          .collect()
      }
      assert(err.getMessage.contains("foldable"), err.getMessage)
    }
  }

  test("ensureRegistered exposes the same surface on an existing session; idempotent") {
    GraftSql.ensureRegistered(spark)
    GraftSql.ensureRegistered(spark)
    spark.sql(fixtureSql).createOrReplaceTempView("fixture")
    val viaSql = spark.sql(scalarCallsSql).collect().map(_.toString).toSeq
    val viaCols = columnTwin(spark.sql(fixtureSql)).collect().map(_.toString).toSeq
    assert(viaSql === viaCols)
  }

  test("optimizer rule rewrites HOF inner products to natives, bit-exact") {
    withExtensionsSession { s2 =>
      import graft.functions.Vectors
      // transform-derived arrays carry containsNull = false (non-null
      // lambda over non-null elements): the soundness precondition the
      // rule checks. Built over range() — a literal Seq would
      // constant-fold into a LocalRelation and leave no plan to assert.
      val df = s2.range(4).select(col("id"),
          expr("transform(sequence(1, 3), i -> CAST(i * 3 + id AS FLOAT))")
            .as("a"),
          expr("transform(sequence(1, 3), i -> CAST(i - 2 * id AS FLOAT))")
            .as("b"))
        .withColumn("bd", expr("transform(b, x -> CAST(x AS DOUBLE))"))
      val q = df.select(
        Vectors.dotHof(col("a"), col("b")).as("dot_ff"),
        Vectors.sqDistHof(col("a"), col("b")).as("sq_ff"),
        aggregate(zip_with(col("a"), col("bd"),
          (x, y) => x.cast("double") * y), lit(0.0), (acc, v) => acc + v)
          .as("dot_fd"),
        aggregate(zip_with(col("bd"), col("a"),
          (x, y) => (x - y.cast("double")) * (x - y.cast("double"))),
          lit(0.0), (acc, v) => acc + v).as("sq_df_swapped"))
      val p = q.queryExecution.optimizedPlan.toString
      // every HOF form replaced by its native (incl. the commuted one)
      assert(!p.contains("aggregate(zip_with"), p.take(1200))
      assert(p.contains("float_dot") && p.contains("float_sqdist") &&
        p.contains("fd_dot") && p.contains("fd_sqdist"), p.take(1200))
      // bit-equality against the directly-written natives
      val got = q.collect().map(_.toString).toSeq
      val want = df.select(
        Vectors.dot(col("a"), col("b")).as("dot_ff"),
        Vectors.sqDist(col("a"), col("b")).as("sq_ff"),
        GraftSql.fdDot(col("a"), col("bd")).as("dot_fd"),
        GraftSql.fdSqDist(col("a"), col("bd")).as("sq_df_swapped"))
        .collect().map(_.toString).toSeq
      assert(got === want)
    }
  }

  test("optimizer rule also installs via spark.experimental.extraOptimizations") {
    // the per-session path for sessions built without the injector —
    // extraOptimizations run in their own post-optimization batch, so
    // the rule must match the already-cast-simplified shapes too
    import graft.functions.Vectors
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      prev :+ graft.plans.NativeVectorRewrite
    try {
      val df = spark.range(4).select(
        expr("transform(sequence(1, 3), i -> CAST(i + id AS FLOAT))").as("a"),
        expr("transform(sequence(1, 3), i -> CAST(i * 2 - id AS FLOAT))").as("b"))
      val q = df.select(Vectors.dotHof(col("a"), col("b")).as("d"))
      val p = q.queryExecution.optimizedPlan.toString
      assert(p.contains("float_dot") && !p.contains("aggregate(zip_with"),
        p.take(800))
      val want = df.select(Vectors.dot(col("a"), col("b")).as("d"))
        .collect().map(_.getDouble(0)).toSeq
      assert(q.collect().map(_.getDouble(0)).toSeq === want)
    } finally spark.experimental.extraOptimizations = prev
  }

  test("optimizer rule leaves nullable-element arrays on the HOF path") {
    withExtensionsSession { s2 =>
      import graft.functions.Vectors
      // parquet arrays default to containsNull = true — the HOF nulls
      // out on a null element where the natives read primitive buffers,
      // so the rewrite must NOT fire
      val emb = Tables.embeddings(s2, sf).limit(8)
      val q = emb.select(
        Vectors.dotHof(col("embedding"), col("embedding")).as("d"))
      val p = q.queryExecution.optimizedPlan.toString
      assert(p.contains("aggregate(zip_with"), p.take(1200))
      assert(!p.contains("float_dot"), p.take(1200))
    }
  }

  test("assertDense unlocks the rewrite on parquet-sourced frames") {
    withExtensionsSession { s2 =>
      import graft.functions.Vectors
      // the on-ramp for the rule's real audience: read data. The user
      // asserts the embedding column dense (zero-cost retyping, no
      // runtime check) and the same HOF query that stays interpreted
      // above now compiles onto the fused natives — bit-exactly.
      val emb = Tables.embeddings(s2, sf).limit(8)
        .withColumn("e", Vectors.assertDense(col("embedding")))
      val q = emb.select(col("vec_id"),
        Vectors.dotHof(col("e"), col("e")).as("d"),
        Vectors.sqDistHof(col("e"), col("e")).as("s"))
      val p = q.queryExecution.optimizedPlan.toString
      assert(p.contains("float_dot") && p.contains("float_sqdist") &&
        !p.contains("aggregate(zip_with"), p.take(1200))
      val got = q.collect().map(_.toString).toSeq
      val want = Tables.embeddings(s2, sf).limit(8)
        .select(col("vec_id"),
          Vectors.dot(col("embedding"), col("embedding")).as("d"),
          Vectors.sqDist(col("embedding"), col("embedding")).as("s"))
        .collect().map(_.toString).toSeq
      assert(got === want && got.nonEmpty)
      // and the SQL spelling reaches the same expression
      GraftSql.ensureRegistered(s2)
      Tables.embeddings(s2, sf).limit(2).createOrReplaceTempView("emb_ad")
      val viaSql = s2.sql(
        """SELECT aggregate(zip_with(assert_dense(embedding),
          |    assert_dense(embedding), (x, y)
          |    -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
          |  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS d
          |FROM emb_ad""".stripMargin)
      assert(viaSql.queryExecution.optimizedPlan.toString
        .contains("float_dot"))
      assert(viaSql.collect().map(_.getDouble(0)).forall(_ > 0.0))
    }
  }

  test("conf path: spark.sql.extensions resolves the injector in a fresh JVM") {
    val java = sys.props("java.home") + "/bin/java"
    val addOpens = Seq(
      "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
      "java.net", "java.nio", "java.util", "java.util.concurrent",
      "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
      "sun.security.action", "sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"java.base/$p=ALL-UNNAMED"))
    val cmd = Seq(java) ++ addOpens ++ Seq(
      "-Dspark.ui.enabled=false", "-Dspark.master=local[2]",
      "-Dspark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions",
      "-Xmx2g", "-cp", sys.props("java.class.path"), "graft.ExtensionsProbe")
    val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val out = new String(proc.getInputStream.readAllBytes())
    assert(proc.waitFor() === 0, out.takeRight(1500))
    assert(out.contains("EXTENSIONS_OK"), out.takeRight(1500))
  }
}

/** Forked-JVM probe for the conf-driven extensions path: builds a
  * session purely from `spark.*` system properties (SparkConf loads
  * them), so `spark.sql.extensions` is honored at context creation —
  * then proves a native function resolves from SQL.
  */
object ExtensionsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().getOrCreate()
    val n = spark.sql(
      "SELECT sorted_intersect_count(shingle_hash_set(array('a','b','c'), 2), " +
        "shingle_hash_set(array('a','b','c'), 2)) AS n")
      .collect().head.getInt(0)
    // two distinct 2-shingles intersected with themselves
    assert(n == 2, s"expected 2, got $n")

    // extensions-injected asof machinery: the strategy plans the node,
    // and PushFilterThroughAsofJoin — sitting INSIDE the operator-
    // optimization fixed point on this path — sinks a post-join left
    // filter all the way into the parquet scan's PushedFilters.
    val dir = java.nio.file.Files.createTempDirectory("graft_asof_probe").toString
    spark.range(100).selectExpr("id AS k", "id * 10 AS t", "id AS payload")
      .write.mode("overwrite").parquet(s"$dir/l")
    val l = spark.read.parquet(s"$dir/l")
    val r = spark.range(10).selectExpr("id AS rk", "id * 100 AS rt", "id AS rid")
    val j = graft.plans.AsofJoin.joinAsOf(l, r, "t", "rt", Seq("k"), Seq("rk"),
        tiebreak = Seq("rid"))
      .filter(org.apache.spark.sql.functions.col("payload") < 50)
    assert(j.count() == 50, "asof probe row count")
    val plan = j.queryExecution.executedPlan.toString
    // cost-based selection in a conf-driven fresh JVM: the 10-row dim
    // sits under autoBroadcastJoinThreshold, so with no caller flag
    // the strategy must auto-plan the BROADCAST exec
    assert(plan.contains("AsofBroadcastJoin"),
      "auto-broadcast asof exec missing:\n" + plan.take(1200))
    assert(plan.contains("PushedFilters: [IsNotNull(payload), LessThan(payload,50)]")
        || plan.contains("PushedFilters: [LessThan(payload,50)"),
      "filter did not reach the scan:\n" + plan.take(2000))
    println("EXTENSIONS_OK")
    spark.stop()
  }
}
