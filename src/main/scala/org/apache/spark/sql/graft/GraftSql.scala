package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

import graft.plans.{CharStats, DoubleSqDist, FloatDotProduct, FloatDoubleDot,
  FloatDoubleSqDist, FloatSqDist, PairExplode, ShingleHashSet, ShingleMinHash,
  ShingleSet, SignBands, SimHash16Expr, SimHash64Expr, SortedIntersectCount,
  SparseDotProduct}

/** Bridge into Spark's private[sql] surface (hence the package): builds
  * Columns from custom Catalyst Expressions and registers them as SQL
  * functions on an arbitrary session.
  *
  * Registration is per-session and idempotent, so query functions can
  * call [[ensureRegistered]] defensively — they receive the session from
  * the driver and cannot assume SparkSessionExtensions were installed.
  */
object GraftSql {

  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame over an arbitrary logical plan (`Dataset.ofRows` is
    * private[sql]) — how the custom whole-operator nodes
    * (graft.plans.AsofJoinPlan) enter a query.
    */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Codegen'd float-array dot product (see graft.plans.FloatDotProduct). */
  def floatDot(a: Column, b: Column): Column =
    column(FloatDotProduct(expression(a), expression(b)))

  /** Codegen'd float-array squared L2 (see graft.plans.FloatSqDist). */
  def floatSqDist(a: Column, b: Column): Column =
    column(FloatSqDist(expression(a), expression(b)))

  /** Codegen'd double-array squared L2 (see graft.plans.DoubleSqDist). */
  def doubleSqDist(a: Column, b: Column): Column =
    column(DoubleSqDist(expression(a), expression(b)))

  /** Codegen'd float×double dot (see graft.plans.FloatDoubleDot). */
  def fdDot(a: Column, b: Column): Column =
    column(FloatDoubleDot(expression(a), expression(b)))

  /** Codegen'd float×double squared L2 (graft.plans.FloatDoubleSqDist). */
  def fdSqDist(a: Column, b: Column): Column =
    column(FloatDoubleSqDist(expression(a), expression(b)))

  /** Hash-aggregable argmin over (key ASC, id ASC) returning struct
    * (k, v) — the mutable-buffer replacement for the SortAggregate-
    * forcing `min(struct(key, id))` idiom (see graft.plans.ArgMinDL).
    * For argmax-with-smallest-id ties, pass a negated key.
    */
  def argMinDL(key: Column, id: Column): Column =
    column(graft.plans.ArgMinDL(expression(key.cast("double")),
      expression(id.cast("long"))).toAggregateExpression())

  /** Spark's own banded threshold Levenshtein with a PER-ROW bound —
    * `functions.levenshtein(l, r, threshold)` only accepts an Int
    * literal, but the underlying Catalyst expression takes the
    * threshold as a normal child. Returns -1 when the true distance
    * exceeds the bound (and computes O(len·bound) instead of
    * O(len²) to find out); exact distance otherwise.
    */
  def levenshteinBounded(l: Column, r: Column, threshold: Column): Column =
    column(org.apache.spark.sql.catalyst.expressions.Levenshtein(
      expression(l), expression(r), Some(expression(threshold))))

  /** Native MinHash signature mins (see graft.plans.ShingleMinHash). */
  def shingleMinHash(toks: Column, n: Int, salts: Seq[String]): Column =
    column(ShingleMinHash(expression(toks), n, salts))

  /** Native distinct shingle set (see graft.plans.ShingleSet). */
  def shingleSet(toks: Column, n: Int): Column =
    column(ShingleSet(expression(toks), n))

  /** Native 64-bit SimHash hex sketch (see graft.plans.SimHash64Expr). */
  def simHash64(toks: Column): Column =
    column(SimHash64Expr(expression(toks)))

  /** Native 16-bit SimHash int (see graft.plans.SimHash16Expr). */
  def simHash16(toks: Column): Column =
    column(SimHash16Expr(expression(toks)))

  /** Sorted distinct 8-byte shingle hashes (see graft.plans.ShingleHashSet). */
  def shingleHashSet(toks: Column, n: Int): Column =
    column(ShingleHashSet(expression(toks), n))

  /** Merge-walk intersection count of two sorted long arrays. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    column(SortedIntersectCount(expression(a), expression(b)))

  /** Sign-projection LSH band buckets in one pass (see graft.plans.SignBands). */
  def signBands(emb: Column, planes: Int, bands: Int, dim: Int): Column =
    column(SignBands(expression(emb), planes, bands, dim))

  /** Exact codepoint-histogram stats struct (see graft.plans.CharStats). */
  def charStats(text: Column): Column = column(CharStats(expression(text)))

  /** All unordered element pairs of an array (see graft.plans.PairExplode). */
  def pairExplode(m: Column): Column = column(PairExplode(expression(m)))

  /** Decimal-exact sparse dot product over two sorted
    * array<struct<word,w>> weight vectors (see graft.plans.SparseDotProduct).
    */
  def sparseDot(a: Column, b: Column): Column =
    column(SparseDotProduct(expression(a), expression(b)))

  /** One-row BINARY Bloom sketch over a LONG key column — Spark's own
    * runtime-filter aggregate (`BloomFilterAggregate`). Feed it
    * `xxhash64(key)`: the sketch stores the 64-bit hash, and the probe
    * side ([[bloomMightContain]]) must hash identically.
    */
  def bloomFilterAgg(keyHash: Column, estimatedItems: Long, numBits: Long): Column = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    column(new org.apache.spark.sql.catalyst.expressions.aggregate
      .BloomFilterAggregate(expression(keyHash),
        Literal(estimatedItems), Literal(numBits))
      .toAggregateExpression())
  }

  /** Probe a Bloom sketch built by [[bloomFilterAgg]]. `BloomFilterMightContain`
    * requires its sketch argument to be foldable or a scalar subquery —
    * the one-row aggregated frame is wrapped as a programmatic
    * ScalarSubquery, exactly how Spark's InjectRuntimeFilter plants
    * runtime filters. The subquery executes once (its own tiny job) and
    * the deserialized sketch is then probed per row with no join in the
    * main plan.
    */
  def bloomMightContain(bloomDf: org.apache.spark.sql.DataFrame,
      keyHash: Column): Column =
    column(org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
        bloomDf.queryExecution.analyzed),
      expression(keyHash)))

  /** The RDD a localCheckpoint'ed frame scans (its LogicalRDD leaf) —
    * the thing that actually holds the persisted blocks. Needed because
    * Dataset.unpersist only uncaches CacheManager entries and is a
    * no-op for RDD-level persistence (see graft.operators.Materialize).
    */
  def underlyingRdd(df: org.apache.spark.sql.DataFrame)
      : Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }

  /** Block until every queued listener event has been delivered —
    * `listenerBus.waitUntilEmpty` is `private[spark]`, so the metrics
    * specs (task-grain skew bounds, scan-pruning counters) reach it
    * through this bridge instead of sleeping and hoping.
    */
  def drainListenerBus(s: SparkSession): Unit =
    s.sparkContext.listenerBus.waitUntilEmpty(30000L)

  // ------------------------------------------------- SQL function surface
  // One shared description table drives BOTH registration paths
  // (programmatic ensureRegistered and config-driven GraftExtensions),
  // so the SQL surface can't drift between them.

  private def arity(fn: String, n: Int, es: Seq[Expression]): Unit =
    if (es.length != n) throw new IllegalArgumentException(
      s"$fn expects $n argument(s), got ${es.length}")

  /** Scalar literal extraction for the shape parameters (shingle width,
    * signature length, plane counts): these pick a CODE SHAPE at plan
    * time — per-row values can't, so anything non-foldable is rejected
    * at analysis rather than mis-planned.
    */
  private def intArg(fn: String, pos: Int, es: Seq[Expression]): Int = {
    val e = es(pos)
    if (e.foldable && e.dataType == org.apache.spark.sql.types.IntegerType) {
      // eval once and reject a foldable NULL (e.g. CAST(NULL AS INT))
      // here: null.asInstanceOf[Int] would silently unbox to 0 and
      // plan a shape parameter of 0 instead of failing analysis
      val v = e.eval()
      if (v == null) throw new IllegalArgumentException(
        s"$fn: argument ${pos + 1} must be a non-NULL INT literal, got ${e.sql}")
      v.asInstanceOf[Int]
    } else throw new IllegalArgumentException(
      s"$fn: argument ${pos + 1} must be a foldable INT literal, got ${e.sql}")
  }

  /** (name, implementing class, builder) for every native expression.
    * shingle_minhash(toks, n, k) uses the LSH signature salt convention
    * ("0|", "1|", …) — bit-identical to dMinhashLsh and the bench. The
    * one exception: the k=1 Jaccard BLOCKING key (sizedShinglePairs)
    * salts with "" rather than "0|", so SQL callers cannot reproduce
    * that key through this function; use shingle_hash_set + a manual
    * min over the hashes if blocking-key parity is needed.
    */
  private val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("float_dot", classOf[FloatDotProduct].getName,
      es => { arity("float_dot", 2, es); FloatDotProduct(es(0), es(1)) }),
    ("float_sqdist", classOf[FloatSqDist].getName,
      es => { arity("float_sqdist", 2, es); FloatSqDist(es(0), es(1)) }),
    ("double_sqdist", classOf[DoubleSqDist].getName,
      es => { arity("double_sqdist", 2, es); DoubleSqDist(es(0), es(1)) }),
    ("fd_dot", classOf[FloatDoubleDot].getName,
      es => { arity("fd_dot", 2, es); FloatDoubleDot(es(0), es(1)) }),
    ("fd_sqdist", classOf[FloatDoubleSqDist].getName,
      es => { arity("fd_sqdist", 2, es); FloatDoubleSqDist(es(0), es(1)) }),
    ("shingle_minhash", classOf[ShingleMinHash].getName,
      es => { arity("shingle_minhash", 3, es)
        val k = intArg("shingle_minhash", 2, es)
        ShingleMinHash(es(0), intArg("shingle_minhash", 1, es),
          (0 until k).map(j => s"$j|")) }),
    ("shingle_set", classOf[ShingleSet].getName,
      es => { arity("shingle_set", 2, es)
        ShingleSet(es(0), intArg("shingle_set", 1, es)) }),
    ("shingle_hash_set", classOf[ShingleHashSet].getName,
      es => { arity("shingle_hash_set", 2, es)
        ShingleHashSet(es(0), intArg("shingle_hash_set", 1, es)) }),
    ("sorted_intersect_count", classOf[SortedIntersectCount].getName,
      es => { arity("sorted_intersect_count", 2, es)
        SortedIntersectCount(es(0), es(1)) }),
    ("simhash64", classOf[SimHash64Expr].getName,
      es => { arity("simhash64", 1, es); SimHash64Expr(es(0)) }),
    ("simhash16", classOf[SimHash16Expr].getName,
      es => { arity("simhash16", 1, es); SimHash16Expr(es(0)) }),
    ("sign_bands", classOf[SignBands].getName,
      es => { arity("sign_bands", 4, es)
        SignBands(es(0), intArg("sign_bands", 1, es),
          intArg("sign_bands", 2, es), intArg("sign_bands", 3, es)) }),
    ("char_stats", classOf[CharStats].getName,
      es => { arity("char_stats", 1, es); CharStats(es(0)) }),
    ("pair_explode", classOf[PairExplode].getName,
      es => { arity("pair_explode", 1, es); PairExplode(es(0)) }),
    ("sparse_dot", classOf[SparseDotProduct].getName,
      es => { arity("sparse_dot", 2, es); SparseDotProduct(es(0), es(1)) }),
    ("assert_dense", classOf[graft.plans.KnownDenseArray].getName,
      es => { arity("assert_dense", 1, es)
        graft.plans.KnownDenseArray(es(0)) }),
  )

  /** The injectFunction-shaped descriptions for [[GraftExtensions]]. */
  private[graft] def functionDescriptions: Seq[(
      org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression)] =
    functions.map { case (name, cls, builder) =>
      (new org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(cls, name),
        builder)
    }

  /** Expose every custom expression to SQL on an existing session:
    * `SELECT simhash64(tokens), float_dot(a, b) …`. Idempotent.
    */
  def ensureRegistered(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

/** SparkSessionExtensions entry point — the config-driven registration
  * path for clusters the library doesn't construct sessions for:
  *
  * {{{
  * spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions
  * }}}
  *
  * Injects the same functions [[GraftSql.ensureRegistered]] adds
  * programmatically (one shared description table — the two paths
  * cannot drift), plus the [[graft.plans.NativeVectorRewrite]]
  * optimizer rule, which transparently upgrades user-written
  * `aggregate(zip_with(...))` inner products to the fused native
  * expressions where bit-exactness is provable. Query functions still
  * call ensureRegistered defensively, so either path (or both) works.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    GraftSql.functionDescriptions.foreach(e.injectFunction)
    e.injectOptimizerRule(_ => graft.plans.NativeVectorRewrite)
    e.injectOptimizerRule(_ => graft.plans.GridJoinRewrite)
    e.injectOptimizerRule(_ => graft.plans.PushFilterThroughAsofJoin)
    e.injectOptimizerRule(_ => graft.plans.SqlAsofRewrite)
    e.injectOptimizerRule(_ => graft.plans.PushFilterThroughBandCount)
    e.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    e.injectPlannerStrategy(_ => graft.plans.BandJoinStrategy)
  }
}
