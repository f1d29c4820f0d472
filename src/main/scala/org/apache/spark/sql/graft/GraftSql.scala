package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

import graft.plans.{CharStats, FloatDotProduct, PairExplode, ShingleHashSet,
  ShingleMinHash, ShingleSet, SignBands, SimHash16Expr, SimHash64Expr,
  SortedIntersectCount}

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

  /** Codegen'd float-array dot product (see graft.plans.FloatDotProduct). */
  def floatDot(a: Column, b: Column): Column =
    column(FloatDotProduct(expression(a), expression(b)))

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

  /** Expose the custom expressions to SQL: `SELECT float_dot(a, b)`. */
  def ensureRegistered(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "float_dot", exprs => FloatDotProduct(exprs.head, exprs(1)), "built-in")
}

/** SparkSessionExtensions entry point — the config-driven registration
  * path for clusters the library doesn't construct sessions for:
  *
  * {{{
  * spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions
  * }}}
  *
  * Injects the same functions [[GraftSql.ensureRegistered]] adds
  * programmatically. Query functions still call ensureRegistered
  * defensively, so either path (or both) works.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit =
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("float_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[FloatDotProduct].getName, "float_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        FloatDotProduct(exprs.head, exprs(1))))
}
