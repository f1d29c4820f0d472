package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact per-document character-histogram statistics in one codepoint
  * pass: total codepoints, distinct codepoints, sum of squared
  * frequencies, and the max frequency — the integer ingredients of
  * Simpson diversity (1 − Σn²/N²) and top-character share, which are
  * then closed-form double divisions (engine-identical, no
  * order-dependent float accumulation anywhere).
  *
  * Why an expression and not explode(chars) + groupBy: the statistics
  * are algebraically per-document, so shuffling one row per character
  * (the compositional formulation) moves |corpus| rows to compute what
  * a per-row map produces in place — the same explode-vs-map argument
  * that retired the SimHash UDAF (plans/SimHashExpressions.scala).
  * Codepoint iteration (not UTF-16 chars) matches the oracle's
  * `split(text, '')` unicode segmentation for everything outside
  * grapheme clusters, which the fixtures don't contain.
  */
case class CharStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_stats expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = CharStats.Schema
  override def prettyName: String = "char_stats"

  override protected def nullSafeEval(input: Any): Any =
    CharStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.plans.CharStats.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): CharStats =
    copy(child = newChild)
}

object CharStats {
  val Schema: StructType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("sum_sq", LongType, nullable = false),
    StructField("max_cnt", IntegerType, nullable = false)))

  def compute(text: UTF8String): InternalRow = {
    // codepoint histogram: dense int[128] for ASCII (the overwhelming
    // bulk of any text corpus), HashMap spillover for the rest
    val ascii = new Array[Int](128)
    var other: java.util.HashMap[Integer, Integer] = null
    val s = text.toString
    var i = 0
    var total = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      total += 1
      if (cp < 128) ascii(cp) += 1
      else {
        if (other == null) other = new java.util.HashMap[Integer, Integer]()
        other.merge(cp, 1, (a, b) => a + b)
      }
    }
    var distinct = 0
    var sumSq = 0L
    var maxCnt = 0
    var c = 0
    while (c < 128) {
      val n = ascii(c)
      if (n > 0) {
        distinct += 1
        sumSq += n.toLong * n
        if (n > maxCnt) maxCnt = n
      }
      c += 1
    }
    if (other != null) {
      val it = other.values().iterator()
      while (it.hasNext) {
        val n = it.next().intValue()
        distinct += 1
        sumSq += n.toLong * n
        if (n > maxCnt) maxCnt = n
      }
    }
    new GenericInternalRow(Array[Any](total, distinct, sumSq, maxCnt))
  }
}
