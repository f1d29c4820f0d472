package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Σ aᵢ·bᵢ over two ArrayType(FloatType)
  * columns, accumulating in double, left-to-right.
  *
  * This is the codegen'd fast path for the similarity operators. The
  * generated loop reads floats straight out of the UnsafeArrayData
  * buffers — no per-element boxing, no lambda dispatch, and it fuses
  * into the surrounding WholeStageCodegen stage, unlike the equivalent
  * `aggregate(zip_with(...))` higher-order pipeline (interpreted, one
  * allocation per pair). Summation order is identical to the
  * higher-order form and to DuckDB's list_reduce fold (see
  * graft.functions.Vectors), so swapping implementations is bit-exact.
  *
  * Precondition: array elements are non-null (embedding vectors). A
  * null ARRAY (either side) yields null via BinaryExpression's default
  * null handling, and a LENGTH MISMATCH yields null too — exactly the
  * higher-order form's semantics (zip_with null-pads the shorter array
  * and the aggregate fold propagates the null), so the bit-equality
  * claim covers malformed/short vectors as well, not just the fixture's
  * fixed-width case.
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"float_dot expects two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  override def prettyName: String = "float_dot"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |final int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst expression: Σ (aᵢ−bᵢ)² over two ArrayType(FloatType)
  * columns — the squared-L2 distance the k-center / PQ-recall /
  * exact-kNN paths rank on. Same contract as [[FloatDotProduct]]:
  * accumulates in double, left-to-right, each term computed as
  * ((double)aᵢ − (double)bᵢ)² — bit-identical to the
  * `aggregate(zip_with(...))` higher-order form it replaces (same
  * operation order) and to DuckDB's `list_reduce` fold, but codegen'd:
  * the loop reads floats straight off the UnsafeArrayData buffers and
  * fuses into the surrounding WholeStageCodegen stage instead of
  * paying interpreted lambda dispatch and a per-pair array allocation.
  */
case class FloatSqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  // length mismatch -> null, matching the HOF form (see FloatDotProduct)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"float_sqdist expects two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  override def prettyName: String = "float_sqdist"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |final int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $d = ((double) $a.getFloat($i)) - ((double) $b.getFloat($i));
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatSqDist =
    copy(left = newLeft, right = newRight)
}

/** [[FloatSqDist]]'s ArrayType(DoubleType) twin — the PQ family's
  * subvector/codebook distances work in double arrays (exact-decimal
  * means surfaced as doubles), so they need the same fused codegen'd
  * subtract-square-sum over double buffers. Identical fold order to
  * the `aggregate(zip_with(...))` form it replaces.
  */
case class DoubleSqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  // length mismatch -> null, matching the HOF form (see FloatDotProduct)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"double_sqdist expects two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  override def prettyName: String = "double_sqdist"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |final int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DoubleSqDist =
    copy(left = newLeft, right = newRight)
}

/** Mixed-type dot: Σ (double)aᵢ·bᵢ with `a: array<float>` (stored
  * vectors) and `b: array<double>` (derived means / component sums /
  * normalized directions). Same left-to-right double fold as the
  * `aggregate(zip_with(a, b, (x, y) => x.cast("double") * y))` form it
  * replaces — the shape every centroid-mean comparison in the suite
  * uses (Lloyd medoid pick, nearest-centroid classify, silhouette
  * moment identity).
  */
case class FloatDoubleDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // length mismatch -> null, matching the HOF form (see FloatDotProduct)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"fd_dot expects (array<float>, array<double>), got " +
          s"${l.simpleString} and ${r.simpleString}")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "fd_dot"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |final int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDoubleDot =
    copy(left = newLeft, right = newRight)
}

/** Mixed-type squared L2: Σ ((double)aᵢ − bᵢ)² with `a: array<float>`,
  * `b: array<double>` — the stored-vector-vs-derived-mean distance
  * (centroid outlier screen). Fold order identical to the HOF form.
  */
case class FloatDoubleSqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  // length mismatch -> null, matching the HOF form (see FloatDotProduct)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"fd_sqdist expects (array<float>, array<double>), got " +
          s"${l.simpleString} and ${r.simpleString}")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "fd_sqdist"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |final int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $d = ((double) $a.getFloat($i)) - $b.getDouble($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDoubleSqDist =
    copy(left = newLeft, right = newRight)
}

/** Native sign-random-projection LSH band buckets: all `planes` signed
  * projections of an ArrayType(FloatType) vector in ONE pass, sliced
  * into `bands` bucket strings of planes/bands sign bits each —
  * bit-identical to the higher-order form in
  * graft.operators.Similarity (per plane j, a left fold over positions
  * i = 1..dim of acc + emb[i]·w(i,j), with the ±1 weight from the same
  * Knuth-style integer mix (i·2654435761 + j·40503) mod 97 mod 2, and
  * bucket char '1' iff the projection is ≥ 0).
  *
  * Why: the HOF formulation interprets planes·dim lambda steps per
  * vector per reference, and the LSH family (`s_ann_lsh`,
  * `s_knn_graph`, `s_recall`) references it on BOTH join sides — the
  * signature was the dominant cost of the self-join k-NN graph. Here
  * the eight accumulators ride one dim-length loop, fused into
  * whole-stage codegen.
  *
  * Degenerate-input parity: for vectors SHORTER than `dim`, the HOF's
  * out-of-range element_at yields a null that poisons the whole fold,
  * and `null >= 0` is false — every bucket char becomes '0'. Mirrored
  * here explicitly (all-zero buckets when numElements < dim).
  */
case class SignBands(child: Expression, planes: Int, bands: Int, dim: Int)
    extends UnaryExpression {
  require(planes % bands == 0, "planes must divide evenly into bands")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sign_bands expects array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "sign_bands"

  override protected def nullSafeEval(input: Any): Any =
    SignBands.compute(input.asInstanceOf[ArrayData], planes, bands, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.plans.SignBands.compute($c, $planes, $bands, $dim);"
    })

  override protected def withNewChildInternal(newChild: Expression): SignBands =
    copy(child = newChild)
}

object SignBands {
  def compute(emb: ArrayData, planes: Int, bands: Int, dim: Int): ArrayData = {
    val width = planes / bands
    val out = new Array[Any](bands)
    if (emb.numElements() < dim) {
      val zeros = UTF8String.fromString("0" * width)
      var b = 0
      while (b < bands) { out(b) = zeros; b += 1 }
      return new GenericArrayData(out)
    }
    val acc = new Array[Double](planes)
    var i = 0
    while (i < dim) {
      val x = emb.getFloat(i).toDouble
      val mixBase = (i + 1).toLong * 2654435761L
      var j = 0
      while (j < planes) {
        val w = if (((mixBase + j * 40503L) % 97L) % 2L == 0L) 1.0 else -1.0
        acc(j) += x * w
        j += 1
      }
      i += 1
    }
    var b = 0
    while (b < bands) {
      val chars = new Array[Byte](width)
      var k = 0
      while (k < width) {
        chars(k) = if (acc(b * width + k) >= 0) '1'.toByte else '0'.toByte
        k += 1
      }
      out(b) = UTF8String.fromBytes(chars)
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** Native sparse dot product over two SORTED weight vectors
  * (array<struct<word: string, w: double>>, sorted ascending by word —
  * the `sort_array(collect_list(struct(word, w)))` shape): a merge-walk
  * over the two arrays multiplies weights of shared words through an
  * EXACT decimal path — each weight is quantized to scale 6 (HALF_UP;
  * for the producer's `round(w, 6)` doubles this is an exact recovery
  * of the 6-dp decimal, since no shorter decimal can live within a
  * half-ulp), the product is exact decimal arithmetic at scale 12,
  * each term is rounded to scale 9 (HALF_UP on the EXACT decimal — no
  * double-representation tie can sneak in), and terms sum in an exact
  * BigDecimal accumulator. Bit-identical to
  * `SUM(round(CAST(wa AS DECIMAL(18,6)) * CAST(wb AS DECIMAL(18,6)),
  * 9))::DOUBLE` over the exploded shared-word join — in Spark AND in
  * DuckDB, for ANY evaluation order, because every step is exact
  * decimal arithmetic with a deterministic rounding mode. (The earlier
  * form rounded the double product at 9 dp, which both engines did
  * through different decimal paths — a representable .5 tie at the
  * 10th digit of a 12-dp product could diverge; products of 6-dp
  * decimals land on such boundaries, so the hazard was real. Routing
  * the quantization through the exact product removes it.)
  *
  * Why it exists (SURVEY.md §4 bar — a measured gap): the exploded
  * join-aggregate pushes |pairs|·|shared words| rows (~30×) through two
  * hash joins and a re-aggregation; this expression makes the pair
  * scoring one codegen'd O(|a|+|b|) call per candidate row — no
  * explode, no second exchange, no regroup, and no interpreted-HOF
  * evaluator in the hot path (an `aggregate` lambda fold was measured
  * 3–5× slower after unrelated queries polluted its dispatch profile;
  * docs/PLANS.md round-5).
  *
  * Word comparison is UTF8String binary order — the same ordering
  * `sort_array` applies to the struct's leading string field, so the
  * merge-walk's sortedness precondition is exactly what the producer
  * guarantees.
  */
case class SparseDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // containsNull stays accepted (DDL-cast array types default to
  // containsNull=true, so rejecting it would refuse legitimate SQL
  // literals); null ELEMENTS and null word fields are skipped at eval —
  // they sort nowhere in the merge-walk and contribute nothing.
  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(org.apache.spark.sql.types.StructType(fields), _) =>
      fields.length == 2 && fields(0).dataType == StringType &&
        fields(1).dataType == DoubleType
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sparse_dot expects two array<struct<string,double>> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  override def prettyName: String = "sparse_dot"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    SparseDotProduct.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"${ev.value} = graft.plans.SparseDotProduct.compute($a, $b);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SparseDotProduct =
    copy(left = newLeft, right = newRight)
}

object SparseDotProduct {
  def compute(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    var acc = java.math.BigDecimal.ZERO
    var i = 0
    var j = 0
    while (i < na && j < nb) {
      val ra = a.getStruct(i, 2)
      val rb = b.getStruct(j, 2)
      // null elements / null words contribute nothing; skip rather
      // than NPE in compareTo (see the containsNull note above)
      if (ra == null || ra.isNullAt(0)) { i += 1 }
      else if (rb == null || rb.isNullAt(0)) { j += 1 }
      else {
      val cmp = ra.getUTF8String(0).compareTo(rb.getUTF8String(0))
      if (cmp == 0) {
        // exact decimal path (see scaladoc): quantize each weight at
        // scale 6 (exact for round(·,6)-produced doubles), multiply
        // exactly, round the exact 12-dp product to 9 dp
        val wa = java.math.BigDecimal.valueOf(ra.getDouble(1))
          .setScale(6, java.math.RoundingMode.HALF_UP)
        val wb = java.math.BigDecimal.valueOf(rb.getDouble(1))
          .setScale(6, java.math.RoundingMode.HALF_UP)
        acc = acc.add(wa.multiply(wb)
          .setScale(9, java.math.RoundingMode.HALF_UP))
        i += 1; j += 1
      } else if (cmp < 0) i += 1
      else j += 1
      }
    }
    acc.doubleValue()
  }
}

/** Zero-cost element-nullability assertion: re-types an `ArrayType`
  * child to `containsNull = false` without touching the data — the
  * documented on-ramp that lets [[NativeVectorRewrite]] fire on
  * PARQUET-SOURCED frames. Parquet scans always report array elements
  * nullable (the format can't promise otherwise), so the rewrite's
  * soundness gate keeps read-path HOF queries on the interpreted form
  * even when the caller KNOWS the column is a dense embedding; this
  * node is how the caller states that knowledge. Exposed as
  * `Vectors.assertDense(col)` and SQL `assert_dense(col)`.
  *
  * Modeled on Spark's own `KnownNotNull` (an unchecked retyping
  * pass-through, not a runtime check): `genCode`/`eval` delegate to
  * the child verbatim, so the assertion costs nothing in the hot
  * path. UNCHECKED means exactly that — if the caller lies and a null
  * element slips through, downstream natives read primitive buffer
  * slots whose content for a null element is undefined (garbage
  * values, not an error). Assert only what ingestion enforces.
  */
case class KnownDenseArray(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: ArrayType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"assert_dense expects an array input, got ${other.catalogString}")
  }

  override def dataType: DataType =
    child.dataType.asInstanceOf[ArrayType].copy(containsNull = false)

  override def nullable: Boolean = child.nullable

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)

  override def genCode(ctx: CodegenContext): ExprCode = child.genCode(ctx)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    throw new IllegalStateException("genCode delegates to the child")

  override protected def withNewChildInternal(newChild: Expression): KnownDenseArray =
    copy(child = newChild)
}
