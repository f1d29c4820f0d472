package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StructField, StructType}

/** Generator emitting every unordered element pair (i < j) of an array:
  * the native form of
  *
  * {{{ explode(flatten(transform(sequence(1, size(m) - 1), i =>
  *       transform(sequence(i + 1, size(m)), j =>
  *         struct(element_at(m, i), element_at(m, j)))))) }}}
  *
  * The HOF form materializes the full m(m−1)/2 struct-of-structs array
  * per input row under the interpreted lambda evaluator (two nested
  * lambdas, an element copy per pair side) BEFORE the explode even
  * starts; this generator walks the array once and yields pairs
  * lazily — no intermediate array, no lambda interpretation, the outer
  * element fetched once per i. Used by `Dedup.blockPairs`, the pair
  * core under the jaccard/overlap/semdedup/embedding near-dup family.
  *
  * Not a `CollectionGenerator`, so the Generate node itself stays
  * outside whole-stage codegen (like any custom generator); the win is
  * the removed per-pair interpretation and allocation, not codegen.
  */
case class PairExplode(child: Expression) extends Generator
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def children: Seq[Expression] = child :: Nil

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PairExplode =
    copy(child = newChildren.head)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pair_explode expects an array, got ${other.simpleString}")
  }

  private def elementType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def elementSchema: StructType = {
    val ArrayType(et, nullable) = child.dataType: @unchecked
    StructType(StructField("x", et, nullable) :: StructField("y", et, nullable) :: Nil)
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() < 2) Iterator.empty
    else {
      val n = arr.numElements()
      val et = elementType
      new Iterator[InternalRow] {
        private var i = 0
        private var j = 1
        private var xi: Any = arr.get(0, et)
        override def hasNext: Boolean = i < n - 1
        override def next(): InternalRow = {
          // fresh row per pair: downstream operators may buffer rows
          // without copying inside a partition
          val out = new GenericInternalRow(Array[Any](xi, arr.get(j, et)))
          j += 1
          if (j == n) { i += 1; j = i + 1; if (i < n - 1) xi = arr.get(i, et) }
          out
        }
      }
    }
  }

  override def prettyName: String = "pair_explode"
}
