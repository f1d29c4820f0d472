package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature: for each salt s_j, the minimum md5 over the
  * word n-shingles of a token array, as lowercase hex — exactly
  * `transform(salts, j -> array_min(transform(shingles(toks, n), x ->
  * md5(concat(j, x)))))` but in one tight loop:
  *
  *  - no per-element Catalyst lambda interpretation (higher-order
  *    functions don't participate in codegen),
  *  - shingle bytes are built once per position and reused across all K
  *    salts,
  *  - mins are tracked over raw digest bytes (unsigned lexicographic ==
  *    hex-string order) and only the K winners are hex-encoded.
  *
  * Measured ~5-10× over the HOF form on the dedup suite, which is what
  * justifies a custom Expression here (SURVEY.md §4: only where a
  * measured gap exists). Returns NULL when the doc has fewer than n
  * tokens (callers filter, matching the HOF pipeline's size(sh) > 0).
  */
case class ShingleMinHash(child: Expression, n: Int, salts: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_minhash expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "shingle_minhash"

  @transient private lazy val saltBytes: Array[Array[Byte]] =
    salts.map(_.getBytes("UTF-8")).toArray

  override protected def nullSafeEval(input: Any): Any =
    ShingleMinHash.compute(input.asInstanceOf[ArrayData], n, saltBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val saltsRef = ctx.addReferenceObj("salts", saltBytes, "byte[][]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.plans.ShingleMinHash.compute($c, $n, $saltsRef);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleMinHash =
    copy(child = newChild)
}

/** Native distinct word-n-shingle set: equals
  * `array_distinct(shingles(toks, n))` (first-occurrence order) without
  * the per-position slice/concat_ws interpretation of the higher-order
  * form. Empty array when the doc has fewer than n tokens.
  */
case class ShingleSet(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_set expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_set"

  override protected def nullSafeEval(input: Any): Any =
    ShingleSet.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.plans.ShingleSet.compute($c, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
}

/** Sorted distinct word-n-shingle HASHES: each distinct shingle (the
  * [[ShingleSet]] members) reduced to the first 8 bytes of its md5 as a
  * big-endian long, deduped and sorted ascending. For consumers that
  * only need set SIZES and intersections (Jaccard), this replaces
  * shuffling full shingle strings (~30+ bytes each) with 8-byte values
  * that a merge-walk ([[SortedIntersectCount]]) intersects in O(n+m)
  * long compares — `array_intersect` over UTF8 strings was the
  * per-pair cost that made d_jaccard the bench's most expensive query.
  * A 64-bit collision would merge two distinct shingles (changing a
  * set size); for a corpus with D distinct shingles per block the
  * probability is ~D²/2⁶⁵ — immaterial at any realistic block size
  * (blocks are salt-capped at ~64 members).
  * Empty array when the doc has fewer than n tokens.
  */
case class ShingleHashSet(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hash_set expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash_set"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashSet.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.plans.ShingleHashSet.compute($c, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHashSet =
    copy(child = newChild)
}

object ShingleHashSet {
  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val SPACE = ' '.toByte

  def compute(toks: ArrayData, n: Int): ArrayData = {
    val nToks = toks.numElements()
    val count = nToks - (n - 1)
    if (count <= 0) return new GenericArrayData(Array.empty[Long])
    val md = md5.get()
    val hashes = new Array[Long](count)
    val tokBytes = new Array[Array[Byte]](nToks)
    var i = 0
    while (i < nToks) {
      tokBytes(i) = toks.getUTF8String(i).getBytes
      i += 1
    }
    var s = 0
    while (s < count) {
      var len = n - 1
      var k = 0
      while (k < n) { len += tokBytes(s + k).length; k += 1 }
      val shingle = new Array[Byte](len)
      var pos = 0
      k = 0
      while (k < n) {
        val t = tokBytes(s + k)
        System.arraycopy(t, 0, shingle, pos, t.length)
        pos += t.length
        if (k < n - 1) { shingle(pos) = SPACE; pos += 1 }
        k += 1
      }
      md.reset()
      val d = md.digest(shingle)
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      hashes(s) = h
      s += 1
    }
    java.util.Arrays.sort(hashes)
    // in-place dedupe of the sorted run
    var w = 1
    var r = 1
    while (r < count) {
      if (hashes(r) != hashes(w - 1)) { hashes(w) = hashes(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hashes, w))
  }
}

/** O(n+m) merge-walk intersection COUNT of two sorted distinct long
  * arrays (the [[ShingleHashSet]] contract) — the pairwise Jaccard
  * numerator without `array_intersect`'s O(n·m) interpreted scan or
  * any intermediate array allocation.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count expects (array<bigint>, array<bigint>), " +
        s"got (${l.simpleString}, ${r.simpleString})")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"${ev.value} = graft.plans.SortedIntersectCount.compute($a, $b);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression)
      : SortedIntersectCount = copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  def compute(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }
}

object ShingleSet {
  def compute(toks: ArrayData, n: Int): ArrayData = {
    val nToks = toks.numElements()
    val count = nToks - (n - 1)
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](count * 2)
    var s = 0
    while (s < count) {
      val sb = new java.lang.StringBuilder
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks.getUTF8String(s + k).toString)
        k += 1
      }
      seen.add(UTF8String.fromString(sb.toString))
      s += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}

object ShingleMinHash {
  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val HEX = "0123456789abcdef".toCharArray
  private val SPACE = ' '.toByte

  /** Unsigned lexicographic compare of two 16-byte digests. */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HEX(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Null iff fewer than n tokens. */
  def compute(toks: ArrayData, n: Int, salts: Array[Array[Byte]]): ArrayData = {
    val nToks = toks.numElements()
    val count = nToks - (n - 1)
    if (count <= 0) return null
    val tokBytes = new Array[Array[Byte]](nToks)
    var i = 0
    while (i < nToks) {
      tokBytes(i) = toks.getUTF8String(i).getBytes
      i += 1
    }
    val md = md5.get()
    val mins = new Array[Array[Byte]](salts.length)
    var s = 0
    while (s < count) {
      // shingle bytes: toks[s..s+n-1] joined by ' '
      var len = n - 1
      var k = 0
      while (k < n) { len += tokBytes(s + k).length; k += 1 }
      val shingle = new Array[Byte](len)
      var pos = 0
      k = 0
      while (k < n) {
        val t = tokBytes(s + k)
        System.arraycopy(t, 0, shingle, pos, t.length)
        pos += t.length
        if (k < n - 1) { shingle(pos) = SPACE; pos += 1 }
        k += 1
      }
      var j = 0
      while (j < salts.length) {
        md.reset()
        md.update(salts(j))
        md.update(shingle)
        val digest = md.digest()
        if (mins(j) == null || less(digest, mins(j))) mins(j) = digest
        j += 1
      }
      s += 1
    }
    val out = new Array[Any](salts.length)
    var j = 0
    while (j < salts.length) { out(j) = hex(mins(j)); j += 1 }
    new GenericArrayData(out)
  }
}
