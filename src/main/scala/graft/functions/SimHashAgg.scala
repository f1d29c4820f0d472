package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** 64-bit SimHash as a typed custom aggregate (`Aggregator[IN, BUF, OUT]`,
  * the idiomatic Spark custom-UDAF surface; the reference's only custom
  * aggregate is Hadoop's IntSumReducer — this is the engine's
  * "user-defined aggregation" extension point exercised for real).
  *
  * Semantics: per group, take the md5 of every input token (with
  * multiplicity); per bit position j (0–63 over the first 16 hex chars),
  * count +1 when the bit is set, −1 when clear; output bit j of the
  * sketch = 1 iff the sum is positive. Result is rendered as a 16-char
  * lowercase hex string — no int64 sign games, and directly comparable
  * with a (generated) pure-SQL DuckDB oracle over the same md5 bits.
  *
  * The ±1 counter buffer is a fixed 64-int array: merge is elementwise
  * addition (commutative/associative), so the aggregate is
  * partial+final-safe and insensitive to row order and partitioning.
  */
object SimHash64 extends Aggregator[String, Array[Int], String] {

  override def zero: Array[Int] = new Array[Int](64)

  // one digest instance per thread, reset by digest() itself — the JCA
  // provider lookup must not sit on the per-token hot path
  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  override def reduce(buf: Array[Int], token: String): Array[Int] = {
    val digest = md5.get().digest(token.getBytes(StandardCharsets.UTF_8))
    var j = 0
    while (j < 64) {
      val bit = (digest(j / 8) >> (7 - (j % 8))) & 1
      buf(j) += (if (bit == 1) 1 else -1)
      j += 1
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var j = 0
    while (j < 64) { a(j) += b(j); j += 1 }
    a
  }

  override def finish(buf: Array[Int]): String = {
    val sb = new StringBuilder(16)
    var d = 0
    while (d < 16) {
      var v = 0
      var b = 0
      while (b < 4) {
        if (buf(d * 4 + b) > 0) v |= (8 >> b)
        b += 1
      }
      sb.append("0123456789abcdef".charAt(v))
      d += 1
    }
    sb.toString
  }

  override def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
  override def outputEncoder: Encoder[String] = Encoders.STRING

  /** DuckDB oracle body: 64 SUM(CASE) bit counters over md5 hex digits,
    * reassembled into the same 16-char hex sketch. Hex digit d of the
    * hash carries bits 4d..4d+3 (MSB first); the IN-sets below are the
    * hex characters with that bit set.
    */
  def oracleSql(toksSql: String): String = {
    val bitSets = Seq(
      "('8','9','a','b','c','d','e','f')", // value & 8
      "('4','5','6','7','c','d','e','f')", // value & 4
      "('2','3','6','7','a','b','e','f')", // value & 2
      "('1','3','5','7','9','b','d','f')") // value & 1
    val sums = (0 until 64).map { j =>
      s"SUM(CASE WHEN substr(h, ${j / 4 + 1}, 1) IN ${bitSets(j % 4)} THEN 1 ELSE -1 END) AS s$j"
    }.mkString(",\n    ")
    val digits = (0 until 16).map { d =>
      val v = (0 until 4).map(b => s"CASE WHEN s${d * 4 + b} > 0 THEN ${8 >> b} ELSE 0 END")
        .mkString(" + ")
      s"substr('0123456789abcdef', ($v) + 1, 1)"
    }.mkString(" ||\n    ")
    s"""WITH w AS (SELECT doc_id, unnest($toksSql) AS word FROM documents),
       |h AS (SELECT doc_id, md5(word) AS h FROM w),
       |s AS (SELECT doc_id,
       |    $sums
       |  FROM h GROUP BY doc_id)
       |SELECT doc_id,
       |    $digits AS simhash64
       |FROM s ORDER BY doc_id""".stripMargin
  }
}
