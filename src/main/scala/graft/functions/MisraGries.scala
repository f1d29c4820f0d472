package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra–Gries heavy-hitters summary: at most `cap` counters
  * over an unbounded key stream, with the classic guarantees
  * (Misra–Gries 1982; mergeability per Agarwal et al., "Mergeable
  * Summaries", PODS'12):
  *
  *  - every key with true count > N/(cap+1) is PRESENT in the summary;
  *  - estimates only UNDERCOUNT, by at most N/(cap+1), where N is the
  *    total stream length — and the bound survives arbitrary merge
  *    trees, which is what makes this a Spark aggregate: partial
  *    summaries per partition, pairwise merged, same bound.
  *
  * reduce: increment a live counter, else open one under `cap`, else a
  * decrement-all event (each such event cancels `cap`+1 units of mass,
  * so there are ≤ N/(cap+1) events — amortized O(1) counter updates
  * per element; the rebuild cost is real but rare). merge: sum
  * counters, and if over `cap`, subtract the (cap+1)-th largest value
  * from all and drop the non-positive — the PODS'12 merge step.
  *
  * Determinism note: the summary's exact CONTENT depends on stream and
  * merge order; only the guarantees above are order-free. Queries must
  * therefore emit theorem-backed facts (membership/error checks for
  * keys safely above the threshold), never the raw summary — see
  * TextAnalysis.tHeavyHitters.
  */
class MisraGries(cap: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(cap > 0, "cap must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], x: String): Map[String, Long] = {
    val c = b.getOrElse(x, 0L)
    if (c > 0L || b.size < cap) b.updated(x, c + 1L)
    else b.iterator.map { case (k, v) => k -> (v - 1L) }
      .filter(_._2 > 0L).toMap
  }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val m = b.foldLeft(a) { case (acc, (k, v)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + v)
    }
    if (m.size <= cap) m
    else {
      val delta = m.valuesIterator.toArray.sorted(Ordering[Long].reverse)(cap)
      m.iterator.map { case (k, v) => k -> (v - delta) }
        .filter(_._2 > 0L).toMap
    }
  }

  override def finish(r: Map[String, Long]): Map[String, Long] = r

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}
