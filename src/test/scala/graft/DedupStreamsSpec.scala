package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Dedup
import graft.streaming.DedupStreams
import graft.streaming.DedupStreams.{BandVerdict, BandedDoc}

/** Streaming near-dup suppression == a driver-side replay of the same
  * first-wins keeper rule, and every streaming suppression is a pair
  * the oracle-checked batch `d_minhash_lsh` also surfaces.
  */
class DedupStreamsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val bandedRows: Seq[BandedDoc] =
    DedupStreams.banded(Tables.documents(spark, sf))
      .collect().toSeq.sortBy(b => (b.doc_id, b.bucket))

  private def replay(rows: Seq[BandedDoc]): Seq[BandVerdict] =
    rows.groupBy(_.bucket).toSeq.flatMap { case (bucket, docs) =>
      var ids = Vector.empty[Long]
      var sigs = Vector.empty[Seq[String]]
      docs.sortBy(_.doc_id).map { d =>
        val hit = ids.iterator.zip(sigs.iterator)
          .map { case (kid, ksig) =>
            (kid, ksig.iterator.zip(d.sig.iterator)
              .count { case (x, y) => x == y }.toDouble / Dedup.MinhashK)
          }
          .find(_._2 >= DedupStreams.SuppressEst)
        hit match {
          case Some((kid, est)) =>
            BandVerdict(d.doc_id, bucket, kept = false, kid, est)
          case None =>
            if (ids.length < DedupStreams.MaxKeepersPerBucket) {
              ids :+= d.doc_id; sigs :+= d.sig
            }
            BandVerdict(d.doc_id, bucket, kept = true, -1L, 0.0)
        }
      }
    }

  test("streaming near-dup suppression == driver replay, in-order feed") {
    val input = MemoryStream[BandedDoc](spark)
    val q = DedupStreams.nearDupSuppress(input.toDS())
      .writeStream.format("memory").queryName("t_neardup")
      .outputMode("append").start()
    try {
      bandedRows.grouped(math.max(1, bandedRows.size / 3)).foreach { g =>
        input.addData(g); q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table("t_neardup")
      .as[BandVerdict].collect().toSet
    val want = replay(bandedRows).toSet
    assert(got === want)
    // the fixture must exercise BOTH outcomes or the test proves nothing
    assert(got.exists(!_.kept), "no suppression occurred on the fixture")
    assert(got.exists(_.kept))
  }

  test("every streaming suppression pair is a batch d_minhash_lsh pair") {
    val suppressed = replay(bandedRows).filter(!_.kept)
      .map(v => (math.min(v.doc_id, v.dup_of), math.max(v.doc_id, v.dup_of)))
      .toSet
    assert(suppressed.nonEmpty)
    val batchPairs = Dedup.dMinhashLsh(spark, sf)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val missing = suppressed -- batchPairs
    assert(missing.isEmpty,
      s"streaming flagged pairs the batch LSH does not: $missing")
  }
}
