package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Dedup

/** Streaming NEAR-duplicate suppression — the online twin of the batch
  * MinHash+LSH dedup (`d_minhash_lsh`): documents arrive on a stream,
  * each is banded with the SAME signature machinery
  * ([[Dedup.minhashBanded]] — native one-loop MinHash, band buckets),
  * and per band bucket a keeper set decides FIRST-WINS suppression: a
  * new doc whose signature agrees with any already-kept doc in the
  * bucket at ≥ [[SuppressEst]] is flagged a duplicate of that keeper;
  * otherwise it joins the keeper set. `EventStreams.dedupByContent`
  * covers streaming EXACT dedup; this is the fuzzy version an ingest
  * pipeline runs ahead of an expensive batch pass.
  *
  * Semantics are arrival-order first-wins (the only causal choice
  * online — a batch pass can pick min-id canonicals, a stream cannot
  * retract an already-emitted keeper), and band-level verdicts are
  * emitted so the consumer chooses doc-level policy (typically:
  * suppressed iff ANY band flags it — what DedupStreamsSpec pins
  * against a driver-side replay of the same rule).
  *
  * Scale notes: state is per LIVE band bucket — keeper ids + their
  * K-component signatures, capped at [[MaxKeepersPerBucket]] (uniform
  * md5 buckets keep real occupancy near 1; the cap bounds a
  * degenerate spam bucket the way [[Dedup.blockPairs]]'s salt groups
  * bound the batch pass — past the cap, new non-matching docs are
  * kept WITHOUT joining the keeper set, trading recall inside a
  * pathological bucket for bounded state, and the verdict row carries
  * `kept=true` either way). The banding projection is stateless
  * map-side work; only (bucket, id, sig) rows shuffle.
  */
object DedupStreams {

  /** Signature-agreement fraction at or above which a doc is
    * suppressed against a keeper — same 0.5 the batch `d_minhash_lsh`
    * keeps as its probable-near-dup floor.
    */
  val SuppressEst = 0.5

  /** Keeper-set cap per band bucket (state bound under adversarial
    * all-identical-prefix floods).
    */
  val MaxKeepersPerBucket = 64

  /** One banded doc as it reaches the stateful stage. */
  case class BandedDoc(doc_id: Long, sig: Seq[String], bucket: String)

  /** Keeper state for one band bucket. */
  case class Keepers(ids: Seq[Long], sigs: Seq[Seq[String]])

  /** Band-level verdict: `kept=false` means suppressed as a duplicate
    * of `dup_of` at signature agreement `est_sim`; `kept=true` rows
    * carry dup_of = -1.
    */
  case class BandVerdict(doc_id: Long, bucket: String, kept: Boolean,
      dup_of: Long, est_sim: Double)

  private def estSim(a: Seq[String], b: Seq[String]): Double =
    a.iterator.zip(b.iterator).count { case (x, y) => x == y }.toDouble /
      Dedup.MinhashK

  /** Band the incoming (doc_id, text) stream with the batch LSH
    * projection. Stateless — safe ahead of the stateful stage.
    */
  def banded(docs: DataFrame): Dataset[BandedDoc] = {
    import docs.sparkSession.implicits._
    Dedup.minhashBanded(docs).as[BandedDoc]
  }

  /** The stateful suppression stage. Docs within a microbatch are
    * processed in doc_id order (deterministic replay for a same-batch
    * tie; across batches, arrival order rules).
    */
  def nearDupSuppress(docs: Dataset[BandedDoc]): Dataset[BandVerdict] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[Keepers, BandVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (bucket: String, rows: Iterator[BandedDoc], state: GroupState[Keepers]) =>
          val st = state.getOption.getOrElse(Keepers(Nil, Nil))
          var ids = st.ids.toVector
          var sigs = st.sigs.toVector
          val out = Vector.newBuilder[BandVerdict]
          rows.toSeq.sortBy(_.doc_id).foreach { doc =>
            val hit = ids.iterator.zip(sigs.iterator)
              .map { case (kid, ksig) => (kid, estSim(doc.sig, ksig)) }
              .find(_._2 >= SuppressEst)
            hit match {
              case Some((kid, est)) =>
                out += BandVerdict(doc.doc_id, bucket, kept = false, kid, est)
              case None =>
                if (ids.length < MaxKeepersPerBucket) {
                  ids :+= doc.doc_id; sigs :+= doc.sig
                }
                out += BandVerdict(doc.doc_id, bucket, kept = true, -1L, 0.0)
            }
          }
          state.update(Keepers(ids, sigs))
          out.result().iterator
      }
  }
}
