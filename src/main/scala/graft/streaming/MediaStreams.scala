package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Multimodal

/** Streaming counterparts of the multimodal operators: clips arrive as
  * individual frame-feature rows (the output of a decode stage running
  * at the ingest edge), possibly split across microbatches and out of
  * frame order within a clip, and the detector keeps per-clip state to
  * emit incrementally-updated scene-cut counts.
  *
  * Scale notes: state is one tiny struct per clip — at most
  * [[MaxFramesPerClip]] (frame_idx, luma) pairs, matching the batch
  * frame generator's cap — so the state store grows with the number of
  * LIVE clips, not with frames seen. The rule constant is shared with
  * the batch detector ([[Multimodal.SceneCutThreshold]]); StreamingSpec
  * pins final streaming output == the oracle-checked `m_scene_cut`.
  */
object MediaStreams {

  /** One decoded frame feature row as it arrives off the wire. */
  case class FrameRow(doc_id: Long, frame_idx: Int, luma: Int)

  /** Per-clip detector state: the distinct frames seen so far, kept
    * sorted by frame_idx so cut counting is a linear scan.
    */
  case class ClipFrames(idx: Seq[Int], luma: Seq[Int])

  /** Incremental per-clip report — the streaming twin of one
    * `m_scene_cut` output row.
    */
  case class ClipCuts(doc_id: Long, n_frames: Long, n_cuts: Long)

  /** Upper bound on retained frames per clip. The batch generator emits
    * ≤ 8; a real keyframe sampler bounds this per clip segment the same
    * way. Enforced defensively so a misbehaving upstream can never grow
    * a key's state unboundedly.
    */
  val MaxFramesPerClip = 64

  /** Scene-cut detection over a stream of frame rows: per-clip
    * flatMapGroupsWithState (Update mode) merges each batch's frames
    * into the clip's sorted frame buffer (idempotent on frame_idx, so
    * duplicate delivery is harmless), recounts cuts with the shared
    * threshold rule, and emits the clip's current (n_frames, n_cuts).
    * The LAST emitted row per clip equals the batch detector's row.
    */
  def sceneCuts(frames: Dataset[FrameRow]): Dataset[ClipCuts] = {
    import frames.sparkSession.implicits._
    frames
      .groupByKey(_.doc_id)
      .flatMapGroupsWithState[ClipFrames, ClipCuts](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (doc: Long, rows: Iterator[FrameRow], state: GroupState[ClipFrames]) =>
          val prev = state.getOption.getOrElse(ClipFrames(Nil, Nil))
          val seen = scala.collection.mutable.TreeMap.empty[Int, Int]
          prev.idx.iterator.zip(prev.luma.iterator)
            .foreach { case (i, l) => seen(i) = l }
          rows.foreach(r => seen(r.frame_idx) = r.luma)
          val bounded = seen.take(MaxFramesPerClip).toSeq // already idx-sorted
          state.update(ClipFrames(bounded.map(_._1), bounded.map(_._2)))
          val lumas = bounded.map(_._2)
          val cuts = lumas.zip(lumas.drop(1)).count { case (a, b) =>
            math.abs(b - a) >= Multimodal.SceneCutThreshold
          }
          Iterator.single(ClipCuts(doc, bounded.size.toLong, cuts.toLong))
      }
  }
}
