package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal plumbing semantics: binary column flow, generator-shaped
  * frame sampling, and the per-partition decode stub.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("binary metadata: sizes match utf-8 byte lengths") {
    val meta = Multimodal.mBinaryMeta(spark, sf)
    val mismatch = meta.join(Tables.documents(spark, sf), "doc_id")
      .filter(col("n_bytes") =!= length(encode(col("text"), "UTF-8")))
    assert(mismatch.count() === 0)
  }

  test("frame sampling caps at 8 frames and ids are distinct") {
    val frames = Multimodal.mFrameSample(spark, sf)
    assert(frames.groupBy("doc_id").count()
      .filter(col("count") > 8).count() === 0)
    assert(frames.select("frame_id").distinct().count() === frames.count())
  }

  test("resize stub: deterministic downsample, size ratio and checksum bounds hold") {
    val rows = Multimodal.resizeStub(spark, sf).collect()
    rows.foreach { r =>
      assert(r.resized_bytes === r.orig_bytes / r.factor)
      assert(r.r_sum >= 0 && r.r_sum <= 255L * r.resized_bytes)
      // weights are 1..n, so the weighted checksum dominates the plain sum
      assert(r.r_check >= r.r_sum)
    }
    val again = Multimodal.resizeStub(spark, sf).collect()
    assert(rows.sortBy(_.doc_id).toSeq === again.sortBy(_.doc_id).toSeq)
  }

  test("decode stub: histogram mass equals byte count; deterministic") {
    val feats = Multimodal.decodeStub(spark, sf).collect()
    feats.foreach { f =>
      assert(f.histogram.split(',').map(_.toInt).sum === f.n_bytes)
      assert(f.brightness >= 0.0 && f.brightness <= 255.0)
    }
    val again = Multimodal.decodeStub(spark, sf).collect()
    assert(feats.sortBy(_.doc_id).toSeq === again.sortBy(_.doc_id).toSeq)
  }
}
