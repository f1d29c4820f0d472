package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Telemetry}
import graft.sources.ShardSink

/** End-to-end composition: the individual operators are each
  * oracle-checked; this spec proves they CHAIN into the pipeline a
  * training run would execute — curate (quality + exact + near dedup)
  * → split → keep train → epoch shuffle order → fixed-size shards on
  * disk — with the inline telemetry gate riding the same pass, and the
  * read-back equal to the computed plan at every step.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("curate -> split(train) -> shuffle order -> shards -> read-back") {
    val out = Files.createTempDirectory("graft_pipe").toFile.getAbsolutePath + "/epoch1"

    // survivors of the full curation gate, joined back to their text
    val kept = Curation.curate(spark, sf).select("doc_id")
    val train = Curation.pSplit(spark, sf)
      .filter(col("split") === "train").select("doc_id")
    val (corpus, gate) = Telemetry.qualityGate(
      Tables.documents(spark, sf)
        .join(kept, "doc_id").join(train, "doc_id")
        .select(col("doc_id"), col("lang"), col("text")))

    // epoch order = the p_shuffle permutation key; ShardSink consumes
    // it as the total order (key, then id as the unique tiebreak)
    val epoch = corpus.withColumn("shuffle_key",
      md5(concat(lit("epoch1|"), col("doc_id").cast("string")).cast("binary")))

    // telemetry gate: Observation keeps its FIRST consuming action's
    // metrics, so read it off the count pass (writeShards re-executes
    // the frame for zipWithIndex offsets + the write itself — the
    // multi-action shape of any real sink job)
    val nTrain = epoch.count()
    val m = gate.get
    val nKept = kept.count()
    assert(m("rows") === nTrain)
    assert(nTrain > 0 && nTrain < nKept,
      s"split must drop some of the $nKept curated docs, kept $nTrain")

    ShardSink.writeShards(epoch, out, rowsPerShard = 64,
      orderCols = Seq("shuffle_key", "doc_id"))

    // read-back: every train doc present exactly once, shard membership
    // follows the shuffle-key order, shards are dataloader-sized
    val back = spark.read.parquet(out)
    assert(back.count() === nTrain)
    assert(back.select("doc_id").distinct().count() === nTrain)
    val ordered = back.select("shuffle_key", "doc_id", "shard")
      .as[(String, Long, Long)].collect().sortBy(r => (r._1, r._2))
    ordered.grouped(64).zipWithIndex.foreach { case (grp, k) =>
      assert(grp.forall(_._3 == k), s"shard $k holds wrong members")
    }
    val man = spark.read.parquet(s"$out/_manifest")
    assert(man.agg(sum(col("rows"))).collect()(0).getLong(0) === nTrain)
    assert(man.filter(col("rows") > 64).count() === 0)
  }
}
