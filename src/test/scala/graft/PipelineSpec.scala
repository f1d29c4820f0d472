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

  test("p_shuffle -> shards -> manifest-driven multi-host consumption and mid-epoch resume") {
    val base = Files.createTempDirectory("graft_resume").toFile.getAbsolutePath
    val out = s"$base/epoch1"
    val rps = 48L

    // the epoch order IS p_shuffle's output; the sink consumes
    // (shuffle_key, doc_id) as the total order
    val epoch = Curation.pShuffle(spark, sf)
    ShardSink.writeShards(epoch, out, rowsPerShard = rps,
      orderCols = Seq("shuffle_key", "doc_id"))

    // the stable-global-order contract (ShardSink scaladoc): shard k
    // holds EXACTLY rows [k*rps, (k+1)*rps) of the epoch order — pin it
    // against a driver-side sort of the full permutation
    val want = epoch.select("shuffle_key", "doc_id")
      .as[(String, Long)].collect().sortBy(identity)
    val back = spark.read.parquet(out)
      .select("shuffle_key", "doc_id", "shard")
      .as[(String, Long, Long)].collect()
    assert(back.length === want.length)
    val rankOf = want.zipWithIndex.toMap
    back.foreach { case (k, id, shard) =>
      val rank = rankOf((k, id))
      assert(rank / rps === shard,
        s"doc $id rank $rank landed in shard $shard")
    }

    // layout independence: re-shard the SAME epoch from an adversarial
    // input partitioning — shard membership must be bit-identical
    val out2 = s"$base/epoch1_relayout"
    ShardSink.writeShards(epoch.repartition(7), out2, rowsPerShard = rps,
      orderCols = Seq("shuffle_key", "doc_id"))
    val back2 = spark.read.parquet(out2)
      .select("shuffle_key", "doc_id", "shard")
      .as[(String, Long, Long)].collect()
    assert(back.sortBy(r => (r._1, r._2)).toSeq === back2.sortBy(r => (r._1, r._2)).toSeq,
      "shard assignment changed under input repartitioning")

    // manifest-driven multi-host consumption: each of world_size ranks
    // reads shards shard % world == rank, mapped from the MANIFEST
    // alone (no data-file listing); the union is the whole epoch,
    // pairwise disjoint
    val man = spark.read.parquet(s"$out/_manifest")
    val shardIds = man.select("shard").as[Long].collect().sorted
    assert(shardIds.length === (want.length + rps - 1) / rps)
    val world = 4
    val perRank = (0 until world).map { rank =>
      val mine = shardIds.filter(_ % world == rank)
      spark.read.parquet(out)
        .filter(col("shard").isin(mine: _*))
        .select("doc_id").as[Long].collect().toSet
    }
    assert(perRank.map(_.size).sum === want.length)
    assert(perRank.reduce(_ ++ _).size === want.length, "rank overlap")

    // mid-epoch resume: a run that died after fully consuming shards
    // < k0 resumes by reading shards >= k0 — the manifest's key ranges
    // identify the cut; the resumed rows are EXACTLY the tail of the
    // epoch order past rank k0*rps
    val k0 = shardIds.length / 2
    val resumed = spark.read.parquet(out)
      .filter(col("shard") >= k0)
      .select("shuffle_key", "doc_id")
      .as[(String, Long)].collect().sortBy(identity)
    assert(resumed.toSeq === want.drop((k0 * rps).toInt).toSeq,
      "resumed shards are not the exact tail of the epoch order")
    // and the manifest alone locates the cut: first resumed key equals
    // the k0 shard's first_key
    val firstKey = man.filter(col("shard") === k0)
      .select("first_key").as[String].collect()(0)
    assert(resumed.head._1 === firstKey)
  }
}
