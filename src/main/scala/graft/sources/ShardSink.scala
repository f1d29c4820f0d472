package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic fixed-size training shards.
  *
  * Training dataloaders consume a corpus as numbered shards with a
  * STABLE global order: shard `k` must hold exactly rows
  * `[k·rowsPerShard, (k+1)·rowsPerShard)` of the total order, every
  * run, on any cluster layout — that is what makes mid-epoch resume
  * and multi-host sharding (`shard_id % world_size`) reproducible.
  * (The reference's analogue is its single sorted reducer output,
  * `ComputeWordScore.java:206-216` — one global order, one file; this
  * sink is that contract generalized to many bounded files.)
  *
  * Exact fixed-size shards need each row's global rank in the total
  * order. A window `row_number()` over no partition key would funnel
  * the corpus through ONE task, so the rank comes from
  * `RDD.zipWithIndex` over the range-partitioned sort instead: one
  * extra count job per partition, then offsets are assigned locally —
  * linear, no single-task stage, deterministic because the input order
  * is the sort's. This is the rare per-partition imperative case where
  * the RDD hop is the scale-safe tool (a DataFrame-only global rank
  * doesn't exist without the single-partition window).
  *
  * Layout: `path/shard=<k>/part-*.parquet` (one file per shard — rows
  * of one shard land in one task because the frame is hash-repartitioned
  * on the shard id before the partitioned write), plus
  * `path/_manifest/` (parquet: shard, rows, first/last order key) —
  * the `_`-prefix keeps it invisible to readers of `path`. The
  * manifest is #shards rows; a dataloader reads it alone to map
  * shard → key range without listing data files.
  *
  * `orderCols` must be a TOTAL order (include a unique tiebreak
  * column); a partial order would make shard membership
  * nondeterministic at the boundaries.
  */
object ShardSink {
  def writeShards(df: DataFrame, path: String, rowsPerShard: Long,
      orderCols: Seq[String]): Unit = {
    require(rowsPerShard > 0, "rowsPerShard must be positive")
    require(orderCols.nonEmpty, "orderCols must name a total order")
    val spark = df.sparkSession
    val sorted = df.orderBy(orderCols.map(col): _*)
    val withRank = spark.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) },
      sorted.schema.add("__rank", LongType, nullable = false))
    val sharded = withRank
      .withColumn("shard", (col("__rank") / rowsPerShard).cast("long"))
      .repartition(col("shard"))
      .sortWithinPartitions((Seq("shard") ++ orderCols).map(col): _*)
      .drop("__rank")
    sharded.write.mode(SaveMode.Overwrite).partitionBy("shard").parquet(path)
    // manifest from the WRITTEN files, not the plan: re-aggregating
    // `sharded` would re-execute the whole global sort + zipWithIndex +
    // repartition lineage a second time — on the corpus this sink is
    // for, a full extra sort. The read-back scans only (shard, key)
    // columns of the data just written.
    // explicit schema on the read-back: an empty input wrote zero data
    // files (schema inference would throw), and partition DISCOVERY
    // types `shard=<k>` dirs as INT — the writer's schema says LONG.
    // Passing the written schema fixes both: empty path → empty frame →
    // empty (but readable) manifest; shard comes back as LONG.
    val key = col(orderCols.head)
    spark.read.schema(sharded.schema).parquet(path).groupBy("shard")
      .agg(count(lit(1)).as("rows"),
        min(key).as("first_key"), max(key).as("last_key"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/_manifest")
  }
}
