package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Similarity
import graft.sources.IndexStore

/** Incremental ANN-index maintenance from a vector stream — the piece
  * that makes the IVF store's build-once/serve-many contract honest
  * under a GROWING corpus: the expensive fit ran once offline, and new
  * vectors arriving on a stream are folded into the index per
  * microbatch instead of forcing rebuilds.
  *
  * Shape: `foreachBatch` is the right Structured-Streaming primitive
  * here because the sink is a partitioned-parquet APPEND keyed by a
  * value computed AGAINST BATCH-EXTERNAL state (the frozen centroids)
  * — not a stateful aggregation the engine could fold itself. Each
  * microbatch: one broadcast of the K-row centroid frame, a map-side
  * argmax assignment (zero shuffles of vector data —
  * [[Similarity.assignVectors]]), one append into the probed-at-serve
  * `cell=` directories. Serving sessions see additions on their next
  * [[IndexStore.loadIvf]]; centroid drift is a REBUILD decision made
  * offline (monitor with s_drift/p_domain_shift), never an online one.
  *
  * Delivery: EXACTLY-ONCE. foreachBatch re-runs a failed batch with
  * the same `batchId` and the same rows; every sink here threads that
  * id into the store's batch-partitioned append, which deletes the
  * prior attempt's `batch={batchId}` leaves before writing — a replay
  * is an idempotent overwrite of exactly its own partition
  * ([[IndexStore.appendIvf]]). IndexStoreSpec replays a batch id
  * twice and pins the served rows identical; the equivalence spec
  * covers the happy path (served top-k after N microbatches == a
  * from-scratch assignment of the union against the frozen
  * centroids).
  */
object IndexUpserts {

  /** Assign one microbatch against the store's frozen centroids and
    * append it to the inverted lists. Public so batch backfills can
    * reuse the exact streaming code path.
    */
  def upsertIvfBatch(dir: String)(batch: DataFrame, batchId: Long): Unit = {
    if (!batch.isEmpty) {
      val cent = batch.sparkSession.read
        .parquet(IndexStore.resolvePath(batch.sparkSession, dir, "centroids"))
        .select(col("c_id"), col("c_emb"), col("c_nrm"))
      IndexStore.appendIvf(dir, Similarity.assignVectors(batch, cent),
        batchId)
    }
  }

  /** Start the upsert stream: `vectors` carries (vec_id, embedding).
    * Checkpointed so a restart resumes from the last committed
    * microbatch.
    */
  def startIvfUpserts(vectors: DataFrame, dir: String,
      checkpointDir: String): StreamingQuery =
    leased(vectors.sparkSession, dir, vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(upsertIvfBatch(dir) _)
      .start())

  /** IVF-PQ twin of [[upsertIvfBatch]]: encode one microbatch of raw
    * vectors against the store's FROZEN centroids + codebook
    * ([[graft.operators.Similarity.encodeVectors]] — two broadcast
    * model joins, map-side argmin) and append the codes into the
    * inverted-list directories. The corpus grows as codes only — no
    * raw vector ever lands in the store, preserving the compressed
    * layout's storage contract under streaming growth.
    */
  def upsertIvfPqBatch(dir: String)(batch: DataFrame, batchId: Long): Unit = {
    if (!batch.isEmpty) {
      val s = batch.sparkSession
      val cent = s.read
        .parquet(IndexStore.resolvePath(s, dir, "centroids"))
        .select(col("c_id"), col("c_emb"), col("c_nrm"))
      val codebook = s.read
        .parquet(IndexStore.resolvePath(s, dir, "codebook"))
        .select(col("m"), col("cell"), col("c_emb"))
      IndexStore.appendIvfPq(dir,
        Similarity.encodeVectors(batch, cent, codebook), batchId)
    }
  }

  /** Start the compressed-index upsert stream: `vectors` carries
    * (vec_id, embedding). Checkpointed for restart resume.
    */
  def startIvfPqUpserts(vectors: DataFrame, dir: String,
      checkpointDir: String): StreamingQuery =
    leased(vectors.sparkSession, dir, vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(upsertIvfPqBatch(dir) _)
      .start())

  /** Grid-store twin of [[upsertIvfBatch]]: key one microbatch of new
    * points (cx, cy columns) to their home cells and append into the
    * cell directories. There is no model frame to consult — the grid
    * is a pure function of the radius — so the batch is one map-side
    * cell derivation and one partitioned append, zero shuffles.
    */
  def upsertGridBatch(dir: String)(batch: DataFrame, batchId: Long): Unit =
    if (!batch.isEmpty)
      IndexStore.appendGrid(dir, graft.operators.Geo.withCells(batch),
        batchId)

  /** Start the spatial upsert stream: `points` carries at least
    * (cx, cy) unit-square coordinates plus payload columns matching
    * the store schema. Checkpointed for restart resume.
    */
  def startGridUpserts(points: DataFrame, dir: String,
      checkpointDir: String): StreamingQuery =
    leased(points.sparkSession, dir, points.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(upsertGridBatch(dir) _)
      .start())

  /** Record the started query as the store's upsert-lease holder so a
    * concurrent compaction refuses instead of silently losing the
    * stream's mid-flight appends at version cleanup. The lease names
    * the query's runId; once the query stops, the next compaction (or
    * [[IndexStore.releaseUpsertLease]]) clears it as stale.
    */
  private def leased(s: org.apache.spark.sql.SparkSession, dir: String,
      q: StreamingQuery): StreamingQuery = {
    IndexStore.acquireUpsertLease(s, dir, q.runId.toString)
    q
  }
}
