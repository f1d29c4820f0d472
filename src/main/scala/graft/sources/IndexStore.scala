package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Persistence for the IVF similarity index — the build-once /
  * serve-many contract every production ANN deployment needs: the fit
  * (Lloyd iterations over the corpus) runs in an offline job, the two
  * resulting frames land as parquet, and query-serving sessions reload
  * them without ever re-fitting.
  *
  * Layout under `dir`:
  *  - `centroids/` — the K-row fitted frame (c_id, c_emb, c_nrm);
  *    trivially broadcast at serve time.
  *  - `postings/`  — the corpus assignment (vec_id, embedding, nrm),
  *    written `partitionBy("cell")`: one directory per inverted list.
  *    This is the layout decision that makes serving cheap at 100 TB —
  *    `Similarity.annIvfServe` joins postings on the probed cells, so
  *    the scan reads ONLY the nProbe·|Q| cell directories a query
  *    batch touches (static pruning when probes are literals, dynamic
  *    partition pruning under the broadcast join otherwise); the other
  *    K − nProbe lists are never opened.
  *
  * Both writes are deterministic parquet (Overwrite — an index rebuild
  * replaces the index). No driver-side state: save is two distributed
  * writes, load is two reads.
  */
object IndexStore {

  def saveIvf(dir: String, cent: DataFrame, assign: DataFrame): Unit = {
    cent.write.mode(SaveMode.Overwrite).parquet(s"$dir/centroids")
    assign.write.mode(SaveMode.Overwrite)
      .partitionBy("cell").parquet(s"$dir/postings")
  }

  /** Incremental maintenance: append an already-assigned batch of new
    * vectors into the postings store's cell partitions — the
    * build-once/serve-many contract under a GROWING corpus: centroids
    * stay frozen, each new vector lands in its inverted list's
    * directory, and serving sessions pick the additions up on their
    * next load with no re-fit and no rewrite of existing lists.
    * Callers assign with [[graft.operators.Similarity.assignVectors]]
    * against the store's own centroids (the streaming upsert sink in
    * [[graft.streaming.IndexUpserts]] wires the two together).
    *
    * Delivery note: parquet Append is at-least-once under retried
    * microbatches — production deployments key files by batch id (the
    * foreachBatch argument) or land appends in a transactional table
    * format; the upsert sink documents the same caveat.
    */
  def appendIvf(dir: String, assigned: DataFrame): Unit =
    assigned.select(col("vec_id"), col("embedding"), col("nrm"), col("cell"))
      .write.mode(SaveMode.Append).partitionBy("cell")
      .parquet(s"$dir/postings")

  /** Compact the postings store: every [[appendIvf]] microbatch lands
    * one new file per touched cell directory, so a long-running upsert
    * stream degrades serve-time listing and scan granularity (hundreds
    * of tiny row groups per inverted list). Compaction rewrites the
    * postings with one shuffle keyed on `cell` — each cell's rows land
    * in exactly one task, hence ONE file per cell directory — into a
    * sibling directory, then swaps it in. Row content is untouched
    * (IndexStoreSpec pins byte-identical serve results and the
    * one-file-per-cell invariant).
    *
    * The delete+rename swap is not atomic across the two steps — a
    * crash between them loses the listing until re-run. Production
    * compaction lands in a transactional table format (manifest swap);
    * this is the filesystem-level equivalent, same caveat class as
    * [[appendIvf]]'s at-least-once note.
    */
  def compactIvf(s: SparkSession, dir: String): Unit = {
    val tmp = s"$dir/postings_compacting"
    s.read.parquet(s"$dir/postings")
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cell"))
      .repartition(col("cell"))
      .write.mode(SaveMode.Overwrite).partitionBy("cell").parquet(tmp)
    val conf = s.sparkContext.hadoopConfiguration
    val live = new org.apache.hadoop.fs.Path(s"$dir/postings")
    val staged = new org.apache.hadoop.fs.Path(tmp)
    val fs = live.getFileSystem(conf)
    fs.delete(live, true)
    if (!fs.rename(staged, live))
      throw new java.io.IOException(s"compaction swap failed for $dir")
  }

  /** Reload (centroids, postings) for [[graft.operators.Similarity
    * .annIvfServe]]. Column order is restored to the build-time shape
    * (partitionBy moves `cell` last on disk).
    */
  def loadIvf(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val cent = s.read.parquet(s"$dir/centroids")
      .select(col("c_id"), col("c_emb"), col("c_nrm"))
    val assign = s.read.parquet(s"$dir/postings")
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cell"))
    (cent, assign)
  }

  /** Persist the composed IVF-PQ index — the production COMPRESSED
    * layout: `centroids/` (IVF, K rows), `codebook/` (PQ, M·K rows),
    * and `codes/` — the corpus as (vec_id, m, cell) PQ codes
    * partitioned by `ivf_cell`. No raw vector appears anywhere in the
    * store: per-vector storage is M small ints + one list id, and
    * serving ([[graft.operators.Similarity.annIvfPqServe]]) reads only
    * probed `ivf_cell=` directories and broadcasts the two tiny model
    * frames.
    */
  def saveIvfPq(dir: String, cent: DataFrame, codebook: DataFrame,
      codes: DataFrame): Unit = {
    cent.write.mode(SaveMode.Overwrite).parquet(s"$dir/centroids")
    codebook.write.mode(SaveMode.Overwrite).parquet(s"$dir/codebook")
    codes.write.mode(SaveMode.Overwrite)
      .partitionBy("ivf_cell").parquet(s"$dir/codes")
  }

  def loadIvfPq(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val cent = s.read.parquet(s"$dir/centroids")
      .select(col("c_id"), col("c_emb"), col("c_nrm"))
    val codebook = s.read.parquet(s"$dir/codebook")
      .select(col("m"), col("cell"), col("c_emb"))
    val codes = s.read.parquet(s"$dir/codes")
      .select(col("vec_id"), col("m"), col("cell"), col("ivf_cell"))
    (cent, codebook, codes)
  }

  /** Persist a point corpus as a SPATIAL grid store: rows land
    * `partitionBy("cell_x", "cell_y")` — one directory per grid cell,
    * the 2-D analog of the IVF inverted-list layout. A radius or kNN
    * query over the store touches only the build side's 3x3 cell
    * neighborhoods, so the scan reads 9·|sites| cell directories via
    * partition pruning (dynamic under the broadcast cell join), never
    * the whole corpus — spatial data skipping as a directory layout.
    */
  def saveGrid(dir: String, pointsWithCells: DataFrame): Unit =
    // cluster rows by cell before the partitioned write: without this,
    // EVERY upstream task writes a file into EVERY cell directory it
    // touches (up to |tasks| x |cells| small files — measured 2x slower
    // to write and list); with it, each cell lands as ONE file, same
    // one-file-per-inverted-list shape compactIvf restores for IVF
    pointsWithCells.repartition(col("cell_x"), col("cell_y"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("cell_x", "cell_y").parquet(s"$dir/cells")

  /** Reload the grid store for [[graft.operators.Geo]] serving; column
    * order restored to the build-time shape (partition cols move last
    * on disk, and their values come back through partition-directory
    * inference as INTs — same type the build wrote).
    */
  def loadGrid(s: SparkSession, dir: String): DataFrame = {
    val df = s.read.parquet(s"$dir/cells")
    val dataCols = df.columns.filterNot(c => c == "cell_x" || c == "cell_y")
    df.select((dataCols :+ "cell_x" :+ "cell_y").map(col).toSeq: _*)
  }

  /** Incremental grid maintenance — the spatial twin of [[appendIvf]]:
    * new points land in their cell directories, serving sessions pick
    * them up on the next [[loadGrid]], the grid itself never rewrites.
    * Same at-least-once delivery caveat as appendIvf under retried
    * microbatches.
    */
  def appendGrid(dir: String, pointsWithCells: DataFrame): Unit =
    pointsWithCells.write.mode(SaveMode.Append)
      .partitionBy("cell_x", "cell_y").parquet(s"$dir/cells")

  /** Compact the grid store after upsert fragmentation — one file per
    * cell directory, same one-shuffle mechanism and same
    * non-atomic-swap caveat as [[compactIvf]].
    */
  def compactGrid(s: SparkSession, dir: String): Unit = {
    val tmp = s"$dir/cells_compacting"
    val df = s.read.parquet(s"$dir/cells")
    df.repartition(col("cell_x"), col("cell_y"))
      .write.mode(SaveMode.Overwrite).partitionBy("cell_x", "cell_y")
      .parquet(tmp)
    val conf = s.sparkContext.hadoopConfiguration
    val live = new org.apache.hadoop.fs.Path(s"$dir/cells")
    val staged = new org.apache.hadoop.fs.Path(tmp)
    val fs = live.getFileSystem(conf)
    fs.delete(live, true)
    if (!fs.rename(staged, live))
      throw new java.io.IOException(s"grid compaction swap failed for $dir")
  }
}
