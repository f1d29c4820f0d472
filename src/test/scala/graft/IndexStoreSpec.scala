package graft

import org.apache.spark.sql.functions._

import graft.functions.Vectors
import graft.operators.{Materialize, Similarity}
import graft.sources.IndexStore

/** The build-once / serve-many contract: a fitted IVF index persisted
  * by IndexStore and reloaded in a (conceptually) different session
  * must serve EXACTLY the results the in-session build serves — and
  * the cell-partitioned postings layout must actually exist on disk,
  * because that layout is the 100 TB serving story (only probed cells'
  * directories are read).
  */
class IndexStoreSpec extends SparkSpec {
  import spark.implicits._

  test("ivf index round-trips through parquet and serves identical results") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_index")
      .toString
    try {
      val (cent, assign) = Similarity.buildIvfIndex(spark, sf)
      IndexStore.saveIvf(dir, cent, assign)
      // the reference answer from the same in-memory index frames
      val queries = Tables.embeddings(spark, sf)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          Vectors.norm(col("embedding")).as("q_nrm"))
        .filter(col("q_id") < Similarity.NumQueries)
      val want = Similarity.annIvfServe(queries, cent, assign)
        .as[(Long, Long, Int, Double)].collect().toSeq
      Materialize.releaseAll(spark) // in-memory fit dropped: reload must stand alone
      // serve from the RELOADED index — no re-fit, no corpus-side Lloyd
      val (cent2, assign2) = IndexStore.loadIvf(spark, dir)
      val got = Similarity.annIvfServe(queries, cent2, assign2)
        .as[(Long, Long, Int, Double)].collect().toSeq
      assert(got === want)
      assert(got.nonEmpty && got.map(_._1).distinct.size.toLong ===
        Similarity.NumQueries)
      // the inverted-list layout is real: one directory per cell
      val cells = Option(new java.io.File(s"$dir/postings").listFiles())
        .toSeq.flatten.filter(f => f.isDirectory &&
          f.getName.startsWith("cell="))
      assert(cells.nonEmpty && cells.size <= Similarity.IvfK,
        s"expected cell=* partition dirs, found ${cells.map(_.getName)}")
      // and the served rows match the oracle-checked s_ann_ivf query
      // (same fit parameters), tying the persisted path to the gate
      val oracleChecked = Similarity.sAnnIvf(spark, sf)
        .as[(Long, Long, Int, Double)].collect().toSeq
      assert(got === oracleChecked)
    } finally {
      Materialize.releaseAll(spark)
      rmTree(dir)
    }
  }

  test("ivf-pq index round-trips as codes only and serves == s_ivf_pq") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_index")
      .toString
    try {
      val (cent, codebook, codes) = Similarity.buildIvfPqIndex(spark, sf)
      IndexStore.saveIvfPq(dir, cent, codebook, codes)
      Materialize.releaseAll(spark) // reload must stand alone — no re-fit
      val (cent2, cb2, codes2) = IndexStore.loadIvfPq(spark, dir)
      val queries = Tables.embeddings(spark, sf)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          Vectors.norm(col("embedding")).as("q_nrm"))
        .filter(col("q_id") < Similarity.NumQueries)
      val served = Similarity.annIvfPqServe(queries, cent2, cb2, codes2)
      val got = served.as[(Long, Long, Int, Double)].collect().toSeq
      // the layout pays off: the broadcast probes join drives DYNAMIC
      // PARTITION PRUNING into the codes scan — only probed ivf_cell=
      // directories are read, which at corpus scale is the difference
      // between scanning the index and scanning a few inverted lists
      assert(served.queryExecution.executedPlan.toString
        .toLowerCase.contains("dynamicpruning"),
        "partition pruning lost on the loaded codes scan")
      // the oracle-checked query IS the serve path over the in-session
      // build — reload must reproduce it exactly
      val want = Similarity.sIvfPq(spark, sf)
        .as[(Long, Long, Int, Double)].collect().toSeq
      assert(got === want)
      assert(got.nonEmpty)
      // the compressed-index property: the persisted codes carry NO
      // raw vector column (storage = M small ints + a list id)
      val codesSchema = spark.read.parquet(s"$dir/codes").schema
      assert(!codesSchema.exists(_.dataType.typeName == "array"),
        s"raw vectors leaked into the codes store: $codesSchema")
      // inverted-list layout on disk
      val cells = Option(new java.io.File(s"$dir/codes").listFiles())
        .toSeq.flatten.filter(f => f.isDirectory &&
          f.getName.startsWith("ivf_cell="))
      assert(cells.nonEmpty && cells.size <= Similarity.IvfK,
        s"expected ivf_cell=* dirs, found ${cells.map(_.getName)}")
    } finally {
      Materialize.releaseAll(spark)
      rmTree(dir)
    }
  }

  private def rmTree(dir: String): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).toSeq.flatten.foreach(rm); f.delete()
    }
    rm(new java.io.File(dir))
  }
}
