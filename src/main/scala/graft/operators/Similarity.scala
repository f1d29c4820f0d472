package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Vectors

/** Similarity search over the `embeddings` fixture (ArrayType(FloatType),
  * dim 64): brute-force cosine top-k as the exact baseline, and an
  * IVF-style two-probe ANN as the scale path. Both oracle-checked.
  *
  * Scale design (100 TB of vectors):
  *  - Brute force is O(|Q|·N) with the query side BROADCAST — the big
  *    vector table is scanned once, never shuffled; ranking shuffles only
  *    (q, candidate, score) triples, not vectors.
  *  - IVF: K deterministic centroids (vec_id < K stands in for a k-means
  *    fit; swap in real centroids without touching the plan). Cell
  *    assignment is a broadcast map-side cross (K·N rows, collapses to
  *    one row per vector via min-by-rank), so the inverted index is
  *    produced with ZERO shuffles of the vector data; probing joins the
  *    query's nProbe cells only — the pair join touches ~nProbe/K of the
  *    corpus instead of all of it.
  *
  * Determinism: cosines are bit-identical across engines (sequential
  * double folds, see graft.functions.Vectors); ranking always orders by
  * (rounded cosine DESC, id ASC) so ties never depend on partitioning.
  */
object Similarity {

  val NumQueries = 10   // query set: vec_id < NumQueries
  val TopK = 5
  val IvfK = 16         // centroids: vec_id < IvfK
  val NumProbes = 2

  /** embeddings + precomputed norm, pinned behind an exchange so every
    * consumer (query side, corpus side, centroids, assignment) reuses
    * ONE norm computation via ReuseExchange instead of re-deriving it,
    * and so downstream projections can't inline the norm fold into each
    * reference.
    */
  private def withNorm(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).select(
      col("vec_id"), col("embedding"),
      Vectors.norm(col("embedding")).as("nrm"))
      .repartition(s.sparkContext.defaultParallelism, col("vec_id"))

  // --------------------------------------------------- brute-force top-k
  def sCosineTopK(s: SparkSession, d: String): DataFrame = {
    val base = withNorm(s, d)
    val q = base.toDF("q_id", "q_emb", "q_nrm").filter(col("q_id") < NumQueries)
    val cos = round(
      Vectors.cosineWithNorms(Vectors.dot(col("q_emb"), col("embedding")),
        col("q_nrm"), col("nrm")), 6)
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    broadcast(q).crossJoin(base)
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"), cos.as("cos"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= TopK)
      .select("q_id", "n_id", "rnk", "cos")
      .orderBy("q_id", "rnk")
  }

  /** DuckDB fragment: cosine between tables aliased a (query) and b. */
  private def cosSql(a: String, b: String): String =
    s"""round(list_reduce(list_transform(range(1, 65),
       |      i -> CAST($a.embedding[i] AS DOUBLE) * CAST($b.embedding[i] AS DOUBLE)),
       |      (x, y) -> x + y) / ($a.nrm * $b.nrm), 6)""".stripMargin

  private val NORM_CTE =
    """n AS (SELECT vec_id, embedding,
      |  sqrt(list_reduce(list_transform(embedding,
      |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, x) -> a + x)) AS nrm
      |FROM embeddings)""".stripMargin

  val sCosineTopKSql: String =
    s"""WITH $NORM_CTE,
       |scored AS (
       |  SELECT q.vec_id AS q_id, b.vec_id AS n_id, ${cosSql("q", "b")} AS cos
       |  FROM n q JOIN n b ON q.vec_id < $NumQueries AND q.vec_id <> b.vec_id),
       |ranked AS (SELECT q_id, n_id, cos,
       |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS INT) AS rnk
       |  FROM scored)
       |SELECT q_id, n_id, rnk, cos FROM ranked WHERE rnk <= $TopK
       |ORDER BY q_id, rnk""".stripMargin

  // ----------------------------------------------------------- IVF ANN
  def sAnnIvf(s: SparkSession, d: String): DataFrame = {
    val base = withNorm(s, d)
    val cent = base.toDF("c_id", "c_emb", "c_nrm").filter(col("c_id") < IvfK)
    val centCos = round(
      Vectors.cosineWithNorms(Vectors.dot(col("embedding"), col("c_emb")),
        col("nrm"), col("c_nrm")), 6)

    // inverted index: every vector → nearest centroid (1 row via rank)
    val wAssign = Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("c_id"))
    val assign = base.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("embedding"), col("nrm"), col("c_id"), centCos.as("ccos"))
      .withColumn("arn", row_number().over(wAssign))
      .filter(col("arn") === 1)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("c_id").as("cell"))

    // query probes: top nProbe centroids per query
    val wProbe = Window.partitionBy("q_id").orderBy(col("ccos").desc, col("c_id"))
    val probes = base.filter(col("vec_id") < NumQueries)
      .toDF("q_id", "q_emb", "q_nrm")
      .crossJoin(broadcast(cent))
      .select(col("q_id"), col("q_emb"), col("q_nrm"), col("c_id"),
        round(Vectors.cosineWithNorms(Vectors.dot(col("q_emb"), col("c_emb")),
          col("q_nrm"), col("c_nrm")), 6).as("ccos"))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= NumProbes)
      .select(col("q_id"), col("q_emb"), col("q_nrm"), col("c_id").as("cell"))

    // search only the probed cells
    val cos = round(
      Vectors.cosineWithNorms(Vectors.dot(col("q_emb"), col("embedding")),
        col("q_nrm"), col("nrm")), 6)
    val wRank = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    probes.join(assign, "cell")
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"), cos.as("cos"))
      .withColumn("rnk", row_number().over(wRank))
      .filter(col("rnk") <= TopK)
      .select("q_id", "n_id", "rnk", "cos")
      .orderBy("q_id", "rnk")
  }

  val sAnnIvfSql: String =
    s"""WITH $NORM_CTE,
       |cent AS (SELECT vec_id AS c_id, embedding, nrm FROM n WHERE vec_id < $IvfK),
       |assign AS (SELECT vec_id, embedding, nrm, c_id AS cell FROM (
       |  SELECT v.vec_id, v.embedding, v.nrm, c.c_id,
       |    row_number() OVER (PARTITION BY v.vec_id
       |      ORDER BY ${cosSql("v", "c")} DESC, c.c_id) AS arn
       |  FROM n v CROSS JOIN cent c) WHERE arn = 1),
       |probes AS (SELECT q_id, embedding, nrm, c_id AS cell FROM (
       |  SELECT q.vec_id AS q_id, q.embedding, q.nrm, c.c_id,
       |    row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY ${cosSql("q", "c")} DESC, c.c_id) AS prn
       |  FROM n q CROSS JOIN cent c WHERE q.vec_id < $NumQueries) WHERE prn <= $NumProbes),
       |scored AS (
       |  SELECT p.q_id, a.vec_id AS n_id, ${cosSql("p", "a")} AS cos
       |  FROM probes p JOIN assign a ON p.cell = a.cell AND p.q_id <> a.vec_id),
       |ranked AS (SELECT q_id, n_id, cos,
       |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS INT) AS rnk
       |  FROM scored)
       |SELECT q_id, n_id, rnk, cos FROM ranked WHERE rnk <= $TopK
       |ORDER BY q_id, rnk""".stripMargin

  val queries: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "s_cosine_topk" -> (sCosineTopK _, sCosineTopKSql),
    "s_ann_ivf"     -> (sAnnIvf _, sAnnIvfSql),
  )
}
