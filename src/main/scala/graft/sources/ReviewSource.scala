package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's native input/output surface.
  *
  * Input (reference `ComputeWordScore.java:99-116`): newline-delimited
  * JSON, one Yelp review per line; only `stars` (JSON number, truncated
  * to int at `:113`) and `text` (`:116`) are read; malformed JSON is
  * fail-fast (`:102-108`).
  *
  * Spark's JSON source is line-oriented, so scan+parse (reference ops
  * #1-2) is one `read`. The 2-field schema makes the reference's
  * hand-done column pruning (`:113,116`) explicit — the JSON parser
  * only materializes these fields.
  */
object ReviewSource {

  val schema: StructType = StructType(Seq(
    StructField("stars", DoubleType),
    StructField("text", StringType)))

  /** FAILFAST matches the reference's wrapped-RuntimeException behavior
    * on malformed lines (`:105-107`).
    */
  def reviews(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)
}

/** The reference's final sink: tab-delimited `score<TAB>word` lines
  * (TextOutputFormat after the KV inversion, `ComputeWordScore.java:
  * 192,206-216`), one file (1 reducer, `:209-213`).
  *
  * `singleFile = true` reproduces the reference's one-file contract —
  * and, like its single reducer, serializes the FINAL sort stage:
  * `coalesce(1)` is a narrow dependency, so one task merges all range
  * partitions. All upstream work (scan, tokenize, aggregate, shuffle)
  * stays distributed. At 100 TB drop the single-file requirement
  * (`singleFile = false`): the range exchange already orders part files
  * within and across each other, so the sorted output is the
  * lexicographic concatenation of parts.
  */
object TsvSink {
  def write(scored: DataFrame, path: String, singleFile: Boolean = true): Unit = {
    val out = scored.select(
      concat_ws("\t", col("score").cast("string"), col("word")).as("value"))
    (if (singleFile) out.coalesce(1) else out).write.mode("overwrite").text(path)
  }
}
