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
  * We keep the sort parallel (range-partitioned SortExec) and only
  * collapse to a single file AT THE SINK — `coalesce(1)` after the
  * sort preserves the global order while the expensive work stays
  * distributed. At 100 TB one would drop the single-file requirement
  * and write sorted part files instead (order within and across parts
  * is preserved by the range exchange).
  */
object TsvSink {
  def write(scored: DataFrame, path: String, singleFile: Boolean = true): Unit = {
    val out = scored.select(
      concat_ws("\t", col("score").cast("string"), col("word")).as("value"))
    (if (singleFile) out.coalesce(1) else out).write.mode("overwrite").text(path)
  }
}
