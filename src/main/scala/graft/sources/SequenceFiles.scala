package graft.sources

import org.apache.hadoop.io.{IntWritable, Text}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Interop with the reference's intermediate format: Hadoop
  * `SequenceFile<Text, IntWritable>` (reference `ComputeWordScore.java:
  * 170-176` writes job-1 word→score output in this format "to avoid
  * re-parsing text").
  *
  * The Spark engine itself never materializes an intermediate (one lazy
  * DAG), but a migrating user may hold existing SequenceFile outputs —
  * these readers/writers make them first-class inputs/outputs. RDD API
  * is used only at the boundary (Hadoop Writables aren't Dataset
  * types); everything after `toDF` is Catalyst-planned.
  */
object SequenceFiles {

  /** Read a `SequenceFile<Text, IntWritable>` as (word, score) rows.
    * Scores widen to LONG to match the engine's score type (sum over
    * int), so read → write round-trips.
    */
  def readWordScores(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext
      .sequenceFile(path, classOf[Text], classOf[IntWritable])
      .map { case (k, v) => (k.toString, v.get().toLong) }
      .toDF("word", "score")
  }

  /** Write (word, score) rows in the reference's intermediate format.
    * Accepts int or long score columns; fails loudly (like the
    * reference's fail-fast stance) if a score exceeds IntWritable's
    * range instead of silently truncating.
    */
  def writeWordScores(df: DataFrame, path: String): Unit = {
    df.select("word", "score").rdd
      .map { r =>
        val score = r.getAs[Number](1).longValue()
        require(score >= Int.MinValue && score <= Int.MaxValue,
          s"score $score for word '${r.getString(0)}' exceeds IntWritable range")
        (new Text(r.getString(0)), new IntWritable(score.toInt))
      }
      .saveAsSequenceFile(path)
  }
}
