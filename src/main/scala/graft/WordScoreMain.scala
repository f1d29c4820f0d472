package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.operators.WordScore
import graft.sources.{ReviewSource, TsvSink}

/** CLI twin of the reference's driver (`ComputeWordScore.run`,
  * `ComputeWordScore.java:137-223`): `<input> <output>`, exit 2 on
  * misuse, exit 0/1 on success/failure — so a user of the reference can
  * run the same submission command shape against this engine.
  *
  * Input: a file/dir of Yelp-style JSON-lines reviews (fail-fast on
  * malformed records, like the reference). Output: one tab-delimited
  * `score<TAB>word` file sorted by score descending — byte-compatible
  * with the reference's TextOutputFormat result (`:192,206-216`),
  * produced by a parallel range sort instead of its single reducer.
  */
object WordScoreMain {
  def main(args: Array[String]): Unit = {
    if (args.length != 2) {
      System.err.println("Usage: WordScoreMain <input> <output>")
      sys.exit(2)
    }
    val Array(input, output) = args
    val spark = SparkSession.builder()
      .appName("word-score")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    // compute the exit code first, stop the session, THEN exit —
    // sys.exit inside try/catch would skip a finally entirely
    val code =
      try {
        val scored = WordScore.score(
          ReviewSource.reviews(spark, input), col("stars"), col("text"))
        TsvSink.write(scored, output)
        0
      } catch {
        case e: Throwable =>
          System.err.println(s"word-score failed: ${e.getMessage}")
          1
      }
    spark.stop()
    sys.exit(code)
  }
}
