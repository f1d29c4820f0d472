package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.operators.WordScore
import graft.sources.{ReviewSource, TsvSink}

/** CLI twin of the reference's driver (`ComputeWordScore.run`,
  * `ComputeWordScore.java:137-223`): `[-Dkey=value ...] <input>
  * <output>`, exit 2 on misuse, exit 0/1 on success/failure — so a user
  * of the reference can run the same submission command shape against
  * this engine. `-D key=value` (separate tokens) is accepted too,
  * matching Hadoop's `GenericOptionsParser`/`ToolRunner` handling
  * (`ComputeWordScore.java:221-223`); each pair lands in the session
  * conf before any query runs.
  *
  * Input: a file/dir of Yelp-style JSON-lines reviews (fail-fast on
  * malformed records, like the reference). Output: one tab-delimited
  * `score<TAB>word` file sorted by score descending — byte-compatible
  * with the reference's TextOutputFormat result (`:192,206-216`),
  * produced by a parallel range sort instead of its single reducer.
  */
object WordScoreMain {

  /** Splits argv into (-D conf pairs, positional args); None on a
    * malformed `-D` (no '=' or empty key) or a dangling trailing `-D`.
    */
  private[graft] def parseArgs(args: Array[String]): Option[(Seq[(String, String)], Seq[String])] = {
    val confs = Seq.newBuilder[(String, String)]
    val positional = Seq.newBuilder[String]
    var i = 0
    def addConf(kv: String): Boolean = kv.indexOf('=') match {
      case n if n > 0 => confs += kv.substring(0, n) -> kv.substring(n + 1); true
      case _ => false
    }
    while (i < args.length) {
      args(i) match {
        case "-D" if i + 1 < args.length => if (!addConf(args(i + 1))) return None; i += 2
        case a if a.startsWith("-D") && a.length > 2 => if (!addConf(a.substring(2))) return None; i += 1
        case "-D" => return None
        case a => positional += a; i += 1
      }
    }
    Some((confs.result(), positional.result()))
  }

  def main(args: Array[String]): Unit = {
    val parsed = parseArgs(args).filter(_._2.length == 2)
    if (parsed.isEmpty) {
      System.err.println("Usage: WordScoreMain [-Dkey=value ...] <input> <output>")
      sys.exit(2)
    }
    val (confs, positional) = parsed.get
    val (input, output) = (positional(0), positional(1))
    // everything after arg validation — session startup (an invalid -D
    // VALUE fails conf validation here), conf application, and the
    // pipeline — lands in the documented exit-1 failure path; compute
    // the exit code first, stop the session, THEN exit.
    var spark: SparkSession = null
    val code =
      try {
        val builder = SparkSession.builder()
          .appName("word-score")
          .config("spark.sql.adaptive.enabled", "true")
          .config("spark.sql.session.timeZone", "UTC")
        spark = confs.foldLeft(builder) { case (b, (k, v)) => b.config(k, v) }
          .getOrCreate()
        // an already-running session (tests) won't pick builder confs
        // up — apply runtime-settable ones directly as well (static
        // confs can't be set here; the builder above already took them)
        confs.foreach { case (k, v) =>
          try spark.conf.set(k, v)
          catch { case _: org.apache.spark.sql.AnalysisException => }
        }
        val scored = WordScore.score(
          ReviewSource.reviews(spark, input), col("stars"), col("text"))
        TsvSink.write(scored, output)
        0
      } catch {
        case e: Throwable =>
          System.err.println(s"word-score failed: ${e.getMessage}")
          1
      }
    if (spark != null) spark.stop()
    sys.exit(code)
  }
}
