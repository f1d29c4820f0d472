package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** The reference's entire computation, Spark-first.
  *
  * Reference semantics (`ComputeWordScore.java:32-57`): for every
  * whitespace token of every review's `text`, add `stars - 3`
  * (5★→+2 … 1★→−2, table at `:86-93`); final score per word is the sum;
  * output sorted by score descending (`:54-56`, job 2 at `:187-216`).
  *
  * The reference's two MapReduce jobs + materialized SequenceFile
  * (`:170-176`) collapse into ONE lazy DAG with two exchanges:
  *   scan → project → generate(explode) → partial sum → shuffle(word)
  *   → final sum → range-partitioned parallel sort.
  * The hand-written combiner (`:180-181`) is Spark's automatic partial
  * HashAggregate; the single-reducer total order (`:209-213`) becomes a
  * parallel SortExec over a range exchange — same total order, no
  * single-node bottleneck at 100 TB.
  *
  * Scale notes: the vocabulary is tiny relative to the corpus, so the
  * partial aggregate collapses virtually all rows map-side; the final
  * shuffle moves only |vocab| × shufflePartitions rows. Hot words ("the")
  * are therefore NOT a skew problem post-combine; see
  * [[wordScoreSalted]] for the explicit two-phase pattern used when the
  * grouped value state is too big to pre-aggregate (kept for the 100 TB
  * design discussion and exercised by the bench).
  */
object WordScore {

  /** (stars, text) → (word, score), sorted score desc, word asc (the
    * deterministic tie-break the reference explicitly allows, `:56`).
    * Fail-fast on stars outside {1..5}, matching the reference's NPE
    * task failure (`ComputeWordScore.java:113`) EXACTLY: the reference
    * unboxes the modifier at `context.write`, i.e. once per emitted
    * token — a bad-stars review whose text tokenizes to zero words
    * never reaches the write and succeeds. The strict modifier is
    * therefore evaluated in the projection ABOVE the Generate (per
    * word), not below it (per review); Catalyst does not push project
    * expressions under a Generate, so token-less reviews never
    * evaluate it (pinned by WordScoreSpec).
    */
  def score(reviews: DataFrame, stars: Column, text: Column): DataFrame =
    reviews
      .select(stars.as("stars_in"), Text.explodedWord(text).as("word"))
      .select(Text.starsModifierStrict(col("stars_in")).as("modifier"), col("word"))
      .groupBy("word")
      .agg(sum("modifier").as("score"))
      .orderBy(col("score").desc, col("word"))

  /** Flagship over the `documents` fixture: the fixture has no ratings,
    * so a deterministic star rating is derived from `doc_id`
    * (SURVEY.md §7) — expressible identically in the DuckDB oracle.
    */
  def flagship(docs: DataFrame): DataFrame =
    score(docs, col("doc_id") % 5 + 1, col("text"))

  def flagshipOracle(): String =
    s"""SELECT word, CAST(SUM(CAST(doc_id % 5 + 1 AS INT) - 3) AS BIGINT) AS score
       |FROM (SELECT doc_id, unnest(string_split_regex(text, '${Text.DelimRegexSql}')) AS word
       |      FROM documents)
       |WHERE length(word) > 0
       |GROUP BY word
       |ORDER BY score DESC, word""".stripMargin

  /** Same result via the explicit two-phase (salted) aggregation.
    *
    * Pattern for 100 TB skew: salt the hot key space, partially
    * aggregate per (word, salt), then de-salt and finish. For a plain
    * `sum` Spark's map-side partial agg already does this implicitly;
    * the salted form is the drop-in shape for aggregations whose
    * partial state is per-row (e.g. collect-type aggs) where one hot
    * word would otherwise pin a single reducer.
    */
  def wordScoreSalted(reviews: DataFrame, stars: Column, text: Column,
                      saltBuckets: Int = 16): DataFrame =
    reviews
      .select(Text.starsModifier(stars).as("modifier"),
              Text.explodedWord(text).as("word"))
      .withColumn("salt", pmod(spark_partition_id(), lit(saltBuckets)))
      .groupBy("word", "salt")
      .agg(sum("modifier").as("partial"))
      .groupBy("word")
      .agg(sum("partial").as("score"))
      .orderBy(col("score").desc, col("word"))
}
