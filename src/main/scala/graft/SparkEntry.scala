package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Curation, Dedup, Events, Geo, Multimodal, Relational, Similarity, TextAnalysis, WordScore}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator gets a named entry in [[queries]]; batch
  * SQL-expressible ones get matching DuckDB SQL in [[oracleSql]] over
  * the same parquet tables (bare table names). Column names and types
  * are aligned on both sides (the driver sorts columns by name and
  * hash-compares values), and every query ends in a deterministic total
  * order.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    WordScore.flagship(Tables.documents(spark, "/root/testdata/sf0.001"))

  type Query = (SparkSession, String) => DataFrame

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, Query] = {
    val base: Map[String, Query] = Map(
      "wordscore" -> ((s, d) => WordScore.flagship(Tables.documents(s, d))),
      "wordscore_salted" -> ((s, d) =>
        WordScore.wordScoreSalted(Tables.documents(s, d),
          org.apache.spark.sql.functions.col("doc_id") % 5 + 1,
          org.apache.spark.sql.functions.col("text"))),
    )
    base ++
      Relational.queries.map { case (k, (fn, _)) => k -> fn } ++
      TextAnalysis.queries.map { case (k, (fn, _)) => k -> fn } ++
      Dedup.queries.map { case (k, (fn, _)) => k -> fn } ++
      Similarity.queries.map { case (k, (fn, _)) => k -> fn } ++
      Events.queries.map { case (k, (fn, _)) => k -> fn } ++
      Multimodal.queries.map { case (k, (fn, _)) => k -> fn } ++
      Curation.queries.map { case (k, (fn, _)) => k -> fn } ++
      Geo.queries.map { case (k, (fn, _)) => k -> fn }
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "wordscore" -> WordScore.flagshipOracle(),
    "wordscore_salted" -> WordScore.flagshipOracle(),
  ) ++ Relational.queries.map { case (k, (_, sql)) => k -> sql } ++
    TextAnalysis.queries.map { case (k, (_, sql)) => k -> sql } ++
    Dedup.queries.map { case (k, (_, sql)) => k -> sql } ++
    Similarity.queries.map { case (k, (_, sql)) => k -> sql } ++
    Events.queries.map { case (k, (_, sql)) => k -> sql } ++
    Multimodal.queries.collect { case (k, (_, Some(sql))) => k -> sql } ++
    Curation.queries.map { case (k, (_, sql)) => k -> sql } ++
    Geo.queries.map { case (k, (_, sql)) => k -> sql }
}
