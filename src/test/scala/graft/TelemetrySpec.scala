package graft

import org.apache.spark.sql.functions._

import graft.operators.Telemetry

/** Inline observe() telemetry: metrics must equal a separately computed
  * aggregation, arrive without extra jobs, and survive a real
  * transformation pipeline downstream of the observe point.
  */
class TelemetrySpec extends SparkSpec {

  test("quality gate metrics equal a standalone aggregation") {
    val docs = Tables.documents(spark, sf)
    val (observed, obs) = Telemetry.qualityGate(docs)
    // consume through a downstream pipeline — the observe point sees
    // every input row even though the action only keeps a filtered agg
    val out = observed.filter(col("lang") === "en")
      .groupBy("lang").agg(count(lit(1)).as("n")).collect()
    assert(out.nonEmpty)
    val m = obs.get
    val want = docs.agg(
      count(lit(1)).as("rows"),
      sum(when(col("text").isNull || length(trim(col("text"))) === 0, 1L)
        .otherwise(0L)).as("blank_texts"),
      sum(octet_length(col("text")).cast("long")).as("text_bytes"),
      min(length(col("text"))).as("min_len"),
      max(length(col("text"))).as("max_len")).collect()(0)
    assert(m("rows") === want.getAs[Long]("rows"))
    assert(m("blank_texts") === want.getAs[Long]("blank_texts"))
    assert(m("text_bytes") === want.getAs[Long]("text_bytes"))
    assert(m("min_len") === want.getAs[Int]("min_len"))
    assert(m("max_len") === want.getAs[Int]("max_len"))
  }

  test("withMetrics: custom mergeable metrics on a joined plan") {
    val ev = graft.operators.Events.load(spark, sf)
    val (observed, obs) = Telemetry.withMetrics(ev, "ev_gate", Seq(
      count(lit(1)).as("n"),
      sum(when(col("value").isNull, 1L).otherwise(0L)).as("null_values")))
    observed.groupBy("event_type").count().collect()
    val m = obs.get
    assert(m("n") === ev.count())
    assert(m("null_values") === ev.filter(col("value").isNull).count())
  }
}
