package graft

import org.apache.spark.sql.functions._

import graft.operators.Events

/** Semantic checks for the windowed event analytics that the DuckDB
  * oracle alone can't localize: the anomaly z-scores are recomputed
  * independently driver-side for a flagged row, and the transition
  * matrix is cross-checked against an independently-derived bigram
  * count.
  */
class EventsSpec extends SparkSpec {
  import spark.implicits._

  test("e_anomaly: flagged z matches an independent driver-side recomputation") {
    val flagged = Events.eAnomaly(spark, sf)
    val rows = flagged.limit(3).collect()
    assert(rows.nonEmpty, "fixture should contain at least one |z| >= 2 event")
    rows.foreach { r =>
      val eid = r.getLong(0); val uid = r.getLong(1)
      val hist = Events.load(spark, sf)
        .filter(col("user_id") === uid)
        .select(col("ts_ns"), col("event_id"), col("value"))
        .orderBy("ts_ns", "event_id")
        .as[(Long, Long, Double)].collect()
      val idx = hist.indexWhere(_._2 == eid)
      assert(idx >= Events.AnomalyWin - 1)
      // exact decimal sums, then the same closed-form double sequence
      val win = hist.slice(idx - Events.AnomalyWin + 1, idx + 1)
        .map(t => BigDecimal(t._3).setScale(2, BigDecimal.RoundingMode.HALF_UP))
      val ws = win.sum.toDouble
      val wss = win.map(v => v * v).sum.toDouble
      val n = Events.AnomalyWin.toDouble
      val mean = ws / n
      val vr = wss / n - mean * mean
      val x = BigDecimal(hist(idx)._3).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      val z = BigDecimal(( x - mean) / math.sqrt(vr))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(3) - z) < 1e-9,
        s"event $eid: got ${r.getDouble(3)}, recomputed $z")
    }
  }

  test("e_anomaly: every flagged row clears the threshold") {
    val bad = Events.eAnomaly(spark, sf).filter(abs(col("z")) < 2.0)
    assert(bad.count() === 0)
  }

  test("e_attribution: one row per purchase; attributed clicks precede, deltas non-negative") {
    val a = Events.eAttribution(spark, sf)
    val purchases = Events.load(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(a.count() === purchases)
    assert(a.filter(col("click_id").isNotNull && col("delta_us") < 0).count() === 0)
    // unattributed purchases have BOTH click columns null
    assert(a.filter(col("click_id").isNull =!= col("delta_us").isNull).count() === 0)
    assert(a.filter(col("click_id").isNotNull).count() > 0)
  }

  test("e_transitions: counts cover exactly the non-first events; rows of p sum to 1") {
    val t = Events.eTransitions(spark, sf)
    val totalN = t.agg(sum("n")).as[Long].head()
    val expected = Events.load(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("c"))
      .agg(sum(col("c") - 1)).as[Long].head()
    assert(totalN === expected)
    val rowSums = t.groupBy("prev_type").agg(sum("p").as("s"))
      .filter(abs(col("s") - 1.0) > 1e-4)
    assert(rowSums.count() === 0)
  }
}
