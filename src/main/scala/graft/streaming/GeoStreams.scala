package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Geo

/** Streaming twins of the grid spatial join family (operators/Geo):
  * a stream of moving probe points enriched against a STATIC site
  * table through the same cell equi-join seam the batch operators
  * use — `Geo.gridCandidates` — so the streaming and batch plans
  * share one candidate-generation definition and can't drift apart.
  *
  * Stream-static joins are stateless per microbatch (the static side
  * is re-broadcast, the stream side never buffers), so the only state
  * in these pipelines is the downstream aggregation — the same
  * watermark/complete-mode story as every other windowed count here.
  * At scale the static site table follows the batch family's rule:
  * the replicated (x9) side is the SMALL side, broadcast to every
  * executor once per batch; a continental site table would flip to a
  * cell-bucketed static table co-partitioned with a cell-repartitioned
  * stream — same keys, same plan shape, bigger exchange.
  */
object GeoStreams {

  /** Live per-site load: how many in-radius probe points each site has
    * seen so far (complete mode). `points` needs (cx, cy) unit-square
    * coordinates; `sites` is the static (s_suppkey, sx, sy) frame.
    */
  def geoSiteLoads(points: DataFrame, sites: DataFrame): DataFrame =
    Geo.gridCandidates(points, sites)
      .groupBy("s_suppkey")
      .agg(count(lit(1)).as("n_near"))

  /** Hourly per-site load with a 30-minute watermark — the append-mode
    * production shape (site utilization dashboards, geofence alert
    * rates): windows close when the watermark passes, so late points
    * beyond 30 minutes drop instead of holding state forever.
    */
  def geoSiteLoadsWindowed(points: DataFrame, sites: DataFrame): DataFrame =
    Geo.gridCandidates(points.withWatermark("ts", "30 minutes"), sites)
      .groupBy(window(col("ts"), "1 hour"), col("s_suppkey"))
      .agg(count(lit(1)).as("n_near"))
      .select(col("window.start").as("win_start"), col("s_suppkey"), col("n_near"))

  /** Streaming geofence visits — the live twin of the batch
    * `g_visits` operator: in-radius pings sessionize per (user, site)
    * with Spark's native session_window (30-minute gap), so visit
    * state is per-key and closes with the watermark instead of
    * accumulating. (Gap-boundary convention differs from the batch
    * lag-rule by the measure-zero `gap == 30min` case — the pinned
    * batch twin below IS this same session_window expression, and the
    * grid join machinery is the oracle-checked `g_visits` path.)
    */
  def geoVisits(points: DataFrame, sites: DataFrame): DataFrame =
    Geo.gridCandidates(points.withWatermark("ts", "30 minutes"), sites)
      .groupBy(session_window(col("ts"), "30 minutes"),
        col("user_id"), col("s_suppkey"))
      .agg(count(lit(1)).as("n_pings"))
      .select(col("session_window.start").as("visit_start"),
        col("user_id"), col("s_suppkey"), col("n_pings"))
}
