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
}
