package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Structured Streaming pipelines over event streams.
  *
  * Each transformation takes a DataFrame that may be BATCH or STREAMING —
  * the plan is identical either way (watermarks are no-ops in batch), and
  * StreamingSpec proves stream-fed results equal the batch run. The
  * reference is strictly batch (two blocking MR jobs); this is the
  * engine's streaming extension surface: windowed aggregation with
  * watermarked late-data handling, gap sessionization, stateful dedup,
  * and arbitrary user state via flatMapGroupsWithState.
  *
  * Scale notes: all state here is keyed and watermark-bounded — state
  * store size is O(active windows × types), O(open sessions), and
  * O(in-watermark event ids) respectively; nothing grows with total
  * stream length. Shuffles are on the grouping keys only.
  */
object EventStreams {

  /** Opt the session's streaming state stores into RocksDB.
    *
    * The default HDFSBackedStateStoreProvider keeps every key's state
    * in executor HEAP (a versioned in-memory map, snapshotted to the
    * checkpoint dir). That is the right default for the fixture-scale
    * tests, but at cluster scale the keyed state here — open sessions,
    * in-watermark content fingerprints, per-user running stats, both
    * sides of the stream-stream funnel join — is proportional to
    * active-key cardinality, and a 100 TB-scale stream's hot-key set
    * can exceed executor memory; RocksDB keeps state on local SSD with
    * a block-cache in native (off-heap) memory, and changelog
    * checkpointing uploads per-batch deltas instead of full snapshots.
    * Conf-gated (not hardcoded) because the provider must be fixed for
    * a checkpoint's lifetime — flipping it under an existing
    * checkpoint is an error; set it BEFORE the first start() of a
    * query, or pass the conf at session build. StreamingSpec runs the
    * stateful suite under this provider to prove the pipelines are
    * provider-agnostic.
    */
  def useRocksDbStateStore(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // deltas per micro-batch instead of full SST uploads at checkpoint
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
  }

  /** Streaming data-quality gate: the SAME row-local audit counters as
    * the batch `e_dq_audit` (null/blank identity, NaN/negative/+Inf
    * values, NULL-or-malformed props — one shared predicate set,
    * [[graft.operators.Events.dqRowMetrics]]), packaged for
    * `Dataset.observe` so a streaming ingest pays ZERO extra passes or
    * shuffles for its quality audit: each task folds its rows into the
    * metric buffer while the pipeline's real work runs, and per-batch
    * values surface via `StreamingQueryProgress.observedMetrics`.
    * Cross-batch checks (duplicate ids, envelope) need keyed state and
    * live in `dropDuplicatesWithinWatermark` / the batch audit.
    */
  def dqGateMetrics: Seq[Column] = graft.operators.Events.dqRowMetrics

  /** Attach the streaming DQ gate to an event stream. */
  def withDqGate(events: DataFrame, name: String = "dq_gate"): DataFrame =
    events.observe(name, dqGateMetrics.head, dqGateMetrics.tail: _*)

  /** Hourly tumbling counts per event type; 10-minute watermark drops
    * late data and lets window state be evicted.
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("bucket"), col("event_type"), col("n"))

  /** Sliding 30-minute windows every 10 minutes (each event lands in 3). */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "30 minutes", "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("bucket"), col("event_type"), col("n"))

  /** Hourly distinct-user cardinality per event type via the HLL++
    * sketch — streaming cardinality monitoring at bounded state: exact
    * windowed COUNT(DISTINCT) would hold every seen id per open
    * window; the sketch holds a fixed-size register array that merges
    * across micro-batches. The sketch state is max-per-register, so
    * the estimate is ORDER-INSENSITIVE: streaming (any chunking) and
    * batch produce the identical number — StreamingSpec pins
    * streaming == batch equality, unlike order-dependent summaries
    * (Misra–Gries) which can't promise content equality and stay
    * batch-side.
    */
  def distinctUsersPerWindow(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
      .select(col("window.start").as("bucket"), col("event_type"),
        col("approx_users"))

  /** Gap-based sessions (5 min) per user. */
  def sessionize(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("session_start"),
        col("user_id"), col("n"))

  /** Stateful exactly-once-style dedup on event_id, state bounded by the
    * watermark (at-least-once source → effectively-once downstream).
    */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming CONTENT dedup: suppress records whose payload
    * fingerprint was already seen within the watermark — the streaming
    * twin of the batch exact-dedup ([[graft.operators.Dedup.dExact]]),
    * i.e. the ingestion-time shape of a training-data curation
    * pipeline. State holds one fingerprint per distinct payload and is
    * dropped as the watermark passes.
    */
  def dedupByContent(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .withColumn("fp", md5(concat_ws("|",
        col("user_id"), col("event_type"), col("value")).cast("binary")))
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming Count-Min counters over user ids — "who is hitting us
    * hardest" frequency monitoring at FIXED state: the full per-user
    * count table grows with the id space, the CM counter grid is
    * [[graft.operators.TextAnalysis.CmDepth]]×[[graft.operators
    * .TextAnalysis.CmWidth]] cells forever. Counters are PURE SUMS, so
    * micro-batch merging is the sketch's native mergeability and
    * streaming equals batch EXACTLY regardless of chunking (the HLL
    * argument, pinned in StreamingSpec); an estimate for any id is
    * min over rows of its hashed cells — never an undercount. Uses
    * the same md5-row-hash convention as the batch `t_countmin`, so
    * a batch-built sketch and a stream-built sketch are one table.
    */
  def countMinCounters(events: DataFrame): DataFrame = {
    import graft.operators.TextAnalysis.{CmDepth, CmWidth}
    def bucket(i: Int): Column =
      conv(substring(md5(concat(lit(s"$i|"), col("user_id").cast("string"))), 1, 8), 16, 10)
        .cast("long") % CmWidth
    events.select(explode(array((0 until CmDepth).map(i =>
        struct(lit(i).as("h"), bucket(i).as("bkt"))): _*)).as("hb"))
      .select(col("hb.h"), col("hb.bkt"))
      .groupBy("h", "bkt").agg(count(lit(1)).as("c"))
  }

  case class UserEvent(user_id: Long, value: Double)
  case class UserStats(user_id: Long, n: Long, total: Double)

  /** Arbitrary stateful processing: running per-user count/total via
    * flatMapGroupsWithState (Update mode) — the escape hatch for
    * semantics windows can't express. State is one small struct per user.
    */
  def runningUserStats(events: Dataset[UserEvent]): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserStats, UserStats](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[UserEvent], state: GroupState[UserStats]) =>
          val prev = state.getOption.getOrElse(UserStats(uid, 0L, 0.0))
          var n = prev.n
          var total = prev.total
          rows.foreach { e => n += 1; total += e.value }
          val next = UserStats(uid, n, total)
          state.update(next)
          Iterator.single(next)
      }
  }

  /** The same running stats on the Spark 4.x arbitrary-state API
    * (`transformWithState`): a [[StatefulProcessor]] holding one typed
    * [[ValueState]] per user. Functionally identical to
    * [[runningUserStats]] — kept side by side because the APIs differ
    * where it matters at scale: transformWithState gives TYPED state
    * variables (value/list/map) that read/write incrementally against
    * the store instead of round-tripping one opaque blob per key, plus
    * per-state TTL and timers. ListState appends, for example, don't
    * rewrite the whole list — the difference between O(1) and O(n)
    * per event for long-history keys. Streaming runs REQUIRE the
    * RocksDB state store provider ([[useRocksDbStateStore]]); the
    * HDFS-backed default refuses transformWithState queries.
    */
  class RunningStatsProcessor extends StatefulProcessor[Long, UserEvent, UserStats] {
    @transient private var stats: ValueState[UserStats] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      stats = getHandle.getValueState[UserStats]("stats",
        Encoders.product[UserStats], TTLConfig.NONE)

    override def handleInputRows(uid: Long, rows: Iterator[UserEvent],
        timers: TimerValues): Iterator[UserStats] = {
      val prev = if (stats.exists()) stats.get() else UserStats(uid, 0L, 0.0)
      var n = prev.n
      var total = prev.total
      rows.foreach { e => n += 1; total += e.value }
      val next = UserStats(uid, n, total)
      stats.update(next)
      Iterator.single(next)
    }
  }

  def runningUserStatsTws(events: Dataset[UserEvent]): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningStatsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  case class AnomEvent(event_id: Long, ts_ns: Long, user_id: Long, value: Double)
  case class Anomaly(event_id: Long, user_id: Long, value: Double, z: Double)

  /** Streaming trailing z-score anomalies — the stateful-stream twin of
    * the oracle-checked batch [[graft.operators.Events.eAnomaly]]: per
    * user, each event with a full [[graft.operators.Events.AnomalyWin]]-
    * event history is standardized against its trailing window, |z| ≥ 2
    * emitted. State per user is a ring of the last W−1 (ts, id, value)
    * tuples — bounded, independent of stream length; the same exact-
    * decimal-sums math as the batch query, so StreamingSpec asserts
    * row-level equality against it.
    *
    * Ordering contract: events must arrive in per-user event-time order
    * ACROSS micro-batches (within a batch they are sorted here). The
    * ring keeps only the tail, so an event older than the ring would be
    * scored against the wrong window — in production, front this with a
    * watermark-delayed sorted replay (or accept approximate windows at
    * the late tail), the standard trade for O(1) state.
    */
  def trailingZScores(events: Dataset[AnomEvent]): Dataset[Anomaly] = {
    import events.sparkSession.implicits._
    val W = graft.operators.Events.AnomalyWin
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[AnomEvent], Anomaly](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[AnomEvent], state: GroupState[List[AnomEvent]]) =>
          var win = state.getOption.getOrElse(Nil) // oldest-first, ≤ W−1
          val out = Seq.newBuilder[Anomaly]
          rows.toSeq.sortBy(e => (e.ts_ns, e.event_id)).foreach { e =>
            win = (win :+ e).takeRight(W)
            if (win.length == W) {
              // identical arithmetic to the batch query: exact decimal
              // sums, then the same closed-form double sequence
              val decs = win.map(x =>
                BigDecimal(x.value).setScale(2, BigDecimal.RoundingMode.HALF_UP))
              val n = W.toDouble
              val ws = decs.sum.toDouble
              val wss = decs.map(v => v * v).sum.toDouble
              val mean = ws / n
              val vr = wss / n - mean * mean
              if (vr > 1e-12) {
                val z = BigDecimal((decs.last.toDouble - mean) / math.sqrt(vr))
                  .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
                if (math.abs(z) >= 2.0) out += Anomaly(e.event_id, uid, e.value, z)
              }
            }
          }
          state.update(win.takeRight(W - 1))
          out.result().iterator
      }
  }

  /** Watermarked stream-stream inner join: click events joined to the
    * same user's purchase events within the following 30 minutes. Both
    * sides buffer state bounded by watermark + time-range condition —
    * the canonical funnel/attribution join. Works identically on batch
    * frames (watermarks no-op) for the equivalence test.
    */
  def clickToPurchase(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.withWatermark("ts", "10 minutes").alias("c")
    val p = purchases.withWatermark("ts", "10 minutes").alias("p")
    c.join(p, expr(
        """c.user_id = p.user_id AND
          |p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTES""".stripMargin))
      .select(col("c.event_id").as("click_id"),
        col("p.event_id").as("purchase_id"), col("c.user_id").as("user_id"))
  }

  case class FunnelEvent(user_id: Long, ts: java.sql.Timestamp,
      ts_us: Long, kind: Int) // kind: 0 = click, 1 = purchase
  case class ClickOutcome(user_id: Long, click_us: Long, converted: Boolean)
  case class FunnelState(clicks: List[Long], purchases: List[Long])

  /** Streaming funnel with EXPIRY: every click gets exactly one
    * outcome row — `converted = true` as soon as a same-user purchase
    * lands within the 30-minute window ([[graft.operators.Events
    * .eFunnel]]'s rule, purchase-at-or-after-click inclusive), or
    * `converted = false` when the event-time watermark passes the
    * click's window unmatched. The stream-stream join
    * ([[clickToPurchase]]) can only ever emit the matches; the
    * business question — conversion RATE — needs the non-matches too,
    * and that is precisely what `GroupStateTimeout.EventTimeTimeout`
    * exists for: the timeout callback fires once the watermark
    * guarantees no qualifying purchase can still arrive, so the
    * false-outcome emission is late-data-safe by construction.
    *
    * State per user is the pending-click list plus the purchases still
    * inside the match horizon — both pruned against the watermark
    * every invocation, so state is bounded by per-user traffic within
    * one watermark+window span regardless of stream length. Out-of-
    * order arrival within the watermark is handled (a purchase may
    * arrive before its click); rows older than the watermark are
    * dropped by the engine, which is exactly the contract the pruning
    * relies on.
    */
  def clickFunnelOutcomes(events: Dataset[FunnelEvent]): Dataset[ClickOutcome] = {
    import events.sparkSession.implicits._
    val H = 1800000000L // 30-minute match window, microseconds
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, ClickOutcome](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          val prev = state.getOption.getOrElse(FunnelState(Nil, Nil))
          val wmMs = state.getCurrentWatermarkMs()
          val newRows = rows.toList
          val clicks = prev.clicks ++ newRows.filter(_.kind == 0).map(_.ts_us)
          val purchases =
            prev.purchases ++ newRows.filter(_.kind == 1).map(_.ts_us)
          val (conv, pend) = clicks.partition(c =>
            purchases.exists(p => p >= c && p <= c + H))
          // expired: the watermark is past the click's whole window, no
          // qualifying purchase can still arrive
          val (expired, pending) = pend.partition(c => (c + H) / 1000L < wmMs)
          // a purchase can only match clicks at-or-before it; future
          // clicks are at-or-after the watermark, so older purchases
          // are dead weight
          val keptP = purchases.filter(p => p / 1000L >= wmMs)
          if (pending.isEmpty && keptP.isEmpty) state.remove()
          else {
            state.update(FunnelState(pending, keptP))
            // wake at the earliest moment any state row becomes prunable
            val next = (pending.map(c => (c + H) / 1000L) ++
              keptP.map(_ / 1000L)).min + 1
            state.setTimeoutTimestamp(math.max(next, wmMs + 1))
          }
          (conv.map(c => ClickOutcome(uid, c, converted = true)) ++
            expired.map(c => ClickOutcome(uid, c, converted = false))).iterator
      }
  }

  /** Adapter: raw events frame → typed funnel stream. */
  def toFunnelEvents(events: DataFrame): Dataset[FunnelEvent] = {
    import events.sparkSession.implicits._
    events.filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("ts"),
        expr("unix_micros(ts)").as("ts_us"),
        when(col("event_type") === "purchase", 1).otherwise(0).as("kind"))
      .as[FunnelEvent]
  }

  /** Stream-static enrichment join: the streaming side joins a static
    * dimension frame (broadcast — the static side is planned once per
    * micro-batch, never shuffled with the stream). The standard shape
    * for attaching reference data to an event stream.
    */
  def enrichedByUserSegment(events: DataFrame, userDim: DataFrame): DataFrame =
    events
      .join(broadcast(userDim), col("user_id") === col("c_custkey"), "left")
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n"))

  case class BandEvent(user_id: Long, ts: java.sql.Timestamp,
      ts_us: Long, event_id: Long)
  case class BandOutcome(user_id: Long, event_id: Long, ts_us: Long,
      n_follow: Long)
  case class BandState(pending: List[(Long, Long)], times: List[Long])

  /** Streaming twin of the native banded range-count join
    * (e_range_native): for each event, how many same-user events follow
    * within `windowUs`. A LOOK-AHEAD count, so emission is held back by
    * the watermark: an event's count is final exactly when the
    * watermark passes the end of its band (no in-band follower can
    * still arrive), implemented with flatMapGroupsWithState + event-time
    * timeout — the same hold-back machinery as the funnel.
    *
    * Bounded state, mirroring the batch exec's one-band bound: pending
    * events span at most (window + watermark delay) of event time, and
    * observed times evict once they fall a full window behind the
    * watermark — every kept time x satisfies x > wm − W, which covers
    * all pending events (t > wm − W, band ⊆ (t, t+W]) and all future
    * arrivals (t' ≥ wm). Pinned equal to the batch operator in
    * StreamingSpec.
    */
  def streamingBandCounts(events: Dataset[BandEvent],
      windowUs: Long): Dataset[BandOutcome] = {
    import events.sparkSession.implicits._
    val W = windowUs
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[BandState, BandOutcome](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[BandEvent], state: GroupState[BandState]) =>
          val prev = state.getOption.getOrElse(BandState(Nil, Nil))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val newRows = rows.toList
          val times = prev.times ++ newRows.map(_.ts_us)
          val pending = prev.pending ++ newRows.map(e => (e.event_id, e.ts_us))
          // final: the whole band is below the watermark
          val (ready, stillPending) =
            pending.partition { case (_, t) => t + W < wmUs }
          val out = ready.map { case (id, t) =>
            BandOutcome(uid, id, t, times.count(x => x > t && x <= t + W).toLong)
          }
          val keptTimes = times.filter(_ > wmUs - W)
          if (stillPending.isEmpty && keptTimes.isEmpty) state.remove()
          else {
            state.update(BandState(stillPending, keptTimes))
            // wake when the earliest pending band closes
            val nextMs = stillPending.map { case (_, t) => (t + W) / 1000L }
              .minOption.getOrElse(wmUs / 1000L) + 1
            state.setTimeoutTimestamp(math.max(nextMs, wmUs / 1000L + 1))
          }
          out.iterator
      }
  }

  /** Adapter: raw events frame → typed band stream. */
  def toBandEvents(events: DataFrame): Dataset[BandEvent] = {
    import events.sparkSession.implicits._
    events.select(col("user_id"), col("ts"),
      expr("unix_micros(ts)").as("ts_us"), col("event_id")).as[BandEvent]
  }

  /** Stream-static AS-OF enrichment: each event picks up the LATEST
    * order of the same user with order time <= event time — the
    * streaming twin of the native batch as-of join (e_asof_native),
    * pinned equivalent in StreamingSpec.
    *
    * Shape: the static side is pre-aggregated once per user into a
    * TIME-SORTED array of (t, k) structs, broadcast to the stream-side
    * tasks, and each event binary-searches nothing — `filter` + last
    * element on the sorted array gives max-t (ties: max-k, matching the
    * batch operator's tiebreak). Stateless per row: append mode, no
    * state store, no watermark needed. Bounded by orders-per-user on
    * the static side; for an unbounded/huge dimension drop the
    * broadcast hint (shuffle stream-static join) or run the batch
    * native operator over micro-batch snapshots via foreachBatch.
    */
  def asofEnrich(events: DataFrame, orders: DataFrame): DataFrame = {
    val dim = orders
      .select(col("o_custkey"),
        struct((unix_timestamp(col("o_orderdate")) * lit(1000000L)).as("t"),
               col("o_orderkey").as("k")).as("rec"))
      .groupBy("o_custkey")
      .agg(sort_array(collect_list(col("rec"))).as("recs"))
    events
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .join(broadcast(dim), col("user_id") === col("o_custkey"), "left")
      .withColumn("m",
        element_at(filter(col("recs"), r => r("t") <= col("ts_us")), -1))
      .select(col("event_id"), col("user_id"),
        col("m.k").as("o_orderkey"),
        (col("m.t") / lit(1000000L)).cast("bigint").as("order_epoch"))
  }

  /** Enrich ONE microbatch through the NATIVE as-of operator
    * ([[graft.plans.AsofJoin.joinAsOf]] forced onto
    * `AsofBroadcastJoinExec`) and append the result to a parquet sink.
    * Public so batch backfills replay the exact streaming code path.
    *
    * The `orders` frame is re-evaluated per batch — the "refresh"
    * semantics of a slowly-changing dimension: a dim row that appeared
    * between triggers is visible to the next batch, exactly like
    * Spark's own stream-static joins (which also re-execute the static
    * side each microbatch). Each batch's plan carries a fresh
    * BroadcastExchange, so the per-executor [[graft.plans.AsofIndexCache]]
    * entry is keyed to the new broadcast and REBUILT from the refreshed
    * dim — stale indexes can't serve, and the LRU bound retires the
    * previous batch's entry. For a truly static dim, `persist()` the
    * frame caller-side to make the per-batch re-collect a cache read.
    */
  def asofEnrichNativeBatch(orders: DataFrame, outDir: String)(
      batch: DataFrame, batchId: Long): Unit =
    if (!batch.isEmpty) {
      val dim = orders.select(col("o_custkey"), col("o_orderkey"),
        (unix_timestamp(col("o_orderdate")) * lit(1000000L)).as("o_us"))
      graft.plans.AsofJoin.joinAsOf(batch, dim,
          leftTime = "ts_us", rightTime = "o_us",
          leftBy = Seq("user_id"), rightBy = Seq("o_custkey"),
          tiebreak = Seq("o_orderkey"), broadcast = Some(true))
        .select(col("event_id"), col("user_id"), col("o_orderkey"),
          (col("o_us") / lit(1000000L)).cast("bigint").as("order_epoch"))
        .write.mode("append").parquet(outDir)
    }

  /** Stream-static as-of enrichment through the NATIVE operator — the
    * streaming twin of `e_asof_native`, on the broadcast-index seam:
    * every microbatch is joined by [[graft.plans.AsofBroadcastJoinExec]]
    * (per-executor per-key time-sorted index over the dimension, one
    * binary search per event), so the stream side pays NO shuffle and
    * NO sort per trigger, and hot keys are a non-event. Contrast with
    * [[asofEnrich]], which composes the same semantics from
    * sort_array/filter HOFs over a broadcast hash join — that form
    * re-scans a user's whole order array per event; this one is
    * O(log |user's orders|) per event and shares the executor-level
    * index across the batch's tasks.
    *
    * Stateless (no state store, no watermark): each event's match
    * depends only on the event and the dim snapshot, so append mode is
    * exact. Checkpointed for restart resume; the parquet append in
    * [[asofEnrichNativeBatch]] is at-least-once on a mid-batch crash
    * (the standard foreachBatch file-sink caveat — dedup downstream on
    * event_id, or point outDir at a transactional table format).
    * `events` must carry (event_id, user_id, ts).
    */
  def startAsofEnrichNative(events: DataFrame, orders: DataFrame,
      outDir: String, checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    events
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(asofEnrichNativeBatch(orders, outDir) _)
      .start()

  /** KEYLESS streaming as-of enrichment — the streaming market-data
    * shape: each microbatch of events picks up the latest GLOBAL tick
    * at or before its time through the native keyless as-of
    * ([[graft.plans.AsofJoin.joinAsOf]] with empty key lists, forced
    * broadcast — one per-executor time-sorted series, the event side
    * untouched). Same refresh/delivery contract as
    * [[startAsofEnrichNative]]: the tick frame re-reads per batch (a
    * late tick is visible to the next trigger), parquet append is
    * at-least-once on a mid-batch crash. `events` must carry
    * (event_id, ts); `ticks` must carry (tick_id, tick_us).
    */
  def startGlobalAsofEnrich(events: DataFrame, ticks: DataFrame,
      outDir: String, checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    events
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          graft.plans.AsofJoin.joinAsOf(batch, ticks,
              leftTime = "ts_us", rightTime = "tick_us",
              leftBy = Nil, rightBy = Nil, tiebreak = Seq("tick_id"),
              broadcast = Some(true))
            .select(col("event_id"), col("tick_id"))
            .write.mode("append").parquet(outDir)
      }
      .start()

  case class AsofFeed(user_id: Long, ts: java.sql.Timestamp, ts_us: Long,
      id: Long, side: Int) // side: 0 = left (probe), 1 = right (dimension)
  case class AsofSSState(pending: List[(Long, Long)], // (event_id, ts_us)
      rights: List[(Long, Long)]) // (ts_us, right id)
  case class AsofSSOut(user_id: Long, event_id: Long, ts_us: Long,
      matched_id: Option[Long], matched_us: Option[Long])

  /** STREAM-STREAM as-of join (backward, left outer) — the production
    * market-data shape where the dimension ITSELF streams: for every
    * left event, the latest right row of the same key with time at or
    * before the event's (ties: largest right id; optional tolerance),
    * with BOTH sides arriving live and out of order. The stream-static
    * twins ([[startAsofEnrichNative]]) re-read a static dim per
    * microbatch; here right rows are buffered in keyed state and
    * expired by the watermark.
    *
    * Mechanics (the [[clickFunnelOutcomes]] hold-back machinery): both
    * streams are tagged and unioned, so ONE event-time watermark
    * governs both sides; a left event is emitted exactly when the
    * watermark passes its time — from then on any arriving right row
    * is strictly newer than the event, so the match is final
    * (late-data-safe by construction), and the emission is the match
    * over the full buffered candidate set, so out-of-order arrival on
    * either side within the watermark cannot change the answer. A left
    * event with no admissible right row emits null-matched — the
    * left-outer contract, which a raw stream-stream join cannot give
    * without the same timeout machinery.
    *
    * BOUNDED STATE, the part that scales: of the right rows older than
    * the watermark only the BEST (latest time, then largest id) can
    * ever match a future left event (future events are at or after the
    * watermark, so every old row is admissible and the best dominates)
    * — all others are dropped each invocation, so per-key state is one
    * carry row plus the traffic inside the watermark delay, regardless
    * of stream length; with a tolerance even the carry row expires
    * once `watermark − rightTime > tolerance`. This is the streaming
    * analog of [[graft.plans.AsofJoinExec]]'s O(1) held-row merge
    * state, and of the salted batch wrapper's bucket carry-over.
    *
    * WITHOUT a tolerance the backward carry row is kept PER KEY
    * FOREVER (that is the left-outer guarantee: an event may match an
    * arbitrarily old right row), so total state grows with distinct
    * key cardinality for the stream's lifetime. `carryIdleTtlUs`
    * bounds it: a carry row is dropped once
    * `watermark − rightTime > carryIdleTtlUs` (state for a key with
    * nothing else pending is then removed via an event-time timeout),
    * TRADING the guarantee — an event whose nearest prior right row
    * went idle longer than the TTL emits null-matched instead of
    * matched. Backward-only; ignored forward (forward state is already
    * tolerance-bounded).
    *
    * FORWARD direction (`direction = "forward"`): the EARLIEST right
    * row at or after the event, ties to the SMALLEST id — the batch
    * operator's forward contract. Forward REQUIRES a tolerance: a
    * forward match is final when the watermark passes the current
    * best candidate's time (no admissible future row can be earlier),
    * and an UNMATCHED event is final only when the watermark passes
    * `event + tolerance` — with no bound it could wait forever.
    * Forward state is simpler than backward's dominating-carry: a
    * right row matches only events within `tolerance` before it, so
    * everything older than `watermark − tolerance` drops.
    *
    * Inputs must carry (user_id, ts, id); `left` rows are probe
    * events, `right` rows the streamed dimension.
    */
  def streamStreamAsof(left: DataFrame, right: DataFrame,
      delay: String = "10 minutes",
      toleranceUs: Option[Long] = None,
      direction: String = "backward",
      carryIdleTtlUs: Option[Long] = None): Dataset[AsofSSOut] = {
    import left.sparkSession.implicits._
    require(direction == "backward" || direction == "forward",
      s"streamStreamAsof: direction must be backward|forward, got '$direction'")
    val fwd = direction == "forward"
    require(!fwd || toleranceUs.isDefined,
      "streamStreamAsof: forward direction requires toleranceUs — " +
        "an unmatched event can never finalize without a bound")
    def feed(df: DataFrame, side: Int): Dataset[AsofFeed] =
      df.select(col("user_id"), col("ts"),
        expr("unix_micros(ts)").as("ts_us"), col("id"),
        lit(side).as("side")).as[AsofFeed]
    feed(left, 0).unionByName(feed(right, 1))
      .withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsofSSState, AsofSSOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[AsofFeed], state: GroupState[AsofSSState]) =>
          val prev = state.getOption.getOrElse(AsofSSState(Nil, Nil))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val newRows = rows.toList
          val rights = prev.rights ++
            newRows.filter(_.side == 1).map(r => (r.ts_us, r.id))
          val pending = prev.pending ++
            newRows.filter(_.side == 0).map(e => (e.id, e.ts_us))
          val (out, stillPend, keptRights) = if (!fwd) {
            // BACKWARD — final when the watermark passed the event:
            // any future right row is strictly newer than the event
            val (ready, still) = pending.partition { case (_, t) => t < wmUs }
            val o = ready.map { case (eid, t) =>
              val cand = rights.filter { case (rt, _) =>
                rt <= t && toleranceUs.forall(tol => t - rt <= tol) }
              if (cand.isEmpty) AsofSSOut(uid, eid, t, None, None)
              else {
                val (bt, bid) = cand.max // max (time, id): batch tiebreak
                AsofSSOut(uid, eid, t, Some(bid), Some(bt))
              }
            }
            // right expiry: keep everything at/after the watermark plus
            // the single dominating older row (tolerance kills even that
            // once out of reach of any future event)
            val (fresh, old) = rights.partition { case (rt, _) => rt >= wmUs }
            val keptOld = old.maxOption.toList.filter { case (rt, _) =>
              toleranceUs.forall(tol => wmUs - rt <= tol) &&
                carryIdleTtlUs.forall(ttl => wmUs - rt <= ttl) }
            (o, still, keptOld ++ fresh)
          } else {
            // FORWARD — a left's candidate is the min (time, id) right
            // in [t, t + tol]; final when the watermark passed the
            // candidate (future rows arrive at/after the watermark, so
            // none can be earlier or tie) or passed t + tol unmatched
            val tol = toleranceUs.get
            def bestFor(t: Long): Option[(Long, Long)] =
              rights.filter { case (rt, _) => rt >= t && rt - t <= tol }
                .minOption
            val evaluated = pending.map { case (eid, t) => (eid, t, bestFor(t)) }
            val (ready, still) = evaluated.partition { case (_, t, b) =>
              b.exists(_._1 < wmUs) || t + tol < wmUs }
            val o = ready.map {
              case (eid, t, Some((bt, bid))) =>
                AsofSSOut(uid, eid, t, Some(bid), Some(bt))
              case (eid, t, None) => AsofSSOut(uid, eid, t, None, None)
            }
            // a right can only match events within tol before it, and
            // every pending/future event is at/after watermark − tol
            (o, still.map { case (eid, t, _) => (eid, t) },
              rights.filter { case (rt, _) => rt >= wmUs - tol })
          }
          if (stillPend.isEmpty && keptRights.isEmpty) state.remove()
          else {
            state.update(AsofSSState(stillPend, keptRights))
            // wake when the earliest pending event can finalize, or
            // when buffered rights next expire (state cleanup). A key
            // holding ONLY the no-tolerance, no-TTL backward carry row
            // has neither — set NO timeout: the carry is revisited when
            // new data for the key arrives, instead of timeout-firing
            // on every watermark advance for the stream's lifetime
        // (per-batch work would grow with every key ever seen).
            val pendWake =
              if (!fwd) stillPend.map { case (_, t) => t / 1000L + 1 }
              else stillPend.map { case (_, t) =>
                val bound = toleranceUs.map(t + _).getOrElse(t)
                val best = keptRights.collect {
                  case (rt, _) if rt >= t && rt <= bound => rt }
                math.min(best.minOption.getOrElse(Long.MaxValue - 1000L),
                  bound) / 1000L + 1
              }
            // backward: the carry TTL is a second expiry horizon — the
            // timeout is what evicts an idle key's state (without it a
            // TTL'd carry would linger until new key data arrives,
            // defeating the bound)
            val expiryHorizon =
              if (fwd) toleranceUs
              else (toleranceUs.toList ++ carryIdleTtlUs.toList).minOption
            val expiryWake = expiryHorizon.toList.flatMap(h =>
              keptRights.map { case (rt, _) => (rt + h) / 1000L + 1 })
            (pendWake ++ expiryWake).minOption.foreach(wake =>
              state.setTimeoutTimestamp(math.max(wake, wmUs / 1000L + 1)))
          }
          out.iterator
      }
  }

  /** Convenience: file-stream reader over a fixture directory with the
    * events schema (ts as µs timestamp), for driving these pipelines
    * from parquet drops. maxFilesPerTrigger bounds per-batch work.
    */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    graft.operators.Events.normalizeTs(
      spark.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        // glob form: FileStreamSource wants a directory or glob, and the
        // fixture is a single file
        .parquet(s"$dir/events*.parquet"))
  }
}
