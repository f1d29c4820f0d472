package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Events
import graft.streaming.EventStreams

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

/** Nullable-field twin of Ev for the dirty DQ-gate fixture. */
case class DirtyEv(event_id: Long, ts: Timestamp, user_id: java.lang.Long,
    event_type: String, value: java.lang.Double, props: String)

/** One side's row for the stream-stream as-of fixtures. */
case class SSRow(user_id: Long, ts: Timestamp, id: Long)

/** Streaming ≡ batch equivalence: feed the events fixture through
  * MemoryStream in multiple chunks and assert the streaming results
  * equal running the SAME transformation over the batch frame.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val batchEvents: Seq[Ev] =
    Events.load(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Ev].collect().toSeq.sortBy(_.ts.getTime)

  /** Run a streaming transformation over the fixture fed in `chunks`
    * pieces, complete-mode into a memory sink; return the final table.
    */
  private def runStream(name: String, chunks: Int,
      f: DataFrame => DataFrame, mode: String = "complete"): DataFrame = {
    val input = MemoryStream[Ev](spark)
    val q = f(input.toDF())
      .writeStream.format("memory").queryName(name).outputMode(mode).start()
    try {
      batchEvents.grouped(math.max(1, batchEvents.size / chunks)).foreach { g =>
        input.addData(g); q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(name)
  }

  test("observe() telemetry arrives per microbatch; totals equal batch") {
    // pins the Telemetry claim: the same observe call that feeds the
    // batch quality gate surfaces per-microbatch via
    // StreamingQueryProgress.observedMetrics — no listener subclass
    // needed, progress objects carry them
    val input = MemoryStream[Ev](spark)
    val observed = input.toDF().observe("ev_gate",
      count(lit(1)).as("n"),
      sum(when(col("value") > 50.0, 1L).otherwise(0L)).as("hot_values"))
    val q = observed.groupBy("event_type").count()
      .writeStream.format("memory").queryName("tele_gate")
      .outputMode("complete").start()
    try {
      batchEvents.grouped(math.max(1, batchEvents.size / 3)).foreach { g =>
        input.addData(g); q.processAllAvailable()
      }
      val perBatch = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("ev_gate")))
      assert(perBatch.nonEmpty, "no observedMetrics in any progress")
      val totalN = perBatch.map(_.getAs[Long]("n")).sum
      val totalHot = perBatch.map(_.getAs[Long]("hot_values")).sum
      assert(totalN === batchEvents.size.toLong)
      assert(totalHot === batchEvents.count(_.value > 50.0).toLong)
    } finally q.stop()
  }

  test("streaming DQ gate: per-batch observed metrics sum to the batch audit counts") {
    // the EventsSpec dirty fixture, fed as a stream: the SAME shared
    // predicate set (Events.dqRowMetrics) must produce the same
    // violation counts whether it runs as the batch audit or as
    // per-microbatch observe metrics — zero extra passes either way
    val t0 = Timestamp.from(java.time.Instant.EPOCH)
    val dirty = Seq(
      DirtyEv(1L, t0, 1L, "click", 1.0, """{"k":1}"""),
      DirtyEv(1L, t0, 2L, "view", 2.0, "{}"),
      DirtyEv(2L, t0, null, "click", 1.0, """{"k":2}"""),
      DirtyEv(3L, t0, 3L, "", 1.0, "[1,2]"),
      DirtyEv(4L, t0, 4L, "click", Double.NaN, "null"),
      DirtyEv(5L, t0, 5L, "click", -1.0, "5"),
      DirtyEv(6L, t0, 6L, "click", Double.PositiveInfinity, """{"k":3}"""),
      DirtyEv(7L, t0, 7L, "click", 1.0, "{malformed"),
      DirtyEv(8L, t0, 8L, "click", 1.0, null),
      DirtyEv(9L, t0, 9L, "click", 1.0, "  "))
    val input = MemoryStream[DirtyEv](spark)
    val q = EventStreams.withDqGate(input.toDF())
      .groupBy("event_type").count()
      .writeStream.format("memory").queryName("dq_gate_t")
      .outputMode("complete").start()
    try {
      dirty.grouped(4).foreach { g => input.addData(g); q.processAllAvailable() }
      val perBatch = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("dq_gate")))
      assert(perBatch.nonEmpty)
      def total(c: String): Long = perBatch.map(_.getAs[Long](c)).sum
      assert(total("n") === 10L)
      assert(total("null_user") === 1L)
      assert(total("blank_type") === 1L)
      assert(total("bad_value") === 3L, "NaN + negative + Infinity")
      assert(total("bad_props") === 3L, "malformed + NULL + whitespace")
      // and the identical counters over the same frame as ONE batch agg
      val m = EventStreams.dqGateMetrics
      val batch = dirty.toDF().agg(m.head, m.tail: _*).collect()(0)
      Seq("n" -> 10L, "null_user" -> 1L, "blank_type" -> 1L,
        "bad_value" -> 3L, "bad_props" -> 3L).foreach { case (c, v) =>
        assert(batch.getAs[Long](c) === v, c)
      }
    } finally q.stop()
  }

  test("tumbling window: streaming (3 chunks) == batch") {
    val streamed = runStream("t_tumb", 3, EventStreams.tumblingCounts)
      .as[(Timestamp, String, Long)].collect().toSet
    val batch = EventStreams.tumblingCounts(batchEvents.toDF())
      .as[(Timestamp, String, Long)].collect().toSet
    assert(streamed === batch && batch.nonEmpty)
  }

  test("windowed HLL distinct users: streaming == batch EXACTLY (order-free sketch)") {
    val streamed = runStream("t_hll", 5, EventStreams.distinctUsersPerWindow)
      .as[(Timestamp, String, Long)].collect().toSet
    val batch = EventStreams.distinctUsersPerWindow(batchEvents.toDF())
      .as[(Timestamp, String, Long)].collect().toSet
    // HLL state is max-per-register → estimates are identical numbers
    // under any chunking, not merely close
    assert(streamed === batch && batch.nonEmpty)
    // and the sketch tracks the exact per-window cardinality
    val exact = batchEvents.toDF()
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .select(col("window.start"), col("event_type"), col("n"))
      .as[(Timestamp, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    batch.foreach { case (b, t, est) =>
      val e = exact((b, t))
      assert(math.abs(est - e).toDouble / math.max(e, 1L) < 0.10,
        s"window $b/$t: sketch $est vs exact $e")
    }
  }

  test("count-min counters: streaming == batch EXACTLY; estimates never undercount") {
    val streamed = runStream("t_cm", 5, EventStreams.countMinCounters)
      .as[(Int, Long, Long)].collect().toSet
    val batch = EventStreams.countMinCounters(batchEvents.toDF())
      .as[(Int, Long, Long)].collect().toSet
    // counters are pure sums → identical under any micro-batch chunking
    assert(streamed === batch && batch.nonEmpty)
    // point estimates: min over rows of the id's hashed cells ≥ truth
    import graft.operators.TextAnalysis.{CmDepth, CmWidth}
    val grid = batch.map { case (h, b, c) => (h, b) -> c }.toMap
    def bucket(i: Int, uid: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i|$uid".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16) % CmWidth
    }
    val truth = batchEvents.groupBy(_.user_id).view.mapValues(_.size.toLong)
    truth.foreach { case (uid, n) =>
      val est = (0 until CmDepth)
        .map(i => grid.getOrElse((i, bucket(i, uid)), 0L)).min
      assert(est >= n, s"user $uid: CM $est < exact $n")
    }
  }

  test("sliding window: streaming == batch, each event in 3 windows") {
    val streamed = runStream("t_slide", 4, EventStreams.slidingCounts)
      .as[(Timestamp, String, Long)].collect().toSet
    val batch = EventStreams.slidingCounts(batchEvents.toDF())
      .as[(Timestamp, String, Long)].collect().toSet
    assert(streamed === batch)
    assert(streamed.toSeq.map(_._3).sum === 3L * batchEvents.size)
  }

  test("session windows: streaming == batch == oracle-checked e_session") {
    val streamed = runStream("t_sess", 3, EventStreams.sessionize)
      .as[(Timestamp, Long, Long)].collect().toSet
    val batch = EventStreams.sessionize(batchEvents.toDF())
      .as[(Timestamp, Long, Long)].collect().toSet
    assert(streamed === batch && batch.nonEmpty)
    // and the batch sessionizer agrees with the oracle-checked query
    val viaQuery = Events.eSession(spark, sf)
      .select(col("user_id"), col("session_start"), col("n"))
      .as[(Long, Long, Long)].collect().toSet
    val viaStream = streamed.map { case (t, u, n) => (u, t.getTime / 1000, n) }
    assert(viaStream === viaQuery)
  }

  test("dropDuplicatesWithinWatermark suppresses duplicate event ids") {
    val input = MemoryStream[Ev](spark)
    val q = EventStreams.dedupWithinWatermark(input.toDF())
      .writeStream.format("memory").queryName("t_dedup").outputMode("append").start()
    try {
      val chunk = batchEvents.take(200)
      input.addData(chunk); q.processAllAvailable()
      input.addData(chunk); q.processAllAvailable() // exact replay
    } finally q.stop()
    assert(spark.table("t_dedup").count() === 200)
  }

  test("content-fingerprint dedup keeps one record per distinct payload") {
    val input = MemoryStream[Ev](spark)
    val q = EventStreams.dedupByContent(input.toDF())
      .writeStream.format("memory").queryName("t_cdedup").outputMode("append").start()
    try {
      val chunk = batchEvents.take(300)
      input.addData(chunk); q.processAllAvailable()
      // replay with DIFFERENT event ids but identical payloads — the
      // content fingerprint, not the id, must drive suppression
      input.addData(chunk.map(e => e.copy(event_id = e.event_id + 1000000)))
      q.processAllAvailable()
    } finally q.stop()
    val expected = batchEvents.take(300)
      .map(e => (e.user_id, e.event_type, e.value)).distinct.size
    assert(spark.table("t_cdedup").count() === expected)
  }

  test("flatMapGroupsWithState running stats converge to batch totals") {
    val input = MemoryStream[EventStreams.UserEvent](spark)
    val q = EventStreams.runningUserStats(input.toDS())
      .writeStream.format("memory").queryName("t_state").outputMode("update").start()
    try {
      batchEvents.grouped(300).foreach { g =>
        input.addData(g.map(e => EventStreams.UserEvent(e.user_id, e.value)))
        q.processAllAvailable()
      }
    } finally q.stop()
    // last emitted row per user == batch aggregate
    val finalRows = spark.table("t_state")
      .groupBy("user_id").agg(max("n").as("n")).as[(Long, Long)].collect().toMap
    val batch = batchEvents.groupBy(_.user_id).view.mapValues(_.size.toLong).toMap
    assert(finalRows === batch)
  }

  test("streaming scene cuts == oracle-checked batch m_scene_cut, out of order") {
    import graft.streaming.MediaStreams
    import graft.operators.Multimodal
    // frame rows delivered in a deterministic NON-frame order (by luma
    // then doc) so clips split across chunks and arrive idx-shuffled
    val frames = Multimodal.frameLuma(spark, sf)
      .as[(Long, Int, Int)].collect().toSeq
      .sortBy { case (doc, idx, luma) => (luma, doc, idx) }
      .map { case (doc, idx, luma) => MediaStreams.FrameRow(doc, idx, luma) }
    val input = MemoryStream[MediaStreams.FrameRow](spark)
    val q = MediaStreams.sceneCuts(input.toDS())
      .writeStream.format("memory").queryName("t_scene").outputMode("update").start()
    try {
      frames.grouped(math.max(1, frames.size / 3)).foreach { g =>
        input.addData(g); q.processAllAvailable()
      }
    } finally q.stop()
    // last emitted row per clip: frames only accumulate, so max(n_frames)
    // picks it; re-read the cut count from that row via a self-join-free
    // struct max (n_frames strictly grows per emission for a given doc)
    val got = spark.table("t_scene")
      .groupBy("doc_id")
      .agg(max(struct(col("n_frames"), col("n_cuts"))).as("s"))
      .select(col("doc_id"), col("s.n_frames"), col("s.n_cuts"))
      .as[(Long, Long, Long)].collect()
      .map { case (d, nf, nc) => d -> ((nf, nc)) }.toMap
    val want = Multimodal.mSceneCut(spark, sf)
      .as[(Long, Long, Long)].collect()
      .map { case (d, nf, nc) => d -> ((nf, nc)) }.toMap
    assert(got === want)
  }

  test("transformWithState running stats == flatMapGroupsWithState (RocksDB)") {
    // the 4.x arbitrary-state API refuses the HDFS-backed default
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    EventStreams.useRocksDbStateStore(spark)
    try {
      val input = MemoryStream[EventStreams.UserEvent](spark)
      val q = EventStreams.runningUserStatsTws(input.toDS())
        .writeStream.format("memory").queryName("t_tws").outputMode("update").start()
      try {
        batchEvents.grouped(300).foreach { g =>
          input.addData(g.map(e => EventStreams.UserEvent(e.user_id, e.value)))
          q.processAllAvailable()
        }
      } finally q.stop()
      // the final state per user (the row with the max n) == batch fold
      val finalRows = spark.table("t_tws")
        .groupBy("user_id")
        .agg(max("n").as("n"), expr("max_by(total, n)").as("total"))
        .as[(Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      val batch = batchEvents.groupBy(_.user_id).view.mapValues { evs =>
        (evs.size.toLong, evs.map(_.value).sum)
      }.toMap
      assert(finalRows.keySet === batch.keySet)
      finalRows.foreach { case (u, (n, tot)) =>
        assert(n === batch(u)._1, s"user $u count")
        // float accumulation order differs between fold sites
        assert(math.abs(tot - batch(u)._2) < 1e-6, s"user $u total")
      }
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
      spark.conf.unset(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled")
    }
  }

  test("streaming trailing z-scores == the oracle-checked batch e_anomaly") {
    val anomEvents = Events.load(spark, sf)
      .select("event_id", "ts_ns", "user_id", "value")
      .as[EventStreams.AnomEvent].collect().toSeq
      .sortBy(e => (e.ts_ns, e.event_id)) // per-user order across chunks
    val input = MemoryStream[EventStreams.AnomEvent](spark)
    val q = EventStreams.trailingZScores(input.toDS())
      .writeStream.format("memory").queryName("t_zscore").outputMode("append").start()
    try {
      anomEvents.grouped(math.max(1, anomEvents.size / 4)).foreach { g =>
        input.addData(g); q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table("t_zscore")
      .as[(Long, Long, Double, Double)].collect().toSet
    val batch = Events.eAnomaly(spark, sf)
      .as[(Long, Long, Double, Double)].collect().toSet
    assert(streamed === batch && batch.nonEmpty)
  }

  test("funnel with expiry: every click gets exactly one outcome; rule matches batch") {
    val H = 1800000000L // 30 min in µs, the eFunnel window
    val funnelEvents = EventStreams.toFunnelEvents(batchEvents.toDF())
      .collect().toSeq.sortBy(_.ts_us)
    assert(funnelEvents.nonEmpty)
    val maxUs = funnelEvents.map(_.ts_us).max
    def sentinel(offsetUs: Long) = EventStreams.FunnelEvent(-1L,
      new Timestamp((maxUs + offsetUs) / 1000L), maxUs + offsetUs, 1)
    val input = MemoryStream[EventStreams.FunnelEvent](spark)
    val q = EventStreams.clickFunnelOutcomes(input.toDS())
      .writeStream.format("memory").queryName("t_funnel").outputMode("append").start()
    try {
      funnelEvents.grouped(math.max(1, funnelEvents.size / 4)).foreach { g =>
        input.addData(g); q.processAllAvailable()
      }
      // two far-future sentinels: the first advances the watermark past
      // every pending click's window, the second triggers the batch in
      // which those event-time timeouts actually fire
      input.addData(Seq(sentinel(7200000000L))); q.processAllAvailable()
      input.addData(Seq(sentinel(10800000000L))); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("t_funnel")
      .as[(Long, Long, Boolean)].collect().toSeq
    // exactly one outcome per click (the sentinel user has none)
    val clicks = funnelEvents.filter(_.kind == 0)
    assert(got.length === clicks.length,
      s"${got.length} outcomes for ${clicks.length} clicks")
    // the outcome matches eFunnel's rule: purchase at-or-after the
    // click, within 30 minutes, same user
    val purByUser = funnelEvents.filter(_.kind == 1)
      .groupBy(_.user_id).view.mapValues(_.map(_.ts_us)).toMap
    val want = clicks.map { c =>
      (c.user_id, c.ts_us, purByUser.getOrElse(c.user_id, Nil)
        .exists(p => p >= c.ts_us && p <= c.ts_us + H))
    }.sorted
    assert(got.sorted === want)
    assert(want.exists(_._3) && want.exists(!_._3),
      "fixture must exercise both outcomes")
  }

  test("streaming band count == the native batch band join, watermark-held") {
    val bandEvents = EventStreams.toBandEvents(batchEvents.toDF())
      .collect().toSeq.sortBy(_.ts_us)
    val maxUs = bandEvents.map(_.ts_us).max
    def sentinel(offsetUs: Long) = EventStreams.BandEvent(-1L,
      new Timestamp((maxUs + offsetUs) / 1000L), maxUs + offsetUs, -1L)
    val input = MemoryStream[EventStreams.BandEvent](spark)
    val q = EventStreams.streamingBandCounts(input.toDS(), 600000000L)
      .writeStream.format("memory").queryName("t_band").outputMode("append").start()
    try {
      bandEvents.grouped(math.max(1, bandEvents.size / 4)).foreach { g =>
        input.addData(g); q.processAllAvailable()
      }
      input.addData(Seq(sentinel(7200000000L))); q.processAllAvailable()
      input.addData(Seq(sentinel(10800000000L))); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("t_band").where(col("user_id") =!= -1L)
      .select("event_id", "n_follow").as[(Long, Long)].collect().toMap
    val batch = graft.operators.Events.eRangeNative(spark, sf)
      .select("event_id", "n_follow").as[(Long, Long)].collect().toMap
    assert(got.size === batch.size,
      s"streamed ${got.size} outcomes, batch has ${batch.size}")
    assert(got === batch)
    assert(batch.values.exists(_ > 0) && batch.values.exists(_ == 0),
      "fixture must exercise both zero and nonzero follower counts")
  }

  test("parquet file-stream reader drives the tumbling pipeline") {
    val q = EventStreams.tumblingCounts(
        EventStreams.readEventStream(spark, sf))
      .writeStream.format("memory").queryName("t_file").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("t_file")
      .as[(Timestamp, String, Long)].collect().toSet
    val batch = EventStreams.tumblingCounts(batchEvents.toDF())
      .as[(Timestamp, String, Long)].collect().toSet
    assert(streamed === batch)
  }

  test("stream-static broadcast enrichment join == batch") {
    val dim = Tables.customer(spark, sf).select("c_custkey", "c_mktsegment")
    val input = MemoryStream[Ev](spark)
    val q = EventStreams.enrichedByUserSegment(input.toDF(), dim)
      .writeStream.format("memory").queryName("t_enrich").outputMode("complete").start()
    try {
      batchEvents.grouped(400).foreach { g => input.addData(g); q.processAllAvailable() }
    } finally q.stop()
    val streamed = spark.table("t_enrich")
      .as[(Option[String], Long)].collect().toSet
    val batch = EventStreams.enrichedByUserSegment(batchEvents.toDF(), dim)
      .as[(Option[String], Long)].collect().toSet
    assert(streamed === batch && batch.nonEmpty)
  }

  test("stream-static as-of enrichment == the native batch as-of join") {
    val orders = Tables.orders(spark, sf)
    val input = MemoryStream[Ev](spark)
    val q = EventStreams.asofEnrich(input.toDF(), orders)
      .writeStream.format("memory").queryName("t_asof_enrich")
      .outputMode("append").start()
    try {
      batchEvents.grouped(400).foreach { g => input.addData(g); q.processAllAvailable() }
    } finally q.stop()
    val streamed = spark.table("t_asof_enrich")
      .as[(Long, Long, Option[Long], Option[Long])].collect().toSet
    val batch = graft.operators.Events.eAsofNative(spark, sf)
      .as[(Long, Long, Option[Long], Option[Long])].collect().toSet
    assert(streamed === batch && batch.nonEmpty)
    // sanity: at least one event actually enriched, at least one null
    assert(streamed.exists(_._3.isDefined))
  }

  test("native stream-static as-of enrichment == the native batch as-of join") {
    // the foreachBatch twin on the broadcast-index seam: each
    // microbatch runs AsofBroadcastJoinExec against the (re-read)
    // static dim. Run under the RocksDB provider conf like the other
    // streaming ops — the op is stateless, so this pins that it is
    // provider-agnostic rather than provider-dependent.
    val dir = java.nio.file.Files.createTempDirectory("graft_asof_native").toFile.getAbsolutePath
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    EventStreams.useRocksDbStateStore(spark)
    try {
      graft.plans.AsofIndexCache.clear()
      val orders = Tables.orders(spark, sf)
      val input = MemoryStream[Ev](spark)
      val q = EventStreams.startAsofEnrichNative(
        input.toDF(), orders, s"$dir/out", s"$dir/ckpt")
      val nBatches = 3
      try {
        batchEvents.grouped(
            math.max(1, batchEvents.size / nBatches)).foreach { g =>
          input.addData(g); q.processAllAvailable()
        }
      } finally q.stop()
      val streamed = spark.read.parquet(s"$dir/out")
        .as[(Long, Long, Option[Long], Option[Long])].collect().toSet
      val batch = graft.operators.Events.eAsofNative(spark, sf)
        .as[(Long, Long, Option[Long], Option[Long])].collect().toSet
      assert(streamed === batch && batch.nonEmpty)
      assert(streamed.exists(_._3.isDefined))
      // evidence the native broadcast exec served every batch: only
      // AsofBroadcastJoinExec populates the executor index cache, and
      // each microbatch's fresh BroadcastExchange keys a NEW entry
      // (the per-batch dim refresh the scaladoc promises)
      val asofEntries = graft.plans.AsofIndexCache.keys
        .count(!_.startsWith("band|"))
      assert(asofEntries >= nBatches,
        s"expected >= $nBatches per-batch index builds, saw $asofEntries")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).toSeq.flatten.foreach(rm); f.delete()
      }
      rm(new java.io.File(dir))
    }
  }

  test("keyless global streaming as-of enrichment == batch e_asof_global") {
    val dir = java.nio.file.Files.createTempDirectory("graft_asof_global").toFile.getAbsolutePath
    try {
      val ticks = Events.load(spark, sf).where(col("event_id") % 97 === 0)
        .select(expr("ts_ns div 1000").as("tick_us"), col("event_id").as("tick_id"))
      val input = MemoryStream[Ev](spark)
      val q = EventStreams.startGlobalAsofEnrich(
        input.toDF(), ticks, s"$dir/out", s"$dir/ckpt")
      try {
        batchEvents.grouped(math.max(1, batchEvents.size / 3)).foreach { g =>
          input.addData(g); q.processAllAvailable()
        }
      } finally q.stop()
      val streamed = spark.read.parquet(s"$dir/out")
        .as[(Long, Option[Long])].collect().toSet
      val batch = graft.operators.Events.eAsofGlobal(spark, sf)
        .select("event_id", "tick_id")
        .as[(Long, Option[Long])].collect().toSet
      assert(streamed === batch && batch.nonEmpty)
      assert(streamed.exists(_._2.isDefined))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).toSeq.flatten.foreach(rm); f.delete()
      }
      rm(new java.io.File(dir))
    }
  }

  // ------------- stream-stream as-of: BOTH sides live --------------

  private def tsUs(us: Long) = new Timestamp(us / 1000L) // ms-grain fixture times

  /** Adversarial two-sided fixture: interleaved users, scrambled times
    * (delivery order != event order on both sides), a tie on (user,
    * time) with distinct ids, a left-only user (null matches), and a
    * right-only user (ignored) — all inside the 10-minute watermark
    * delay so nothing is dropped as late.
    */
  private def ssFixture: (Seq[SSRow], Seq[SSRow]) = {
    def scr(i: Int, m: Int) = ((i * 2654435761L) % m + m) % m
    // +1 s base: a row AT the epoch sits on the initial watermark (0)
    // and is filtered as late before any state sees it
    val lefts = (0 until 48).map { i =>
      SSRow(1 + i % 4, tsUs(scr(i, 280) * 1000000L + 1000000L), 100 + i)
    }
    val rights = (0 until 30).map { i =>
      SSRow(1 + i % 3, tsUs(scr(i, 280) * 1000000L + 1500000L), 500 + i)
    } ++ Seq(
      SSRow(2, tsUs(77000000L), 900), SSRow(2, tsUs(77000000L), 901),
      SSRow(9, tsUs(50000000L), 950))
    (lefts, rights)
  }

  private def runSSAsof(name: String, lRows: Seq[SSRow], rRows: Seq[SSRow],
      chunks: Int, tol: Option[Long],
      direction: String = "backward"): Set[(Long, Long, Option[Long])] = {
    val lIn = MemoryStream[SSRow](spark)
    val rIn = MemoryStream[SSRow](spark)
    val q = EventStreams.streamStreamAsof(lIn.toDF(), rIn.toDF(),
        toleranceUs = tol, direction = direction)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    val maxUs = (lRows ++ rRows).map(_.ts.getTime * 1000L).max
    def sentinel(off: Long) = SSRow(-1L, tsUs(maxUs + off), -1L)
    try {
      val lg = lRows.grouped(math.max(1, lRows.size / chunks)).toSeq
      val rg = rRows.grouped(math.max(1, rRows.size / chunks)).toSeq
      (0 until math.max(lg.size, rg.size)).foreach { i =>
        if (i < lg.size) lIn.addData(lg(i))
        if (i < rg.size) rIn.addData(rg(i))
        q.processAllAvailable()
      }
      // two far-future sentinels: the first advances the watermark
      // past every pending event, the second fires the timeouts
      rIn.addData(Seq(sentinel(7200000000L))); q.processAllAvailable()
      rIn.addData(Seq(sentinel(10800000000L))); q.processAllAvailable()
    } finally q.stop()
    spark.table(name).where(col("user_id") =!= -1L)
      .select("user_id", "event_id", "matched_id")
      .as[(Long, Long, Option[Long])].collect().toSet
  }

  private def ssAsofBatchRef(lRows: Seq[SSRow], rRows: Seq[SSRow],
      tol: Option[Long],
      direction: String = "backward"): Set[(Long, Long, Option[Long])] = {
    val l = lRows.toDF().select(col("user_id"),
      expr("unix_micros(ts)").as("ts_us"), col("id"))
    val r = rRows.toDF().select(col("user_id").as("u_r"),
      expr("unix_micros(ts)").as("t_r"), col("id").as("rid"))
    graft.plans.AsofJoin.joinAsOf(l, r, "ts_us", "t_r",
        Seq("user_id"), Seq("u_r"), tiebreak = Seq("rid"),
        toleranceUs = tol, direction = direction)
      .select("user_id", "id", "rid")
      .as[(Long, Long, Option[Long])].collect().toSet
  }

  test("stream-stream as-of FORWARD == batch; tolerance required") {
    val (lRows, rRows) = ssFixture
    val tol = Some(40000000L) // 40 s: exercises both matched and expired
    val got = runSSAsof("t_ssasof_fwd", lRows, rRows, chunks = 4,
      tol = tol, direction = "forward")
    val want = ssAsofBatchRef(lRows, rRows, tol, direction = "forward")
    assert(got === want,
      s"extra=${(got -- want).take(3)} missing=${(want -- got).take(3)}")
    assert(want.exists(_._3.isEmpty) && want.exists(_._3.nonEmpty),
      "fixture must exercise both matched and expired-unmatched outcomes")
    intercept[IllegalArgumentException] { // no bound -> can never finalize
      EventStreams.streamStreamAsof(
        lRows.toDF(), rRows.toDF(), direction = "forward")
    }
  }

  test("stream-stream as-of == native batch as-of, out of order on BOTH sides") {
    val (lRows, rRows) = ssFixture
    for ((tol, name) <- Seq((None, "t_ssasof"),
        (Some(30000000L), "t_ssasof_tol"))) {
      val got = runSSAsof(name, lRows, rRows, chunks = 4, tol = tol)
      val want = ssAsofBatchRef(lRows, rRows, tol)
      assert(got === want, s"tol=$tol: " +
        s"extra=${(got -- want).take(3)} missing=${(want -- got).take(3)}")
      assert(want.exists(_._3.isEmpty) && want.exists(_._3.nonEmpty),
        "fixture must exercise both matched and null outcomes")
    }
  }

  test("stream-stream as-of: late right rows expire; the carry row still serves") {
    // A right row delivered after the watermark passed its time is
    // dropped by the engine — already-final events keep their match,
    // and later events match the retained dominating carry row, not
    // the ghost. The batch reference over ALL rows (late one included)
    // must DIFFER, proving the expiry actually bit.
    val lIn = MemoryStream[SSRow](spark)
    val rIn = MemoryStream[SSRow](spark)
    val q = EventStreams.streamStreamAsof(lIn.toDF(), rIn.toDF())
      .writeStream.format("memory").queryName("t_ssasof_late")
      .outputMode("append").start()
    try {
      lIn.addData(Seq(SSRow(1, tsUs(100000000L), 1))) // L1 @ 100 s
      rIn.addData(Seq(SSRow(1, tsUs(50000000L), 10))) // R1 @ 50 s
      q.processAllAvailable()
      // advance the watermark to 200 s (800 s − 10 min delay), then
      // fire the timeout batch: L1 finalizes against R1
      rIn.addData(Seq(SSRow(-1, tsUs(800000000L), -2))); q.processAllAvailable()
      rIn.addData(Seq(SSRow(-1, tsUs(900000000L), -3))); q.processAllAvailable()
      // LATE right @ 90 s — behind the 200 s watermark: dropped
      rIn.addData(Seq(SSRow(1, tsUs(90000000L), 20))); q.processAllAvailable()
      // L2 @ 350 s (clear of the 300 s watermark) must match the carry
      // row R1, not the ghost
      lIn.addData(Seq(SSRow(1, tsUs(350000000L), 2)))
      rIn.addData(Seq(SSRow(-1, tsUs(1200000000L), -4))); q.processAllAvailable()
      rIn.addData(Seq(SSRow(-1, tsUs(1300000000L), -5))); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("t_ssasof_late").where(col("user_id") =!= -1L)
      .select("user_id", "event_id", "matched_id")
      .as[(Long, Long, Option[Long])].collect().toSet
    assert(got === Set((1L, 1L, Some(10L)), (1L, 2L, Some(10L))))
    // the batch answer with the ghost row present disagrees on L2 —
    // the streaming difference is exactly the documented late-drop
    val allRows = Seq(SSRow(1, tsUs(50000000L), 10),
      SSRow(1, tsUs(90000000L), 20))
    val batchAll = ssAsofBatchRef(
      Seq(SSRow(1, tsUs(100000000L), 1), SSRow(1, tsUs(350000000L), 2)),
      allRows, None)
    assert(batchAll === Set((1L, 1L, Some(20L)), (1L, 2L, Some(20L))))
  }

  test("stream-stream as-of: backward carry TTL evicts the idle carry row") {
    // the no-tolerance backward carry is per-key-forever by default
    // (the left-outer guarantee). carryIdleTtlUs trades that guarantee
    // for bounded state: once the watermark passes rightTime + TTL the
    // carry drops (via the event-time timeout, so the key's state is
    // actually removed without new key traffic), and a later event
    // emits null-matched. The control run WITHOUT the TTL on the
    // identical sequence still matches — proving the null came from
    // the TTL, not the fixture.
    def run(name: String, ttl: Option[Long]): Set[(Long, Long, Option[Long])] = {
      val lIn = MemoryStream[SSRow](spark)
      val rIn = MemoryStream[SSRow](spark)
      val q = EventStreams.streamStreamAsof(lIn.toDF(), rIn.toDF(),
          carryIdleTtlUs = ttl)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        rIn.addData(Seq(SSRow(1, tsUs(50000000L), 10))) // R1 @ 50 s
        q.processAllAvailable()
        // watermark to 200 s; second sentinel fires the 150 s TTL
        // timeout (50 s + 100 s TTL): the idle carry evicts
        rIn.addData(Seq(SSRow(-1, tsUs(800000000L), -2))); q.processAllAvailable()
        rIn.addData(Seq(SSRow(-1, tsUs(900000000L), -3))); q.processAllAvailable()
        // L1 @ 400 s: post-eviction probe (strictly above the 300 s
        // watermark the 900 s sentinel set — ts == wm drops as late)
        lIn.addData(Seq(SSRow(1, tsUs(400000000L), 1)))
        rIn.addData(Seq(SSRow(-1, tsUs(1200000000L), -4))); q.processAllAvailable()
        rIn.addData(Seq(SSRow(-1, tsUs(1300000000L), -5))); q.processAllAvailable()
      } finally q.stop()
      spark.table(name).where(col("user_id") =!= -1L)
        .select("user_id", "event_id", "matched_id")
        .as[(Long, Long, Option[Long])].collect().toSet
    }
    assert(run("t_ssasof_ttl", Some(100000000L)) === Set((1L, 1L, None)))
    assert(run("t_ssasof_nottl", None) === Set((1L, 1L, Some(10L))))
  }

  test("stream-stream as-of == batch under the RocksDB state store") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    EventStreams.useRocksDbStateStore(spark)
    try {
      val (lRows, rRows) = ssFixture
      val got = runSSAsof("t_ssasof_rocks", lRows, rRows, 3, None)
      assert(got === ssAsofBatchRef(lRows, rRows, None))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
      spark.conf.unset(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled")
    }
  }

  test("checkpointed file sink resumes exactly-once after restart") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toFile.getAbsolutePath
    val input = MemoryStream[Ev](spark)
    def start() = input.toDF().select(col("event_id"), col("event_type"))
      .writeStream.format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append").start()

    val (c1, c2) = batchEvents.splitAt(batchEvents.size / 2)
    val q1 = start()
    try { input.addData(c1); q1.processAllAvailable() } finally q1.stop()
    val q2 = start() // fresh query, same checkpoint -> resumes past c1
    try { input.addData(c2); q2.processAllAvailable() } finally q2.stop()

    val out = spark.read.parquet(s"$dir/out")
    assert(out.count() === batchEvents.size)
    assert(out.select("event_id").distinct().count() === batchEvents.size)
  }

  test("stateful pipelines run unchanged on the RocksDB state store") {
    // the cluster-scale provider (docs/SCALE.md): same results, state
    // off-heap on local disk. Provider is fixed per query lifetime, so
    // gate it, run a stateful query end-to-end, and restore the
    // default for the rest of the suite.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    EventStreams.useRocksDbStateStore(spark)
    try {
      val streamed = runStream("t_rocks", 3, EventStreams.tumblingCounts)
        .as[(Timestamp, String, Long)].collect().toSet
      val batch = EventStreams.tumblingCounts(batchEvents.toDF())
        .as[(Timestamp, String, Long)].collect().toSet
      assert(streamed === batch && batch.nonEmpty)
      // the two newest flatMapGroupsWithState ops on the same provider:
      // near-dup suppression == its driver replay, scene cuts == batch
      import graft.streaming.{DedupStreams, MediaStreams}
      val bandedRows = DedupStreams.banded(Tables.documents(spark, sf))
        .collect().toSeq.sortBy(b => (b.doc_id, b.bucket))
      val ndIn = MemoryStream[DedupStreams.BandedDoc](spark)
      val ndQ = DedupStreams.nearDupSuppress(ndIn.toDS())
        .writeStream.format("memory").queryName("t_rocks_nd")
        .outputMode("append").start()
      try {
        bandedRows.grouped(math.max(1, bandedRows.size / 3)).foreach { g =>
          ndIn.addData(g); ndQ.processAllAvailable()
        }
      } finally ndQ.stop()
      val ndGot = spark.table("t_rocks_nd").count()
      assert(ndGot === bandedRows.size.toLong,
        "one verdict per banded row under RocksDB")
      val frames = graft.operators.Multimodal.frameLuma(spark, sf)
        .as[(Long, Int, Int)].collect().toSeq
        .map { case (d, i, l) => MediaStreams.FrameRow(d, i, l) }
      val scIn = MemoryStream[MediaStreams.FrameRow](spark)
      val scQ = MediaStreams.sceneCuts(scIn.toDS())
        .writeStream.format("memory").queryName("t_rocks_sc")
        .outputMode("update").start()
      try { scIn.addData(frames); scQ.processAllAvailable() } finally scQ.stop()
      val scGot = spark.table("t_rocks_sc")
        .as[(Long, Long, Long)].collect()
        .map { case (d, nf, nc) => d -> ((nf, nc)) }.toMap
      val scWant = graft.operators.Multimodal.mSceneCut(spark, sf)
        .as[(Long, Long, Long)].collect()
        .map { case (d, nf, nc) => d -> ((nf, nc)) }.toMap
      assert(scGot === scWant)
      // the watermark-held band count on the same provider: one final
      // outcome per event, equal to the native batch exec
      val bandEvents = EventStreams.toBandEvents(batchEvents.toDF())
        .collect().toSeq.sortBy(_.ts_us)
      val bMax = bandEvents.map(_.ts_us).max
      val bIn = MemoryStream[EventStreams.BandEvent](spark)
      val bQ = EventStreams.streamingBandCounts(bIn.toDS(), 600000000L)
        .writeStream.format("memory").queryName("t_rocks_band")
        .outputMode("append").start()
      try {
        bandEvents.grouped(math.max(1, bandEvents.size / 3)).foreach { g =>
          bIn.addData(g); bQ.processAllAvailable()
        }
        bIn.addData(Seq(EventStreams.BandEvent(-1L,
          new Timestamp((bMax + 7200000000L) / 1000L), bMax + 7200000000L, -1L)))
        bQ.processAllAvailable()
        bIn.addData(Seq(EventStreams.BandEvent(-1L,
          new Timestamp((bMax + 10800000000L) / 1000L), bMax + 10800000000L, -1L)))
        bQ.processAllAvailable()
      } finally bQ.stop()
      val bGot = spark.table("t_rocks_band").where(col("user_id") =!= -1L)
        .select("event_id", "n_follow").as[(Long, Long)].collect().toMap
      val bWant = graft.operators.Events.eRangeNative(spark, sf)
        .select("event_id", "n_follow").as[(Long, Long)].collect().toMap
      assert(bGot === bWant && bWant.nonEmpty)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("watermarked stream-stream join == batch join") {
    val clicksB = batchEvents.filter(_.event_type == "click")
    val purchB = batchEvents.filter(_.event_type == "purchase")
    val ci = MemoryStream[Ev](spark)
    val pi = MemoryStream[Ev](spark)
    val q = EventStreams.clickToPurchase(ci.toDF(), pi.toDF())
      .writeStream.format("memory").queryName("t_ss").outputMode("append").start()
    try {
      clicksB.grouped(80).zipAll(purchB.grouped(80), Nil, Nil).foreach {
        case (cg, pg) =>
          if (cg.nonEmpty) ci.addData(cg)
          if (pg.nonEmpty) pi.addData(pg)
          q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table("t_ss")
      .as[(Long, Long, Long)].collect().toSet
    val batch = EventStreams.clickToPurchase(clicksB.toDF(), purchB.toDF())
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed === batch && batch.nonEmpty)
  }

  // ------------------------------------------------- geo stream-static

  /** Events as moving probe points: unit-square coordinates derived
    * from event_id the same integer-exact way the batch geo family
    * derives them from table keys.
    */
  private def evPoints(df: DataFrame): DataFrame = df
    .withColumn("cx", expr("CAST((event_id * 2654435761) % 100003 AS DOUBLE) / 100003.0"))
    .withColumn("cy", expr("CAST((event_id * 2246822519) % 100019 AS DOUBLE) / 100019.0"))

  private lazy val geoSites: DataFrame =
    Tables.supplier(spark, sf).select(col("s_suppkey"),
      expr("CAST((s_suppkey * 2654435761 + 911382323) % 100003 AS DOUBLE) / 100003.0").as("sx"),
      expr("CAST((s_suppkey * 2246822519 + 387413921) % 100019 AS DOUBLE) / 100019.0").as("sy"))

  test("stream-static grid radius join == batch grid join") {
    val streamed = runStream("t_geo", 4,
        df => graft.streaming.GeoStreams.geoSiteLoads(evPoints(df), geoSites))
      .as[(Long, Long)].collect().toSet
    val batch = graft.streaming.GeoStreams
      .geoSiteLoads(evPoints(batchEvents.toDF()), geoSites)
      .as[(Long, Long)].collect().toSet
    assert(streamed === batch && batch.nonEmpty)
  }

  test("watermarked hourly site loads == batch windowed grid join") {
    val maxTs = batchEvents.map(_.ts.getTime).max
    def sentinel(offsetMs: Long) = Ev(-1L, new Timestamp(maxTs + offsetMs),
      -1L, "geo_sentinel", 0.0)
    val input = MemoryStream[Ev](spark)
    val q = graft.streaming.GeoStreams
      .geoSiteLoadsWindowed(evPoints(input.toDF()), geoSites)
      .writeStream.format("memory").queryName("t_geo_win")
      .outputMode("append").start()
    try {
      batchEvents.grouped(math.max(1, batchEvents.size / 4)).foreach { g =>
        input.addData(g); q.processAllAvailable()
      }
      // advance the watermark past every fixture window, then trigger
      // the batch that emits them (funnel-sentinel pattern); the
      // sentinel's own window never closes and never emits
      input.addData(Seq(sentinel(7200000L))); q.processAllAvailable()
      input.addData(Seq(sentinel(10800000L))); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("t_geo_win")
      .as[(Timestamp, Long, Long)].collect().toSet
    val batch = graft.operators.Geo
      .gridCandidates(evPoints(batchEvents.toDF()), geoSites)
      .groupBy(window(col("ts"), "1 hour"), col("s_suppkey"))
      .agg(count(lit(1)).as("n_near"))
      .select(col("window.start").as("win_start"), col("s_suppkey"), col("n_near"))
      .as[(Timestamp, Long, Long)].collect().toSet
    assert(streamed === batch && batch.nonEmpty)
  }

  test("streaming geofence visits == batch session_window over the grid join") {
    val streamed = runStream("t_geo_visits", 4,
        df => graft.streaming.GeoStreams.geoVisits(evPoints(df), geoSites))
      .as[(Timestamp, Long, Long, Long)].collect().toSet
    val batch = graft.streaming.GeoStreams
      .geoVisits(evPoints(batchEvents.toDF()), geoSites)
      .as[(Timestamp, Long, Long, Long)].collect().toSet
    assert(streamed === batch && batch.nonEmpty)
    // conservation: sessionization must neither drop nor duplicate a
    // ping — total pings across visits == in-radius pair count
    val pairs = graft.operators.Geo
      .gridCandidates(evPoints(batchEvents.toDF()), geoSites).count()
    assert(batch.toSeq.map(_._4).sum === pairs && pairs > 0)
  }

  test("streaming geofence visits under RocksDB state == batch") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    EventStreams.useRocksDbStateStore(spark)
    try {
      val streamed = runStream("t_geo_visits_rdb", 4,
          df => graft.streaming.GeoStreams.geoVisits(evPoints(df), geoSites))
        .as[(Timestamp, Long, Long, Long)].collect().toSet
      val batch = graft.streaming.GeoStreams
        .geoVisits(evPoints(batchEvents.toDF()), geoSites)
        .as[(Timestamp, Long, Long, Long)].collect().toSet
      assert(streamed === batch && batch.nonEmpty)
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
      spark.conf.unset(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled")
    }
  }
}
