package graft

import org.apache.spark.sql.functions._

import graft.functions.Vectors
import graft.operators.{Materialize, Similarity}
import graft.sources.IndexStore

/** The build-once / serve-many contract: a fitted IVF index persisted
  * by IndexStore and reloaded in a (conceptually) different session
  * must serve EXACTLY the results the in-session build serves — and
  * the cell-partitioned postings layout must actually exist on disk,
  * because that layout is the 100 TB serving story (only probed cells'
  * directories are read).
  */
class IndexStoreSpec extends SparkSpec {
  import spark.implicits._

  test("ivf index round-trips through parquet and serves identical results") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_index")
      .toString
    try {
      val (cent, assign) = Similarity.buildIvfIndex(spark, sf)
      IndexStore.saveIvf(dir, cent, assign)
      // the reference answer from the same in-memory index frames
      val queries = Tables.embeddings(spark, sf)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          Vectors.norm(col("embedding")).as("q_nrm"))
        .filter(col("q_id") < Similarity.NumQueries)
      val want = Similarity.annIvfServe(queries, cent, assign)
        .as[(Long, Long, Int, Double)].collect().toSeq
      Materialize.releaseAll(spark) // in-memory fit dropped: reload must stand alone
      // serve from the RELOADED index — no re-fit, no corpus-side Lloyd
      val (cent2, assign2) = IndexStore.loadIvf(spark, dir)
      val got = Similarity.annIvfServe(queries, cent2, assign2)
        .as[(Long, Long, Int, Double)].collect().toSeq
      assert(got === want)
      assert(got.nonEmpty && got.map(_._1).distinct.size.toLong ===
        Similarity.NumQueries)
      // the inverted-list layout is real: one directory per cell
      // (resolvePath: saves publish versioned dirs under a manifest)
      val cells = Option(new java.io.File(
          IndexStore.resolvePath(spark, dir, "postings")).listFiles())
        .toSeq.flatten.filter(f => f.isDirectory &&
          f.getName.startsWith("cell="))
      assert(cells.nonEmpty && cells.size <= Similarity.IvfK,
        s"expected cell=* partition dirs, found ${cells.map(_.getName)}")
      // and the served rows match the oracle-checked s_ann_ivf query
      // (same fit parameters), tying the persisted path to the gate
      val oracleChecked = Similarity.sAnnIvf(spark, sf)
        .as[(Long, Long, Int, Double)].collect().toSeq
      assert(got === oracleChecked)
    } finally {
      Materialize.releaseAll(spark)
      rmTree(dir)
    }
  }

  test("ivf-pq index round-trips as codes only and serves == s_ivf_pq") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_index")
      .toString
    try {
      val (cent, codebook, codes) = Similarity.buildIvfPqIndex(spark, sf)
      IndexStore.saveIvfPq(dir, cent, codebook, codes)
      Materialize.releaseAll(spark) // reload must stand alone — no re-fit
      val (cent2, cb2, codes2) = IndexStore.loadIvfPq(spark, dir)
      val queries = Tables.embeddings(spark, sf)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          Vectors.norm(col("embedding")).as("q_nrm"))
        .filter(col("q_id") < Similarity.NumQueries)
      val served = Similarity.annIvfPqServe(queries, cent2, cb2, codes2)
      val got = served.as[(Long, Long, Int, Double)].collect().toSeq
      // the layout pays off: the serve path plants the probed cells as
      // a STATIC literal partition filter, so only probed ivf_cell=
      // directories are read — asserted on the EXECUTED scan's metric,
      // not the plan string (round 9 pinned the string "dynamicpruning",
      // which also matches the degraded dynamicpruningexpression(true)
      // no-op Spark actually planned — a metric can't lie)
      val codesLive = IndexStore.resolvePath(spark, dir, "codes")
      val codesScans = scansUnder(served.queryExecution.executedPlan)
        .filter(_.relation.location.rootPaths
          .exists(_.toString.endsWith(codesLive.split('/').last)))
      assert(codesScans.nonEmpty, "codes scan not found")
      val readCells = codesScans.map(_.metrics("numPartitions").value).max
      val allCells = Option(new java.io.File(codesLive).listFiles())
        .toSeq.flatten
        .count(f => f.isDirectory && f.getName.startsWith("ivf_cell="))
      assert(readCells < allCells,
        s"partition pruning lost on the loaded codes scan: " +
          s"read $readCells of $allCells cells")
      // the oracle-checked query IS the serve path over the in-session
      // build — reload must reproduce it exactly
      val want = Similarity.sIvfPq(spark, sf)
        .as[(Long, Long, Int, Double)].collect().toSeq
      assert(got === want)
      assert(got.nonEmpty)
      // the compressed-index property: the persisted codes carry NO
      // raw vector column (storage = M small ints + a list id)
      val codesSchema = spark.read.parquet(codesLive).schema
      assert(!codesSchema.exists(_.dataType.typeName == "array"),
        s"raw vectors leaked into the codes store: $codesSchema")
      // inverted-list layout on disk
      val cells = Option(new java.io.File(codesLive).listFiles())
        .toSeq.flatten.filter(f => f.isDirectory &&
          f.getName.startsWith("ivf_cell="))
      assert(cells.nonEmpty && cells.size <= Similarity.IvfK,
        s"expected ivf_cell=* dirs, found ${cells.map(_.getName)}")
    } finally {
      Materialize.releaseAll(spark)
      rmTree(dir)
    }
  }

  test("scan metrics: a served query READS only the probed cells, counted") {
    // The DPP pin above checks the PLAN SHAPE; this pins the effect
    // with executed-scan METRICS: the partition count the postings
    // scan actually read must equal the number of DISTINCT PROBED
    // cells (nProbe-bounded), strictly fewer than the K cell
    // directories on disk. A regression that keeps the plan string
    // ("dynamicpruning") but stops pruning files (e.g. a filter pushed
    // to the wrong side) now fails on the measured count.
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_metrics")
      .toString
    try {
      val (cent, assign) = Similarity.buildIvfIndex(spark, sf)
      IndexStore.saveIvf(dir, cent, assign)
      Materialize.releaseAll(spark)
      val (cent2, assign2) = IndexStore.loadIvf(spark, dir)
      val queries = Tables.embeddings(spark, sf)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          Vectors.norm(col("embedding")).as("q_nrm"))
        .filter(col("q_id") < Similarity.NumQueries)
      val served = Similarity.annIvfServe(queries, cent2, assign2)
      assert(served.collect().nonEmpty)

      // expected: the distinct probed cells, recomputed with the serve
      // path's own probe rule (top-nProbe rounded cosine, c_id ties)
      import org.apache.spark.sql.expressions.Window
      val wP = Window.partitionBy("q_id")
        .orderBy(col("ccos").desc, col("c_id"))
      val probedCells = queries.crossJoin(broadcast(cent2))
        .select(col("q_id"), col("c_id"),
          round(Vectors.cosineWithNorms(
            Vectors.dot(col("q_emb"), col("c_emb")),
            col("q_nrm"), col("c_nrm")), 6).as("ccos"))
        .withColumn("prn", row_number().over(wP))
        .filter(col("prn") <= Similarity.NumProbes)
        .select("c_id").distinct().count()
      val postingsLive = IndexStore.resolvePath(spark, dir, "postings")
      val cellsOnDisk = Option(new java.io.File(postingsLive)
        .listFiles()).toSeq.flatten
        .count(f => f.isDirectory && f.getName.startsWith("cell="))

      // the executed postings scan, dug out of the adaptive plan
      val postingsScan = scansUnder(served.queryExecution.executedPlan)
        .filter(_.relation.location.rootPaths
          .exists(_.toString.endsWith(postingsLive.split('/').last)))
      assert(postingsScan.nonEmpty, "postings scan not found in plan")
      val readPartitions = postingsScan
        .map(_.metrics("numPartitions").value).max
      assert(readPartitions === probedCells,
        s"scan read $readPartitions cell dirs; probes cover $probedCells")
      assert(readPartitions < cellsOnDisk,
        s"no pruning: read $readPartitions of $cellsOnDisk cells")
    } finally {
      Materialize.releaseAll(spark)
      rmTree(dir)
    }
  }

  test("streaming upserts: served top-k after N microbatches == from-scratch union build") {
    // build-once/serve-many under a GROWING corpus: fit + save on a
    // base slice, stream the held-out vectors in 3 microbatches
    // through the foreachBatch upsert sink (assign against FROZEN
    // centroids, append into cell partitions), then prove the RELOADED
    // index serves exactly what a from-scratch assignment of the full
    // union against the same centroids serves.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_upsert")
      .toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ivf_ckpt")
      .toString
    try {
      val all = Tables.embeddings(spark, sf)
        .select(col("vec_id"), col("embedding"))
      val baseIds = all.filter(col("vec_id") % 5 =!= 0)
      val lateIds = all.filter(col("vec_id") % 5 === 0)
      // initial offline build. buildIvfIndex fits on the full fixture
      // — for this spec the FROZEN-CENTROID contract is what matters,
      // not which slice fed the fit — so reuse the fitted frame and
      // assign only the base slice into the initial store.
      val (centFit, _) = Similarity.buildIvfIndex(spark, sf)
      IndexStore.saveIvf(dir, centFit,
        Similarity.assignVectors(baseIds, centFit))
      Materialize.releaseAll(spark)
      val (centFrozen, _) = IndexStore.loadIvf(spark, dir)

      // stream the late vectors in 3 microbatches
      val input = MemoryStream[(Long, Array[Float])](spark)
      val q = graft.streaming.IndexUpserts.startIvfUpserts(
        input.toDF().toDF("vec_id", "embedding"), dir, ckpt)
      try {
        val late = lateIds.as[(Long, Array[Float])].collect().toSeq
        late.grouped(math.max(1, late.size / 3)).foreach { g =>
          input.addData(g); q.processAllAvailable()
        }
      } finally q.stop()

      // serve from the grown store
      val queries = Tables.embeddings(spark, sf)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          Vectors.norm(col("embedding")).as("q_nrm"))
        .filter(col("q_id") < Similarity.NumQueries)
      val (cent2, assign2) = IndexStore.loadIvf(spark, dir)
      val got = Similarity.annIvfServe(queries, cent2, assign2)
        .as[(Long, Long, Int, Double)].collect().toSeq
      // from-scratch reference: the UNION assigned against the same
      // frozen centroids, served in-session
      val want = Similarity.annIvfServe(queries, centFrozen,
          Similarity.assignVectors(all, centFrozen))
        .as[(Long, Long, Int, Double)].collect().toSeq
      assert(got === want)
      assert(got.nonEmpty)
      // every appended vector actually landed in a cell partition
      val totalPostings = spark.read
        .parquet(IndexStore.resolvePath(spark, dir, "postings")).count()
      assert(totalPostings === all.count())
    } finally {
      Materialize.releaseAll(spark)
      rmTree(dir); rmTree(ckpt)
    }
  }

  test("ivf-pq streaming upserts + codes compaction: served == from-scratch encode") {
    // the compressed-index growth contract: fit + save on a base
    // slice, stream held-out RAW vectors through the PQ upsert sink
    // (encode against the FROZEN centroids + codebook, append codes
    // only), then prove the reloaded store serves exactly what a
    // from-scratch encode of the full union against the same frozen
    // model serves — and that compaction restores one file per
    // inverted list while updating the store MANIFEST atomically.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_upsert")
      .toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ivfpq_ckpt")
      .toString
    try {
      val all = Tables.embeddings(spark, sf)
        .select(col("vec_id"), col("embedding"))
      val (cent, codebook, codesAll) = Similarity.buildIvfPqIndex(spark, sf)
      IndexStore.saveIvfPq(dir, cent, codebook,
        codesAll.filter(col("vec_id") % 5 =!= 0))
      Materialize.releaseAll(spark)
      val (centF, cbF, _) = IndexStore.loadIvfPq(spark, dir)

      val late = all.filter(col("vec_id") % 5 === 0)
        .as[(Long, Array[Float])].collect().toSeq
      val input = MemoryStream[(Long, Array[Float])](spark)
      val q = graft.streaming.IndexUpserts.startIvfPqUpserts(
        input.toDF().toDF("vec_id", "embedding"), dir, ckpt)
      try {
        late.grouped(math.max(1, late.size / 3)).foreach { g =>
          input.addData(g); q.processAllAvailable()
        }
      } finally q.stop()

      val queries = Tables.embeddings(spark, sf)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          graft.functions.Vectors.norm(col("embedding")).as("q_nrm"))
        .filter(col("q_id") < Similarity.NumQueries)
      def serve(): Seq[(Long, Long, Int, Double)] = {
        val (c, cb, codes) = IndexStore.loadIvfPq(spark, dir)
        Similarity.annIvfPqServe(queries, c, cb, codes)
          .as[(Long, Long, Int, Double)].collect().toSeq
      }
      val got = serve()
      val want = Similarity.annIvfPqServe(queries, centF, cbF,
          Similarity.encodeVectors(all, centF, cbF))
        .as[(Long, Long, Int, Double)].collect().toSeq
      assert(got === want && got.nonEmpty,
        "grown store drifted from the from-scratch encode")
      // no raw vectors leaked into the grown codes
      def codesLive = IndexStore.resolvePath(spark, dir, "codes")
      assert(!spark.read.parquet(codesLive).schema
        .exists(_.dataType.typeName == "array"))
      val rowsBefore = spark.read.parquet(codesLive).count()
      assert(rowsBefore === all.count() * Similarity.PqM)

      // compaction: one file per inverted-list dir, manifest advanced,
      // serve byte-identical
      IndexStore.compactIvfPq(spark, dir)
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(IndexStore.readManifest(fs, dir)
        .exists(_.get("codes").contains("v2")), "manifest not advanced")
      val cellDirs = new java.io.File(codesLive).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("ivf_cell="))
      // leaves are cell/batch pairs now: compaction folds every batch
      // except the max (the only replayable one) into -1 and leaves
      // ONE file per remaining leaf
      def leaves(d: java.io.File) = d.listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("batch="))
      assert(cellDirs.nonEmpty && cellDirs.forall(leaves(_).forall(
        _.listFiles().count(_.getName.endsWith(".parquet")) === 1)),
        "compaction left a multi-file leaf")
      val batchVals = cellDirs.flatMap(leaves).map(
        _.getName.stripPrefix("batch=").toLong).toSet
      assert(batchVals.subsetOf(Set(-1L, batchVals.max)),
        s"compaction left folded batches behind: $batchVals")
      assert(spark.read.parquet(codesLive).count() === rowsBefore)
      assert(serve() === got, "compaction drifted serve results")
    } finally {
      Materialize.releaseAll(spark)
      rmTree(dir); rmTree(ckpt)
    }
  }

  test("compaction: one file per cell, serve results byte-identical") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_compact")
      .toString
    try {
      val all = Tables.embeddings(spark, sf)
        .select(col("vec_id"), col("embedding"))
      val (centFit, _) = Similarity.buildIvfIndex(spark, sf)
      // base build + 3 appends: each append adds a file per touched cell
      IndexStore.saveIvf(dir, centFit,
        Similarity.assignVectors(all.filter(col("vec_id") % 4 === 0), centFit))
      (1 to 3).foreach { r =>
        IndexStore.appendIvf(dir, Similarity.assignVectors(
          all.filter(col("vec_id") % 4 === r), centFit))
      }
      def livePostings = IndexStore.resolvePath(spark, dir, "postings")
      def cellDirs = new java.io.File(livePostings).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("cell="))
      def parquetFiles(d: java.io.File): Seq[java.io.File] = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
          else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
        walk(d)
      }
      assert(cellDirs.exists(parquetFiles(_).length > 1),
        "fixture never fragmented — appends landed in one file?")

      val queries = Tables.embeddings(spark, sf)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          Vectors.norm(col("embedding")).as("q_nrm"))
        .filter(col("q_id") < Similarity.NumQueries)
      def serve(): Seq[(Long, Long, Int, Double)] = {
        val (c, a) = IndexStore.loadIvf(spark, dir)
        Similarity.annIvfServe(queries, c, a)
          .as[(Long, Long, Int, Double)].collect().toSeq
      }
      val before = serve()
      val rowsBefore = spark.read.parquet(livePostings).count()
      IndexStore.compactIvf(spark, dir)
      assert(cellDirs.nonEmpty &&
        cellDirs.forall(parquetFiles(_).length === 1),
        "compaction left a multi-file cell directory")
      assert(!new java.io.File(s"$dir/postings_staging").exists(),
        "staging directory survived the swap")
      // the store is manifest-protocol (multi-component save): the
      // MANIFEST names the compacted version, no per-component pointer
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(IndexStore.readManifest(fs, dir)
          .exists(_.get("postings").contains("v2")),
        "store manifest missing/stale after compaction")
      assert(!new java.io.File(s"$dir/CURRENT_postings").exists(),
        "superseded per-component pointer survived on a manifested store")
      assert(!new java.io.File(s"$dir/postings").exists(),
        "legacy plain dir survived cleanup")
      assert(spark.read.parquet(livePostings).count() === rowsBefore)
      assert(serve() === before, "serve results drifted across compaction")

      // SECOND compaction over the already-versioned store: the version
      // counter advances, exactly one version dir remains, serve stable
      IndexStore.compactIvf(spark, dir)
      assert(livePostings.endsWith("postings_v3"), s"unexpected live dir $livePostings")
      assert(serve() === before)
    } finally {
      Materialize.releaseAll(spark)
      rmTree(dir)
    }
  }

  test("compaction killed mid-swap: old version serves; re-run completes to the new") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_crash")
      .toString
    try {
      val all = Tables.embeddings(spark, sf)
        .select(col("vec_id"), col("embedding"))
      val (centFit, _) = Similarity.buildIvfIndex(spark, sf)
      IndexStore.saveIvf(dir, centFit,
        Similarity.assignVectors(all.filter(col("vec_id") % 2 === 0), centFit))
      IndexStore.appendIvf(dir, Similarity.assignVectors(
        all.filter(col("vec_id") % 2 === 1), centFit))
      val queries = Tables.embeddings(spark, sf)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          Vectors.norm(col("embedding")).as("q_nrm"))
        .filter(col("q_id") < Similarity.NumQueries)
      def serve(): Seq[(Long, Long, Int, Double)] = {
        val (c, a) = IndexStore.loadIvf(spark, dir)
        Similarity.annIvfServe(queries, c, a)
          .as[(Long, Long, Int, Double)].collect().toSeq
      }
      val before = serve()

      // kill after the staging write, BEFORE the version rename: the
      // manifest/live data are untouched — the store must serve the
      // old content unchanged (saveIvf published postings_v1 under the
      // store manifest)
      class Killed extends RuntimeException("injected crash")
      intercept[Killed] {
        IndexStore.compactIvf(spark, dir,
          step => if (step == "staged:postings") throw new Killed)
      }
      assert(IndexStore.resolvePath(spark, dir, "postings") === s"$dir/postings_v1",
        "crash before the version rename must leave the manifested v1 live")
      assert(serve() === before, "mid-swap crash changed what serves")

      // kill after the version rename, BEFORE the manifest update: the
      // complete v2 sits dormant, the manifest still names v1 — the
      // store keeps serving the old version (content-identical here,
      // compaction never changes rows)
      intercept[Killed] {
        IndexStore.compactIvf(spark, dir,
          step => if (step == "versioned:postings") throw new Killed)
      }
      assert(IndexStore.resolvePath(spark, dir, "postings") === s"$dir/postings_v1",
        "pre-manifest crash must keep the manifested old version live")
      assert(new java.io.File(s"$dir/postings_v2").exists(),
        "the complete new version should sit dormant after the crash")
      assert(serve() === before, "pre-manifest crash changed what serves")

      // re-run to completion: the new version serves, byte-identical
      // content, dormant crash debris reaped, one file per cell
      IndexStore.compactIvf(spark, dir)
      val live = IndexStore.resolvePath(spark, dir, "postings")
      assert(live != s"$dir/postings" && new java.io.File(live).exists())
      assert(serve() === before, "completed compaction drifted serve results")
      // cleanup retains the version that WAS serving (v1, for readers
      // still pinned on it) and reaps the dormant crash debris (v2)
      val versionDirs = Option(new java.io.File(dir).listFiles()).toSeq.flatten
        .filter(f => f.isDirectory && f.getName.startsWith("postings_v"))
        .map(_.getName).sorted
      assert(versionDirs === Seq("postings_v1", live.split('/').last),
        s"expected retained v1 + live, got: $versionDirs")
      def leafFiles(d: java.io.File): Seq[java.io.File] = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
          else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
        walk(d)
      }
      assert(new java.io.File(live).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("cell="))
        .forall(leafFiles(_).size === 1))

      // a full REBUILD over the live versioned store also goes through
      // the publish protocol: the version advances (no unlisted window,
      // no delete-first pass over the live dir) and serve is unchanged
      // (same inputs -> same content)
      val vBefore = live.split("_v").last.toInt
      IndexStore.saveIvf(dir, centFit, Similarity.assignVectors(all, centFit))
      assert(IndexStore.resolvePath(spark, dir, "postings")
          .endsWith(s"postings_v${vBefore + 1}"),
        "rebuild over a live store must publish a new version")
      assert(serve() === before, "rebuild drifted serve results")
    } finally {
      Materialize.releaseAll(spark)
      rmTree(dir)
    }
  }

  test("multi-component publish killed at EVERY step serves one consistent tuple") {
    // The store-level manifest contract: a rebuild over a live
    // (centroids, postings) store, killed at each named phase of the
    // publish protocol, must leave the store serving EITHER the old
    // tuple or the new tuple — never a new model over old lists, never
    // postings without centroids. Content markers: build A has 2
    // centroids + 4 postings, build B has 3 centroids + 6 postings.
    import spark.implicits._
    def cents(k: Int) = (0 until k)
      .map(i => (i.toLong, Array(i.toFloat, 1f), 1.0))
      .toDF("c_id", "c_emb", "c_nrm")
    def posts(n: Int) = (0 until n)
      .map(i => (i.toLong, Array(i.toFloat, 1f), 1.0, i % 2))
      .toDF("vec_id", "embedding", "nrm", "cell")
    val tuples = Map("A" -> (2L, 4L), "B" -> (3L, 6L))
    def servedTuple(dir: String): (Long, Long) = {
      val (c, a) = IndexStore.loadIvf(spark, dir)
      (c.count(), a.count())
    }
    class Killed extends RuntimeException("injected crash")
    val steps = Seq("staged:centroids", "versioned:centroids",
      "staged:postings", "versioned:postings", "manifest", "cleaned")
    for (killAt <- steps) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_manifest_kill").toString
      try {
        IndexStore.saveIvf(dir, cents(2), posts(4)) // complete build A
        assert(servedTuple(dir) === tuples("A"))
        intercept[Killed] { // build B, killed at `killAt`
          IndexStore.saveIvf(dir, cents(3), posts(6),
            step => if (step == killAt) throw new Killed)
        }
        val got = servedTuple(dir)
        assert(tuples.values.toSet.contains(got),
          s"kill at '$killAt' left a MIXED tuple serving: $got")
        // the manifest is the atomicity point: before it, A serves;
        // from it on, B serves
        val wantKey =
          if (killAt == "manifest" || killAt == "cleaned") "B" else "A"
        assert(got === tuples(wantKey),
          s"kill at '$killAt' should leave build $wantKey serving, got $got")
        // and a re-run always completes to B
        IndexStore.saveIvf(dir, cents(3), posts(6))
        assert(servedTuple(dir) === tuples("B"),
          s"re-run after kill at '$killAt' failed to converge")
      } finally rmTree(dir)
    }
  }

  test("resolution: stale pointer falls back; legacy plain store still reads") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_resolve").toString
    try {
      val df = Seq((1L, "x")).toDF("vec_id", "v")
      // legacy PLAIN store (the pre-versioning save layout)
      df.write.parquet(s"$dir/postings")
      assert(IndexStore.resolvePath(spark, dir, "postings") === s"$dir/postings")
      // a pointer naming a MISSING version dir (external cleanup /
      // tampering) must not strand readers on a nonexistent path:
      // resolution falls back to the highest complete version, then
      // the plain dir
      df.write.parquet(s"$dir/postings_v7")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/CURRENT_postings"), "v99")
      assert(IndexStore.resolvePath(spark, dir, "postings") === s"$dir/postings_v7",
        "stale pointer must fall back to the highest complete version")
      // a manifest naming a missing version falls back the same way
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/MANIFEST"), "postings=v42\n")
      assert(IndexStore.resolvePath(spark, dir, "postings") === s"$dir/postings_v7",
        "stale manifest entry must fall back to the highest complete version")
    } finally rmTree(dir)
  }

  test("exactly-once upserts: replaying a batchId overwrites, never duplicates") {
    // The retry contract: foreachBatch replays a FAILED batch with the
    // same id and the same rows. The sink must converge to the same
    // store content whether the first attempt wrote nothing, part of
    // the batch, or all of it. Simulated here by invoking the sink's
    // own batch function directly: a PARTIAL first attempt (half the
    // rows — a crash mid-write), then the full replay, then a second
    // full replay; after each replay the store must hold exactly
    // base + batch, and serve exactly the from-scratch assignment.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_replay")
      .toString
    try {
      val all = Tables.embeddings(spark, sf)
        .select(col("vec_id"), col("embedding"))
      val base = all.filter(col("vec_id") % 5 =!= 0)
      val batch = all.filter(col("vec_id") % 5 === 0)
      val (centFit, _) = Similarity.buildIvfIndex(spark, sf)
      IndexStore.saveIvf(dir, centFit,
        Similarity.assignVectors(base, centFit))
      Materialize.releaseAll(spark)
      val upsert = graft.streaming.IndexUpserts.upsertIvfBatch(dir) _

      upsert(batch.filter(col("vec_id") % 10 === 0), 0L) // partial attempt
      upsert(batch, 0L) // the replay: full batch, same id
      def postings = spark.read
        .parquet(IndexStore.resolvePath(spark, dir, "postings"))
      assert(postings.count() === all.count(),
        "replay after a partial attempt must overwrite, not append")
      assert(postings.select("vec_id").distinct().count() === all.count())
      upsert(batch, 0L) // replay of a COMPLETE attempt: still idempotent
      assert(postings.count() === all.count(),
        "replay of a complete batch duplicated rows")

      val queries = Tables.embeddings(spark, sf)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          Vectors.norm(col("embedding")).as("q_nrm"))
        .filter(col("q_id") < Similarity.NumQueries)
      def serve(): Seq[(Long, Long, Int, Double)] = {
        val (c, a) = IndexStore.loadIvf(spark, dir)
        Similarity.annIvfServe(queries, c, a)
          .as[(Long, Long, Int, Double)].collect().toSeq
      }
      val want = {
        val (c, _) = IndexStore.loadIvf(spark, dir)
        Similarity.annIvfServe(queries, c, Similarity.assignVectors(all, c))
          .as[(Long, Long, Int, Double)].collect().toSeq
      }
      assert(serve() === want && want.nonEmpty)

      // compaction preserves the property for the one batch that can
      // still be replayed (the MAX id — commits are ordered): append
      // batch 1, compact (folds batch 0 into the base partition,
      // keeps batch 1 under its own), replay batch 1 — still no dup
      val batch1 = base.filter(col("vec_id") % 7 === 0)
      upsert(batch1, 1L) // deliberate re-add of existing ids via a new batch
      val afterB1 = postings.count()
      assert(afterB1 === all.count() + batch1.count())
      IndexStore.compactIvf(spark, dir)
      assert(postings.count() === afterB1, "compaction changed row count")
      val batchesOnDisk = postings.select(col("batch")).distinct()
        .collect().map(_.getAs[Number](0).longValue).toSet
      assert(batchesOnDisk === Set(-1L, 1L),
        s"fold should leave base + max batch, got $batchesOnDisk")
      upsert(batch1, 1L) // the replay, post-compaction
      assert(postings.count() === afterB1,
        "post-compaction replay of the max batch duplicated rows")
    } finally {
      Materialize.releaseAll(spark)
      rmTree(dir)
    }
  }

  test("leases: compaction refuses under a live upsert stream; appends refuse mid-compaction") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_lease")
      .toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_lease_ckpt")
      .toString
    try {
      val all = Tables.embeddings(spark, sf)
        .select(col("vec_id"), col("embedding"))
      val (centFit, _) = Similarity.buildIvfIndex(spark, sf)
      IndexStore.saveIvf(dir, centFit,
        Similarity.assignVectors(all.filter(col("vec_id") % 2 === 0), centFit))
      Materialize.releaseAll(spark)

      val input = MemoryStream[(Long, Array[Float])](spark)
      val q = graft.streaming.IndexUpserts.startIvfUpserts(
        input.toDF().toDF("vec_id", "embedding"), dir, ckpt)
      try {
        // the stream holds the upsert lease: compaction must refuse
        // (a mid-compaction append would vanish at version cleanup)
        val e = intercept[IllegalStateException] {
          IndexStore.compactIvf(spark, dir)
        }
        assert(e.getMessage.contains("active upsert stream"))
      } finally q.stop()
      // stopped stream -> stale lease: the next compaction clears it
      // and proceeds
      IndexStore.compactIvf(spark, dir)
      assert(!new java.io.File(s"$dir/LEASE_upsert").exists(),
        "stale upsert lease survived compaction")

      // a (hard-killed) compaction's lease blocks batch appends
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/LEASE_compact"), "compact")
      // assign against the store's own persisted centroids (centFit's
      // localCheckpoint blocks were released above)
      val centStore = spark.read
        .parquet(IndexStore.resolvePath(spark, dir, "centroids"))
        .select(col("c_id"), col("c_emb"), col("c_nrm"))
      val assigned = Similarity.assignVectors(
        all.filter(col("vec_id") % 2 === 1), centStore)
      val e2 = intercept[IllegalStateException] {
        IndexStore.appendIvf(dir, assigned, 0L)
      }
      assert(e2.getMessage.contains("compacting"))
      IndexStore.clearCompactionLease(spark, dir)
      IndexStore.appendIvf(dir, assigned, 0L) // now lands
      assert(spark.read
        .parquet(IndexStore.resolvePath(spark, dir, "postings"))
        .count() === all.count())
    } finally {
      Materialize.releaseAll(spark)
      rmTree(dir); rmTree(ckpt)
    }
  }

  test("store writes cluster at a PINNED partition count (AQE must not coalesce)") {
    // the load-bearing property behind the round-13 fix: an unpinned
    // repartition(cols) is REPARTITION_BY_COL, which AQE coalesces by
    // byte size — at store sizes down to ONE partition, serializing a
    // ~400-directory dynamic-partition write into a single task. The
    // pinned form must survive as a user-specified numPartitions
    // shuffle (AQE leaves those alone) at exactly the session's
    // shuffle-partition count.
    import spark.implicits._
    val df = spark.range(1000).select((col("id") % 37).as("cell"),
      col("id").as("v")).toDF()
    val clustered = IndexStore.clusterForWrite(df, Seq("cell"))
    val n = spark.sessionState.conf.numShufflePartitions
    assert(clustered.rdd.getNumPartitions === n,
      s"clustered write frame must hold $n pinned partitions")
    // and the logical shuffle carries an explicit numPartitions (the
    // REPARTITION_BY_NUM shape), not the coalescible by-col form
    val rep = clustered.queryExecution.logical.collectFirst {
      case r: org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression => r
    }
    assert(rep.exists(_.optNumPartitions.contains(n)),
      s"repartition lost its pinned partition count: $rep")
  }

  test("version retention: a reader pinned on the old version survives one publish") {
    // The reader contract: publish keeps the previously-serving
    // directory for `spark.graft.store.retainVersions` (default 1)
    // more publishes, so a scan that resolved just before a publish
    // completes instead of losing its files mid-flight; the publish
    // after that reaps it (retention bounded).
    import spark.implicits._
    def posts(n: Int) = (0 until n)
      .map(i => (i.toLong, Array(i.toFloat, 1f), 1.0, i % 2))
      .toDF("vec_id", "embedding", "nrm", "cell")
    def cents(k: Int) = (0 until k)
      .map(i => (i.toLong, Array(i.toFloat, 1f), 1.0))
      .toDF("c_id", "c_emb", "c_nrm")
    val dir = java.nio.file.Files.createTempDirectory("graft_retain").toString
    try {
      IndexStore.saveIvf(dir, cents(2), posts(4)) // postings_v1 serves
      val pinnedPath = IndexStore.resolvePath(spark, dir, "postings")
      assert(pinnedPath.endsWith("postings_v1"))
      val pinned = spark.read.parquet(pinnedPath) // resolved, not yet run
      IndexStore.saveIvf(dir, cents(2), posts(6)) // v2 publishes
      assert(IndexStore.resolvePath(spark, dir, "postings")
        .endsWith("postings_v2"))
      // the pinned reader's directory survived the publish: the scan
      // completes with the OLD content
      assert(pinned.count() === 4L,
        "pinned reader lost its version directory across a publish")
      assert(new java.io.File(s"$dir/postings_v1").exists())
      // the next publish reaps v1 (bounded retention: newest superseded
      // only), keeps v2 for ITS pinned readers
      IndexStore.saveIvf(dir, cents(2), posts(8))
      assert(!new java.io.File(s"$dir/postings_v1").exists(),
        "retention unbounded: v1 survived two publishes")
      assert(new java.io.File(s"$dir/postings_v2").exists(),
        "previously-serving v2 should be retained")
      assert(spark.read.parquet(
        IndexStore.resolvePath(spark, dir, "postings")).count() === 8L)
      // retainVersions=0 restores immediate reaping
      spark.conf.set("spark.graft.store.retainVersions", "0")
      try {
        IndexStore.saveIvf(dir, cents(2), posts(10))
        assert(!new java.io.File(s"$dir/postings_v3").exists(),
          "retainVersions=0 must reap the superseded version immediately")
      } finally spark.conf.unset("spark.graft.store.retainVersions")
    } finally rmTree(dir)
  }

  /** Every FileSourceScanExec in an executed plan, descending through
    * adaptive wrappers (AQE hides finalized stages from plain
    * collect).
    */
  private def scansUnder(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val self = p match {
      case f: FileSourceScanExec => Seq(f); case _ => Nil
    }
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    self ++ kids.flatMap(scansUnder)
  }

  private def rmTree(dir: String): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).toSeq.flatten.foreach(rm); f.delete()
    }
    rm(new java.io.File(dir))
  }
}
