package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage-truncating materialization for plans that must be evaluated
  * exactly once: reliable `checkpoint` when the session has a
  * checkpoint dir configured (`sc.setCheckpointDir` — fault-tolerant,
  * the cluster default; executor loss costs one re-read instead of a
  * recompute or a dead loop), `localCheckpoint` otherwise (tests/dev —
  * no durable-store round-trip).
  *
  * When to use it instead of trusting the optimizer:
  *  - A shared subplan consumed by branches the optimizer SPECIALIZES
  *    differently (e.g. one branch needs an aggregate the other
  *    prunes): the specialized copies can never match canonically, so
  *    neither ReuseExchange nor the cache manager dedupes them — each
  *    branch re-evaluates the full upstream. Measured on t_tfidf: the
  *    df branch re-ran tokenize+explode+aggregate despite byte-equal
  *    user code, because its copy dropped the unused count column.
  *  - Iterative loops (connected components): without truncation the
  *    logical plan nests union+join per superstep and grows
  *    exponentially until planning itself OOMs.
  *
  * NOT a fix for duplicated cheap per-row projections above a reused
  * exchange (Catalyst pushes projects through REPARTITION exchanges;
  * the exchange still dedupes the scan+shuffle, and re-running a
  * per-row map on each side is cheaper than materializing wide rows).
  */
object Materialize {
  // every live pin, per session: pins returned to callers (t_tfidf's tf
  // table, connectedComponents labels) hold persisted blocks that
  // outlive the consuming action — WITHOUT a registry each query run
  // leaks its pins for the session lifetime. Two subtleties force the
  // registry to hold the underlying persisted RDDs, not the Datasets:
  //  - Dataset.unpersist only uncaches CacheManager entries; a
  //    localCheckpoint's blocks are persisted at the RDD level
  //    (LogicalRDD), so unpersisting the Dataset frees NOTHING — the
  //    RDD itself must be unpersisted.
  //  - a Dataset strongly references its SparkSession; storing it as a
  //    WeakHashMap VALUE whose key is that same session is the
  //    documented WeakHashMap anti-pattern (value pins key, entry is
  //    immortal). An RDD references only the SparkContext, so entries
  //    really do die with their session.
  private val pins =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      java.util.ArrayList[org.apache.spark.rdd.RDD[_]]]()

  /** Test seam: a pin truncates lineage, so plan-audit sweeps walking a
    * query's outer optimized plan cannot see inside pinned subframes.
    * WindowRuleSpec registers an inspector here to audit every pinned
    * subplan as it is built. Null (the default) costs one volatile read
    * per pin; never set outside tests.
    *
    * CONCURRENCY CONTRACT: this is a mutable JVM-global shared by
    * WindowRuleSpec and PlanSpec. It is race-free today ONLY because
    * build.sbt pins `Test / testForkedParallel := false` (suites run
    * sequentially in the forked test JVM); enabling suite parallelism
    * would let one suite's registration clobber another's mid-sweep
    * (missed audits or cross-suite capture). If that build setting
    * ever changes, convert this to a thread-confined or synchronized
    * registry first.
    */
  @volatile private[graft] var inspector: DataFrame => Unit = null

  def pin(df: DataFrame): DataFrame = {
    val insp = inspector
    if (insp != null) insp(df)
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) {
      // checkpoint() alone computes the plan TWICE: the eager count job
      // materializes the un-persisted RDD, then ReliableRDDCheckpointData
      // runs a SECOND job to write the checkpoint files, recomputing
      // from scratch. The standard recipe: cache first (count populates
      // the cache, the write job reads it), release the cache after the
      // files exist. Set spark.cleaner.referenceTracking.cleanCheckpoints
      // =true on long-lived apps or checkpoint dirs accumulate. Reads
      // come from the checkpoint FILES afterwards — no resident blocks
      // to register.
      val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val checked = cached.checkpoint(true)
      cached.unpersist()
      checked
    } else {
      val out = df.localCheckpoint(true)
      org.apache.spark.sql.graft.GraftSql.underlyingRdd(out).foreach { rdd =>
        synchronized {
          pins.computeIfAbsent(df.sparkSession,
            _ => new java.util.ArrayList[org.apache.spark.rdd.RDD[_]]()).add(rdd)
        }
      }
      out
    }
  }

  /** Unpersist every pin created for `spark` so far. Call AFTER the
    * consuming action has fully materialized its result (Verify calls
    * it after each query's parquet write, Bench after each timed
    * evaluation) — a localCheckpoint'ed frame cannot be recomputed
    * once its blocks are dropped, so releasing mid-consumption would
    * fail the job, not silently recompute.
    */
  def releaseAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    val l = synchronized { pins.remove(spark) }
    if (l != null) l.forEach(_.unpersist(false))
  }
}
