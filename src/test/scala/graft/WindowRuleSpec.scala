package graft

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.{Filter, GlobalLimit,
  LocalLimit, LogicalPlan, Project, Sort, Window, WindowGroupLimit}

/** Machine-enforcement of the repo's window rule: an unpartitioned
  * window (`Window.orderBy(...)` with no `partitionBy`) funnels its
  * ENTIRE input through one task — Spark itself warns "No Partition
  * Defined ... Moving all data to a single partition". That is a
  * named 100×-scale killer unless the frame is provably bounded by
  * construction (a calendar grain, a value-bounded histogram, a
  * constant-size block-base table, a top-k cut). This spec sweeps the
  * optimized logical plan of EVERY registered query — including the
  * subplans hidden behind Materialize.pin, via the pin inspector seam
  * — and fails on any unpartitioned Window that is neither
  * auto-protected by a partial WindowGroupLimit (a rank/row_number
  * filter plans a per-input-partition top-k below the exchange, so
  * only ~k rows per partition reach the single-partition final) nor
  * documented in the bounded-frame allowlist below.
  *
  * The allowlist is the reviewable source of truth mirrored by the
  * "bounded-frame windows" table in docs/SCALE.md — every entry names
  * WHY its frame cannot grow with the corpus. Adding a query here
  * requires that argument; this spec existing means a new
  * unpartitioned window over a corpus-grain frame fails CI instead of
  * shipping (exactly the defect t_zipf and t_vocab_coverage carried
  * through round 8).
  */
class WindowRuleSpec extends SparkSpec {

  /** query name -> the window-expression column names its documented
    * bounded-frame unpartitioned windows may emit (reasons inline;
    * mirrored by the bounded-frame windows table in docs/SCALE.md).
    * Keyed by COLUMN NAMES, not just query names, so a NEW
    * unpartitioned window added to an already-allowlisted query (the
    * round-8 t_zipf defect reintroduced) still fails: its alias won't
    * be in the set.
    */
  private val allow: Map[String, Set[String]] = Map(
    // day-grain daily-count series (calendar-bounded)
    "e_autocorr" -> Set("d1", "d7"),
    // hour-grain SLO window series (calendar-bounded)
    "e_burn_rate" -> Set("err6", "total6"),
    // day-grain series (calendar-bounded)
    "e_changepoint" -> Set("_we0", "_we1"),
    // block-base table of the two-level prefix scan (events/8192, sublinear)
    "e_concurrency" -> Set("_we0"),
    // day-grain series (calendar-bounded)
    "e_decompose" -> Set("n_win", "_we1", "_we2"),
    // per-user activity-count histogram (value-bounded)
    "e_gini" -> Set("_we0"),
    // per-user activity-count histogram (value-bounded)
    "e_lorenz" -> Set("_we0"),
    // day-grain series (calendar-bounded)
    "e_season_strength" -> Set("n_win", "_we1", "_we2"),
    // day-grain series (calendar-bounded)
    "e_seasonal_naive" -> Set("f1", "f7"),
    // day-grain Kaplan-Meier life table (calendar-bounded)
    "e_survival" -> Set("lnsum", "zero", "n_risk"),
    // block-base table of the two-level prefix scan (docs/8192, sublinear)
    "m_shard_pack" -> Set("_we0"),
    // doc-length histogram (<= max_doc_tokens/16 bucket rows, value-bounded)
    "p_length_buckets" -> Set("_we0"),
    // block-base table of the two-level prefix scan (docs/8192, sublinear)
    "p_pack" -> Set("_we0"),
    // block-base table of the two-level prefix scan (docs/8192, sublinear)
    "p_pack_bpe" -> Set("_we0"),
    // 64-row dimension frame (embedding width, constant)
    "s_pq_layout" -> Set("rk"),
    // BPE symbol alphabet (base chars + <= BpeMerges symbols, constant)
    "t_bpe_ids" -> Set("tok_id"),
    // floor(log2 freq) block-base table (<= 64 rows by construction)
    "t_zipf" -> Set("_we0"))

  /** Literal limits above which a GlobalLimit no longer counts as a
    * bounded frame for auto-acceptance.
    */
  private val MaxAutoLimit = 65536

  /** True when the plan itself bounds this unpartitioned window's
    * input, through row-preserving unary nodes below it: either a
    * partial WindowGroupLimit with the same empty partitionSpec (the
    * InferWindowGroupLimit optimization — each input partition
    * forwards at most k rows to the single-partition final) or a
    * literal GlobalLimit (TakeOrdered-style top-k cut: the window sees
    * a constant-size frame regardless of corpus size).
    */
  private def boundedByPlan(w: Window): Boolean = {
    var n: LogicalPlan = w.child
    var steps = 0
    while (steps < 8) {
      n match {
        case g: WindowGroupLimit if g.partitionSpec.isEmpty => return true
        case GlobalLimit(Literal(v: Int, _), _) => return v <= MaxAutoLimit
        case l: LocalLimit => n = l.child
        case s: Sort => n = s.child
        case p: Project => n = p.child
        case f: Filter => n = f.child
        case _ => return false
      }
      steps += 1
    }
    false
  }

  test("unpartitioned windows appear only on documented bounded frames") {
    val offenders = mutable.SortedMap[String, mutable.Set[String]]()
    def audit(name: String, plan: LogicalPlan): Unit = plan.foreach {
      case w: Window if w.partitionSpec.isEmpty && !boundedByPlan(w) =>
        offenders.getOrElseUpdate(name, mutable.Set()) ++=
          w.windowExpressions.map(_.name)
      case _ => ()
    }
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      operators.Materialize.inspector =
        d => audit(name, d.queryExecution.optimizedPlan)
      try {
        audit(name, fn(spark, sf).queryExecution.optimizedPlan)
      } finally {
        operators.Materialize.inspector = null
        operators.Materialize.releaseAll(spark)
      }
    }
    val undocumented = offenders.toSeq.flatMap { case (q, cols) =>
      val extra = cols -- allow.getOrElse(q, Set.empty)
      if (extra.isEmpty) None else Some(s"  $q: cols ${extra.mkString(", ")}")
    }
    assert(undocumented.isEmpty,
      s"""UNDOCUMENTED unpartitioned window(s) — either repartition the
         |plan (two-level rank / TakeOrdered cut / WindowGroupLimit
         |filter) or, if the frame is provably bounded, document it in
         |the allowlist AND docs/SCALE.md:
         |${undocumented.mkString("\n")}""".stripMargin)
    // keep the allowlist honest in the other direction too: entries
    // whose query or columns no longer match any window are stale
    val stale = allow.toSeq.flatMap { case (q, cols) =>
      val have = offenders.getOrElse(q, mutable.Set.empty[String])
      val gone = cols.filterNot(have.contains)
      if (gone.isEmpty) None else Some(s"$q: ${gone.mkString(", ")}")
    }
    assert(stale.isEmpty,
      s"stale allowlist entries (window gone or renamed): " +
        stale.mkString("; "))
  }
}
