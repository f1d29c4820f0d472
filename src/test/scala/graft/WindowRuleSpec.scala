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

  /** query name -> why every unpartitioned window frame in it is
    * bounded by construction (frame grain + bound). Mirrored by the
    * bounded-frame windows table in docs/SCALE.md.
    */
  private val allow: Map[String, String] = Map(
    "e_autocorr" -> "day-grain daily-count series (calendar-bounded)",
    "e_burn_rate" -> "hour-grain SLO window series (calendar-bounded)",
    "e_changepoint" -> "day-grain series (calendar-bounded)",
    "e_concurrency" ->
      "block-base table of the two-level prefix scan (#blocks = events/8192, sublinear)",
    "e_decompose" -> "day-grain series (calendar-bounded)",
    "e_gini" -> "per-user activity-count histogram (value-bounded)",
    "e_lorenz" -> "per-user activity-count histogram (value-bounded)",
    "e_season_strength" -> "day-grain series (calendar-bounded)",
    "e_seasonal_naive" -> "day-grain series (calendar-bounded)",
    "e_survival" -> "day-grain Kaplan-Meier life table (calendar-bounded)",
    "m_shard_pack" ->
      "block-base table of the two-level prefix scan (#blocks = docs/8192, sublinear)",
    "p_length_buckets" ->
      "doc-length histogram (<= max_doc_tokens/16 bucket rows, value-bounded)",
    "p_pack" ->
      "block-base table of the two-level prefix scan (#blocks = docs/8192, sublinear)",
    "p_pack_bpe" ->
      "block-base table of the two-level prefix scan (#blocks = docs/8192, sublinear)",
    "s_pq_layout" -> "64-row dimension frame (embedding width, constant)",
    "t_bpe_ids" ->
      "BPE symbol alphabet (base chars + <= BpeMerges symbols, trainer constant)",
    "t_zipf" ->
      "floor(log2 freq) block-base table (<= 64 rows by construction)")

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
    val offenders = mutable.SortedMap[String, mutable.Buffer[String]]()
    def audit(name: String, plan: LogicalPlan): Unit = plan.foreach {
      case w: Window if w.partitionSpec.isEmpty && !boundedByPlan(w) =>
        offenders.getOrElseUpdate(name, mutable.Buffer()) +=
          w.windowExpressions.map(_.name).mkString("+")
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
    val undocumented = (offenders.keySet -- allow.keySet).toSeq.sorted
    assert(undocumented.isEmpty,
      s"""UNDOCUMENTED unpartitioned window(s) — either repartition the
         |plan (two-level rank / TakeOrdered cut / WindowGroupLimit
         |filter) or, if the frame is provably bounded, document it in
         |the allowlist AND docs/SCALE.md:
         |${undocumented.map(q => s"  $q: cols " +
             offenders(q).mkString("; ")).mkString("\n")}""".stripMargin)
    // keep the allowlist honest in the other direction too: an entry
    // whose query no longer has any unpartitioned window is stale
    val stale = (allow.keySet -- offenders.keySet).toSeq.sorted
    assert(stale.isEmpty,
      s"stale allowlist entries (no unpartitioned window anymore): " +
        stale.mkString(", "))
  }
}
