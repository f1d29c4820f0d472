package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, Alias, And, Attribute,
  AttributeReference, Cast, Divide, EqualTo, Expression, Floor,
  GenericInternalRow, LessThan, LessThanOrEqual, Literal, Multiply, Subtract}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Join, JoinHint,
  LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Catalyst optimizer rule: turn a naive distance-filtered (cross)
  * join
  *
  * {{{ a.crossJoin(b).where((ax-bx)*(ax-bx) + (ay-by)*(ay-by) <= r2) }}}
  *
  * into the PBSM grid join `operators/Geo` builds by hand: key the
  * left side to its home cell on a grid of edge r = sqrt(r2),
  * replicate the right side to its 3x3 cell neighborhood (a 9-row
  * offsets relation — broadcast by size), and equi-join on the cell
  * ids with the ORIGINAL predicate kept behind the join. The user
  * writes the O(|A|*|B|) form; the optimizer plans the
  * O(|A| + 9*|B| + candidates) one.
  *
  * SOUNDNESS — same result set, bit-for-bit:
  *  - superset: |ax-bx| <= r implies the cell coordinates differ by
  *    at most 1 (floor monotonicity on a grid of edge exactly r), so
  *    every pair passing the distance predicate meets in some cell;
  *  - no duplicates: the left row's home cell is unique and the nine
  *    replicas of a right row land in nine DISTINCT cells, so a pair
  *    meets at most once;
  *  - no drift: the original conjunction is re-applied verbatim as
  *    the join condition — the grid only bounds candidates; NULL
  *    coordinates produce NULL cells which join nothing, exactly the
  *    rows the NULL-rejecting distance predicate dropped before.
  *
  * Fires only on Inner/Cross joins whose condition carries the
  * squared-euclidean conjunct over DOUBLE attributes with one point
  * per side and a positive finite DOUBLE literal bound (<= or <).
  * Idempotence inside the fixed-point batch: the rewritten join's
  * own condition references the generated `_gridx_/_gridy_` cell
  * attributes, which the matcher rejects.
  *
  * Installed by [[org.apache.spark.sql.graft.GraftExtensions]] or
  * per-session via `spark.experimental.extraOptimizations`
  * ([[graft.operators.Geo.ensureRegistered]]).
  */
object GridJoinRewrite extends Rule[LogicalPlan] {

  /** (ax, ay, bx, by, r2) with (ax, ay) from one side, (bx, by) from
    * the other, or None when the conjunct is not the distance shape.
    */
  private def matchDist(conjunct: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[(Attribute, Attribute, Attribute, Attribute, Double)] = {
    def attr(e: Expression): Option[Attribute] = e match {
      case a: AttributeReference if a.dataType == DoubleType => Some(a)
      case _ => None
    }
    // one squared term: (u - v) * (u - v) with semantically equal subs
    def sq(e: Expression): Option[(Attribute, Attribute)] = e match {
      case Multiply(s1 @ Subtract(u1, v1, _), s2, _) if s1.semanticEquals(s2) =>
        for (u <- attr(u1); v <- attr(v1)) yield (u, v)
      case _ => None
    }
    val bound = conjunct match {
      case LessThanOrEqual(l, Literal(r2: Double, DoubleType)) => Some((l, r2))
      case LessThan(l, Literal(r2: Double, DoubleType)) => Some((l, r2))
      case _ => None
    }
    bound.flatMap { case (lhs, r2) =>
      if (!(r2 > 0.0) || r2.isInfinite) None
      else lhs match {
        case Add(t1, t2, _) =>
          for {
            (x1, x2) <- sq(t1)
            (y1, y2) <- sq(t2)
            res <- orient(x1, x2, y1, y2, left, right)
          } yield (res._1, res._2, res._3, res._4, r2)
        case _ => None
      }
    }
  }

  /** Sort the four attributes into (leftX, leftY, rightX, rightY),
    * accepting either written order inside each subtraction.
    */
  private def orient(x1: Attribute, x2: Attribute, y1: Attribute,
      y2: Attribute, left: LogicalPlan, right: LogicalPlan)
      : Option[(Attribute, Attribute, Attribute, Attribute)] = {
    def side(a: Attribute): Option[Boolean] =
      if (left.outputSet.contains(a)) Some(true)
      else if (right.outputSet.contains(a)) Some(false)
      else None
    for {
      sx1 <- side(x1); sx2 <- side(x2); sy1 <- side(y1); sy2 <- side(y2)
      if sx1 != sx2 && sy1 != sy2
      lx = if (sx1) x1 else x2
      rx = if (sx1) x2 else x1
      ly = if (sy1) y1 else y2
      ry = if (sy1) y2 else y1
    } yield (lx, ly, rx, ry)
  }

  /** floor(coord / edge) as LONG — the home-cell index. */
  private def cell(coord: Expression, edge: Double): Expression =
    Floor(Divide(coord, Literal(edge, DoubleType)))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner | Cross, Some(cond), hint)
        if !cond.references.exists(_.name.startsWith("_gridx_")) =>
      val conjuncts = splitConjuncts(cond)
      conjuncts.iterator
        .flatMap(c => matchDist(c, left, right))
        .take(1).toSeq.headOption match {
        case None => j
        case Some((lx, ly, rx, ry, r2)) =>
          // edge must be >= the REAL radius for the superset bound:
          // sqrt rounds to nearest (can round DOWN by half an ulp) and
          // the runtime coord/edge division rounds again, so widen by
          // 1e-9 relative — a few candidate rows, never a missed pair
          val edge = math.sqrt(r2) * 1.000000001
          val glx = Alias(cell(lx, edge), "_gridx_l")()
          val gly = Alias(cell(ly, edge), "_gridy_l")()
          val leftP = Project(left.output ++ Seq(glx, gly), left)
          val dx = AttributeReference("_gridx_d", IntegerType, nullable = false)()
          val dy = AttributeReference("_gridy_d", IntegerType, nullable = false)()
          val offsets = LocalRelation(Seq(dx, dy),
            for (i <- -1 to 1; k <- -1 to 1)
              yield new GenericInternalRow(Array[Any](i, k)))
          val rightX = Join(right, offsets, Cross, None, JoinHint.NONE)
          val grx = Alias(Add(cell(rx, edge), Cast(dx, LongType)), "_gridx_r")()
          val gry = Alias(Add(cell(ry, edge), Cast(dy, LongType)), "_gridy_r")()
          val rightP = Project(right.output ++ Seq(grx, gry), rightX)
          val newCond = And(And(
            EqualTo(glx.toAttribute, grx.toAttribute),
            EqualTo(gly.toAttribute, gry.toAttribute)), cond)
          Project(j.output,
            Join(leftP, rightP, Inner, Some(newCond), hint))
      }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}
