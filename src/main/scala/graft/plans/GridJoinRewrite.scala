package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Abs, Add, Alias, And,
  Attribute, AttributeReference, Cast, Divide, EqualTo, Expression, Floor,
  GenericInternalRow, IntegralDivide, LessThan, LessThanOrEqual, Literal,
  Multiply, Subtract}
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

  /** 1-D band form: `abs(a - b) <= w` (or <) over attributes of the
    * same numeric type on opposite sides, w a positive literal. For
    * INTEGRAL coordinates the cell is exact truncating division —
    * trunc-div boundaries sit at multiples of w (none at zero, so the
    * origin cell is 2w wide), consecutive boundaries are >= w apart,
    * and |a-b| <= w therefore crosses at most one boundary: the same
    * +-1 neighbor bound as floor cells, with zero float rounding.
    */
  private def matchBand(conjunct: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[(Attribute, Attribute, Literal, Boolean)] = {
    def attrs(u: Expression, v: Expression): Option[(Attribute, Attribute)] =
      (u, v) match {
        case (a: AttributeReference, b: AttributeReference)
            if a.dataType == b.dataType =>
          if (left.outputSet.contains(a) && right.outputSet.contains(b))
            Some((a, b))
          else if (left.outputSet.contains(b) && right.outputSet.contains(a))
            Some((b, a))
          else None
        case _ => None
      }
    conjunct match {
      case LessThanOrEqual(Abs(Subtract(u, v, _), _), lit: Literal) =>
        lit match {
          case Literal(w: Long, LongType) if w > 0 =>
            attrs(u, v).filter(_._1.dataType == LongType)
              .map { case (a, b) => (a, b, lit, true) }
          case Literal(w: Int, IntegerType) if w > 0 =>
            attrs(u, v).filter(_._1.dataType == IntegerType)
              .map { case (a, b) => (a, b, lit, true) }
          case Literal(w: Double, DoubleType) if w > 0 && !w.isInfinite =>
            attrs(u, v).filter(_._1.dataType == DoubleType)
              .map { case (a, b) => (a, b, lit, false) }
          case _ => None
        }
      case _ => None
    }
  }

  /** floor(coord / edge) as LONG — the home-cell index (double axes). */
  private def cell(coord: Expression, edge: Double): Expression =
    Floor(Divide(coord, Literal(edge, DoubleType)))

  /** One rewrite dimension: the left cell expr and a function from the
    * offset attribute to the right cell expr.
    */
  private case class Dim(leftCell: Expression, rightCell: Expression => Expression)

  private def dims(conjunct: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[Seq[Dim]] =
    matchDist(conjunct, left, right).map { case (lx, ly, rx, ry, r2) =>
      // edge must be >= the REAL radius for the superset bound: sqrt
      // rounds to nearest (can round DOWN by half an ulp) and the
      // runtime coord/edge division rounds again, so widen by 1e-9
      // relative — a few candidate rows, never a missed pair
      val edge = math.sqrt(r2) * 1.000000001
      Seq(Dim(cell(lx, edge), d => Add(cell(rx, edge), Cast(d, LongType))),
        Dim(cell(ly, edge), d => Add(cell(ry, edge), Cast(d, LongType))))
    }.orElse(matchBand(conjunct, left, right).map { case (a, b, w, integral) =>
      if (integral) {
        val wl = Literal(w.value match {
          case i: Int => i.toLong; case l: Long => l
        }, LongType)
        Seq(Dim(IntegralDivide(Cast(a, LongType), wl),
          d => Add(IntegralDivide(Cast(b, LongType), wl), Cast(d, LongType))))
      } else {
        val edge = w.value.asInstanceOf[Double] * 1.000000001
        Seq(Dim(cell(a, edge), d => Add(cell(b, edge), Cast(d, LongType))))
      }
    })

  /** True when the condition already carries an attribute-equality
    * conjunct across the two sides: Spark then plans a hash join on
    * that key and the distance/band predicate is a cheap post-filter
    * over ALREADY key-local candidates — re-gridding would only add
    * the x9/x3 replication. This guard is also what makes the rule
    * idempotent: its own output (and any hand-built grid join) keys
    * on cell-equality conjuncts and is left alone.
    */
  private def hasEquiKey(conjuncts: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(a: Attribute, b: Attribute) =>
        (left.outputSet.contains(a) && right.outputSet.contains(b)) ||
          (left.outputSet.contains(b) && right.outputSet.contains(a))
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner | Cross, Some(cond), hint)
        if !cond.references.exists(_.name.startsWith("_gridx_")) &&
          !hasEquiKey(splitConjuncts(cond), left, right) =>
      splitConjuncts(cond).iterator
        .flatMap(c => dims(c, left, right))
        .take(1).toSeq.headOption match {
        case None => j
        case Some(ds) =>
          val leftAliases = ds.zipWithIndex.map { case (dim, i) =>
            Alias(dim.leftCell, s"_gridx_l$i")()
          }
          val leftP = Project(left.output ++ leftAliases, left)
          val offAttrs = ds.indices.map(i =>
            AttributeReference(s"_gridx_d$i", IntegerType, nullable = false)())
          val offsetRows = ds.size match {
            case 1 => (-1 to 1).map(i => new GenericInternalRow(Array[Any](i)))
            case _ => for (i <- -1 to 1; k <- -1 to 1)
              yield new GenericInternalRow(Array[Any](i, k))
          }
          val offsets = LocalRelation(offAttrs, offsetRows)
          val rightX = Join(right, offsets, Cross, None, JoinHint.NONE)
          val rightAliases = ds.zipWithIndex.map { case (dim, i) =>
            Alias(dim.rightCell(offAttrs(i)), s"_gridx_r$i")()
          }
          val rightP = Project(right.output ++ rightAliases, rightX)
          val eqs = leftAliases.zip(rightAliases)
            .map { case (l, r) => EqualTo(l.toAttribute, r.toAttribute) }
            .reduceLeft[Expression](And(_, _))
          Project(j.output,
            Join(leftP, rightP, Inner, Some(And(eqs, cond)), hint))
      }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}
