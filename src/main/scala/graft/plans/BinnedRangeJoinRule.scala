package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{CalendarIntervalType, DayTimeIntervalType, LongType, TimestampType}
import org.apache.spark.unsafe.types.CalendarInterval

/** Optimizer rule: rewrite a pure time-range inequality join
  *
  *   A JOIN B ON b.ts <= a.ts AND b.ts >= a.ts - INTERVAL w
  *
  * (which Spark can only execute as a broadcast-nested-loop / cartesian
  * product — the O(|A| x |B|) shape that dies at scale) into a binned
  * equi-join: bucket both sides into floor(epoch_micros / w) bins, explode
  * the upper-bound side into its two candidate bins {bin-1, bin}, hash-join
  * on the bin, and keep the original predicate as the residual filter.
  * Each matching (a, b) pair satisfies the bin equality for exactly one of
  * a's two candidate bins (b's own bin), so no duplicates are introduced
  * and the rewrite is semantics-preserving for any data, including
  * pre-epoch timestamps (floor division, not truncation).
  *
  * Fires only when the join is Inner, the range bounds are bare timestamp
  * columns from opposite sides with a foldable interval width, and there
  * is no cross-side equality conjunct (if there is, Spark already picks a
  * hash join and binning would only add work). The rewritten join contains
  * a bin-equality conjunct, so the rule is idempotent under fixed-point
  * batches.
  *
  * This generalizes the hand-binned q49 plan (AnalyticsOps): with the rule
  * installed, the NAIVE formulation gets the scalable plan automatically.
  */
object BinnedRangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  /** b >= a - w (in any accepted syntactic orientation) => (b, a, w). */
  private object LowerBound {
    def unapply(e: Expression): Option[(AttributeReference, AttributeReference, Long)] = {
      def width(lit: Literal): Option[Long] = lit match {
        case Literal(v: Long, DayTimeIntervalType(_, _)) if v < 0 => Some(-v)
        case Literal(ci: CalendarInterval, CalendarIntervalType) if ci.months == 0 =>
          val total = ci.days * java.util.concurrent.TimeUnit.DAYS.toMicros(1) +
            ci.microseconds
          if (total < 0) Some(-total) else None
        case _ => None
      }
      e match {
        case GreaterThanOrEqual(b: AttributeReference,
            TimestampAddInterval(a: AttributeReference, l: Literal, _)) =>
          width(l).map((b, a, _))
        case GreaterThan(b: AttributeReference,
            TimestampAddInterval(a: AttributeReference, l: Literal, _)) =>
          width(l).map((b, a, _))
        case LessThanOrEqual(TimestampAddInterval(a: AttributeReference, l: Literal, _),
            b: AttributeReference) =>
          width(l).map((b, a, _))
        case LessThan(TimestampAddInterval(a: AttributeReference, l: Literal, _),
            b: AttributeReference) =>
          width(l).map((b, a, _))
        case _ => None
      }
    }
  }

  /** b <= a (either orientation) => (b, a). */
  private object UpperBound {
    def unapply(e: Expression): Option[(AttributeReference, AttributeReference)] = e match {
      case LessThanOrEqual(b: AttributeReference, a: AttributeReference) => Some((b, a))
      case LessThan(b: AttributeReference, a: AttributeReference) => Some((b, a))
      case GreaterThanOrEqual(a: AttributeReference, b: AttributeReference) => Some((b, a))
      case GreaterThan(a: AttributeReference, b: AttributeReference) => Some((b, a))
      case _ => None
    }
  }

  /** Exact floorDiv(unix_micros(ts), w) as a catalyst tree (IntegralDivide
    * truncates toward zero; correct it for negative micros so pre-epoch
    * timestamps bin consistently).
    */
  private def binOf(ts: Expression, w: Long): Expression = {
    val micros = UnixMicros(ts)
    val wLit = Literal(w, LongType)
    val q = IntegralDivide(micros, wLit)
    If(And(LessThan(micros, Literal(0L, LongType)),
        Not(EqualTo(Multiply(q, wLit), micros))),
      Subtract(q, Literal(1L, LongType)), q)
  }

  private def fromSide(attr: Attribute, side: LogicalPlan): Boolean =
    side.outputSet.contains(attr)

  private def crossSideEquality(conjuncts: Seq[Expression],
                                left: LogicalPlan, right: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(l, r) => spansSides(l, r, left, right)
      case EqualNullSafe(l, r) => spansSides(l, r, left, right)
      case _ => false
    }

  private def spansSides(l: Expression, r: Expression,
                         left: LogicalPlan, right: LogicalPlan): Boolean = {
    val (lr, rr) = (l.references, r.references)
    lr.nonEmpty && rr.nonEmpty &&
      ((lr.subsetOf(left.outputSet) && rr.subsetOf(right.outputSet)) ||
        (lr.subsetOf(right.outputSet) && rr.subsetOf(left.outputSet)))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val rewritten =
        // Streaming range joins have their own state-eviction machinery
        // keyed on the raw interval condition — leave them alone.
        if (left.isStreaming || right.isStreaming) None
        else if (crossSideEquality(conjuncts, left, right)) None
        else {
          // Find a lower bound and an upper bound over the same (b, a)
          // timestamp column pair, with a and b from opposite sides.
          val candidates = for {
            LowerBound(b, a, w) <- conjuncts.view
            UpperBound(b2, a2) <- conjuncts.view
            if b2.semanticEquals(b) && a2.semanticEquals(a)
            if a.dataType == TimestampType && b.dataType == TimestampType
            if (fromSide(a, left) && fromSide(b, right)) ||
              (fromSide(a, right) && fromSide(b, left))
          } yield (b, a, w)
          candidates.headOption.map { case (b, a, w) =>
            rewrite(j, left, right, cond, b, a, w)
          }
        }
      rewritten.getOrElse(j)
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      cond: Expression, b: AttributeReference,
                      a: AttributeReference, w: Long): LogicalPlan = {
    // Build side (b): one bin per row.
    val buildBin = Alias(binOf(b, w), "__graft_bin_b")()
    // Probe side (a): rows exploded into their two candidate bins.
    val aBin = binOf(a, w)
    val gen = Explode(CreateArray(Seq(
      Subtract(aBin, Literal(1L, LongType)), aBin)))
    val genOut = AttributeReference("__graft_bin_a", LongType,
      nullable = gen.elementSchema.head.nullable)()

    def withBins(side: LogicalPlan): LogicalPlan =
      if (fromSide(a, side))
        Generate(gen, unrequiredChildIndex = Nil, outer = false,
          qualifier = None, generatorOutput = Seq(genOut), child = side)
      else
        Project(side.output :+ buildBin, side)

    val newCond = And(EqualTo(genOut, buildBin.toAttribute), cond)
    Project(j.output,
      j.copy(left = withBins(left), right = withBins(right),
        condition = Some(newCond)))
  }
}
