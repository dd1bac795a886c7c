package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Catalyst optimizer rule: a join whose ONLY condition is a range
  * containment (`p >= s AND p <= e`, any comparison orientation) has no
  * equi key, so Spark plans it as BroadcastNestedLoopJoin — every point
  * compared against every interval through a single broadcast, the plan
  * that dies first at 100 TB. [[graft.operators.RangeJoin]] is the manual
  * escape; this rule is the same rewrite applied AUTOMATICALLY inside the
  * optimizer, so any `points.join(intervals, $"p" >= $"s" && $"p" <= $"e")`
  * — including ones written by SQL users who never heard of bucketing —
  * gets the scalable plan.
  *
  * Rewrite (semantics-preserving, bucket width `w` from
  * `spark.graft.rangeJoin.bucketWidth`):
  * {{{
  *   points   → Project(+ _graft_pb = floordiv(p, w))
  *   intervals → Filter(s <= e) → Generate(explode(sequence(
  *                 floordiv(s, w), floordiv(e, w))) AS _graft_ib)
  *   join on _graft_pb = _graft_ib AND (original condition)
  *   → Project(original output)
  * }}}
  * The added equality turns the nested loop into a hash/sort-merge
  * equi-join partitioned by bucket. Containment still holds exactly: a
  * point in `[s, e]` lies in some bucket the interval overlaps, and the
  * original predicate re-checks exactness. `Filter(s <= e)` drops
  * backwards intervals `sequence()` would reject — such intervals match
  * nothing in the original join too. Null points/bounds produce a null
  * bucket / null sequence → no join rows, the original NULL semantics.
  *
  * Scope guards: inner joins; condition is EXACTLY the two range
  * conjuncts (any extra conjunct usually carries an equi key, and Spark
  * then plans a fine equi-join with the range as a post-filter); the
  * three columns are integral (long/int) attributes, point on one side
  * and both bounds on the other. The rule fires once — the rewritten
  * join's condition has three conjuncts and no longer matches. Off by
  * default: enable by setting the width conf to the typical interval
  * span.
  */
class RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  import RangeJoinRewrite._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = conf.getConfString(WidthConf, "").trim
    if (width.isEmpty) return plan
    val w = try width.toLong catch {
      case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"$WidthConf must be a positive integer bucket width, got '$width'")
    }
    require(w > 0, s"$WidthConf must be positive, got $w")
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        splitConjunctivePredicates(cond) match {
          case Seq(c1, c2) =>
            (asRange(c1, c2, left, right), asRange(c1, c2, right, left)) match {
              case (Some((p, s, e)), _) =>
                rewrite(j, left, right, p, s, e, w, hint, pointsLeft = true)
              case (_, Some((p, s, e))) =>
                rewrite(j, right, left, p, s, e, w, hint, pointsLeft = false)
              case _ => j
            }
          case _ => j
        }
    }
  }

  /** If the two conjuncts bound one integral attribute of `pointSide`
    * between two integral attributes of `intervalSide`, return
    * (point, start, end).
    */
  private def asRange(c1: Expression, c2: Expression,
      pointSide: LogicalPlan, intervalSide: LogicalPlan)
      : Option[(Attribute, Attribute, Attribute)] = {
    def integral(a: Attribute): Boolean =
      a.dataType == LongType || a.dataType == IntegerType
    def ofPoint(a: Attribute) =
      pointSide.outputSet.contains(a) && integral(a)
    def ofInterval(a: Attribute) =
      intervalSide.outputSet.contains(a) && integral(a)
    // normalize each conjunct to (point, bound, isLower)
    def norm(c: Expression): Option[(Attribute, Attribute, Boolean)] =
      c match {
        case GreaterThanOrEqual(p: Attribute, b: Attribute)
            if ofPoint(p) && ofInterval(b) => Some((p, b, true))
        case LessThanOrEqual(b: Attribute, p: Attribute)
            if ofPoint(p) && ofInterval(b) => Some((p, b, true))
        case LessThanOrEqual(p: Attribute, b: Attribute)
            if ofPoint(p) && ofInterval(b) => Some((p, b, false))
        case GreaterThanOrEqual(b: Attribute, p: Attribute)
            if ofPoint(p) && ofInterval(b) => Some((p, b, false))
        case _ => None
      }
    (norm(c1), norm(c2)) match {
      case (Some((p1, s, true)), Some((p2, e, false))) if p1.semanticEquals(p2) =>
        Some((p1, s, e))
      case (Some((p1, e, false)), Some((p2, s, true))) if p1.semanticEquals(p2) =>
        Some((p1, s, e))
      case _ => None
    }
  }

  /** Exact floor division for integral types — `(x - pmod(x, w)) div w`,
    * never a double `floor()` (doubles lose exactness past 2^53, which
    * epoch-nanos exceed).
    */
  private def floorDiv(x: Expression, w: Long): Expression = {
    val xl = if (x.dataType == LongType) x else Cast(x, LongType)
    val lit = Literal(w)
    IntegralDivide(Subtract(xl, Pmod(xl, lit)), lit)
  }

  private def rewrite(j: Join, points: LogicalPlan, intervals: LogicalPlan,
      p: Attribute, s: Attribute, e: Attribute, w: Long,
      hint: JoinHint, pointsLeft: Boolean): LogicalPlan = {
    val pb = Alias(floorDiv(p, w), "_graft_pb")()
    val pointsB = Project(points.output :+ pb, points)
    val ib = AttributeReference("_graft_ib", LongType, nullable = false)()
    // Sequence is TimeZoneAwareExpression: without an explicit zone it
    // stays unresolved even for integral inputs (the analyzer normally
    // fills it in; optimizer-stage rules must do it themselves)
    val seq = Sequence(floorDiv(s, w), floorDiv(e, w), None,
      Some(conf.sessionLocalTimeZone))
    val intervalsB = Generate(Explode(seq),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(ib),
      child = Filter(LessThanOrEqual(s, e), intervals))
    val bucketEq = EqualTo(pb.toAttribute, ib)
    val newCond = And(bucketEq, j.condition.get)
    val joined =
      if (pointsLeft) Join(pointsB, intervalsB, Inner, Some(newCond), hint)
      else Join(intervalsB, pointsB, Inner, Some(newCond), hint)
    Project(j.output, joined)
  }
}

object RangeJoinRewrite {
  val WidthConf = "spark.graft.rangeJoin.bucketWidth"
}
