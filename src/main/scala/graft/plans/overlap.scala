package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Optimizer rule: rewrite inequality-only interval-OVERLAP joins into
  * bucket equi-joins.
  *
  * A join whose condition is the overlap pattern
  * `l_start < r_end AND r_start < l_end` (timestamps, opposite sides, no
  * equality predicate anywhere) has no equi keys, so Spark can only plan it
  * as a broadcast-nested-loop or cartesian product — O(|L|·|R|) comparisons,
  * the plan that dies first at scale. This rule rebuilds it as
  * [[graft.ops.Intervals.overlapJoin]] does by hand: explode each side to
  * the fixed-width time buckets its interval covers, hash-join on the
  * bucket, keep the original predicate as the verifier, and emit each pair
  * exactly once — from the bucket containing `greatest(l_start, r_start)`
  * (always covered by BOTH sides whenever the pair overlaps, since bucket
  * assignment is monotone in time).
  *
  * Semantics-preserving for every input: NULL endpoints explode to nothing
  * (the original predicate is null there too); degenerate/inverted
  * intervals still meet in the report-once bucket whenever the original
  * predicate holds (shown by the monotonicity argument above); all original
  * conjuncts are retained verbatim in the new join condition.
  *
  * Fires only when: inner join, no cross-side equality conjunct (this also
  * stops the rule re-firing on its own output, whose join carries the
  * bucket equality), and both strict-`<` cross conjuncts reference plain
  * timestamp attributes. Bucket width:
  * `spark.graft.overlapJoin.bucketSeconds` (default 3600); disable with
  * `spark.graft.overlapJoin.enabled=false`.
  */
object OverlapJoinRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val conf = SQLConf.get
    if (conf.getConfString("spark.graft.overlapJoin.enabled", "true") != "true") plan
    else {
      val bucketSeconds =
        conf.getConfString("spark.graft.overlapJoin.bucketSeconds", "3600").toLong
      plan.transform {
        case j @ Join(left, right, Inner, Some(cond), _) =>
          rewrite(j, left, right, cond, bucketSeconds).getOrElse(j)
      }
    }
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other => Seq(other)
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression, bucketSeconds: Long): Option[LogicalPlan] = {
    val cs = conjuncts(cond)
    def sideOf(a: Attribute): Option[Boolean] = // true = left
      if (left.outputSet.contains(a)) Some(true)
      else if (right.outputSet.contains(a)) Some(false)
      else None
    // any cross-side equality: Spark already has equi keys (or this IS our
    // rewritten join) — leave it alone
    val hasCrossEquality = cs.exists {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        (sideOf(a), sideOf(b)) match {
          case (Some(x), Some(y)) => x != y
          case _ => false
        }
      case _ => false
    }
    if (hasCrossEquality) return None
    // the two strict cross-side comparisons on timestamp attributes
    def crossLt(e: Expression): Option[(AttributeReference, AttributeReference, Boolean)] =
      e match {
        case LessThan(a: AttributeReference, b: AttributeReference)
            if a.dataType == TimestampType && b.dataType == TimestampType =>
          (sideOf(a), sideOf(b)) match {
            case (Some(true), Some(false)) => Some((a, b, true))   // left < right
            case (Some(false), Some(true)) => Some((a, b, false))  // right < left
            case _ => None
          }
        case _ => None
      }
    val lts = cs.flatMap(e => crossLt(e))
    val lr = lts.collectFirst { case (ls, re, true) => (ls, re) }
    val rl = lts.collectFirst { case (rs, le, false) => (rs, le) }
    (lr, rl) match {
      case (Some((ls, re)), Some((rs, le))) if ls != le && rs != re =>
        val widthUs = Literal(bucketSeconds * 1000000L, LongType)
        def bucketOf(t: Expression): Expression =
          IntegralDivide(UnixMicros(t), widthUs)
        // end-exclusive: the range ends at the bucket of the last contained
        // µs. Sequence is TimeZoneAware — without an explicit zone the
        // expression stays UNRESOLVED and the optimizer rejects the plan.
        def buckets(s: Expression, e: Expression): Expression =
          new Sequence(bucketOf(s),
            IntegralDivide(Subtract(UnixMicros(e), Literal(1L)), widthUs),
            None, Some(SQLConf.get.sessionLocalTimeZone))
        val bL = AttributeReference("_graft_bucket_l", LongType, nullable = false)()
        val bR = AttributeReference("_graft_bucket_r", LongType, nullable = false)()
        val genL = Generate(Explode(buckets(ls, le)), Nil, outer = false,
          qualifier = None, generatorOutput = Seq(bL), child = left)
        val genR = Generate(Explode(buckets(rs, re)), Nil, outer = false,
          qualifier = None, generatorOutput = Seq(bR), child = right)
        val reportOnce = EqualTo(bucketOf(Greatest(Seq(ls, rs))), bL)
        val newCond = And(And(EqualTo(bL, bR), cond), reportOnce)
        Some(Project(j.output, Join(genL, genR, Inner, Some(newCond), j.hint)))
      case _ => None
    }
  }
}
