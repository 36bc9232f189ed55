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
    // the two cross-side comparisons on timestamp attributes; `<` pairs a
    // half-open interval end, `<=` a closed one (bucketing must include the
    // end's own bucket in the closed case)
    def crossLt(e: Expression)
        : Option[(AttributeReference, AttributeReference, Boolean, Boolean)] = {
      def classify(a: Expression, b: Expression, strict: Boolean) = (a, b) match {
        case (a: AttributeReference, b: AttributeReference)
            if a.dataType == TimestampType && b.dataType == TimestampType =>
          (sideOf(a), sideOf(b)) match {
            case (Some(true), Some(false)) => Some((a, b, true, strict))  // l ? r
            case (Some(false), Some(true)) => Some((a, b, false, strict)) // r ? l
            case _ => None
          }
        case _ => None
      }
      e match {
        case LessThan(a, b) => classify(a, b, strict = true)
        case LessThanOrEqual(a, b) => classify(a, b, strict = false)
        case _ => None
      }
    }
    val lts = cs.flatMap(e => crossLt(e))
    val lr = lts.collectFirst { case (ls, re, true, strictR) => (ls, re, strictR) }
    val rl = lts.collectFirst { case (rs, le, false, strictL) => (rs, le, strictL) }
    (lr, rl) match {
      // strictR: ls < re bounds the RIGHT interval's end openness;
      // strictL: rs < le bounds the LEFT's
      case (Some((ls, re, strictR)), Some((rs, le, strictL)))
          if ls != le && rs != re =>
        val widthUs = Literal(bucketSeconds * 1000000L, LongType)
        def bucketOf(t: Expression): Expression =
          IntegralDivide(UnixMicros(t), widthUs)
        // half-open end: range stops at the bucket of the last contained µs;
        // closed end: the endpoint itself is contained. Sequence is
        // TimeZoneAware — without an explicit zone the expression stays
        // UNRESOLVED and the optimizer rejects the plan.
        def buckets(s: Expression, e: Expression, strictEnd: Boolean): Expression =
          new Sequence(bucketOf(s),
            if (strictEnd)
              IntegralDivide(Subtract(UnixMicros(e), Literal(1L)), widthUs)
            else bucketOf(e),
            None, Some(SQLConf.get.sessionLocalTimeZone))
        val bL = AttributeReference("_graft_bucket_l", LongType, nullable = false)()
        val bR = AttributeReference("_graft_bucket_r", LongType, nullable = false)()
        val genL = Generate(Explode(buckets(ls, le, strictL)), Nil, outer = false,
          qualifier = None, generatorOutput = Seq(bL), child = left)
        val genR = Generate(Explode(buckets(rs, re, strictR)), Nil, outer = false,
          qualifier = None, generatorOutput = Seq(bR), child = right)
        val reportOnce = EqualTo(bucketOf(Greatest(Seq(ls, rs))), bL)
        val newCond = And(And(EqualTo(bL, bR), cond), reportOnce)
        Some(Project(j.output, Join(genL, genR, Inner, Some(newCond), j.hint)))
      case _ => None
    }
  }
}
