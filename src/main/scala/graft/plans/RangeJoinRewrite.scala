package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Engine extensions, registered via `spark.sql.extensions`
  * (GraftSession sets it for every session): the range-join bucketing
  * optimizer rule, plus the engine's custom function catalog
  * ([[graft.functions.FunctionDefs]]) — injected here so `newSession()`
  * children of a session-per-job server resolve `dot_i64`/`minhash_sig`/
  * `knn_topk`/… without any per-session imperative registration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RangeJoinRewrite)
    graft.functions.FunctionDefs.injectAll(e)
  }
}

/** Rewrites inner joins whose only usable predicate is an interval
  * containment — `probe >= lo AND probe <= hi` over 64-bit columns from
  * opposite sides — into a bucketed equi-join:
  *
  *   probe side    gains `__rjb = floorDiv(probe, bin)`
  *   interval side explodes `__rjb = floorDiv(lo,bin) .. floorDiv(hi,bin)`
  *   join keys     gain `__rjb = __rjb` (original condition kept)
  *
  * Without this Spark plans the pure-inequality join as
  * BroadcastNestedLoopJoin — O(n·m) comparisons and a broadcast of one
  * whole side — which is exactly the shape that dies first at 100 TB.
  * The rewrite is UNCONDITIONALLY sound for any bin > 0: floor is
  * monotone, so `lo <= p <= hi` implies
  * `floor(lo/bin) <= floor(p/bin) <= floor(hi/bin)` — every qualifying
  * pair shares at least one bucket, and the retained original
  * condition discards the non-qualifying bucket collisions. Pairs can
  * never duplicate: each probe row has exactly ONE bucket. Bin size
  * only affects efficiency (explode fanout ≈ interval width / bin), so
  * it is user-set per workload: `spark.graft.rangeJoin.binSize` in the
  * probe column's units; 0 (default) disables the rule. The conf is
  * deliberately SESSION-scoped (the same interface Databricks'
  * range-join bin size uses): set it for the interval-join workload,
  * unset to fall back to nested-loop planning. Joins that already have
  * a cross-side equi conjunct are never touched.
  *
  * The manual twin of this rewrite is Events.qRangeJoin (bucketed by
  * hand, oracle-checked); Databricks exposes the same idea as a range
  * join hint, Flink as its interval join.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {
  val BinConf = "spark.graft.rangeJoin.binSize"
  private val BucketName = "__rjb"

  def apply(plan: LogicalPlan): LogicalPlan = {
    val raw = conf.getConfString(BinConf, "0").trim
    val bin = raw.toLongOption.getOrElse(throw new IllegalArgumentException(
      s"$BinConf must be a whole number of probe-column units, got '$raw'"))
    if (bin <= 0) plan
    else plan.transformUp {
      case j @ Join(_, _, Inner, Some(_), _) => rewrite(j, bin).getOrElse(j)
    }
  }

  /** floor(e / bin) exact on longs for any sign: (e - pmod(e, bin)) div bin. */
  private def floorDiv(e: Expression, bin: Long): Expression = {
    val b = Literal(bin)
    IntegralDivide(Subtract(e, Pmod(e, b)), b)
  }

  private def fromSide(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  private def rewrite(j: Join, bin: Long): Option[LogicalPlan] = {
    val Join(left, right, _, Some(cond), hint) = j: @unchecked
    // idempotence guard: this join (or a child) is already bucketed —
    // the optimizer batch runs to fixed point
    if (j.children.exists(_.output.exists(_.name == BucketName))) return None
    def split(e: Expression): Seq[Expression] = e match {
      case And(a, b) => split(a) ++ split(b)
      case other => Seq(other)
    }
    val conjuncts = split(cond)
    // an existing cross-side equi conjunct means a hash join is already
    // plannable; bucketing would only widen its key without need
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        (fromSide(a, left) && fromSide(b, right)) || (fromSide(a, right) && fromSide(b, left))
      case _ => false
    }
    if (hasEqui) return None

    // lower bounds: probe >= lo (either spelling, strict or not)
    val lowers = conjuncts.collect {
      case GreaterThanOrEqual(p, lo) => (p, lo)
      case GreaterThan(p, lo) => (p, lo)
      case LessThanOrEqual(lo, p) => (p, lo)
      case LessThan(lo, p) => (p, lo)
    }
    // upper bounds, two spellings: probe <= hi, or (probe - lo) <= width
    def uppers(p: Expression, lo: Expression): Option[Expression] =
      conjuncts.collectFirst {
        case LessThanOrEqual(p2, hi) if p2.semanticEquals(p) && !hi.semanticEquals(lo) &&
          fromSide(hi, if (fromSide(lo, left)) left else right) => hi
        case LessThan(p2, hi) if p2.semanticEquals(p) && !hi.semanticEquals(lo) &&
          fromSide(hi, if (fromSide(lo, left)) left else right) => hi
        case GreaterThanOrEqual(hi, p2) if p2.semanticEquals(p) && !hi.semanticEquals(lo) &&
          fromSide(hi, if (fromSide(lo, left)) left else right) => hi
        case LessThanOrEqual(Subtract(p2, lo2, _), w: Literal)
          if p2.semanticEquals(p) && lo2.semanticEquals(lo) => Add(lo, w)
        case LessThan(Subtract(p2, lo2, _), w: Literal)
          if p2.semanticEquals(p) && lo2.semanticEquals(lo) => Add(lo, w)
      }

    val candidate = lowers.iterator.flatMap { case (p, lo) =>
      val sidesOk = p.dataType == LongType && lo.dataType == LongType &&
        ((fromSide(p, left) && fromSide(lo, right)) || (fromSide(p, right) && fromSide(lo, left)))
      if (!sidesOk) Iterator.empty
      else uppers(p, lo).filter(_.dataType == LongType).map(hi => (p, lo, hi)).iterator
    }.find(_ => true)

    candidate.map { case (p, lo, hi) =>
      val probeOnLeft = fromSide(p, left)
      val (probeSide, intervalSide) = if (probeOnLeft) (left, right) else (right, left)

      val probeBucket = Alias(floorDiv(p, bin), BucketName)()
      val newProbe = Project(probeSide.output :+ probeBucket, probeSide)

      // empty-array branch guards inverted/null intervals (sequence()
      // with a positive step refuses stop < start)
      val loDiv = floorDiv(lo, bin)
      val hiDiv = floorDiv(hi, bin)
      // timeZoneId set explicitly: the analyzer's ResolveTimeZone has
      // already run, so an optimizer-introduced TimeZoneAwareExpression
      // stays unresolved without it
      val seq = If(LessThanOrEqual(loDiv, hiDiv),
        Sequence(loDiv, hiDiv, Some(Literal(1L)), Some(conf.sessionLocalTimeZone)),
        Literal.create(Array.empty[Long], ArrayType(LongType, containsNull = false)))
      val bucketAttr = AttributeReference(BucketName, LongType, nullable = false)()
      val newInterval = Generate(Explode(seq), unrequiredChildIndex = Nil, outer = false,
        qualifier = None, generatorOutput = Seq(bucketAttr), child = intervalSide)

      val (newLeft, newRight) = if (probeOnLeft) (newProbe, newInterval) else (newInterval, newProbe)
      val newCond = And(EqualTo(probeBucket.toAttribute, bucketAttr), cond)
      // restore the original output: parents must not see helper columns
      Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
    }
  }
}
