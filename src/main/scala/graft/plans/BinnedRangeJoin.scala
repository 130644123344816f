package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions._

/** Binned (bucketed) range join — the scale path for interval joins.
  *
  * Spark plans a pure non-equi join (`point >= lo AND point < hi`) as
  * BroadcastNestedLoopJoin when one side fits the broadcast threshold and
  * as a cartesian product otherwise: O(|L|·|R|) comparisons, unrunnable
  * when both sides are large. The standard fix (binned range join, as
  * implemented inside Delta/Photon and DuckDB's IEJoin literature) is to
  * quantize the range dimension into fixed-width bins so the join gains an
  * equi key:
  *
  *   - point side: one row per row, `bin = floor(point / width)`;
  *   - interval side: one row per COVERED bin,
  *     `explode(sequence(floor(lo/width), floor(hi/width)))`;
  *   - equi-join on `bin`, then re-apply the original range predicate.
  *
  * Each matching pair survives exactly once (a point belongs to exactly
  * one bin, and the interval emits that bin exactly once), so no distinct
  * pass is needed. The equi-join shuffles both sides on the bin key —
  * sort-merge or shuffled-hash, partitioned, AQE-skew-splittable — which
  * is what survives 100 TB where a nested loop cannot.
  *
  * Two entry points:
  *   - [[BinnedRangeJoin.join]] — explicit library call;
  *   - [[BinRangeJoinRule]] — a `Rule[LogicalPlan]` (installed by
  *     `graft.GraftExtensions`, opt-in via
  *     `spark.graft.rangeJoin.binWidth`) that rewrites qualifying
  *     `Join` nodes transparently, so plain `spark.sql` range joins —
  *     including reference-style band lookups at scale — get the binned
  *     plan with no query change.
  *
  * Bin width is workload-dependent (≈ the typical interval length: too
  * small explodes the interval side, too large degrades to one giant
  * bucket), so it is a required, explicit knob — there is no safe
  * universal default, which is why the rule is opt-in.
  */
object BinnedRangeJoin {

  val BinWidthKey = "spark.graft.rangeJoin.binWidth"

  /** Explicit binned range join: rows of `points` matched to rows of
    * `intervals` where `point ∈ [lo, hi)` (or `[lo, hi]` when
    * `inclusiveHi`). Output columns = points ++ intervals. */
  def join(
      points: DataFrame,
      intervals: DataFrame,
      point: Column,
      lo: Column,
      hi: Column,
      binWidth: Double,
      inclusiveHi: Boolean = false): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val w = lit(binWidth)
    val p = points.withColumn("__graft_bin", floor(point / w))
    // lo > hi would make sequence() count DOWN and emit phantom bins;
    // such intervals match nothing, so emit no bins at all
    val i = intervals.withColumn(
      "__graft_bin",
      explode(when(lo <= hi, sequence(floor(lo / w), floor(hi / w)))
        .otherwise(array().cast("array<bigint>"))))
    val range = if (inclusiveHi) point >= lo && point <= hi
                else point >= lo && point < hi
    p.join(i, p("__graft_bin") === i("__graft_bin") && range)
      .drop("__graft_bin")
  }
}

/** Optimizer rule: rewrite `Join(Inner, point-in-interval)` with no equi
  * conjunct into the binned form described in [[BinnedRangeJoin]].
  *
  * Fires only when ALL of:
  *   - `spark.graft.rangeJoin.binWidth` is set > 0 (opt-in);
  *   - the join is Inner with no existing equi-join conjunct (if one
  *     exists, Spark already plans a hash/sort-merge join and binning
  *     would only add work);
  *   - the condition contains `pt >= lo` (or `>`) and `pt < hi` (or
  *     `<=`), where `pt` comes entirely from one side and `lo`/`hi`
  *     entirely from the other, all of numeric type.
  *
  * The rewrite preserves the original output exactly: the synthetic bin
  * columns live only inside the new join, under a restoring Project.
  */
case class BinRangeJoinRule(spark: org.apache.spark.sql.SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  private def binWidth: Option[Double] =
    spark.conf.getOption(BinnedRangeJoin.BinWidthKey)
      .flatMap(s => scala.util.Try(s.toDouble).toOption)
      .filter(_ > 0)

  private def isNumeric(e: Expression): Boolean = e.dataType match {
    case _: org.apache.spark.sql.types.NumericType => true
    case _ => false
  }

  // (point, bound, pointOnLeft) for a strict/non-strict comparison conjunct
  private def sides(l: Expression, r: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Boolean)] = {
    def from(e: Expression, p: LogicalPlan) =
      e.references.nonEmpty && e.references.subsetOf(p.outputSet)
    if (from(l, left) && from(r, right)) Some((l, r, true))
    else if (from(l, right) && from(r, left)) Some((l, r, false))
    else None
  }

  def apply(plan: LogicalPlan): LogicalPlan = binWidth match {
    case None => plan
    case Some(width) => plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if j.resolved && !hasEquiConjunct(cond, left, right) =>
        rewrite(j, left, right, cond, hint, width).getOrElse(j)
    }
  }

  private def hasEquiConjunct(cond: Expression, left: LogicalPlan,
      right: LogicalPlan): Boolean =
    splitConjunctivePredicates(cond).exists {
      case EqualTo(l, r) => sides(l, r, left, right).isDefined
      case EqualNullSafe(l, r) => sides(l, r, left, right).isDefined
      case _ => false
    }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression, hint: JoinHint, width: Double): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    // classify each conjunct as a lower/upper bound on a point expression:
    // lower: pt >= lo | pt > lo | lo <= pt | lo < pt  (point side strict or not)
    val bounds = conjuncts.flatMap {
      case GreaterThanOrEqual(a, b) => Seq((a, b, "lo"), (b, a, "hi"))
      case GreaterThan(a, b)        => Seq((a, b, "lo"), (b, a, "hi"))
      case LessThanOrEqual(a, b)    => Seq((a, b, "hi"), (b, a, "lo"))
      case LessThan(a, b)           => Seq((a, b, "hi"), (b, a, "lo"))
      case _ => Nil
    }
    // find a (pt, lo, hi) triple: pt wholly from one side, lo+hi from the other
    val candidates = for {
      (pt1, lo, _) <- bounds.filter(_._3 == "lo")
      (pt2, hi, _) <- bounds.filter(_._3 == "hi")
      if pt1.semanticEquals(pt2)
      if isNumeric(pt1) && isNumeric(lo) && isNumeric(hi)
      (_, _, ptOnLeft) <- sides(pt1, lo, left, right).toSeq
      if sides(pt1, hi, left, right).exists(_._3 == ptOnLeft)
    } yield (pt1, lo, hi, ptOnLeft)

    candidates.headOption.map { case (pt, lo, hi, ptOnLeft) =>
      val (ptPlan, ivPlan) = if (ptOnLeft) (left, right) else (right, left)
      val w = Literal(width)
      def bin(e: Expression): Expression =
        Floor(Cast(Divide(Cast(e, org.apache.spark.sql.types.DoubleType),
          w, evalMode = EvalMode.LEGACY), org.apache.spark.sql.types.DoubleType))
      val ptBin = AttributeReference("__graft_pt_bin",
        org.apache.spark.sql.types.LongType)()
      val ivBin = AttributeReference("__graft_iv_bin",
        org.apache.spark.sql.types.LongType)()
      val ptSide = Project(ptPlan.output :+ Alias(bin(pt), ptBin.name)(
        exprId = ptBin.exprId), ptPlan)
      // one row per covered bin; descending guard: lo > hi emits nothing.
      // timeZoneId must be set explicitly: the analyzer's ResolveTimeZone
      // has already run by optimizer time, and a TimeZoneAwareExpression
      // without it is permanently unresolved.
      val seqExpr = new Sequence(bin(lo), bin(hi), Some(Literal(1L)),
        Some(conf.sessionLocalTimeZone))
      // compare via explicit double casts: lo and hi were each coerced
      // against pt, not against each other, so their types can differ
      // (e.g. int lo, double hi) and a bare comparison would not resolve.
      // Guard-edge rounding is harmless: if the cast doubles compare
      // equal, the bins computed from those same doubles are equal too,
      // so the sequence cannot descend.
      val guarded = If(LessThanOrEqual(
          Cast(lo, org.apache.spark.sql.types.DoubleType),
          Cast(hi, org.apache.spark.sql.types.DoubleType)), seqExpr,
        Literal.create(Array.empty[Long],
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType, containsNull = false)))
      val ivSide = org.apache.spark.sql.catalyst.plans.logical.Generate(
        Explode(guarded), unrequiredChildIndex = Nil, outer = false,
        qualifier = None, generatorOutput = Seq(ivBin), child = ivPlan)
      val (newLeft, newRight) =
        if (ptOnLeft) (ptSide, ivSide) else (ivSide, ptSide)
      val newCond = And(EqualTo(ptBin, ivBin), cond)
      Project(j.output,
        Join(newLeft, newRight, Inner, Some(newCond), hint))
    }
  }
}
