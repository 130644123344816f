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
  val MaxBinsKey = "spark.graft.rangeJoin.maxBins"

  /** Max bins one interval may expand to before it is routed to the
    * nested-loop fallback branch instead. Without a cap, one outlier
    * interval (very wide, or hi = +Infinity, which floor-casts to
    * Long.MaxValue) makes `sequence()` throw or explode the row count. */
  val DefaultMaxBins = 4096L

  /** Explicit binned range join: rows of `points` matched to rows of
    * `intervals` where `point ∈ [lo, hi)` (or `[lo, hi]` when
    * `inclusiveHi`). Output columns = points ++ intervals.
    *
    * Intervals spanning more than `maxBins` bins — including non-finite
    * bounds, whose double span is Inf/NaN and fails the guard naturally —
    * take a nested-loop fallback branch (correct for ANY bounds, viable
    * because outliers are few by definition); everything else takes the
    * binned equi-join. The union of the two branches is exact: each
    * interval row goes to exactly one branch. When no outliers exist the
    * fallback's build side is empty and AQE's empty-relation propagation
    * elides the branch at runtime, so the common case pays nothing. */
  def join(
      points: DataFrame,
      intervals: DataFrame,
      point: Column,
      lo: Column,
      hi: Column,
      binWidth: Double,
      inclusiveHi: Boolean = false,
      maxBins: Long = DefaultMaxBins): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val w = lit(binWidth)
    val range = if (inclusiveHi) point >= lo && point <= hi
                else point >= lo && point < hi
    // span in DOUBLE: (hi-lo)/w ≤ maxBins bounds covered bins at maxBins+1;
    // Inf yields Inf, Inf-Inf yields NaN, and both compare false — so
    // non-finite bounds route to the fallback with no special-casing.
    // lo > hi would make sequence() count DOWN and emit phantom bins;
    // such intervals match nothing, so emit no bins at all.
    val narrow = lo.cast("double") <= hi.cast("double") &&
      (hi.cast("double") - lo.cast("double")) / w <= lit(maxBins.toDouble)
    val p = points.withColumn("__graft_bin", floor(point / w))
    val i = intervals.withColumn(
      "__graft_bin",
      explode(when(narrow, sequence(floor(lo / w), floor(hi / w)))
        .otherwise(array().cast("array<bigint>"))))
    val binned = p.join(i, p("__graft_bin") === i("__graft_bin") && range)
      .drop("__graft_bin")
    val fallback = points.join(
      intervals.filter(!coalesce(narrow, lit(false))), range)
    binned.unionByName(fallback)
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
object BinRangeJoinRule {
  /** Marks the nested-loop fallback Join for outlier intervals: it matches
    * the rule's own pattern (inner, no equi conjunct, range condition), and
    * the rule runs in a fixed-point optimizer batch — without the marker it
    * would re-rewrite its own fallback every iteration. withNewChildren
    * preserves tags, so the marker survives sibling rules. */
  private[plans] val NoRebin =
    org.apache.spark.sql.catalyst.trees.TreeNodeTag[Boolean]("graft.rangeJoin.noRebin")
}

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

  /** Structural re-rewrite guard, complementing the [[BinRangeJoinRule.NoRebin]]
    * tag: true when a join child is (possibly under a Project) the
    * outlier Filter this rule itself emits — `Not(Coalesce(narrow, false))`.
    * The tag is the primary guard, but sibling rules in the same
    * fixed-point batch (e.g. PushPredicateThroughJoin) rebuild Join nodes
    * via constructor/copy, which drops tags; without the structural check
    * the rule would then re-rewrite its own fallback every iteration,
    * bloating the plan until the fixed-point iteration limit. */
  private def isOwnFallbackSide(p: LogicalPlan): Boolean = {
    val filterCond = p match {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => Some(f.condition)
      case Project(_, f: org.apache.spark.sql.catalyst.plans.logical.Filter) => Some(f.condition)
      case _ => None
    }
    filterCond.exists(_.exists {
      case Not(Coalesce(Seq(_, Literal(false, _)))) => true
      case _ => false
    })
  }

  def apply(plan: LogicalPlan): LogicalPlan = binWidth match {
    case None => plan
    case Some(width) => plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if j.resolved && j.getTagValue(BinRangeJoinRule.NoRebin).isEmpty &&
            !isOwnFallbackSide(left) && !isOwnFallbackSide(right) &&
            !hasEquiConjunct(cond, left, right) =>
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
      import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}
      val (ptPlan, ivPlan) = if (ptOnLeft) (left, right) else (right, left)
      val w = Literal(width)
      def bin(e: Expression): Expression =
        Floor(Cast(Divide(Cast(e, DoubleType),
          w, evalMode = EvalMode.LEGACY), DoubleType))
      val ptBin = AttributeReference("__graft_pt_bin", LongType)()
      val ivBin = AttributeReference("__graft_iv_bin", LongType)()
      val ptSide = Project(ptPlan.output :+ Alias(bin(pt), ptBin.name)(
        exprId = ptBin.exprId), ptPlan)
      // one row per covered bin; descending guard: lo > hi emits nothing.
      // timeZoneId must be set explicitly: the analyzer's ResolveTimeZone
      // has already run by optimizer time, and a TimeZoneAwareExpression
      // without it is permanently unresolved.
      val seqExpr = new Sequence(bin(lo), bin(hi), Some(Literal(1L)),
        Some(conf.sessionLocalTimeZone))
      // narrow = in-order AND spans ≤ maxBins bins, computed in DOUBLE:
      // an outlier interval (very wide, or hi = +Infinity which would
      // floor-cast to Long.MaxValue and make sequence() throw) has an
      // Inf/NaN span, compares false, and is routed to the nested-loop
      // fallback branch below instead of the bin expansion.
      // Explicit double casts: lo and hi were each coerced against pt,
      // not against each other, so their types can differ (e.g. int lo,
      // double hi) and a bare comparison would not resolve. Guard-edge
      // rounding is harmless: if the cast doubles compare equal, the
      // bins computed from those same doubles are equal too, so the
      // sequence cannot descend.
      val maxBins = spark.conf.getOption(BinnedRangeJoin.MaxBinsKey)
        .flatMap(s => scala.util.Try(s.toLong).toOption)
        .getOrElse(BinnedRangeJoin.DefaultMaxBins)
      val narrow = And(
        LessThanOrEqual(Cast(lo, DoubleType), Cast(hi, DoubleType)),
        LessThanOrEqual(
          Divide(Subtract(Cast(hi, DoubleType), Cast(lo, DoubleType)),
            w, evalMode = EvalMode.LEGACY),
          Literal(maxBins.toDouble)))
      val guarded = If(narrow, seqExpr,
        Literal.create(Array.empty[Long],
          ArrayType(LongType, containsNull = false)))
      val ivSide = org.apache.spark.sql.catalyst.plans.logical.Generate(
        Explode(guarded), unrequiredChildIndex = Nil, outer = false,
        qualifier = None, generatorOutput = Seq(ivBin), child = ivPlan)
      val (newLeft, newRight) =
        if (ptOnLeft) (ptSide, ivSide) else (ivSide, ptSide)
      val newCond = And(EqualTo(ptBin, ivBin), cond)
      val binned = Project(j.output,
        Join(newLeft, newRight, Inner, Some(newCond), hint))
      // outlier intervals (narrow = false, but NOT null/descending rows,
      // which match nothing anyway) keep the original nested-loop join —
      // correct for any bounds, viable because outliers are few
      val ivOutliers = org.apache.spark.sql.catalyst.plans.logical.Filter(
        Not(Coalesce(Seq(narrow, Literal(false)))), ivPlan)
      val (fbLeft, fbRight) =
        if (ptOnLeft) (ptPlan, ivOutliers) else (ivOutliers, ptPlan)
      val fbJoin = Join(fbLeft, fbRight, Inner, Some(cond), hint)
      fbJoin.setTagValue(BinRangeJoinRule.NoRebin, true)
      val fallback = Project(j.output, fbJoin)
      org.apache.spark.sql.catalyst.plans.logical.Union(Seq(binned, fallback))
    }
  }
}
