package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Ascending, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.DataType

/** Native as-of join — a whole-operator Catalyst extension (logical node +
  * planner strategy + physical merge), because no built-in operator
  * expresses it directly: Spark plans "latest right row at-or-before each
  * left row" either as a correlated subquery (re-scans right per left row)
  * or via the union+window trick (carries both payloads through one window
  * sort over the merged stream).
  *
  * The dedicated physical operator is the classic streamed merge:
  *   - both sides hash-partitioned on the join key (ClusteredDistribution,
  *     so EnsureRequirements co-partitions them like a sort-merge join)
  *     and sorted by (key, time);
  *   - each partition pair merges linearly: one forward pointer into the
  *     right side, remembering the last right row per key — O(|L|+|R|)
  *     per partition, O(1) state, no buffering of either side.
  *
  * At 100 TB that is the same shuffle cost as a sort-merge join and
  * strictly less work after it (no per-row window frames, no merged-stream
  * filter pass).
  *
  * `time` may be any orderable expression — pass a struct to get
  * lexicographic tie-breaks (e.g. `struct(ts, event_id)`).
  *
  * Left rows with no qualifying right row emit null right columns
  * (left-outer semantics, matching SQL's correlated-subquery shape).
  */
object AsOfJoin {

  /** As-of join `left` to `right`: for each left row, the right row with
    * the greatest `rightTime <= leftTime` among rows sharing the join key.
    * Column-name API; rename ahead of the call if the sides share names
    * (right columns win no disambiguation — they are alias-refreshed, so
    * select by position or pre-rename). */
  def join(left: DataFrame, right: DataFrame, leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    val lp = left.queryExecution.analyzed
    // fresh exprIds on the right output: as-of joins are routinely
    // self-joins (events vs events), and a custom node gets no
    // DeduplicateRelations help from the analyzer
    val rp0 = right.queryExecution.analyzed
    val rp = Project(rp0.output.map(a => Alias(a, a.name)()), rp0)
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in [${p.output.map(_.name).mkString(", ")}]"))
    val (lk, rk) = (attr(lp, leftKey), attr(rp, rightKey))
    val (lt, rt) = (attr(lp, leftTime), attr(rp, rightTime))
    require(DataType.equalsStructurally(lk.dataType, rk.dataType, ignoreNullability = true),
      s"key types differ: ${lk.dataType} vs ${rk.dataType}")
    require(DataType.equalsStructurally(lt.dataType, rt.dataType, ignoreNullability = true),
      s"time types differ: ${lt.dataType} vs ${rt.dataType}")
    GraftShims.ofRows(spark, AsOfJoinNode(lp, rp, lk, rk, lt, rt))
  }

  /** Idempotently add the planner strategy to the session (also installed
    * by `GraftExtensions` at session build time). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        AsOfJoinStrategy +: spark.experimental.extraStrategies
}

/** Logical as-of join; output = left columns ++ right columns (right side
  * nullable — unmatched left rows emit nulls). */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override lazy val resolved: Boolean = childrenResolved &&
    Seq(leftKey, rightKey, leftTime, rightTime).forall(_.resolved)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical as-of merge join. Children arrive co-partitioned on the key
  * and sorted by (key, time); each partition pair merges with a single
  * forward pass and O(1) state. */
case class AsOfJoinExec(
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  // rows stream out in left order, one output row per left row
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val (lk, rk, lt, rt) = (leftKey, rightKey, leftTime, rightTime)
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKT = UnsafeProjection.create(Seq(lk, lt), lOut)
      val rKT = UnsafeProjection.create(Seq(rk, rt), rOut)
      val lK = UnsafeProjection.create(Seq(lk), lOut)
      val rK = UnsafeProjection.create(Seq(rk), rOut)
      val ordKT = RowOrdering.createNaturalAscendingOrdering(Seq(lk.dataType, lt.dataType))
      val ordK = RowOrdering.createNaturalAscendingOrdering(Seq(lk.dataType))
      // bind against nullable-marked right attrs: unmatched left rows pair
      // with an all-null row, and a projection bound to the children's
      // original non-nullable schema would codegen without null checks
      val outProj = UnsafeProjection.create(
        outAttrs, lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)

      new Iterator[InternalRow] {
        // shuffle/sort readers reuse row buffers, and rHead/lastMatch are
        // held across next() calls — copy right rows on read
        private def nextRight(): InternalRow =
          if (rIter.hasNext) rIter.next().copy() else null
        private var rHead: InternalRow = nextRight()
        private var lastMatch: InternalRow = _
        private var lastMatchKey: InternalRow = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lkt = lKT(l)
          while (rHead != null && ordKT.compare(rKT(rHead), lkt) <= 0) {
            // rows ahead of the pointer with smaller keys are discards;
            // same-key rows advance the remembered match (time ascending,
            // so the last one wins). SQL semantics: a null key equals
            // nothing and a null time is at-or-before nothing, so such
            // right rows are consumed but never remembered (the natural
            // row ordering would otherwise treat NULL == NULL as a match)
            val rkt = rKT(rHead)
            if (!rkt.isNullAt(0) && !rkt.isNullAt(1) &&
                ordK.compare(rK(rHead), lK(l)) == 0) {
              lastMatch = rHead
              lastMatchKey = rK(rHead).copy()
            }
            rHead = nextRight()
          }
          // a left row with a null key or null time matches nothing either
          val m =
            if (!lkt.isNullAt(0) && !lkt.isNullAt(1) &&
                lastMatch != null && ordK.compare(lastMatchKey, lK(l)) == 0) lastMatch
            else nullRight
          outProj(joined(l, m))
        }
      }
    }
  }
}
