package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.Collect
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.DataType

/** `collect_list` with a hard per-group element bound — the memory-safety
  * primitive for group-then-expand candidate generation (MinHash/SimHash
  * band buckets, shingle inverted indexes, embedding LSH buckets).
  *
  * The built-in `collect_list` materializes one array per group with no
  * bound: a pathological hot key (a stopword-ish shingle, a degenerate
  * all-identical corpus collapsing into one LSH bucket) builds the whole
  * bucket as a single in-memory array in a single task — the one shape
  * that OOMs a 100 TB run no matter how many executors it has. This
  * aggregate retains AT MOST `cap + 1` elements per group, in both the
  * partial (map-side) and merge paths, so per-group state is O(cap)
  * regardless of key skew.
  *
  * The `+ 1` is the overflow sentinel: a result of size `cap + 1` means
  * the true group was LARGER than `cap`, letting callers drop oversized
  * buckets deterministically (`size(col) BETWEEN 2 AND cap`) — the result
  * then never depends on WHICH elements survived, so capped queries stay
  * oracle-exact. Which elements are retained in an overflowing group is
  * otherwise arbitrary (like `collect_list` ordering itself).
  */
case class CollectCapped(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends Collect[mutable.ArrayBuffer[Any]] with UnaryLike[Expression] {

  require(cap > 0, s"graft_collect_capped cap must be positive, got $cap")

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty

  override protected def convertToBufferElement(value: Any): Any =
    InternalRow.copyValue(value)

  override protected lazy val bufferElementType: DataType = child.dataType

  override def update(
      buffer: mutable.ArrayBuffer[Any], input: InternalRow): mutable.ArrayBuffer[Any] = {
    if (buffer.length <= cap) {
      val value = child.eval(input)
      if (value != null) buffer += convertToBufferElement(value)
    }
    buffer
  }

  override def merge(
      buffer: mutable.ArrayBuffer[Any],
      other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    val it = other.iterator
    while (buffer.length <= cap && it.hasNext) buffer += it.next()
    buffer
  }

  override def eval(buffer: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buffer.toArray)

  override def prettyName: String = GraftFunctions.CollectCappedName

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectCapped =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectCapped =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CollectCapped =
    copy(child = newChild)
}
