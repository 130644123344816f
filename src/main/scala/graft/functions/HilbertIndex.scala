package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index of a (x, y) cell in a 2^16 × 2^16 grid — the
  * stronger-locality alternative to the Z-order interleave for write-side
  * data layout: consecutive Hilbert indices are always grid neighbors
  * (|Δx| + |Δy| = 1), where the Z curve makes 2^k-sized jumps at tile
  * boundaries, so contiguous file ranges cover tighter regions on
  * average.
  *
  * The classic iterative rotate-and-accumulate formulation; a loop with
  * carried state cannot be expressed as a Column tree, so this is a
  * native BinaryExpression with a tight codegen'd loop (same pattern as
  * [[FloatCosine]]). Inputs are lane-normalized longs in [0, 65535] —
  * out-of-range bits are masked, not errors, matching the zkey lanes. */
case class HilbertIndex(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two BIGINT arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert"

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertIndex.index(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val s = ctx.freshName("s")
      val t = ctx.freshName("t")
      val d = ctx.freshName("d")
      s"""
         |long $x = $a & 65535L, $y = $b & 65535L, $d = 0L;
         |for (long $s = 32768L; $s > 0L; $s >>= 1) {
         |  long $rx = (($x & $s) > 0L) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0L) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = $s - 1L - $x; $y = $s - 1L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  /** Interpreted twin of the codegen loop (shared reference for specs). */
  def index(xIn: Long, yIn: Long): Long = {
    var x = xIn & 65535L; var y = yIn & 65535L
    var d = 0L
    var s = 32768L
    while (s > 0L) {
      val rx = if ((x & s) > 0L) 1L else 0L
      val ry = if ((y & s) > 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1L - x; y = s - 1L - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse (index → cell), for bijection/adjacency specs. */
  def cell(dIn: Long): (Long, Long) = {
    var x = 0L; var y = 0L
    var t = dIn
    var s = 1L
    while (s < 65536L) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1L - x; y = s - 1L - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }
}
