package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: the 8 per-subspace squared-L2 distances of
  * product quantization in ONE fused pass — `graft_pq_sub_dists(v, c)` →
  * `ARRAY<DOUBLE>[8]`, subspace `s` summing `(v[i]-c[i])²` over the fixed
  * 8-wide slice `[s*8, s*8+8)`.
  *
  * This replaces the `aggregate(zip_with(slice(v,…), slice(c,…), …))`
  * formulation ([[graft.operators.Similarity]]'s `pqSubDist` × 8 columns):
  * Spark's higher-order functions do NOT participate in whole-stage
  * codegen — each of the 16 slices allocates a GenericArrayData copy and
  * every lambda step walks an interpreted eval chain. Measured at the
  * 1000× corpus (2 M vectors × 16 codebook entries), that interpreted
  * path made PQ encode the single most expensive engine-side build stage
  * (2001 s; jstack samples pinned `ArrayAggregate.eval` +
  * `IndexedSeqOps.slice` as the hot frames — SCALE_LADDER.json 1000×
  * rung). The fused loop reads both unsafe arrays in place, allocates
  * only the 8-double result, and codegens into the enclosing stage.
  *
  * Accumulation is ascending-index sequential WITHIN each subspace, in
  * DOUBLE — bit-identical to the `aggregate`-based fold it replaces and
  * to the DuckDB oracle's `list_sum([(v[i]-c[i])*(v[i]-c[i]) for i in
  * range(s*8+1, s*8+9)])` comprehension, so swapping it in changes no
  * oracle result (pinned by PqSubDistsSpec's exact-equality property and
  * the unchanged `q_knn_ivf_pq` / `q_knn_pq_adc` / `q_embed_pq` gates).
  *
  * Short arrays follow `slice` semantics: a subspace reads only the
  * elements both arrays actually have (never past either length). */
case class PqSubDists(left: Expression, right: Expression)
    extends BinaryExpression {

  private val Subs = 8
  private val Width = 8

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<DOUBLE> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_pq_sub_dists"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val out = new Array[Double](Subs)
    var s = 0
    while (s < Subs) {
      var acc = 0.0
      var i = s * Width
      val end = math.min((s + 1) * Width, n)
      while (i < end) {
        val d = x.getDouble(i) - y.getDouble(i)
        acc += d * d
        i += 1
      }
      out(s) = acc
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val end = ctx.freshName("end")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double[] $out = new double[$Subs];
         |for (int $s = 0; $s < $Subs; $s++) {
         |  double $acc = 0.0;
         |  int $end = java.lang.Math.min(($s + 1) * $Width, $n);
         |  for (int $i = $s * $Width; $i < $end; $i++) {
         |    double $d = $a.getDouble($i) - $b.getDouble($i);
         |    $acc += $d * $d;
         |  }
         |  $out[$s] = $acc;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
