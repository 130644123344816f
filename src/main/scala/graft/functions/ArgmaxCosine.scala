package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expression: nearest-centroid assignment as a SINGLE
  * codegen'd map — `graft_argmax_cosine(vec, cents, ids)` → the `ids[j]`
  * of the centroid with the highest cosine similarity to `vec`, ties to
  * the EARLIEST entry (callers pass `ids` ascending, so ties break to
  * the smallest centroid id — the IVF family's global tie rule).
  *
  * This is the row-explosion eliminator for the coarse-quantizer
  * assignment: the previous `crossJoin(broadcast(cents))` +
  * `graft_min_k` argmax materializes n×√n candidate ROWS and pushes
  * every one through an interpreted TypedImperativeAggregate update —
  * at the 1000× corpus (2 M vectors × 1414 cells) that was 2.8 G rows
  * per Lloyd pass and the dominant cost of every IVF build (SCALE.md
  * Round 16; four such passes in the flat build). Here the plan stays
  * ONE ROW PER VECTOR: the centroid matrix rides the expression as a
  * plan literal (O(√n·dims) — the same collected-plan-parameter class
  * as the persisted serves' probed-cell IN-filters; ~0.4 MB at 2 M
  * vectors, ~8 MB at 10^9 — at which point a deployment would move it
  * to a broadcast-backed variant) and the argmax is a fused loop inside
  * whole-stage codegen. No exchange, no aggregate, no candidate rows.
  *
  * Bit parity: per centroid the cosine is the SAME ascending-index
  * dot/norm accumulation as [[FloatCosine]] (and the DuckDB oracle's
  * `list_cosine_similarity`), the comparison is strict `>` over entries
  * in ascending-id order (≡ `min_k(struct(-csim, cent_id))`), and NaN
  * similarities are skipped exactly as [[GraftFunctions.minKCandidate]]
  * masks them (all-NaN ⇒ NULL). Pinned by ArgmaxCosineSpec's
  * exact-equality property against the crossJoin+min_k formulation,
  * including forced ties, and by the unchanged IVF oracle gates. */
case class ArgmaxCosine(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = first.dataType match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    val centsOk = second.dataType match {
      case ArrayType(ArrayType(FloatType, _), _) => true
      case _                                     => false
    }
    val idsOk = third.dataType match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }
    if (vecOk && centsOk && idsOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<FLOAT>, ARRAY<ARRAY<FLOAT>>, ARRAY<BIGINT>), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_argmax_cosine"

  override def nullSafeEval(v: Any, c: Any, i: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val cents = c.asInstanceOf[ArrayData]
    val ids = i.asInstanceOf[ArrayData]
    val k = math.min(cents.numElements(), ids.numElements())
    var best = Double.NegativeInfinity
    var bestId: Any = null
    var j = 0
    while (j < k) {
      val cv = cents.getArray(j)
      val n = math.min(vec.numElements(), cv.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var p = 0
      while (p < n) {
        val x = vec.getFloat(p).toDouble
        val y = cv.getFloat(p).toDouble
        dot += x * y; na += x * x; nb += y * y
        p += 1
      }
      val sim = dot / (math.sqrt(na) * math.sqrt(nb))
      // strict >: ascending-id iteration keeps the earliest (smallest id)
      // on ties; NaN fails every comparison, so all-NaN yields NULL
      if (sim > best) { best = sim; bestId = ids.getLong(j) }
      j += 1
    }
    bestId
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val code = nullSafeCodeGen(ctx, ev, (v, c, i) => {
      val k = ctx.freshName("k")
      val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      val n = ctx.freshName("n")
      val cv = ctx.freshName("cv")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val sim = ctx.freshName("sim")
      val best = ctx.freshName("best")
      val found = ctx.freshName("found")
      s"""
         |int $k = java.lang.Math.min($c.numElements(), $i.numElements());
         |double $best = java.lang.Double.NEGATIVE_INFINITY;
         |boolean $found = false;
         |for (int $j = 0; $j < $k; $j++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $cv = $c.getArray($j);
         |  int $n = java.lang.Math.min($v.numElements(), $cv.numElements());
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $p = 0; $p < $n; $p++) {
         |    double x = (double) $v.getFloat($p);
         |    double y = (double) $cv.getFloat($p);
         |    $dot += x * y; $na += x * x; $nb += y * y;
         |  }
         |  double $sim = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  if ($sim > $best) { $best = $sim; ${ev.value} = $i.getLong($j); $found = true; }
         |}
         |if (!$found) { ${ev.isNull} = true; }
       """.stripMargin
    })
    code
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
