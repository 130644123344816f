package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}

/** Match-count runtime for [[RegexpCount]]: one `Matcher.find()` loop,
  * no match-array materialization. Called from generated code. */
object RegexpCountUtil {
  def count(s: Object, p: java.util.regex.Pattern): Int = {
    val m = p.matcher(s.toString)
    var c = 0
    while (m.find()) c += 1
    c
  }
}

/** Native match counter: `graft_regexp_count(text)` ==
  * `size(regexp_extract_all(text, pattern, 0))` value-for-value — both
  * walk the SAME `java.util.regex` non-overlapping `find()` sequence —
  * but without building the array of match strings just to take its
  * length. The token-counting family (BPE-ish token counts, stopword /
  * punctuation ratios, corpus token totals) calls this per document on
  * the hot path; the DuckDB oracle keeps its `len(regexp_extract_all(…))`
  * formulation, so swapping it in changes no gate result.
  *
  * The pattern is a plan-time constant (compiled once per expression,
  * shipped to generated code as a reference object), which is every use
  * in this codebase.
  *
  * Null semantics: null-in → null-out, matching
  * `size(regexp_extract_all(...))` under the DEFAULT
  * `spark.sql.legacy.sizeOfNull=false` (since Spark 3.0). Under the
  * legacy flag the replaced idiom returned -1 for null input; this
  * expression intentionally does not replicate that deprecated
  * behavior. */
case class RegexpCount(child: Expression, pattern: String)
    extends UnaryExpression {

  @transient private lazy val compiled: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(pattern)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${t.simpleString}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_regexp_count"

  override def nullSafeEval(input: Any): Any =
    RegexpCountUtil.count(input.asInstanceOf[Object], compiled)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patRef = ctx.addReferenceObj("graftRegexpCountPattern", compiled,
      classOf[java.util.regex.Pattern].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.RegexpCountUtil.count($c, $patRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
