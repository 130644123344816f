package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** Scan runtime for [[TokenStats]]: BOTH token-family counts of a
  * document in ONE regex-free linear walk, no match arrays, no split
  * arrays, no Matcher machinery. Called from generated code. */
object TokenStatsUtil {

  // java.util.regex \s — ASCII only by default, which is also RE2's \s
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
  private def isLetter(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
  private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'

  /** (bpeTokens << 32) | words, where
    *  - bpeTokens ≡ the match count of `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]`
    *    (letter runs, digit runs, one per other non-ws CODE POINT — the
    *    class matches a full surrogate pair as one token, like
    *    supplementary-aware java.util.regex);
    *  - words ≡ `size(split(trim(s), "\s+"))` under Spark semantics:
    *    trim strips ' ' only, split keeps leading/trailing empty
    *    elements (default limit -1), so the count is (maximal ws runs
    *    inside the space-trimmed string) + 1, and "" → 1. */
  def pack(input: Object): Long = {
    val s = input.toString
    val n = s.length
    var tokens = 0L
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (isWs(c)) i += 1
      else if (isLetter(c)) {
        tokens += 1; i += 1
        while (i < n && isLetter(s.charAt(i))) i += 1
      } else if (isDigit(c)) {
        tokens += 1; i += 1
        while (i < n && isDigit(s.charAt(i))) i += 1
      } else {
        tokens += 1
        i += Character.charCount(s.codePointAt(i))
      }
    }
    var lo = 0
    var hi = n
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    var words = 1L // k whitespace runs split k+1 elements; "" → [""]
    var inWs = false
    var j = lo
    while (j < hi) {
      val ws = isWs(s.charAt(j))
      if (ws && !inWs) words += 1
      inWs = ws
      j += 1
    }
    (tokens << 32) | words
  }
}

/** Native fused tokenizer statistics: `graft_token_stats(text)` → BIGINT
  * packing the BPE-ish token count (high 32 bits) and the
  * whitespace-word count (low 32 bits) of one document.
  *
  * Value-identical to the pair it replaces on the hot path —
  * `graft_regexp_count(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')` and
  * `size(split(trim(text), "\s+"))` — but ONE allocation-free character
  * scan instead of a regex engine walk PLUS a split that materializes
  * every word as a String just to take the array's length. The token
  * classes are fixed (they ARE the tokenizer), so the scan needs no
  * pattern compilation at all. `q_tok_fertility` — the corpus-sized
  * token accounting table and the registry's worst 1000× constant —
  * projects this once per row and unpacks both counts with two bitwise
  * column ops. The DuckDB oracle keeps its regex formulation; swapping
  * the kernel in changes no gate value (pinned by TokenStatsSpec's
  * randomized equivalence and the driver hash gate).
  *
  * Null semantics: null-in → null-out, like both replaced idioms. */
case class TokenStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_token_stats"

  override def nullSafeEval(input: Any): Any =
    TokenStatsUtil.pack(input.asInstanceOf[Object])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenStatsUtil.pack($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
