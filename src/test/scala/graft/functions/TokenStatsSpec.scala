package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[TokenStats]] must be VALUE-IDENTICAL to the two idioms it fuses:
  * the BPE-ish regex match count and Spark's
  * `size(split(trim(text), "\s+"))` — across whitespace edge shapes,
  * unicode, and surrogate pairs. The oracle SQL keeps the regex
  * formulation, so any divergence here is a silent gate break. */
class TokenStatsSpec extends SparkSpec {

  private val TokenPat = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Reference semantics via java.util.regex, exactly what the replaced
    * Spark expressions do: supplementary-aware find() walk; split with
    * limit -1 (Spark's default) on the space-only-trimmed string. */
  private def expectedTokens(s: String): Int = {
    val m = java.util.regex.Pattern.compile(TokenPat).matcher(s)
    var c = 0
    while (m.find()) c += 1
    c
  }
  private def expectedWords(s: String): Int = {
    var lo = 0; var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    java.util.regex.Pattern.compile("\\s+").split(s.substring(lo, hi), -1).length
  }
  private def unpack(p: Long): (Int, Int) = ((p >>> 32).toInt, (p & 0xFFFFFFFFL).toInt)

  test("edge shapes: empty, all-ws, mixed ws, runs, unicode, surrogates") {
    val cases = Seq(
      "", " ", "   ", "\t", "\na\n", " a ", "a", "abc", "abc123", "a1b2",
      "hello world", "a  b", "a\t\tb", "\ta b\n", "don't stop!!",
      "x...y", "3.14 + 2e5", "日本語 テスト", "héllo wörld", "ab",
      "emoji 😀 pair", "😀😁", "--", "a-b-c",
      "  leading and trailing  ", "tab\tsep\tvals", "\r\n\r\n", "1 2 3")
    cases.foreach { s =>
      val (t, w) = unpack(TokenStatsUtil.pack(s))
      assert(t === expectedTokens(s), s"tokens diverge on ${s.map(_.toInt)}")
      assert(w === expectedWords(s), s"words diverge on ${s.map(_.toInt)}")
    }
  }

  test("randomized equivalence over adversarial alphabets (seeded)") {
    val rnd = new scala.util.Random(42)
    val alphabet =
      "ab zZ09.,!?-\t\n\r\f日ßé" + "😀" // incl. a surrogate pair
    (1 to 2000).foreach { _ =>
      val len = rnd.nextInt(60)
      val sb = new StringBuilder
      var k = 0
      while (k < len) {
        val c = alphabet.charAt(rnd.nextInt(alphabet.length))
        // keep surrogate pairs paired: emit both halves together
        if (Character.isHighSurrogate(c)) { sb.append("😀"); k += 2 }
        else { sb.append(c); k += 1 }
      }
      val s = sb.toString
      val (t, w) = unpack(TokenStatsUtil.pack(s))
      assert(t === expectedTokens(s) && w === expectedWords(s),
        s"diverged on codepoints ${s.map(_.toInt).mkString(",")}")
    }
  }

  test("column path ≡ the replaced Spark expressions on the corpus, nulls included") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf).select("text")
      .unionByName(Seq(Option.empty[String]).toDF("text")) // null row
    val diff = docs
      .select(Portable.tokenStats(col("text")).as("ts"),
        Portable.regexpCount(col("text"), TokenPat).as("t0"),
        size(split(trim(col("text")), "\\s+")).as("w0"))
      .select(Portable.tokensOf(col("ts")).as("t"), col("t0"),
        Portable.wordsOf(col("ts")).as("w"), col("w0"))
      // null text: ts null → t/w null; t0 null; w0 is -1? no — under
      // default sizeOfNull=false size(null)=null, so all four are null
      .filter(!(col("t") <=> col("t0")) || !(col("w") <=> col("w0")))
    assert(diff.count() === 0, "kernel diverges from replaced idioms on the corpus")
  }
}
