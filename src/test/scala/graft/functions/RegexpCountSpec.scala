package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Value-parity of the native match counter against the
  * `size(regexp_extract_all(...))` formulation it replaces — which is the
  * literal translation of the DuckDB oracle idiom
  * `len(regexp_extract_all(...))`. A divergence here would silently break
  * every token-count / stopword-ratio / langid oracle gate at once. */
class RegexpCountSpec extends SparkSpec {

  // every pattern the operators actually count with, plus generic shapes
  private val patterns = Seq(
    graft.operators.TextAnalysis.TokenPat,
    "\\b" + graft.operators.TextAnalysis.Stop + "\\b",
    "[^A-Za-z0-9\\s]", "\\S", "#|\\.\\.\\.", "\\S*[A-Za-z]\\S*",
    "[\\x{4e00}-\\x{9fff}]", "a+", "\\d{2,}")

  private def adversarial: Seq[String] =
    Seq("", " ", "a", "hello world", "the a an and of", "é — ümlaut",
      "日本語テキスト 漢字", "🎉 emoji #tag ... 1.5", "x" * 5000,
      "tab\tnewline\nmixed 123 456", "aaa", "aaaa", "....", "##")

  test("RegexpCount equals size(regexp_extract_all) on adversarial inputs, every pattern") {
    import spark.implicits._
    val df = adversarial.toDF("s")
    patterns.foreach { p =>
      val bad = df.select(col("s"),
          Portable.regexpCount(col("s"), p).as("fast"),
          size(regexp_extract_all(col("s"), lit(p), lit(0))).as("ref"))
        .filter(col("fast") =!= col("ref"))
        .take(3) // one action: the rows double as the failure message
      assert(bad.isEmpty, s"pattern <$p> diverged: ${bad.mkString(", ")}")
    }
  }

  test("RegexpCount equals size(regexp_extract_all) over the documents corpus") {
    val docs = Tables.documents(spark, sf)
    patterns.take(4).foreach { p =>
      val bad = docs.select(
          Portable.regexpCount(col("text"), p).as("fast"),
          size(regexp_extract_all(col("text"), lit(p), lit(0))).as("ref"))
        .filter(col("fast") =!= col("ref"))
      assert(bad.isEmpty, s"pattern <$p> diverged on documents")
    }
  }

  test("SQL registration: graft_regexp_count callable from plain SQL") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq("the cat and the hat").toDF("s").createOrReplaceTempView("rc_probe")
    val n = spark.sql(
      "SELECT graft_regexp_count(s, '\\\\bthe\\\\b') AS n FROM rc_probe")
      .head().getInt(0)
    assert(n === 2)
    val err = intercept[Exception] {
      spark.sql("SELECT graft_regexp_count(s, s) FROM rc_probe").collect()
    }
    assert(err.getMessage.contains("literal"),
      s"non-literal pattern should fail clearly, got: ${err.getMessage}")
  }

  test("interpreted path: direct Expression.eval (codegen is covered by the DataFrame tests above)") {
    // direct eval exercises nullSafeEval, the interpreted path; the
    // whole-stage-codegen path runs in the DataFrame-level parity tests
    import org.apache.spark.unsafe.types.UTF8String
    val e = RegexpCount(
      org.apache.spark.sql.catalyst.expressions.Literal(
        UTF8String.fromString("the cat and the hat"),
        org.apache.spark.sql.types.StringType),
      "\\bthe\\b")
    assert(e.eval(null) === 2)
    assert(RegexpCount(
      org.apache.spark.sql.catalyst.expressions.Literal(
        UTF8String.fromString(""),
        org.apache.spark.sql.types.StringType), "x").eval(null) === 0)
  }
}
