package graft.operators

import graft.SparkSpec

/** End-to-end checks of the training-data operators over sf0.001, including
  * the properties the DuckDB oracle can't express (IVF recall, LSH near-dup
  * surfacing planted duplicates).
  */
class TrainingOpsSpec extends SparkSpec {

  test("q_knn_ivf recall vs brute force is reasonable on sf0.001") {
    val brute = Similarity.qKnnBrute.build(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.qKnnIvf.build(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty)
    val recall = (brute intersect ivf).size.toDouble / brute.size
    // 0.67 with the √n-cell Lloyd-trained codebook (0.47 with the round-3
    // fixed stride seeds) — floor at 0.5 to lock the training gain in
    assert(recall >= 0.5, s"IVF recall $recall too low (ivf=${ivf.size}, brute=${brute.size})")
  }

  test("q_embed_neardup returns pairs sorted by cosine desc") {
    val rows = Similarity.qEmbedNearDup.build(spark, sf).collect()
    assert(rows.nonEmpty, "LSH bucketing produced no candidate pairs")
    val sims = rows.map(_.getDouble(2))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
  }

  test("minhash LSH surfaces a planted near-duplicate pair") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.Portable
    // Two near-identical docs (one word changed) + two unrelated ones.
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"),
      (3L, "totally different content about streaming backpressure and rates"),
      (4L, "yet another unrelated document mentioning parquet and shuffles"))
      .toDF("doc_id", "text")
    val ws = Portable.words(col("text"))
    val sh = docs.select(col("doc_id"), Portable.shingles(ws, col("text"), 3).as("sh"))
    val mh = sh.select(
      col("doc_id") +: (0 until 8).map(i => Portable.minhash(i, col("sh")).as(s"mh$i")): _*)
    val bands = mh.select(
      col("doc_id") +: (0 until 4).map(b =>
        md5(concat_ws("_", col(s"mh${2 * b}"), col(s"mh${2 * b + 1}")).cast("binary"))
          .as(s"band$b")): _*)
    val long = bands.selectExpr(
      "doc_id", "stack(4, 0, band0, 1, band1, 2, band2, 3, band3) AS (band_id, bhash)")
    val pairs = long.as("a").join(long.as("b"),
        $"a.band_id" === $"b.band_id" && $"a.bhash" === $"b.bhash" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"planted pair not found, got $pairs")
    assert(!pairs.contains((3L, 4L)), s"unrelated docs collided: $pairs")
  }

  test("langid predicts the language of clearly-marked text") {
    import spark.implicits._
    // Build a one-row documents table per language through the real query by
    // pointing at a temp dir — instead, exercise the argmax logic inline.
    val df = Seq(
      (1L, "the cat and the dog of the house is that it was for", "en"),
      (2L, "el la los de que y es en un la los", "es"),
      (3L, "le la les des et est que une dans pour", "fr"),
      (4L, "der die das und ist nicht ein mit auf den", "de"))
      .toDF("doc_id", "text", "lang")
    df.createOrReplaceTempView("unit_docs")
    val out = spark.sql(
      """SELECT doc_id, CASE WHEN s_zh > 0 THEN 'zh'
        |  WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
        |  WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
        |  WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END AS p
        |FROM (SELECT doc_id,
        |  size(regexp_extract_all(lower(text), '\\b(?:the|and|of|to|in|is|that|it|was|for)\\b', 0)) AS s_en,
        |  size(regexp_extract_all(lower(text), '\\b(?:der|die|das|und|ist|nicht|ein|mit|auf|den)\\b', 0)) AS s_de,
        |  size(regexp_extract_all(lower(text), '\\b(?:el|la|los|las|de|que|y|es|en|un)\\b', 0)) AS s_es,
        |  size(regexp_extract_all(lower(text), '\\b(?:le|la|les|des|et|est|que|une|dans|pour)\\b', 0)) AS s_fr,
        |  size(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]', 0)) AS s_zh
        |FROM unit_docs)""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "en", 2L -> "es", 3L -> "fr", 4L -> "de"))
  }
}
