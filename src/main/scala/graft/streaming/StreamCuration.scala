package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Portable
import graft.operators.TextAnalysis

/** Streaming corpus curation — the batch quality gate + exact dedup +
  * per-source audit run as ONE incremental pipeline on a live document
  * feed. The same expressions the batch gates use (`q_corpus_pipeline`'s
  * length window and stopword-ratio floor, `q_dedup_exact`'s normalized
  * fingerprint) are applied per micro-batch, so a corpus ingested live is
  * curated by exactly the rules the offline sweep would apply.
  *
  * Scale shape: the quality gate is a stateless narrow filter (pushed
  * into the scan of each micro-batch); dedup state is one 128-bit key per
  * distinct surviving document inside the watermark horizon — bounded by
  * arrival rate × horizon, never corpus size; the audit is a watermarked
  * tumbling-window aggregate emitting one row per (window, source) on
  * watermark close.
  */
object StreamCuration {

  /** Quality gate + exact dedup. Expects `text` (string) and `ts`
    * (event-time timestamp); other columns pass through. Append mode:
    * survivors are emitted on first arrival. */
  def curate(docs: DataFrame, horizon: String = "10 seconds"): DataFrame = {
    val nWords = TextAnalysis.wordCountFloor1(col("text"))
    val nStop = TextAnalysis.stopCount(col("text"))
    docs
      .filter(length(col("text")).between(50, 10000))
      .filter(nStop.cast("double") / nWords >= 0.05)
      .transform(StreamDedup(_, horizon))
  }

  /** [[curate]] with pipeline telemetry: named `observe` nodes count rows
    * and characters entering the gate and rows surviving it, surfaced per
    * micro-batch in `StreamingQueryProgress.observedMetrics` (and usable
    * identically on a batch DataFrame via `Observation`). Telemetry rides
    * the existing pass — accumulator-backed, zero extra scans or shuffles
    * — which is the only affordable way to count a 100 TB pipeline's
    * drop rate. */
  def curateObserved(docs: DataFrame, horizon: String = "10 seconds"): DataFrame =
    curate(
      docs.observe("curation_in",
        count(lit(1)).as("rows_in"),
        sum(length(col("text"))).as("chars_in")),
      horizon)
      .observe("curation_kept", count(lit(1)).as("rows_kept"))

  /** Model-based filtering on a live stream — the batch-train →
    * stream-apply production shape: a token→LLR model trained OFFLINE by
    * [[graft.operators.TextAnalysis.qNbSourceScore]]'s aggregate (or any
    * (tok, llr) table) scores each streaming document as the sum of its
    * tokens' ratios. The model is a STATIC frame broadcast into each
    * micro-batch's join, so the stream side never shuffles for the model
    * and the per-doc sum aggregates within the batch scope (stateless —
    * a document is scored once, on arrival).
    *
    * Apply INSIDE `foreachBatch` (the micro-batch scope, like
    * [[StreamingStats.batchStats]]): per-doc aggregation on an unbounded
    * stream would demand watermarked state for rows that are in fact
    * complete on arrival. Expects a `doc_id` key and `text`.
    *
    * Returns (original columns..., n_scored_tokens, nb_score, is_oov,
    * keep). Rows whose tokens all miss the vocabulary score 0.0, carry
    * `is_oov = true`, and KEEP — the model has no evidence about them, and
    * a cold-start stream must not silently lose out-of-vocabulary
    * documents. In-vocabulary rows keep iff `nb_score > threshold`. A
    * consumer that wants the strict gate filters `keep && !is_oov`; one
    * that wants to quarantine cold-start docs routes on `is_oov`. */
  def scoreWithModel(
      docs: DataFrame,
      model: DataFrame, // (tok: String, llr: Double)
      threshold: Double = 0.0): DataFrame = {
    val toks = docs
      .withColumn("tok", explode(graft.functions.Portable.words(col("text"))))
    val scored = toks
      .join(broadcast(model), Seq("tok"), "left")
      .groupBy("doc_id")
      .agg(
        first(struct(docs.columns.filter(_ != "doc_id").map(col): _*)).as("__doc"),
        count(col("llr")).as("n_scored_tokens"),
        coalesce(sum(col("llr")), lit(0.0)).as("nb_score"))
    scored.select(
      (col("doc_id") +:
        docs.columns.filter(_ != "doc_id").map(c => col(s"__doc.$c")) :+
        col("n_scored_tokens") :+ col("nb_score") :+
        (col("n_scored_tokens") === 0L).as("is_oov") :+
        (col("n_scored_tokens") === 0L || col("nb_score") > threshold).as("keep")): _*)
  }

  /** Per-source tumbling-window audit of a curated stream: kept docs and
    * kept tokens per (window, source) — the dataset-card counters,
    * emitted incrementally. Chains a second stateful operator after the
    * dedup; the watermark set by [[curate]] PROPAGATES here (redefining
    * it on the same column is disallowed once a stateful operator sits
    * upstream), so the input must already be watermarked. */
  def audit(curated: DataFrame, windowLen: String = "5 seconds"): DataFrame =
    curated
      .groupBy(window(col("ts"), windowLen), col("source"))
      .agg(
        count(lit(1)).as("kept_docs"),
        sum(Portable.regexpCount(col("text"), TextAnalysis.TokenPat))
          .as("kept_tokens"))
}
