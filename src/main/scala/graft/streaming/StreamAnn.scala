package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Streaming ANN index maintenance — the shared assignment kernel behind
  * the batch gate (`q_knn_incr_assign`) and its streaming twin
  * (`q_knn_stream_assign`): new vectors are slotted into a FROZEN coarse
  * centroid index with no retraining pass, the per-batch shape an
  * embedding-ingest pipeline runs at every micro-batch.
  *
  * Scale shape: the index is O(cells × dims) and broadcast; assignment is
  * a narrow broadcast argmax (hash-aggregable `graft_min_k`) over only the
  * incoming batch — history is never re-touched, so per-batch cost is
  * proportional to batch size at any corpus scale. Exactly-once replay is
  * free because assignment is a pure function of (batch, frozen index).
  */
object StreamAnn {

  /** Frozen per-label centroids from a historic slice, with the IVF
    * family's round(6)+float-truncate cross-engine parity discipline
    * (both engines sum doubles in different orders; the round+truncate
    * re-synchronizes the codebook bit-for-bit). */
  def labelCentroids(hist: DataFrame): DataFrame =
    hist
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("label", "pos")
      .agg(round(avg(col("v").cast("double")), 6).as("m"))
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("label").as("cent_id"),
        transform(col("pm"), p => p.getField("m").cast("float")).as("c_embedding"))

  /** Assign a batch of (vec_id, label, embedding) rows to their nearest
    * frozen centroid; emits the drift-audit `matches_label` column a
    * pipeline alerts on (sagging agreement = the frozen codebook no
    * longer fits the incoming distribution, time to retrain). */
  def assign(batch: DataFrame, centroids: DataFrame): DataFrame =
    batch.crossJoin(broadcast(centroids))
      .withColumn("csim", GraftFunctions.cosine(col("c_embedding"), col("embedding")))
      .groupBy("vec_id")
      // hash-aggregable argmax (graft_min_k over (-sim, id); the max_by
      // struct-ordering formulation planned SortAggregate — see
      // operators.Similarity.ivfAssign): min over (-csim, cent_id) ≡
      // max over (csim desc, cent_id asc), winner's csim carried along
      .agg(
        any_value(col("label")).as("label"),
        // null/NaN-masked candidate (shared GraftFunctions.minKCandidate
        // convention): a masked element is skipped by the aggregate,
        // matching max_by's skip-null-ordering-key semantics
        GraftFunctions.minK(
          GraftFunctions.minKCandidate(col("csim"), struct(
            (-col("csim")).as("neg"), col("cent_id"), col("csim"))), 1).as("am"))
      .withColumn("best", col("am").getItem(0))
      .select(col("vec_id"), col("label"),
        col("best.cent_id").as("assigned_cell"),
        round(col("best.csim"), 4).as("cosine"),
        when(col("label") === col("best.cent_id"), 1).otherwise(0).as("matches_label"))
}
