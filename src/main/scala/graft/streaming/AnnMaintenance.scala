package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The drift loop CLOSED: detect → decide → act, per micro-batch.
  * [[StreamAnn.assign]] DETECTS (the `matches_label` agreement audit),
  * this policy DECIDES (agreement below the floor ⇒ the frozen codebook
  * no longer fits the incoming distribution), and
  * [[StreamAnnRefresh.refresh]] ACTS (reservoir retrain + reassignment
  * + atomic generation cut-over). Without the decide step an operator
  * reads dashboards; with it the pipeline is self-healing at a bounded
  * cadence — refresh cost is paid only when drift actually happens,
  * never per batch.
  *
  * Scale shape per step: the landing + assignment are the ingest's own
  * costs; the DECIDE adds one scalar aggregate over the batch's
  * assignment (map-side combined); the ACT re-touches history exactly
  * once per genuine drift event (the refresh contract). */
object AnnMaintenance {

  /** One ingest step under the policy: land `batch`, assign it against
    * the CURRENT committed codebook, and refresh iff the batch's label
    * agreement sags below `minAgreement`. Returns (assignment of this
    * batch against the codebook it arrived under, whether a refresh
    * fired). The first batch ever bootstraps the index (a refresh by
    * definition — there is nothing to serve against yet). */
  def step(batch: DataFrame, corpusDir: String, idxDir: String,
      batchId: Long, minAgreement: Double = 0.5,
      sampleSize: Int = StreamAnnRefresh.DefaultSampleSize): (DataFrame, Boolean) = {
    val s = batch.sparkSession
    StreamShardRouter.landBatch(batch, corpusDir, batchId)
    val bootstrap = DeltaCompact
      .readManifest(idxDir, s.sparkContext.hadoopConfiguration).isEmpty
    if (bootstrap) {
      StreamAnnRefresh.refresh(s, corpusDir, idxDir, sampleSize)
      val cents = StreamAnnRefresh.currentCodebook(s, idxDir)
      return (StreamAnn.assign(batch, cents).localCheckpoint(), true)
    }
    val cents = StreamAnnRefresh.currentCodebook(s, idxDir).localCheckpoint()
    // the batch's assignment against the codebook it ARRIVED under — the
    // audit the decision reads, materialized so the refresh can't
    // retroactively change it
    val assigned = StreamAnn.assign(batch, cents).localCheckpoint()
    // empty micro-batches are routine under streaming triggers: avg over
    // zero rows is null, and an empty batch is EVIDENCE OF NOTHING — it
    // must neither crash the ingest nor count as drift
    val row = assigned.agg(avg(col("matches_label").cast("double"))).head()
    val drifted = !row.isNullAt(0) && row.getDouble(0) < minAgreement
    if (drifted) StreamAnnRefresh.refresh(s, corpusDir, idxDir, sampleSize)
    (assigned, drifted)
  }
}
