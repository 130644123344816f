package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-Min Sketch maintained as a STATEFUL streaming aggregation — the
  * incremental twin of `q_heavy_hitters_cms`: each micro-batch's token
  * occurrences increment the same depth × width counter cells, and
  * because the counters are pure SUMS, Structured Streaming's stateful
  * aggregation IS the sketch merge — no custom state function, no
  * order sensitivity, and the streamed sketch is bit-identical to the
  * batch one over the same rows (StreamCmsSpec).
  *
  * This is the bounded-state counterpoint to the watermark-dedup soak:
  * a token-DISTINCT streaming aggregate's state grows with vocabulary
  * (unbounded on open text), while the CMS state is ≤ depth × width =
  * 4096 rows FOREVER — the shape that lets a 100 TB/day stream keep a
  * live frequency estimate in one executor's memory. Point queries
  * (est = min over the d cells of a token) run against the latest
  * completed snapshot exactly like the batch gate's broadcast join.
  */
object StreamCms {

  /** The streaming sketch: (i, cell, c) counter rows, one stateful
    * hash aggregation over the token × depth-coordinate fan-out.
    * `docs` is a streaming DataFrame with a `text` column; use
    * complete/update output mode downstream (the state is the sketch). */
  def sketch(docs: DataFrame): DataFrame =
    docs
      .select(explode(graft.functions.Portable.words(col("text"))).as("tok"))
      .select(explode(graft.operators.Features.cmsCoords(col("tok"))).as("ic"))
      .groupBy(col("ic.i").as("i"), col("ic.cell").as("cell"))
      .agg(count(lit(1)).as("c"))
}
