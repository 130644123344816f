package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Connected-component clustering: min-label propagation must converge to
  * exact components on shapes the pair-loser prune gets wrong — long
  * transitive chains — and on forests of mixed component sizes. */
class DedupClustersSpec extends SparkSpec {

  private def cc(nodes: Seq[Long], pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val n = nodes.toDF("doc_id")
    val p = pairs.toDF("doc_a", "doc_b")
    Dedup.connectedComponents(n, p)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("transitive chain collapses to one cluster (diameter > 1)") {
    // 10-node path 0-1-2-…-9: worst case for propagation rounds, and the
    // shape where "drop the pair loser" under-merges
    val got = cc(0L to 10L, (0L until 9L).map(i => (i, i + 1)))
    assert((0L to 9L).forall(got(_) == 0L))
    assert(got(10L) == 10L) // isolated node keeps its own label
  }

  test("forest of mixed components, ids out of order") {
    val got = cc(
      Seq(5L, 3L, 9L, 7L, 1L, 2L, 8L),
      Seq((5L, 9L), (9L, 3L), (7L, 8L))) // {3,5,9} {7,8} {1} {2}
    assert(got(5L) == 3L && got(9L) == 3L && got(3L) == 3L)
    assert(got(7L) == 7L && got(8L) == 7L)
    assert(got(1L) == 1L && got(2L) == 2L)
  }

  test("no pairs: every doc is its own cluster") {
    val got = cc(Seq(4L, 2L), Nil)
    assert(got === Map(4L -> 4L, 2L -> 2L))
  }

  test("end-to-end clusters refine q_dedup_near consistently at sf0.001") {
    // every pair loser must land in a cluster led by someone else; every
    // cluster representative must survive the near-dedup prune
    val clusters = Dedup.qDedupClusters.build(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val survivors = Dedup.qDedupNear.build(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val reps = clusters.values.toSet
    // representatives are cluster minima and never pair losers
    assert(reps.forall(r => clusters(r) == r))
    assert(reps.subsetOf(survivors))
    assert(clusters.nonEmpty)
  }
}
