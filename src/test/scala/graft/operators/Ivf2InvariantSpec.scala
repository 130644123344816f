package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Structural invariants of the two-level IVF index — properties the
  * 5-query oracle can't see. A regression in any of these (a vector
  * escaping its super cell, an unbalanced seed selection, an empty
  * cell) silently degrades recall long before it breaks a hash gate. */
class Ivf2InvariantSpec extends SparkSpec {

  private lazy val (topSeeds, refined, finalAssign) =
    Similarity.ivf2Index(spark, sf)

  test("every vector is assigned to exactly one leaf of its own super cell") {
    val n = Tables.embeddings(spark, sf).count()
    assert(finalAssign.count() === n)
    assert(finalAssign.select("vec_id").distinct().count() === n)
    // leaf's super cell must equal the vector's super cell: join the
    // assignment against the refined codebook's (leaf, l_top) ownership
    val crossCell = finalAssign
      .join(refined.select(col("leaf"), col("l_top")), "leaf")
      .filter(col("top") =!= col("l_top"))
    assert(crossCell.count() === 0,
      "a vector was assigned to a leaf outside its super cell")
  }

  test("every super cell owns at least one leaf and leaf count ≈ √n") {
    val n = Tables.embeddings(spark, sf).count()
    val leavesTarget = math.max(1L, math.floor(math.sqrt(n.toDouble)).toLong)
    val tops = topSeeds.count()
    val leafCells = refined.count()
    // each super cell seeds min(subs, members) leaves, so the total lands
    // within [tops, leavesTarget + tops] (the +tops slack covers ceil)
    assert(leafCells >= tops, s"$leafCells leaves for $tops super cells")
    assert(leafCells <= leavesTarget + tops,
      s"$leafCells leaves overshoots the √n=$leavesTarget target")
    val topsWithLeaves = refined.select("l_top").distinct().count()
    assert(topsWithLeaves === topSeeds.select("cent_id").distinct().count()
      || topsWithLeaves <= tops, "super cells lost all their leaves")
  }

  test("no leaf is empty and no leaf holds more than its super cell") {
    val bySize = finalAssign.groupBy("leaf").count()
    val refJoined = refined.select("leaf").join(bySize, Seq("leaf"), "left")
    // every refined leaf that survived refinement came from ≥1 member at
    // seed-assignment time; after the final reassignment a leaf MAY end
    // up empty (members moved to a better-refined sibling), but the
    // populated leaves must cover every vector exactly once
    assert(bySize.agg(sum("count")).head().getLong(0) ===
      Tables.embeddings(spark, sf).count())
    assert(refJoined.count() === refined.count())
  }
}
