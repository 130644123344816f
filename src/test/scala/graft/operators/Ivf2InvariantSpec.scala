package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Structural invariants of the two-level IVF index — properties the
  * 5-query oracle can't see. A regression in any of these (a vector
  * escaping its super cell, a super cell losing all leaves, an
  * unbalanced seed selection) silently degrades recall long before it
  * breaks a hash gate. */
class Ivf2InvariantSpec extends SparkSpec {

  private lazy val (topSeeds, refined, finalAssign) =
    Similarity.ivf2Index(spark, sf)

  private lazy val n = Tables.embeddings(spark, sf).count()
  private lazy val tops = topSeeds.count()

  test("every vector is assigned to exactly one leaf of its own super cell") {
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

  test("every populated super cell owns at least one leaf; total leaves bounded by tops × subs") {
    // ground truth for "populated": the super cells that actually hold
    // vectors after routing (a seed whose vectors all tie-broke into a
    // sibling cell — possible with duplicate/parallel embeddings — owns
    // nothing and legitimately has no leaves)
    val populatedCells = finalAssign.select("top").distinct().count()
    val topsWithLeaves = refined.select("l_top").distinct().count()
    assert(topsWithLeaves === populatedCells,
      s"$topsWithLeaves cells own leaves but $populatedCells cells hold vectors")
    assert(populatedCells >= 1 && populatedCells <= tops)
    // sizing: each cell seeds at most `subs` leaves (subs = ceil(√n / k1),
    // recomputed here the same way), so the hard ceiling is tops × subs
    val leavesTarget = math.max(1L, math.floor(math.sqrt(n.toDouble)).toLong)
    val k1 = math.max(1L, math.floor(math.sqrt(leavesTarget.toDouble)).toLong)
    val subs = (leavesTarget + k1 - 1) / k1
    val leafCells = refined.count()
    assert(leafCells >= populatedCells && leafCells <= tops * subs,
      s"$leafCells leaves outside [$populatedCells, ${tops * subs}] " +
        s"for $tops super cells, subs=$subs")
  }

  test("populated leaves partition the corpus and cover every super cell") {
    val bySize = finalAssign.groupBy("leaf").count()
    // partition: sizes sum to n (no vector lost or double-assigned)
    assert(bySize.agg(sum("count")).head().getLong(0) === n)
    // every populated leaf is a refined leaf (no phantom assignments)
    assert(bySize.join(refined.select("leaf"), Seq("leaf"), "left_anti").count() === 0)
    // every POPULATED super cell keeps ≥1 populated leaf after the final
    // reassignment (its members must land somewhere within the cell)
    val populatedCells = finalAssign.select("top").distinct().count()
    val populatedTops = bySize.join(refined.select("leaf", "l_top"), "leaf")
      .select("l_top").distinct().count()
    assert(populatedTops === populatedCells,
      s"only $populatedTops of $populatedCells populated super cells kept members")
    // and no single leaf swallowed the corpus (the degenerate index that
    // would make every probe a full scan)
    val maxLeaf = bySize.agg(max("count")).head().getLong(0)
    assert(tops == 1L || maxLeaf < n,
      s"one leaf holds all $n vectors — the index degenerated to a single bucket")
  }

  test("build plan is Window/Sort-free (reservoir sub-seed selection)") {
    // checkpoint=false keeps the FULL build lineage in one plan; the
    // reservoir swap's whole point is that NO build stage shuffles every
    // row to sort whole super cells in single tasks — a Window or Sort
    // node reappearing here is that regression. ("Sort [" matches the
    // exec node's argument list; array_sort/max_by expressions don't.)
    val (_, _, fa) = Similarity.ivf2Index(spark, sf, checkpoint = false)
    val plan = fa.queryExecution.executedPlan.toString
    Seq("Window", "WindowGroupLimit", "Sort [").foreach { node =>
      assert(!plan.contains(node),
        s"ivf2 build plan regressed to a $node node:\n$plan")
    }
  }
}
