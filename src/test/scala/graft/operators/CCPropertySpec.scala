package graft.operators

import graft.SparkSpec

/** Property check: distributed min-label propagation must agree with a
  * driver-side union-find on arbitrary random graphs — not just the
  * clique-ish shapes dedup produces. Seeded, so failures reproduce. */
class CCPropertySpec extends SparkSpec {

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      // larger root points at smaller root, so every tree root is the
      // component minimum — the same representative the engine picks
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  test("matches union-find on seeded random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260812L)
    (1 to 12).foreach { trial =>
      val n = 1 + rnd.nextInt(24)
      val m = rnd.nextInt(31)
      val edges = Seq.fill(m) {
        val a = rnd.nextInt(n); val b = rnd.nextInt(n)
        (math.min(a, b).toLong, math.max(a, b).toLong)
      }.filter(e => e._1 != e._2)
      val nodes = (0 until n).map(_.toLong).toDF("doc_id")
      val pairs = edges.toDF("doc_a", "doc_b")
      val got = Dedup.connectedComponents(nodes, pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === unionFind(n, edges), s"trial $trial: n=$n edges=$edges")
    }
  }
}
