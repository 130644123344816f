package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Golden-pins the LSH geometry auto-sizer against SCALE.md's round-11
  * MEASURED recall table — the bits ∝ log n rule as code. The anchors
  * are the empirical rows, not a re-derivation: if the formula drifts,
  * it drifts away from measurements, and this suite says so. */
class LshGeometrySpec extends AnyFunSuite {

  test("measured anchors: 8 bits at the 2k corpus, 12 bits at the 10x corpus") {
    // sf0.1 = 2,000 vectors: measured occupancy 7.8 at 8 bits (< cap),
    // recall 0.600 — the geometry's own collision recall, cap dormant
    assert(Similarity.lshGeometry(2000L) === 8)
    // 10x = 20,000 vectors: stock 8 bits measured 0.333 recall
    // (occupancy 5x cap); 11-12 bits measured 1.000 — the sizer picks 12
    // (occupancy 4.9, inside half-cap headroom)
    assert(Similarity.lshGeometry(20000L) === 12)
  }

  test("occupancy bound: sized geometry keeps n / 2^bits at or under half the cap") {
    // the half-cap target is the design contract: the reservoir stays
    // dormant with 2x headroom for skewed buckets
    for (n <- Seq(5000L, 20000L, 100000L, 2000000L, 1000000000L)) {
      val bits = Similarity.lshGeometry(n)
      val occupancy = n.toDouble / (1L << bits)
      assert(occupancy <= 8.0 + 1e-9,
        s"n=$n bits=$bits occupancy=$occupancy exceeds half-cap 8")
      // and not over-sized: one fewer bit would break the bound (except
      // where the registry-geometry floor binds)
      if (bits > 8)
        assert(n.toDouble / (1L << (bits - 1)) > 8.0,
          s"n=$n bits=$bits over-sized: bits-1 would also satisfy the bound")
    }
  }

  test("a decade of corpus growth costs ceil(log2 10) = 3-4 bits") {
    val deltas = Seq(2000L, 20000L, 200000L, 2000000L)
      .map(Similarity.lshGeometry(_)).sliding(2).map(p => p(1) - p(0)).toSeq
    // first step is 4 (the 8-bit floor absorbs part of the 2k sizing);
    // steady state is alternating 3/4 — log2(10) ≈ 3.32 per decade
    assert(deltas.forall(d => d >= 3 && d <= 4), s"per-decade bit growth: $deltas")
  }

  test("floor: never sizes below the registry geometry") {
    for (n <- Seq(1L, 10L, 100L, 2000L))
      assert(Similarity.lshGeometry(n) === 8, s"floor violated at n=$n")
  }

  test("cap parameter shifts the target: doubling cap saves one bit") {
    val n = 1000000L
    assert(Similarity.lshGeometry(n, cap = 32) === Similarity.lshGeometry(n, cap = 16) - 1)
  }
}
