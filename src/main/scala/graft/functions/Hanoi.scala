package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** The CPU-bound scalar workload: solve Tower of Hanoi for n discs and
  * report the wall-clock cost. The reference uses this as its per-element
  * "query" so that input value selects per-row CPU cost (value 7
  * sustainable, 8 ≈ 2× — O(2^n)).
  * (reference: simple-streaming-app test/Hanoi.scala:9-74, wrapper
  * SimpleStreamingApp.scala:71-80)
  *
  * The solver is a standard explicit-stack Hanoi move enumeration (public
  * algorithm), not a copy: it walks every move of the optimal solution and
  * returns the move count, so the work is Θ(2^n) real computation that the
  * JIT cannot elide.
  */
object Hanoi {

  /** Enumerate all moves of the optimal n-disc solution; returns the move
    * count (2^n - 1). Primitive recursion, ZERO allocation: the previous
    * explicit-stack version allocated a Tuple + cons cell per move, and on
    * this host allocation-heavy loops intermittently stall 10-50× on fresh
    * page faults (measured 250k×solve(7) at 0.8 s vs 15 s run-to-run; the
    * allocation-free form is stable). Depth is ≤ n ≤ 40 — safe. */
  def solve(n: Int): Long = {
    require(n >= 0 && n <= 40, s"hanoi($n) out of range")
    def go(d: Int, from: Int, via: Int, to: Int): Long =
      if (d == 0) 0L
      else go(d - 1, from, to, via) + 1L + go(d - 1, via, from, to)
    go(n, 0, 1, 2)
  }

  /** UDF: run the solver, emit elapsed milliseconds. Deterministic work,
    * non-deterministic output (timing) — mark it so Catalyst doesn't
    * collapse duplicate invocations. */
  val hanoiTimeMs: UserDefinedFunction = udf { n: Int =>
    val t0 = System.nanoTime()
    solve(n)
    (System.nanoTime() - t0) / 1000000L
  }.asNondeterministic()

  def hanoiTime(value: Column): Column = hanoiTimeMs(value)

  /** UDF: run the solver, emit its MOVE COUNT (2^n - 1) — the same Θ(2^n)
    * CPU work as [[hanoiTimeMs]] but a deterministic output, so pipelines
    * over it are value-exact against a closed-form oracle
    * (reference SimpleStreamingApp.scala:71-80 aggregates per-value stats
    * of the measured cost; the move count is the machine-independent
    * stand-in for that cost). */
  val hanoiMovesUdf: UserDefinedFunction = udf { n: Int => solve(n) }

  def hanoiMoves(value: Column): Column = hanoiMovesUdf(value)
}
