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
    * count (2^n - 1). Iterative with an explicit stack — executor threads
    * shouldn't risk deep recursion. */
  def solve(n: Int): Long = {
    require(n >= 0 && n <= 40, s"hanoi($n) out of range")
    // frames: (discs, from, via, to, phase)
    var moves = 0L
    var stack = List((n, 0, 1, 2, 0))
    while (stack.nonEmpty) {
      val (d, from, via, to, phase) = stack.head
      stack = stack.tail
      if (d == 1) moves += 1
      else if (d > 0) phase match {
        case 0 =>
          stack = (d - 1, from, to, via, 0) :: (d, from, via, to, 1) :: stack
        case 1 =>
          moves += 1 // move disc d from `from` to `to`
          stack = (d - 1, via, from, to, 0) :: stack
      }
    }
    moves
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
}
