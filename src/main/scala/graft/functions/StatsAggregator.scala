package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The reference's per-key stats fold as a typed Spark `Aggregator`:
  * one pass accumulating (count, sum, sum-of-squares), finishing to
  * (count, sum, mean, population stddev) with the same moment formula.
  * (reference: SimpleStreamingApp.scala:114-122 — `Stats.computeStats`)
  *
  * The partial/merge split is what the reference's fold could not do:
  * `reduce` runs map-side per partition, `merge` combines partials after
  * the shuffle, so the exchange carries one buffer per key per partition
  * regardless of row count. Registered via `udaf(...)` it is usable from
  * SQL; used typed it keeps Dataset[T] pipelines fully typed.
  */
object StatsAggregator {

  /** (count, sum, sumSq) running moments. */
  final case class Buf(n: Long, sum: Long, sumSq: Long)

  /** count/sum/mean/population-stddev, the reference's Stats row. */
  final case class Stats(cnt: Long, sum: Long, mean: Double, stddevPop: Double)

  val ofLong: Aggregator[Long, Buf, Stats] = new Aggregator[Long, Buf, Stats] {
    override def zero: Buf = Buf(0L, 0L, 0L)
    override def reduce(b: Buf, v: Long): Buf =
      Buf(b.n + 1, b.sum + v, b.sumSq + v * v)
    override def merge(a: Buf, b: Buf): Buf =
      Buf(a.n + b.n, a.sum + b.sum, a.sumSq + b.sumSq)
    override def finish(b: Buf): Stats =
      if (b.n == 0) Stats(0, 0, Double.NaN, Double.NaN)
      else {
        val mean = b.sum.toDouble / b.n
        // population stddev via the moment identity the reference uses:
        // sqrt(n*sumSq - sum^2) / n
        val stddev = math.sqrt(b.n.toDouble * b.sumSq - b.sum.toDouble * b.sum) / b.n
        Stats(b.n, b.sum, mean, stddev)
      }
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Stats] = Encoders.product[Stats]
  }
}
