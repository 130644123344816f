package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.plans.{PlanParser, TestPlan}

/** Data Source V2 implementation of the plan-driven generator — the
  * reference's testbed (load generator) re-expressed as a Spark source.
  *
  * Deterministic and replayable: the offset is simply "plan seconds
  * consumed", and every second's rows are a pure function of the plan, so
  * recovery/retry re-produce identical data (exactly-once capable).
  * (reference: testbed DataGeneratorActor.scala:92-136 — the scheduler
  * queue and wall-clock pacing collapse into the trigger+offset model.)
  *
  * Supported options:
  *  - `plan` (required): HOCON-subset test plan text
  *  - `streamId` (default 0): tag emitted in the stream_id column
  *  - `startEpochMs` (default 0): absolute anchor for event_time
  *  - `secondsPerTrigger` (default 1): replay pacing per micro-batch
  *  - `maxRowsPerTrigger`: admission-control row cap (ReadLimit)
  *  - `maxSeconds`: bound for unbounded plans (required if plan unbounded)
  *  - `numPartitions` (default 4): generation parallelism per batch
  *  - `rateLimitKey`: name in [[RateLimitRegistry]] consulted each trigger
  *    for a dynamic row cap (how the PID backpressure controller steers
  *    the source, mirroring receiver rate updates —
  *    reference SubscriberInputDStream.scala:43-48)
  */
class PlanDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "plan-gen"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PlanDataSource.Schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PlanTable(properties)
}

object PlanDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("event_time", TimestampType, nullable = false),
    StructField("value", IntegerType, nullable = false),
    StructField("stream_id", IntegerType, nullable = false)))
}

/** Per-query dynamic rate limits, keyed by `rateLimitKey`. The PID
  * controller writes, the source reads at each latestOffset. Driver-side
  * state: admission control happens on the driver in Structured Streaming,
  * so a plain process-local map is correct even on a cluster. */
object RateLimitRegistry {
  private val limits = new ConcurrentHashMap[String, java.lang.Long]()
  def set(key: String, maxRows: Long): Unit = limits.put(key, maxRows)
  def get(key: String): Option[Long] = Option(limits.get(key)).map(_.longValue)
  def clear(key: String): Unit = limits.remove(key)
}

private final class PlanTable(props: util.Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = "plan-gen"
  override def schema(): StructType = PlanDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = PlanDataSource.Schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new PlanMicroBatchStream(new PlanOptions(props))
      override def toBatch: Batch = new PlanBatch(new PlanOptions(props))
    }
}

private final class PlanOptions(props: util.Map[String, String]) extends Serializable {
  private def opt(k: String): Option[String] = {
    // CaseInsensitiveStringMap lower-cases keys; accept either casing.
    val direct = Option(props.get(k))
    direct.orElse(Option(props.get(k.toLowerCase)))
  }
  val planText: String = opt("plan").getOrElse(
    throw new IllegalArgumentException("plan-gen source needs a 'plan' option"))
  @transient lazy val plan: TestPlan = PlanParser.parse(planText)
  val streamId: Int = opt("streamId").map(_.toInt).getOrElse(0)
  val startEpochMs: Long = opt("startEpochMs").map(_.toLong).getOrElse(0L)
  val secondsPerTrigger: Int = opt("secondsPerTrigger").map(_.toInt).getOrElse(1)
  val maxRowsPerTrigger: Option[Long] = opt("maxRowsPerTrigger").map(_.toLong)
  val maxSeconds: Option[Int] = opt("maxSeconds").map(_.toInt)
  val numPartitions: Int = opt("numPartitions").map(_.toInt).getOrElse(4)
  val rateLimitKey: Option[String] = opt("rateLimitKey")
  def planSeconds: Int = plan.duration.orElse(maxSeconds).getOrElse(
    throw new IllegalArgumentException("unbounded plan needs a 'maxSeconds' option"))
}

private final case class SecondsOffset(seconds: Int) extends Offset {
  override def json(): String = seconds.toString
}

private final class PlanMicroBatchStream(opts: PlanOptions)
    extends MicroBatchStream with SupportsAdmissionControl {

  private val planSeconds = opts.planSeconds

  override def initialOffset(): Offset = SecondsOffset(0)
  override def deserializeOffset(json: String): Offset = SecondsOffset(json.trim.toInt)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def getDefaultReadLimit: ReadLimit =
    opts.maxRowsPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  /** Advance up to secondsPerTrigger plan-seconds, admission-capped by the
    * smaller of the static ReadLimit and the dynamic PID limit. At least
    * one second always advances (second = minimum offset granularity). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val startSec = start.asInstanceOf[SecondsOffset].seconds
    if (startSec >= planSeconds) return SecondsOffset(planSeconds)
    val staticCap = limit match {
      case m: ReadMaxRows => Some(m.maxRows)
      case _              => None
    }
    val dynamicCap = opts.rateLimitKey.flatMap(RateLimitRegistry.get)
    val cap = (staticCap.toSeq ++ dynamicCap.toSeq).reduceOption(_ min _)
    val hardEnd = math.min(planSeconds, startSec + opts.secondsPerTrigger)
    cap match {
      case None => SecondsOffset(hardEnd)
      case Some(maxRows) =>
        var sec = startSec
        var rows = 0L
        var done = false
        while (!done && sec < hardEnd) {
          val next = rows + opts.plan.rowCountFor(sec)
          if (next > maxRows && sec > startSec) done = true
          else { rows = next; sec += 1 }
        }
        SecondsOffset(math.max(sec, startSec + 1))
    }
  }

  override def reportLatestOffset(): Offset = SecondsOffset(planSeconds)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    PlanPartitioning.partitions(
      opts, start.asInstanceOf[SecondsOffset].seconds,
      end.asInstanceOf[SecondsOffset].seconds)

  override def createReaderFactory(): PartitionReaderFactory = new PlanReaderFactory
}

/** Whole-plan batch scan (spark.read on the same source). */
private final class PlanBatch(opts: PlanOptions) extends Batch {
  override def planInputPartitions(): Array[InputPartition] =
    PlanPartitioning.partitions(opts, 0, opts.planSeconds)
  override def createReaderFactory(): PartitionReaderFactory = new PlanReaderFactory
}

private object PlanPartitioning {
  /** Round-robin the seconds range across numPartitions readers: seconds
    * are uniform-cost within a phase, so striping balances mixed-rate
    * plans better than contiguous chunks. */
  def partitions(opts: PlanOptions, startSec: Int, endSec: Int): Array[InputPartition] = {
    val secs = (startSec until endSec).toArray
    if (secs.isEmpty) Array.empty
    else {
      val n = math.min(opts.numPartitions, secs.length)
      (0 until n).map { p =>
        PlanInputPartition(
          opts.planText, secs.filter(_ % n == p),
          opts.startEpochMs, opts.streamId): InputPartition
      }.toArray
    }
  }
}

private final case class PlanInputPartition(
    planText: String,
    seconds: Array[Int],
    startEpochMs: Long,
    streamId: Int) extends InputPartition

private final class PlanReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PlanInputPartition]
    new PartitionReader[InternalRow] {
      private val plan = PlanParser.parse(p.planText)
      private var secIdx = 0
      private var rows: Iterator[(Long, Int)] = Iterator.empty
      private var current: (Long, Int) = _

      override def next(): Boolean = {
        while (!rows.hasNext && secIdx < p.seconds.length) {
          rows = plan.rowsFor(p.seconds(secIdx)).iterator
          secIdx += 1
        }
        if (rows.hasNext) { current = rows.next(); true } else false
      }

      override def get(): InternalRow =
        InternalRow(
          (current._1 + p.startEpochMs) * 1000L, // micros for TimestampType
          current._2,
          p.streamId)

      override def close(): Unit = ()
    }
  }
}
