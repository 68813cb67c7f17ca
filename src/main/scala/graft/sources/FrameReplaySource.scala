package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.decode.{ChangeEventBuilder, PgOutputDecoder, SchemaRegistry}

/** Replayable pgoutput frame source — DataSource V2, batch + micro-batch
  * streaming (`spark.readStream.format("pgcdc-replay").option("path", …)`).
  *
  * This is the Spark realization of the reference's WAL tail (SURVEY.md
  * §2.1 S1) with the walsender socket swapped for a durable frame log, so
  * every downstream stage — offsets, decode, envelope, typed views,
  * compaction — is exercised deterministically without Postgres (§7 step
  * 3). A live source only replaces the frame producer.
  *
  * Design notes:
  *  - Offsets are frame indexes (the file-log LSN analog); checkpointing
  *    stores them durably; `commit(end)` is where a live source would send
  *    WAL flush feedback — strictly AFTER the checkpoint commit, preserving
  *    the reference's at-least-once contract (K2, stores.py:79-86).
  *  - The replication protocol is a single totally-ordered cursor, so each
  *    micro-batch plans ONE input partition (same as the reference's one
  *    callback thread; reader.py:116-123). Parallelism comes from the
  *    downstream shuffle (compaction, typed views), not the tail.
  *  - Decode state (schema registry, open transaction) is rebuilt by
  *    replaying the log prefix [0, start): frames are skipped cheaply
  *    without emitting. A live source keeps the registry in the checkpoint
  *    instead (K3).
  *  - Options: `path` (frame log file), `maxFramesPerTrigger` (admission
  *    control), `txn.markers` (emit 'B'/'C' sentinel rows for txn-atomic
  *    assembly downstream), `messages` (surface 'M' logical decoding
  *    messages as op="M" rows — the WAL audit channel).
  */
class FrameReplayProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "pgcdc-replay"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = Envelope.schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform], properties: JMap[String, String]): Table =
    new FrameReplayTable(properties.asScala.toMap)
}

final class FrameReplayTable(properties: Map[String, String]) extends Table with SupportsRead {
  private val path = properties.getOrElse("path",
    throw new IllegalArgumentException("pgcdc-replay requires option 'path'"))

  override def name(): String = s"pgcdc-replay($path)"
  override def schema(): StructType = Envelope.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val opts = properties ++ options.asScala
    () => new FrameReplayScan(path, opts)
  }
}

final class FrameReplayScan(path: String, options: Map[String, String]) extends Scan {
  private val txnMarkers = options.get("txn.markers").exists(_.toBoolean)
  private val messages = options.get("messages").exists(_.toBoolean)
  private val maxPerTrigger = options.get("maxFramesPerTrigger").map(_.toLong)

  override def readSchema(): StructType = Envelope.schema
  override def description(): String = s"FrameReplayScan($path)"

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      Array(FrameRange(path, 0L, FrameLog.count(path), txnMarkers, messages))
    override def createReaderFactory(): PartitionReaderFactory = new FrameReaderFactory
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new FrameReplayMicroBatch(path, maxPerTrigger, txnMarkers, messages)
}

final case class FrameOffset(idx: Long) extends Offset {
  override def json(): String = idx.toString
}

final case class FrameRange(path: String, from: Long, until: Long,
    txnMarkers: Boolean, messages: Boolean = false)
  extends InputPartition

final class FrameReplayMicroBatch(
    path: String, maxPerTrigger: Option[Long], txnMarkers: Boolean,
    messages: Boolean = false)
    extends MicroBatchStream with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  // For Trigger.AvailableNow: pin the end of "available" at query start so
  // rate-limited batches drain up to a stable point, then terminate.
  @volatile private var availableNowEnd: Long = -1L

  override def prepareForTriggerAvailableNow(): Unit = {
    availableNowEnd = FrameLog.count(path)
  }

  override def initialOffset(): Offset = FrameOffset(0L)

  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(n => ReadLimit.maxRows(n)).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("use latestOffset(start, limit)")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val available = if (availableNowEnd >= 0) availableNowEnd else FrameLog.count(path)
    val from = start.asInstanceOf[FrameOffset].idx
    limit match {
      case rl: org.apache.spark.sql.connector.read.streaming.ReadMaxRows =>
        FrameOffset(math.min(available, from + rl.maxRows()))
      case _ => FrameOffset(available)
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[FrameOffset].idx
    val e = end.asInstanceOf[FrameOffset].idx
    if (e <= s) Array.empty
    else Array(FrameRange(path, s, e, txnMarkers, messages))
  }

  override def createReaderFactory(): PartitionReaderFactory = new FrameReaderFactory

  override def deserializeOffset(json: String): Offset = FrameOffset(json.toLong)

  /** Live-source hook: WAL flush feedback (setFlushedLSN) belongs exactly
    * here — after the engine has durably committed offsets ≤ `end`. The
    * replay log needs no retention management, so this is a no-op. */
  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

final class FrameReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new FramePartitionReader(partition.asInstanceOf[FrameRange])
}

/** Replays the log prefix to rebuild decode state, emits [from, until). */
final class FramePartitionReader(p: FrameRange) extends PartitionReader[InternalRow] {
  private val registry = new SchemaRegistry
  private val builder = new ChangeEventBuilder(registry,
    emitTxnMarkers = p.txnMarkers, emitMessages = p.messages)
  private var idx = 0L
  private val entries = FrameLog.read(p.path, 0L, p.until)
  private var pending: Iterator[InternalRow] = Iterator.empty
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (!pending.hasNext && entries.hasNext) {
      val e = entries.next()
      val events = builder.processRaw(e.lsn, e.payload)
      if (idx >= p.from) pending = events.iterator.map(Envelope.toInternalRow)
      idx += 1
    }
    if (pending.hasNext) { current = pending.next(); true } else false
  }

  override def get(): InternalRow = current
  // Tasks that terminate early (LIMIT, cancellation, downstream failure)
  // must not leak the log's file handle.
  override def close(): Unit = entries.close()
}
