package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.decode._

/** The live-source face: option validation, the framelog producer running
  * through the `pgcdc` format end-to-end, and the pgjdbc path failing fast
  * with a actionable message in this offline environment. */
class PgCdcSourceSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("option validation: unknown producer, missing path, missing dsn/slot/publication") {
    intercept[IllegalArgumentException] {
      PgCdcOptions.validate(Map("producer" -> "kafka"))
    }
    intercept[IllegalArgumentException] {
      PgCdcOptions.validate(Map("producer" -> "framelog"))
    }
    val e = intercept[IllegalArgumentException] {
      PgCdcOptions.validate(Map("producer" -> "pgjdbc", "dsn" -> "jdbc:postgresql://x/y"))
    }
    assert(e.getMessage.contains("slot") && e.getMessage.contains("publication"))
    PgCdcOptions.validate(Map("producer" -> "framelog", "path" -> "/tmp/x"))
    PgCdcOptions.validate(Map(
      "producer" -> "pgjdbc", "dsn" -> "jdbc:postgresql://x/y",
      "slot" -> "s", "publication" -> "p"))
  }

  test("pgcdc format with framelog producer streams envelope rows end-to-end") {
    val rel = Relation(3, "public", "t", 'd', Vector(
      RelationColumn(partOfKey = true, "id", TypedView.Oid.Int8, -1)))
    def t(v: String) = ColumnData('t', Some(v))
    val p = Files.createTempDirectory("pgcdc").resolve("log.bin").toString
    FrameLog.write(p, Iterator(
      FrameLog.Entry(0, PgOutputEncoder.encode(rel)),
      FrameLog.Entry(10, PgOutputEncoder.encode(Begin(12, 1000, 1))),
      FrameLog.Entry(11, PgOutputEncoder.encode(Insert(3, TupleData(Vector(t("42")))))),
      FrameLog.Entry(12, PgOutputEncoder.encode(Commit(0, 12, 12, 1000)))))
    val q = spark.readStream.format("graft.sources.PgCdcProvider")
      .option("path", p).load()
      .writeStream.format("memory").queryName("pgcdc_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val rows = spark.sql("SELECT op, `table`, after['id'] FROM pgcdc_out").collect()
    assert(rows.length === 1)
    assert(rows.head.getString(0) === "I")
    assert(rows.head.getString(1) === "t")
    assert(rows.head.getString(2) === "42")
  }

  test("pgjdbc producer fails fast with an actionable offline message") {
    assert(!PgJdbcReplication.driverAvailable)
    val p = Files.createTempDirectory("pgcdc").resolve("nolog.bin").toString
    val e = intercept[Exception] {
      spark.readStream.format("graft.sources.PgCdcProvider")
        .option("producer", "pgjdbc")
        .option("dsn", "jdbc:postgresql://localhost/db")
        .option("slot", "s").option("publication", "p")
        .load()
        .writeStream.format("memory").queryName("pgjdbc_out")
        .trigger(Trigger.AvailableNow()).start()
        .awaitTermination(30000)
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("pgcdc") || msg.contains("postgresql"), msg)
  }

  test("bootstrap statement sequence covers slot + snapshot + publication enumeration (S2)") {
    val stmts = PgSnapshotSync.bootstrapStatements("my_slot", "my_pub")
    assert(stmts.head.contains("CREATE_REPLICATION_SLOT \"my_slot\" LOGICAL pgoutput"))
    assert(stmts.exists(_.contains("EXPORT_SNAPSHOT")))
    assert(stmts.exists(_.contains("REPEATABLE READ")))
    assert(stmts.exists(_.contains("SET TRANSACTION SNAPSHOT")))
    assert(stmts.exists(_.contains("pg_publication_tables")))
  }

  test("identifiers and literals in bootstrap SQL are escape-safe (no injection)") {
    val stmts = PgSnapshotSync.bootstrapStatements("""sl"ot""", "pu'b")
    assert(stmts.head.contains("\"sl\"\"ot\""))
    assert(stmts.exists(_.contains("pubname = 'pu''b'")))
    assert(PgCatalog.attNotNullSql("n's", "t'bl").contains("'n''s'"))
    assert(PgCatalog.attNotNullSql("n's", "t'bl").contains("'t''bl'"))
  }
}
