package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.decode._

/** SQL-level frame inspection: decode_pgoutput over raw frame bytes, incl.
  * the malformed-frame error channel. */
class DecodeFrameSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def frames: Seq[(Long, Array[Byte])] = {
    val rel = Relation(9, "public", "t", 'd', Vector(
      RelationColumn(partOfKey = true, "id", TypedView.Oid.Int8, -1),
      RelationColumn(partOfKey = false, "v", TypedView.Oid.Text, -1)))
    def t(v: String) = ColumnData('t', Some(v))
    Seq(
      1L -> PgOutputEncoder.encode(rel),
      2L -> PgOutputEncoder.encode(Begin(10, 999, 77)),
      3L -> PgOutputEncoder.encode(Insert(9, TupleData(Vector(t("5"), ColumnData('u', None))))),
      4L -> PgOutputEncoder.encode(Truncate(3, Vector(9, 10))),
      5L -> Array[Byte]('B', 0, 0)) // truncated
  }

  test("decodes every frame kind into the inspection struct; errors stay in-band") {
    import spark.implicits._
    val df = frames.toDF("lsn", "payload")
      .select(col("lsn"), DecodeFrameFunction.decode_pgoutput(col("payload")).as("f"))
      .orderBy("lsn")
    val rows = df.select("f.msg_type", "f.relation_id", "f.xid", "f.new_categories",
      "f.truncate_relation_ids", "f.error").collect()
    assert(rows(0).getString(0) === "R" && rows(0).getInt(1) === 9)
    assert(rows(1).getString(0) === "B" && rows(1).getInt(2) === 77)
    assert(rows(2).getString(0) === "I" && rows(2).getString(3) === "tu")
    assert(rows(3).getString(0) === "T" && rows(3).getSeq[Int](4) === Seq(9, 10))
    assert(rows(4).isNullAt(0) && rows(4).getString(5).contains("truncated 'B' frame"))
  }

  test("relation columns surface with oids and pk flags") {
    import spark.implicits._
    val df = frames.take(1).toDF("lsn", "payload")
      .select(DecodeFrameFunction.decode_pgoutput(col("payload")).as("f"))
      .selectExpr("inline(f.columns)")
    val cols = df.collect().map(r => (r.getString(0), r.getInt(1), r.getBoolean(3)))
    assert(cols.toSeq === Seq(("id", TypedView.Oid.Int8, true), ("v", TypedView.Oid.Text, false)))
  }

  test("frame-log analytics in SQL: op histogram over a real log") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dfa")
    val p = dir.resolve("log.bin").toString
    graft.sources.FrameLog.write(p,
      frames.take(4).iterator.map { case (l, b) => graft.sources.FrameLog.Entry(l, b) })
    val entries = graft.sources.FrameLog.read(p).map(e => (e.lsn, e.payload)).toSeq
    val hist = entries.toDF("lsn", "payload")
      .select(DecodeFrameFunction.decode_pgoutput(col("payload")).as("f"))
      .groupBy(col("f.msg_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hist === Map("R" -> 1L, "B" -> 1L, "I" -> 1L, "T" -> 1L))
  }
}
