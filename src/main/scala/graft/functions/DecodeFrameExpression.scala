package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.decode._

/** `decode_pgoutput(payload binary)` → typed struct: SQL-level inspection
  * of raw pgoutput frames (SURVEY.md §2.2 Decode: "alternatively
  * decode_pgoutput(payload) as an Expression"). The streaming sources
  * decode in plain JVM code (stateful: registry + txn); this expression is
  * the stateless per-frame view — wire archaeology, frame-log analytics,
  * dead-letter triage — so CodegenFallback is fine: it is a diagnostic
  * surface, not the ingest hot path.
  *
  * Malformed frames yield a struct with `error` set instead of failing the
  * query: frame triage must not die on the frame it exists to triage.
  *
  * Binary-transfer tuples (pgoutput `binary 'true'`): values whose
  * category byte is 'b' surface as BASE64 strings in `old_values`/
  * `new_values` — this stateless expression has no Relation in hand to
  * resolve type oids for canonical-text rendering. Consumers MUST check
  * `old_categories`/`new_categories` positionally before reading a value
  * as text ('t' = canonical text, 'b' = base64 payload, 'n'/'u' = null/
  * unsent); the stateful pipeline is the surface that renders 'b' to text
  * (PgBinary at the image boundary). */
case class DecodePgOutput(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary, got ${child.dataType.catalogString}")

  override def prettyName: String = "decode_pgoutput"

  private val columnStruct = StructType(Seq(
    StructField("name", StringType), StructField("type_oid", IntegerType),
    StructField("type_mod", IntegerType), StructField("pk", BooleanType)))

  override val dataType: StructType = StructType(Seq(
    StructField("msg_type", StringType),
    StructField("relation_id", IntegerType),
    StructField("xid", IntegerType),
    StructField("final_lsn", LongType),
    StructField("commit_lsn", LongType),
    StructField("commit_ts_us", LongType),
    StructField("namespace", StringType),
    StructField("name", StringType),
    StructField("replica_identity", StringType),
    StructField("columns", ArrayType(columnStruct)),
    StructField("old_kind", StringType),
    StructField("old_categories", StringType),
    StructField("old_values", ArrayType(StringType)),
    StructField("new_categories", StringType),
    StructField("new_values", ArrayType(StringType)),
    StructField("truncate_relation_ids", ArrayType(IntegerType)),
    StructField("error", StringType)))

  private def u(s: String): UTF8String = if (s == null) null else UTF8String.fromString(s)
  private def cats(t: TupleData): UTF8String =
    u(t.columns.map(_.category).mkString)
  // Binary-mode ('b') values surface as base64 — this expression is
  // stateless per-frame, so the relation's type oid needed for canonical
  // text rendering is not in hand; the category string marks which values
  // are base64 payloads (the stateful pipeline renders them via PgBinary).
  private def vals(t: TupleData): GenericArrayData =
    new GenericArrayData(t.columns.map { c =>
      if (c.category == 'b')
        u(java.util.Base64.getEncoder.encodeToString(c.bin.get.toArray))
      else u(c.data.orNull)
    }.toArray[Any])

  override def nullSafeEval(input: Any): Any = {
    val out = new Array[Any](17)
    try {
      PgOutputDecoder.decode(input.asInstanceOf[Array[Byte]]) match {
        case Begin(finalLsn, ts, xid) =>
          out(0) = u("B"); out(2) = xid; out(3) = finalLsn; out(5) = ts
        case Commit(_, commitLsn, endLsn, ts) =>
          out(0) = u("C"); out(3) = endLsn; out(4) = commitLsn; out(5) = ts
        case Origin(commitLsn, name) =>
          out(0) = u("O"); out(4) = commitLsn; out(7) = u(name)
        case Relation(id, ns, name, ri, cols) =>
          out(0) = u("R"); out(1) = id; out(6) = u(ns); out(7) = u(name)
          out(8) = u(ri.toString)
          out(9) = new GenericArrayData(cols.map(c => new GenericInternalRow(
            Array[Any](u(c.name), c.typeOid, c.typeMod, c.partOfKey))).toArray[Any])
        case PgType(oid, ns, name) =>
          out(0) = u("Y"); out(1) = oid; out(6) = u(ns); out(7) = u(name)
        case Insert(id, t) =>
          out(0) = u("I"); out(1) = id; out(13) = cats(t); out(14) = vals(t)
        case Update(id, oldKind, oldT, newT) =>
          out(0) = u("U"); out(1) = id
          out(10) = u(oldKind.map(_.toString).orNull)
          oldT.foreach { t => out(11) = cats(t); out(12) = vals(t) }
          out(13) = cats(newT); out(14) = vals(newT)
        case Delete(id, kind, t) =>
          out(0) = u("D"); out(1) = id; out(10) = u(kind.toString)
          out(11) = cats(t); out(12) = vals(t)
        case Truncate(_, ids) =>
          out(0) = u("T")
          out(15) = new GenericArrayData(ids.map(Int.box).toArray[Any])
        // Diagnostic mappings for the protocol-v2 / message frames:
        // 'M' rides prefix in `name`, content (UTF-8) in `new_values[0]`,
        // its own WAL position in `final_lsn`, transactional flag in
        // `old_kind` ('t'/'f'). Stream control frames carry xids only.
        case LogicalMessage(transactional, lsn, prefix, content) =>
          out(0) = u("M"); out(3) = lsn; out(7) = u(prefix)
          out(10) = u(if (transactional) "t" else "f")
          out(14) = new GenericArrayData(
            Array[Any](u(new String(content, java.nio.charset.StandardCharsets.UTF_8))))
        case StreamStart(xid, first) =>
          out(0) = u("S"); out(2) = xid; out(10) = u(if (first) "t" else "f")
        case StreamStop =>
          out(0) = u("E")
        case StreamCommit(xid, _, commitLsn, endLsn, ts) =>
          out(0) = u("c"); out(2) = xid; out(3) = endLsn; out(4) = commitLsn; out(5) = ts
        case StreamAbort(xid, subXid) =>
          out(0) = u("A"); out(2) = xid
          // sub_xid has no dedicated slot; relation_id is free on 'A' frames
          out(1) = subXid
        // 2PC frames: gid rides in `name`, prepare/commit positions in
        // final_lsn/commit_lsn, timestamps in commit_ts_us
        case BeginPrepare(pLsn, endLsn, ts, xid, gid) =>
          out(0) = u("b"); out(2) = xid; out(3) = endLsn; out(4) = pLsn
          out(5) = ts; out(7) = u(gid)
        case Prepare(_, pLsn, endLsn, ts, xid, gid) =>
          out(0) = u("P"); out(2) = xid; out(3) = endLsn; out(4) = pLsn
          out(5) = ts; out(7) = u(gid)
        case CommitPrepared(_, cLsn, endLsn, ts, xid, gid) =>
          out(0) = u("K"); out(2) = xid; out(3) = endLsn; out(4) = cLsn
          out(5) = ts; out(7) = u(gid)
        case RollbackPrepared(_, pEnd, rEnd, _, rTs, xid, gid) =>
          out(0) = u("r"); out(2) = xid; out(3) = rEnd; out(4) = pEnd
          out(5) = rTs; out(7) = u(gid)
        case StreamPrepare(_, pLsn, endLsn, ts, xid, gid) =>
          out(0) = u("p"); out(2) = xid; out(3) = endLsn; out(4) = pLsn
          out(5) = ts; out(7) = u(gid)
        // the stateless view cannot know a stream is open, so xid-prefixed
        // in-stream frames are never produced here (decode(payload) only)
        case StreamedPart(_, _) =>
          out(16) = u("in-stream frame reached the stateless decoder")
      }
    } catch {
      case e: PgOutputDecodeException => out(16) = u(e.getMessage)
    }
    new GenericInternalRow(out)
  }

  override protected def withNewChildInternal(newChild: Expression): DecodePgOutput =
    copy(child = newChild)
}

object DecodeFrameFunction {
  def decode_pgoutput(payload: Column): Column =
    ColumnBridge.column(DecodePgOutput(ColumnBridge.expression(payload)))

  val fnName = "decode_pgoutput"
  val fnInfo = new ExpressionInfo(classOf[DecodePgOutput].getName, fnName)
  val fnBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1, s"$fnName expects 1 argument")
    DecodePgOutput(exprs.head)
  }
}
