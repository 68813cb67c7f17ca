package graft.decode

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** ADT for the pgoutput logical-replication message family.
  *
  * Message grammar follows the public Postgres protocol docs
  * (protocol-logicalrep-message-formats) as exercised by the reference
  * implementation (see /root/reference/src/pypgcdc/decoders.py:86-455).
  * All multi-byte integers are big-endian signed; timestamps are int64
  * microseconds since 2000-01-01T00:00:00Z (decoders.py:39-45).
  *
  * Two reference bugs are fixed here (SURVEY.md §7):
  *  - `Begin.xid` is read as Int32 per the wire format (the reference reads
  *    int64 and only survives because the buffer ends, decoders.py:183);
  *  - `Truncate` is decoded as a plain value (the reference's generator-based
  *    truncate path never worked end-to-end, reader.py:386-398).
  */
sealed trait PgOutputMessage { def msgType: Char }

/** One column value inside a TupleData.
  * category 't' = text value present, 'n' = SQL NULL, 'u' = unchanged TOAST
  * datum (value NOT sent — must not be conflated with NULL; the reference
  * conflates them, reader.py:52-58, which is lossy — SURVEY.md §7.2),
  * 'b' = binary value (pgoutput `binary 'true'`, PG 14+ — absent from the
  * reference, decoders.py:125-158 is text-only). Binary payloads carry the
  * type's send-function bytes; [[PgBinary.render]] converts them to the
  * canonical text at the image boundary so downstream stays mode-agnostic.
  * `bin` is an ArraySeq so case-class equality stays element-wise (the
  * decode⇄encode round-trip property relies on it). */
final case class ColumnData(category: Char, data: Option[String],
    bin: Option[scala.collection.immutable.ArraySeq[Byte]] = None) {
  def isNull: Boolean = category == 'n'
  def isUnchangedToast: Boolean = category == 'u'
}

final case class TupleData(columns: Vector[ColumnData])

final case class Begin(finalLsn: Long, commitTs: Long, xid: Int)
    extends PgOutputMessage { def msgType = 'B' }

final case class Commit(flags: Byte, commitLsn: Long, endLsn: Long, commitTs: Long)
    extends PgOutputMessage { def msgType = 'C' }

/** Decoded 'O' message — a stub in the reference (decoders.py:222-229). */
final case class Origin(commitLsn: Long, name: String)
    extends PgOutputMessage { def msgType = 'O' }

final case class RelationColumn(partOfKey: Boolean, name: String, typeOid: Int, typeMod: Int)

final case class Relation(
    relationId: Int,
    namespace: String,
    name: String,
    replicaIdentity: Char,
    columns: Vector[RelationColumn])
    extends PgOutputMessage {
  def msgType = 'R'
  def keyColumnNames: Vector[String] = columns.filter(_.partOfKey).map(_.name)
}

/** Decoded 'Y' message — a stub in the reference (decoders.py:293-303). */
final case class PgType(typeOid: Int, namespace: String, name: String)
    extends PgOutputMessage { def msgType = 'Y' }

final case class Insert(relationId: Int, newTuple: TupleData)
    extends PgOutputMessage { def msgType = 'I' }

/** oldKind: Some('K') key-only old image, Some('O') full old row
  * (REPLICA IDENTITY FULL), None = old image not sent (key unchanged). */
final case class Update(
    relationId: Int,
    oldKind: Option[Char],
    oldTuple: Option[TupleData],
    newTuple: TupleData)
    extends PgOutputMessage { def msgType = 'U' }

final case class Delete(relationId: Int, oldKind: Char, oldTuple: TupleData)
    extends PgOutputMessage { def msgType = 'D' }

final case class Truncate(optionBits: Byte, relationIds: Vector[Int])
    extends PgOutputMessage {
  def msgType = 'T'
  def cascade: Boolean = (optionBits & 1) != 0
  def restartIdentity: Boolean = (optionBits & 2) != 0
}

/** 'M' logical decoding message (`pg_logical_emit_message`, PG 14+ with the
  * `messages` option). Not present in the reference's decoder family at all
  * (decoders.py handles only B/C/O/R/Y/I/U/D/T) — the message channel is how
  * applications ride audit/ordering markers on the WAL without a table.
  * `lsn` is the WAL position of the message itself (distinct from the frame's
  * envelope position); `content` is opaque bytes. */
final case class LogicalMessage(
    transactional: Boolean, lsn: Long, prefix: String, content: Array[Byte])
    extends PgOutputMessage {
  def msgType = 'M'
  def contentText: String = new String(content, StandardCharsets.UTF_8)
  // Array fields break case-class equality; compare by value (tests rely on it).
  override def equals(o: Any): Boolean = o match {
    case m: LogicalMessage =>
      m.transactional == transactional && m.lsn == lsn && m.prefix == prefix &&
        java.util.Arrays.equals(m.content, content)
    case _ => false
  }
  override def hashCode: Int =
    (transactional, lsn, prefix, java.util.Arrays.hashCode(content)).hashCode
}

/** Protocol v2 (PG 14+, `streaming on`): a large in-progress transaction is
  * sent in segments instead of being buffered server-side until commit —
  * the feature that keeps replication lag flat when a bulk load writes
  * millions of rows in one transaction. `xid` is the TOP-LEVEL transaction id;
  * segments of different transactions may interleave. */
final case class StreamStart(xid: Int, firstSegment: Boolean)
    extends PgOutputMessage { def msgType = 'S' }

case object StreamStop extends PgOutputMessage { def msgType = 'E' }

final case class StreamCommit(
    xid: Int, flags: Byte, commitLsn: Long, endLsn: Long, commitTs: Long)
    extends PgOutputMessage { def msgType = 'c' }

/** Abort of a streamed transaction (`subXid == xid`) or of one of its
  * subtransactions (`subXid != xid`): everything streamed under `subXid`
  * must be discarded; the rest of the transaction stays pending. */
final case class StreamAbort(xid: Int, subXid: Int)
    extends PgOutputMessage { def msgType = 'A' }

/** A message observed inside a stream segment: protocol v2 inserts the
  * sending (sub)transaction's xid right after the type byte of
  * R/Y/I/U/D/T/M frames. Decoded only when the caller says the stream is
  * open (tag bytes alone cannot distinguish the two layouts). */
final case class StreamedPart(xid: Int, inner: PgOutputMessage)
    extends PgOutputMessage { def msgType = inner.msgType }

/** Two-phase commit family (protocol v3, PG 15+ with `two_phase on`): a
  * PREPARE TRANSACTION txn opens with 'b' (Begin Prepare), sends its DML,
  * closes the data section with 'P' (Prepare), and is later resolved by
  * 'K' (Commit Prepared) or 'r' (Rollback Prepared) — possibly much later
  * and far apart in the WAL, keyed by the user-visible gid. */
final case class BeginPrepare(
    prepareLsn: Long, endLsn: Long, prepareTs: Long, xid: Int, gid: String)
    extends PgOutputMessage { def msgType = 'b' }

final case class Prepare(
    flags: Byte, prepareLsn: Long, endLsn: Long, prepareTs: Long, xid: Int, gid: String)
    extends PgOutputMessage { def msgType = 'P' }

final case class CommitPrepared(
    flags: Byte, commitLsn: Long, endLsn: Long, commitTs: Long, xid: Int, gid: String)
    extends PgOutputMessage { def msgType = 'K' }

final case class RollbackPrepared(
    flags: Byte, prepareEndLsn: Long, rollbackEndLsn: Long,
    prepareTs: Long, rollbackTs: Long, xid: Int, gid: String)
    extends PgOutputMessage { def msgType = 'r' }

/** 'p' — a STREAMED transaction ends with PREPARE TRANSACTION instead of a
  * stream commit: the reassembled segments move into the prepared (gid)
  * table and wait for 'K'/'r' like any other 2PC txn. */
final case class StreamPrepare(
    flags: Byte, prepareLsn: Long, endLsn: Long, prepareTs: Long, xid: Int, gid: String)
    extends PgOutputMessage { def msgType = 'p' }

final class PgOutputDecodeException(msg: String, cause: Throwable = null)
    extends RuntimeException(msg, cause)

/** Binary decoder for pgoutput frames (reference: decoders.py:86-455).
  * Pure JVM code — safe to call from executor-side `map`/`mapPartitions`
  * or from a DataSource V2 PartitionReader without any UDF registration. */
object PgOutputDecoder {

  /** Microseconds between the unix epoch and the Postgres epoch 2000-01-01Z. */
  val PostgresEpochMicros: Long = 946684800000000L

  /** pgoutput int64 µs-since-2000 → unix µs (decoders.py:39-41). */
  def pgMicrosToUnixMicros(pgUs: Long): Long = pgUs + PostgresEpochMicros
  def unixMicrosToPgMicros(unixUs: Long): Long = unixUs - PostgresEpochMicros

  def decode(payload: Array[Byte]): PgOutputMessage = decode(payload, inStream = false)

  /** `inStream = true` ⇒ an 'S' segment is open, so R/Y/I/U/D/T/M frames
    * carry a leading Int32 xid (protocol v2 layout) and decode to
    * [[StreamedPart]]. Stream-control frames (S/E/c/A) parse the same either
    * way. The caller owns the open/closed state — a stateless decoder cannot
    * recover it from the tag byte alone. */
  def decode(payload: Array[Byte], inStream: Boolean): PgOutputMessage = {
    if (payload.isEmpty)
      throw new PgOutputDecodeException("empty pgoutput frame")
    val buf = ByteBuffer.wrap(payload).order(ByteOrder.BIG_ENDIAN)
    val tag = buf.get().toChar
    val streamedDml = inStream && (tag match {
      case 'R' | 'Y' | 'I' | 'U' | 'D' | 'T' | 'M' => true
      case _ => false
    })
    val xid = if (streamedDml) buf.getInt() else 0
    try {
      val msg = tag match {
        case 'B' => decodeBegin(buf)
        case 'C' => decodeCommit(buf)
        case 'O' => decodeOrigin(buf)
        case 'R' => decodeRelation(buf)
        case 'Y' => decodePgType(buf)
        case 'I' => decodeInsert(buf)
        case 'U' => decodeUpdate(buf)
        case 'D' => decodeDelete(buf)
        case 'T' => decodeTruncate(buf)
        case 'M' => decodeLogicalMessage(buf)
        case 'S' => StreamStart(buf.getInt(), buf.get() == 1)
        case 'E' => StreamStop
        case 'c' =>
          val x = buf.getInt(); val f = buf.get()
          StreamCommit(x, f, buf.getLong(), buf.getLong(), buf.getLong())
        case 'A' => StreamAbort(buf.getInt(), buf.getInt())
        case 'b' =>
          BeginPrepare(buf.getLong(), buf.getLong(), buf.getLong(), buf.getInt(),
            readString(buf))
        case 'P' =>
          Prepare(buf.get(), buf.getLong(), buf.getLong(), buf.getLong(), buf.getInt(),
            readString(buf))
        case 'K' =>
          CommitPrepared(buf.get(), buf.getLong(), buf.getLong(), buf.getLong(),
            buf.getInt(), readString(buf))
        case 'r' =>
          RollbackPrepared(buf.get(), buf.getLong(), buf.getLong(), buf.getLong(),
            buf.getLong(), buf.getInt(), readString(buf))
        case 'p' =>
          StreamPrepare(buf.get(), buf.getLong(), buf.getLong(), buf.getLong(),
            buf.getInt(), readString(buf))
        case other =>
          throw new PgOutputDecodeException(s"unknown pgoutput message type '$other'")
      }
      if (streamedDml) StreamedPart(xid, msg) else msg
    } catch {
      // one catch type for per-frame error routing (callers shouldn't need
      // to know ByteBuffer internals to build an error channel)
      case _: java.nio.BufferUnderflowException =>
        throw new PgOutputDecodeException(
          s"truncated '$tag' frame (${payload.length} bytes)")
    }
  }

  /** Decode insisting on one expected type (the reference ctors raise
    * ValueError on a wrong first byte — test_decoders.py negative cases). */
  def decodeAs[T <: PgOutputMessage](payload: Array[Byte], expected: Char): T = {
    if (payload.isEmpty || payload(0).toChar != expected)
      throw new PgOutputDecodeException(
        s"first byte is not '$expected': ${if (payload.isEmpty) "<empty>" else payload(0).toChar}")
    decode(payload).asInstanceOf[T]
  }

  /** C-string read without per-string stream allocation: every decode buf
    * wraps the payload array, so scan for the NUL directly and decode the
    * slice in place (this runs once per string field per frame — the
    * decode path's hottest allocation site before r10). */
  private def readString(buf: ByteBuffer): String = {
    val arr = buf.array()
    val start = buf.arrayOffset() + buf.position()
    var end = start
    val limit = buf.arrayOffset() + buf.limit()
    while (end < limit && arr(end) != 0) end += 1
    if (end == limit)
      throw new java.nio.BufferUnderflowException() // unterminated string
    val s = new String(arr, start, end - start, StandardCharsets.UTF_8)
    buf.position(end - buf.arrayOffset() + 1)
    s
  }

  /** TupleData: int16 n_columns, then per column a category byte:
    * 'n' NULL, 'u' unchanged TOAST, 't'/'b' int32 length + that many bytes
    * (decoders.py:125-158; 'b' is the PG 14+ `binary 'true'` form the
    * reference does not speak). */
  def readTupleData(buf: ByteBuffer): TupleData = {
    val n = buf.getShort()
    val cols = Vector.newBuilder[ColumnData]
    var i = 0
    while (i < n) {
      val cat = buf.get().toChar
      cat match {
        case 'n' | 'u' => cols += ColumnData(cat, None)
        case 't' | 'b' =>
          val len = buf.getInt()
          // length must fit the remaining frame: garbage input must raise
          // the typed error, not NegativeArraySizeException or an OOM-sized
          // allocation
          if (len < 0 || len > buf.remaining())
            throw new PgOutputDecodeException(
              s"tuple column length $len exceeds frame remainder ${buf.remaining()}")
          if (cat == 't') {
            // decode straight from the frame's backing array — no
            // intermediate copy (one per text value, the decode hot path)
            val s = new String(buf.array(), buf.arrayOffset() + buf.position(),
              len, StandardCharsets.UTF_8)
            buf.position(buf.position() + len)
            cols += ColumnData('t', Some(s))
          } else {
            val bytes = new Array[Byte](len)
            buf.get(bytes)
            cols += ColumnData('b', None,
              Some(scala.collection.immutable.ArraySeq.unsafeWrapArray(bytes)))
          }
        case other =>
          throw new PgOutputDecodeException(s"unknown tuple column category '$other'")
      }
      i += 1
    }
    TupleData(cols.result())
  }

  private def decodeBegin(buf: ByteBuffer): Begin = {
    val lsn = buf.getLong()
    val ts = buf.getLong()
    val xid = buf.getInt() // Int32 per wire format (reference bug fixed)
    Begin(lsn, ts, xid)
  }

  private def decodeCommit(buf: ByteBuffer): Commit = {
    val flags = buf.get()
    val commitLsn = buf.getLong()
    val endLsn = buf.getLong()
    val ts = buf.getLong()
    Commit(flags, commitLsn, endLsn, ts)
  }

  private def decodeOrigin(buf: ByteBuffer): Origin = {
    val lsn = buf.getLong()
    Origin(lsn, readString(buf))
  }

  private def decodeRelation(buf: ByteBuffer): Relation = {
    val relationId = buf.getInt()
    val namespace = readString(buf)
    val name = readString(buf)
    val replicaIdentity = buf.get().toChar
    val nCols = buf.getShort()
    val cols = Vector.newBuilder[RelationColumn]
    var i = 0
    while (i < nCols) {
      val pk = buf.get() == 1
      val colName = readString(buf)
      val oid = buf.getInt()
      val typeMod = buf.getInt()
      cols += RelationColumn(pk, colName, oid, typeMod)
      i += 1
    }
    Relation(relationId, namespace, name, replicaIdentity, cols.result())
  }

  private def decodePgType(buf: ByteBuffer): PgType = {
    val oid = buf.getInt()
    PgType(oid, readString(buf), readString(buf))
  }

  private def decodeInsert(buf: ByteBuffer): Insert = {
    val relationId = buf.getInt()
    val kind = buf.get().toChar
    if (kind != 'N')
      throw new PgOutputDecodeException(s"Insert: expected 'N' tuple marker, got '$kind'")
    Insert(relationId, readTupleData(buf))
  }

  private def decodeUpdate(buf: ByteBuffer): Update = {
    val relationId = buf.getInt()
    val marker = buf.get().toChar
    marker match {
      case 'K' | 'O' =>
        val old = readTupleData(buf)
        val newMarker = buf.get().toChar
        if (newMarker != 'N')
          throw new PgOutputDecodeException(
            s"Update: expected 'N' after old tuple, got '$newMarker'")
        Update(relationId, Some(marker), Some(old), readTupleData(buf))
      case 'N' =>
        Update(relationId, None, None, readTupleData(buf))
      case other =>
        throw new PgOutputDecodeException(s"Update: unexpected tuple marker '$other'")
    }
  }

  private def decodeDelete(buf: ByteBuffer): Delete = {
    val relationId = buf.getInt()
    val kind = buf.get().toChar
    if (kind != 'K' && kind != 'O')
      throw new PgOutputDecodeException(s"Delete: expected 'K' or 'O', got '$kind'")
    Delete(relationId, kind, readTupleData(buf))
  }

  private def decodeTruncate(buf: ByteBuffer): Truncate = {
    val nRelations = buf.getInt()
    val optionBits = buf.get()
    val ids = Vector.newBuilder[Int]
    var i = 0
    while (i < nRelations) { ids += buf.getInt(); i += 1 }
    Truncate(optionBits, ids.result())
  }

  private def decodeLogicalMessage(buf: ByteBuffer): LogicalMessage = {
    val flags = buf.get()
    val lsn = buf.getLong()
    val prefix = readString(buf)
    val len = buf.getInt()
    if (len < 0 || len > buf.remaining())
      throw new PgOutputDecodeException(
        s"message content length $len exceeds frame remainder ${buf.remaining()}")
    val content = new Array[Byte](len)
    buf.get(content)
    LogicalMessage((flags & 1) != 0, lsn, prefix, content)
  }
}

/** Wire-format encoder — the inverse of [[PgOutputDecoder]]. Used by tests
  * (round-trip properties) and by the frame-replay source fixtures that
  * simulate a Postgres walsender without a live database (SURVEY.md §5). */
object PgOutputEncoder {

  private def buf(cap: Int): ByteBuffer =
    ByteBuffer.allocate(cap).order(ByteOrder.BIG_ENDIAN)

  private def cstr(s: String): Array[Byte] = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    val out = new Array[Byte](b.length + 1)
    System.arraycopy(b, 0, out, 0, b.length)
    out
  }

  private def tupleBytes(t: TupleData): Array[Byte] = {
    var size = 2
    t.columns.foreach { c =>
      size += 1
      if (c.category == 't') size += 4 + c.data.get.getBytes(StandardCharsets.UTF_8).length
      if (c.category == 'b') size += 4 + c.bin.get.length
    }
    val b = buf(size)
    b.putShort(t.columns.size.toShort)
    t.columns.foreach { c =>
      b.put(c.category.toByte)
      if (c.category == 't') {
        val d = c.data.get.getBytes(StandardCharsets.UTF_8)
        b.putInt(d.length)
        b.put(d)
      }
      if (c.category == 'b') {
        b.putInt(c.bin.get.length)
        b.put(c.bin.get.toArray)
      }
    }
    b.array()
  }

  def encode(msg: PgOutputMessage): Array[Byte] = msg match {
    case Begin(lsn, ts, xid) =>
      val b = buf(21); b.put('B'.toByte); b.putLong(lsn); b.putLong(ts); b.putInt(xid); b.array()
    case Commit(flags, commitLsn, endLsn, ts) =>
      val b = buf(26); b.put('C'.toByte); b.put(flags)
      b.putLong(commitLsn); b.putLong(endLsn); b.putLong(ts); b.array()
    case Origin(lsn, name) =>
      val n = cstr(name)
      val b = buf(9 + n.length); b.put('O'.toByte); b.putLong(lsn); b.put(n); b.array()
    case Relation(relId, ns, name, ri, cols) =>
      val nsB = cstr(ns); val nameB = cstr(name)
      val colBytes = cols.map { c =>
        val cn = cstr(c.name)
        val b = buf(1 + cn.length + 8)
        b.put(if (c.partOfKey) 1.toByte else 0.toByte); b.put(cn)
        b.putInt(c.typeOid); b.putInt(c.typeMod); b.array()
      }
      val b = buf(5 + nsB.length + nameB.length + 1 + 2 + colBytes.map(_.length).sum)
      b.put('R'.toByte); b.putInt(relId); b.put(nsB); b.put(nameB)
      b.put(ri.toByte); b.putShort(cols.size.toShort)
      colBytes.foreach(b.put); b.array()
    case PgType(oid, ns, name) =>
      val nsB = cstr(ns); val nameB = cstr(name)
      val b = buf(5 + nsB.length + nameB.length)
      b.put('Y'.toByte); b.putInt(oid); b.put(nsB); b.put(nameB); b.array()
    case Insert(relId, tuple) =>
      val t = tupleBytes(tuple)
      val b = buf(6 + t.length)
      b.put('I'.toByte); b.putInt(relId); b.put('N'.toByte); b.put(t); b.array()
    case Update(relId, oldKind, oldTuple, newTuple) =>
      val oldB = oldTuple.map(tupleBytes)
      val newB = tupleBytes(newTuple)
      val size = 5 + oldKind.map(_ => 1 + oldB.get.length).getOrElse(0) + 1 + newB.length
      val b = buf(size)
      b.put('U'.toByte); b.putInt(relId)
      oldKind.foreach { k => b.put(k.toByte); b.put(oldB.get) }
      b.put('N'.toByte); b.put(newB); b.array()
    case Delete(relId, kind, tuple) =>
      val t = tupleBytes(tuple)
      val b = buf(6 + t.length)
      b.put('D'.toByte); b.putInt(relId); b.put(kind.toByte); b.put(t); b.array()
    case Truncate(optionBits, relIds) =>
      val b = buf(6 + 4 * relIds.size)
      b.put('T'.toByte); b.putInt(relIds.size); b.put(optionBits)
      relIds.foreach(b.putInt); b.array()
    case LogicalMessage(transactional, lsn, prefix, content) =>
      val p = cstr(prefix)
      val b = buf(10 + p.length + 4 + content.length)
      b.put('M'.toByte); b.put(if (transactional) 1.toByte else 0.toByte)
      b.putLong(lsn); b.put(p); b.putInt(content.length); b.put(content); b.array()
    case StreamStart(xid, first) =>
      val b = buf(6); b.put('S'.toByte); b.putInt(xid)
      b.put(if (first) 1.toByte else 0.toByte); b.array()
    case StreamStop =>
      Array('E'.toByte)
    case StreamCommit(xid, flags, commitLsn, endLsn, ts) =>
      val b = buf(30); b.put('c'.toByte); b.putInt(xid); b.put(flags)
      b.putLong(commitLsn); b.putLong(endLsn); b.putLong(ts); b.array()
    case StreamAbort(xid, subXid) =>
      val b = buf(9); b.put('A'.toByte); b.putInt(xid); b.putInt(subXid); b.array()
    case BeginPrepare(pLsn, endLsn, ts, xid, gid) =>
      val g = cstr(gid)
      val b = buf(29 + g.length); b.put('b'.toByte)
      b.putLong(pLsn); b.putLong(endLsn); b.putLong(ts); b.putInt(xid); b.put(g); b.array()
    case Prepare(flags, pLsn, endLsn, ts, xid, gid) =>
      val g = cstr(gid)
      val b = buf(30 + g.length); b.put('P'.toByte); b.put(flags)
      b.putLong(pLsn); b.putLong(endLsn); b.putLong(ts); b.putInt(xid); b.put(g); b.array()
    case CommitPrepared(flags, cLsn, endLsn, ts, xid, gid) =>
      val g = cstr(gid)
      val b = buf(30 + g.length); b.put('K'.toByte); b.put(flags)
      b.putLong(cLsn); b.putLong(endLsn); b.putLong(ts); b.putInt(xid); b.put(g); b.array()
    case RollbackPrepared(flags, pEnd, rEnd, pTs, rTs, xid, gid) =>
      val g = cstr(gid)
      val b = buf(38 + g.length); b.put('r'.toByte); b.put(flags)
      b.putLong(pEnd); b.putLong(rEnd); b.putLong(pTs); b.putLong(rTs)
      b.putInt(xid); b.put(g); b.array()
    case StreamPrepare(flags, pLsn, endLsn, ts, xid, gid) =>
      val g = cstr(gid)
      val b = buf(30 + g.length); b.put('p'.toByte); b.put(flags)
      b.putLong(pLsn); b.putLong(endLsn); b.putLong(ts); b.putInt(xid); b.put(g); b.array()
    // Protocol-v2 in-stream layout: the (sub)transaction xid is spliced in
    // right after the inner frame's type byte.
    case StreamedPart(xid, inner) =>
      val innerBytes = encode(inner)
      val b = buf(innerBytes.length + 4)
      b.put(innerBytes(0)); b.putInt(xid)
      b.put(innerBytes, 1, innerBytes.length - 1); b.array()
  }
}
