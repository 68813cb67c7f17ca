package graft.decode

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, rng}

/** Golden pgoutput frames ported byte-for-byte from the reference's unit
  * tests (/root/reference/tests/test_decoders.py:8-143, via FIXTURES.md §A),
  * plus encode→decode round-trip properties the reference lacks. */
class PgOutputDecoderSpec extends AnyFunSuite {

  /** Parse a Python bytes-literal body (the exact text between b"…") into
    * bytes: handles \xNN plus the escapes the fixtures use. */
  private def frame(pyLiteral: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    var i = 0
    while (i < pyLiteral.length) {
      val c = pyLiteral.charAt(i)
      if (c == '\\' && i + 1 < pyLiteral.length) {
        pyLiteral.charAt(i + 1) match {
          case 'x' =>
            out.write(Integer.parseInt(pyLiteral.substring(i + 2, i + 4), 16)); i += 4
          case 'n' => out.write('\n'); i += 2
          case 'r' => out.write('\r'); i += 2
          case 't' => out.write('\t'); i += 2
          case '\\' => out.write('\\'); i += 2
          case '"' => out.write('"'); i += 2
          case '0' => out.write(0); i += 2
          case other => out.write(other.toInt); i += 2
        }
      } else { out.write(c.toInt); i += 1 }
    }
    out.toByteArray
  }

  private def unixMicros(iso: String): Long = {
    val inst = java.time.Instant.parse(iso)
    inst.getEpochSecond * 1000000L + inst.getNano / 1000L
  }

  test("Relation golden frame (test_decoders.py:8-24)") {
    val r = PgOutputDecoder.decode(frame(
      "R\\x00\\x00@\\x01public\\x00test_table\\x00d\\x00\\x02\\x01id\\x00\\x00\\x00\\x00\\x17\\xff\\xff\\xff\\xff\\x00created\\x00\\x00\\x00\\x04\\xa0\\xff\\xff\\xff\\xff"
    )).asInstanceOf[Relation]
    assert(r.relationId === 16385)
    assert(r.namespace === "public")
    assert(r.name === "test_table")
    assert(r.replicaIdentity === 'd')
    assert(r.columns.size === 2)
    assert(r.columns(0) === RelationColumn(partOfKey = true, "id", 23, -1))
    assert(r.columns(1) === RelationColumn(partOfKey = false, "created", 1184, -1))
    assert(r.keyColumnNames === Vector("id"))
  }

  test("Begin golden frame; xid read as Int32 (test_decoders.py:36-44, decoders.py:183 bug fixed)") {
    val b = PgOutputDecoder.decode(frame(
      "B\\x00\\x00\\x00\\x00\\x01f4\\x98\\x00\\x02ck\\xd8i\\x8a1\\x00\\x00\\x01\\xeb"
    )).asInstanceOf[Begin]
    assert(b.finalLsn === 23475352L)
    assert(b.xid === 491)
    assert(PgOutputDecoder.pgMicrosToUnixMicros(b.commitTs) ===
      unixMicros("2021-04-20T20:13:16.867121Z"))
  }

  test("Insert golden frame (test_decoders.py:53-68)") {
    val i = PgOutputDecoder.decode(frame(
      "I\\x00\\x00@\\x01N\\x00\\x02t\\x00\\x00\\x00\\x015t\\x00\\x00\\x00\\x162012-01-01 12:00:00+00"
    )).asInstanceOf[Insert]
    assert(i.relationId === 16385)
    assert(i.newTuple.columns === Vector(
      ColumnData('t', Some("5")), ColumnData('t', Some("2012-01-01 12:00:00+00"))))
  }

  test("Update golden frame, no old image (test_decoders.py:77-81)") {
    val u = PgOutputDecoder.decode(frame(
      "U\\x00\\x00@\\x01N\\x00\\x02t\\x00\\x00\\x00\\x015t\\x00\\x00\\x00\\x162013-01-01 12:00:00+00"
    )).asInstanceOf[Update]
    assert(u.relationId === 16385)
    assert(u.oldKind === None)
    assert(u.oldTuple === None)
    assert(u.newTuple.columns === Vector(
      ColumnData('t', Some("5")), ColumnData('t', Some("2013-01-01 12:00:00+00"))))
  }

  test("Delete golden frame, key-only with NULL (test_decoders.py:90-94)") {
    val d = PgOutputDecoder.decode(frame(
      "D\\x00\\x00@\\x01K\\x00\\x02t\\x00\\x00\\x00\\x014n"
    )).asInstanceOf[Delete]
    assert(d.relationId === 16385)
    assert(d.oldKind === 'K')
    assert(d.oldTuple.columns === Vector(
      ColumnData('t', Some("4")), ColumnData('n', None)))
    assert(d.oldTuple.columns(1).isNull)
  }

  test("Commit golden frame (test_decoders.py:103-111)") {
    val c = PgOutputDecoder.decode(frame(
      "C\\x00\\x00\\x00\\x00\\x00\\x01f4\\x98\\x00\\x00\\x00\\x00\\x01f4\\xc8\\x00\\x02cl\\x83\\x8f\\xd2\\xa1"
    )).asInstanceOf[Commit]
    assert(c.flags === 0)
    assert(c.commitLsn === 23475352L)
    assert(c.endLsn === 23475400L)
    assert(PgOutputDecoder.pgMicrosToUnixMicros(c.commitTs) ===
      unixMicros("2021-04-20T21:01:08.279969Z"))
  }

  test("Truncate golden frame (test_decoders.py:120-125; reference generator bug fixed)") {
    val t = PgOutputDecoder.decode(frame(
      "T\\x00\\x00\\x00\\x01\\x00\\x00\\x00@\\x01"
    )).asInstanceOf[Truncate]
    assert(t.relationIds === Vector(16385))
    assert(t.optionBits === 0)
    assert(!t.cascade && !t.restartIdentity)
  }

  test("wrong first byte rejected per type (test_decoders.py negative cases)") {
    val begin = frame("B\\x00\\x00\\x00\\x00\\x01f4\\x98\\x00\\x02ck\\xd8i\\x8a1\\x00\\x00\\x01\\xeb")
    intercept[PgOutputDecodeException] {
      PgOutputDecoder.decodeAs[Relation](begin, 'R')
    }
    intercept[PgOutputDecodeException] {
      PgOutputDecoder.decode(frame("Zbogus"))
    }
  }

  test("truncated and empty frames raise the typed decode error (one catch type)") {
    val e = intercept[PgOutputDecodeException] {
      PgOutputDecoder.decode(frame("B\\x00\\x00\\x00"))
    }
    assert(e.getMessage.contains("truncated 'B' frame"))
    intercept[PgOutputDecodeException] {
      PgOutputDecoder.decode(Array.empty[Byte])
    }
  }

  test("unchanged-TOAST category 'u' is distinct from NULL (decoders.py:131-137)") {
    val tuple = TupleData(Vector(
      ColumnData('t', Some("1")), ColumnData('u', None), ColumnData('n', None)))
    val encoded = PgOutputEncoder.encode(Insert(42, tuple))
    val decoded = PgOutputDecoder.decode(encoded).asInstanceOf[Insert]
    assert(decoded.newTuple.columns(1).isUnchangedToast)
    assert(!decoded.newTuple.columns(1).isNull)
    assert(decoded.newTuple.columns(2).isNull)
    assert(!decoded.newTuple.columns(2).isUnchangedToast)
  }

  test("fuzz: random garbage never escapes the typed error channel (500 payloads)") {
    val rnd = new scala.util.Random(1234)
    var decoded = 0
    var rejected = 0
    (1 to 500).foreach { _ =>
      val payload = new Array[Byte](rnd.nextInt(64))
      rnd.nextBytes(payload)
      try { PgOutputDecoder.decode(payload); decoded += 1 }
      catch {
        case _: PgOutputDecodeException => rejected += 1
        // anything else (NegativeArraySize, OOM-sized alloc, NPE) fails
      }
    }
    assert(decoded + rejected === 500)
    assert(rejected > 400) // random bytes are overwhelmingly invalid
  }

  // --- round-trip properties (encode → decode === identity) ---

  private val genName: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(32))
  private val genColumnData: Gen[ColumnData] = Gen.oneOf(
    Gen.const(ColumnData('n', None)),
    Gen.const(ColumnData('u', None)),
    Gen.asciiPrintableStr.map(s => ColumnData('t', Some(s))),
    Gen.const(ColumnData('t', Some("héllo wörld ✓"))),
    // binary-mode column ('b', pgoutput binary 'true'): opaque bytes on
    // the wire — framing must round-trip them bit-for-bit
    Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(bs =>
      ColumnData('b', None,
        Some(scala.collection.immutable.ArraySeq.from(bs.take(32))))))
  private val genTuple: Gen[TupleData] =
    Gen.listOf(genColumnData).map(l => TupleData(l.take(16).toVector))

  private val genMessage: Gen[PgOutputMessage] = Gen.oneOf(
    for { l <- Gen.long; t <- Gen.long; x <- Gen.posNum[Int] } yield Begin(l, t, x),
    for { f <- Gen.oneOf(0, 1); c <- Gen.long; e <- Gen.long; t <- Gen.long }
      yield Commit(f.toByte, c, e, t),
    for { l <- Gen.long; n <- genName } yield Origin(l, n),
    for {
      id <- Gen.posNum[Int]; ns <- genName; nm <- genName
      ri <- Gen.oneOf('d', 'f', 'i', 'n')
      cols <- Gen.listOf(for {
        pk <- Gen.oneOf(true, false); cn <- genName
        oid <- Gen.posNum[Int]; tm <- Gen.oneOf(-1, 4, 1048580)
      } yield RelationColumn(pk, cn, oid, tm)).map(_.take(8).toVector)
    } yield Relation(id, ns, nm, ri, cols),
    for { oid <- Gen.posNum[Int]; ns <- genName; nm <- genName } yield PgType(oid, ns, nm),
    for { id <- Gen.posNum[Int]; t <- genTuple } yield Insert(id, t),
    for {
      id <- Gen.posNum[Int]
      old <- Gen.option(for { k <- Gen.oneOf('K', 'O'); t <- genTuple } yield (k, t))
      nt <- genTuple
    } yield Update(id, old.map(_._1), old.map(_._2), nt),
    for { id <- Gen.posNum[Int]; k <- Gen.oneOf('K', 'O'); t <- genTuple }
      yield Delete(id, k, t),
    for { bits <- Gen.oneOf(0, 1, 2, 3); ids <- Gen.nonEmptyListOf(Gen.posNum[Int]) }
      yield Truncate(bits.toByte, ids.take(8).toVector))

  test("encode→decode round-trips every message type (500 random messages)") {
    val seed0 = rng.Seed(42L)
    var seed = seed0
    var i = 0
    var checked = 0
    while (i < 500) {
      genMessage.apply(Gen.Parameters.default, seed).foreach { m =>
        assert(PgOutputDecoder.decode(PgOutputEncoder.encode(m)) === m)
        checked += 1
      }
      seed = seed.next
      i += 1
    }
    assert(checked > 400)
  }

  test("logical message 'M' round-trips (transactional + not, empty + binary content)") {
    val msgs = Seq(
      LogicalMessage(transactional = true, 0x1000L, "audit", "k=1".getBytes("UTF-8")),
      LogicalMessage(transactional = false, 77L, "", Array[Byte](0, -1, 127)),
      LogicalMessage(transactional = true, Long.MaxValue, "p", Array.emptyByteArray))
    msgs.foreach(m => assert(PgOutputDecoder.decode(PgOutputEncoder.encode(m)) === m))
  }

  test("stream control frames S/E/c/A round-trip") {
    val msgs = Seq(
      StreamStart(491, firstSegment = true), StreamStart(7, firstSegment = false),
      StreamStop,
      StreamCommit(491, 0, 0x1234L, 0x1250L, 99L),
      StreamAbort(491, 492), StreamAbort(491, 491))
    msgs.foreach(m => assert(PgOutputDecoder.decode(PgOutputEncoder.encode(m)) === m))
  }

  test("two-phase-commit frames b/P/K/r round-trip") {
    val msgs = Seq(
      BeginPrepare(0x100L, 0x110L, 5000L, 42, "tx-gid-1"),
      Prepare(0, 0x100L, 0x110L, 5000L, 42, "tx-gid-1"),
      CommitPrepared(0, 0x200L, 0x210L, 6000L, 42, "tx-gid-1"),
      RollbackPrepared(0, 0x110L, 0x220L, 5000L, 7000L, 42, ""),
      StreamPrepare(0, 0x100L, 0x110L, 5000L, 42, "gid-streamed"))
    msgs.foreach(m => assert(PgOutputDecoder.decode(PgOutputEncoder.encode(m)) === m))
  }

  test("in-stream frames carry the xid after the type byte (protocol v2 layout)") {
    val inner = Insert(99, TupleData(Vector(ColumnData('t', Some("7")))))
    val wire = PgOutputEncoder.encode(StreamedPart(491, inner))
    // stateless view mis-parses in-stream layout by design; the stream-aware
    // call recovers both the xid and the inner message
    assert(wire(0).toChar === 'I')
    val decoded = PgOutputDecoder.decode(wire, inStream = true)
    assert(decoded === StreamedPart(491, inner))
    // control frames parse identically whether or not a stream is open
    val s = PgOutputEncoder.encode(StreamStart(5, firstSegment = true))
    assert(PgOutputDecoder.decode(s, inStream = true) === StreamStart(5, firstSegment = true))
  }
}
