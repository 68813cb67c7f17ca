package graft.decode

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, rng}
import scala.collection.immutable.ArraySeq

/** Binary transfer mode (pgoutput `binary 'true'`, PG 14+ — a protocol
  * surface the text-only reference lacks, decoders.py:125-158): golden wire
  * vectors per type, text⇄binary round-trip properties, and the decode
  * boundary end-to-end (binary Insert frame → ChangeEventBuilder → the
  * same text image the text mode produces). Live twin: LivePgSpec's
  * binary-mode leg drives the same matrix off a real walsender. */
class PgBinarySpec extends AnyFunSuite {

  private def render(oid: Int, bytes: Array[Byte]) = PgBinary.render(oid, bytes)
  private def rt(oid: Int, text: String): String =
    PgBinary.render(oid, PgBinary.encode(oid, text))

  /** Drive a Gen through 300 seeded samples (the repo's scalacheck style —
    * no scalatestplus runner in the offline dependency set). */
  private def check[A](gen: Gen[A])(body: A => Unit): Unit = {
    var seed = rng.Seed(4242L)
    var i = 0
    var checked = 0
    while (i < 300) {
      gen.apply(Gen.Parameters.default, seed).foreach { a => body(a); checked += 1 }
      seed = seed.next
      i += 1
    }
    assert(checked > 250)
  }

  test("bool / int2 / int4 / int8 golden vectors") {
    assert(render(PgBinary.BoolOid, Array[Byte](1)) === "t")
    assert(render(PgBinary.BoolOid, Array[Byte](0)) === "f")
    assert(render(PgBinary.Int2Oid, Array[Byte](0x7f, -1)) === "32767")
    assert(render(PgBinary.Int4Oid, Array[Byte](-1, -1, -1, -1)) === "-1")
    assert(render(PgBinary.Int8Oid,
      Array[Byte](0, 0, 0, 0, 0, 0, 0x30, 0x39)) === "12345")
  }

  test("float4/float8: special values match pg text; finite values parse-equal") {
    assert(rt(PgBinary.Float4Oid, "NaN") === "NaN")
    assert(rt(PgBinary.Float8Oid, "Infinity") === "Infinity")
    assert(rt(PgBinary.Float8Oid, "-Infinity") === "-Infinity")
    // raw text may differ from pg's shortest repr (documented); the parse
    // must land on the identical IEEE value — what the typed view compares
    check(Gen.chooseNum(-1e18, 1e18)) { d =>
      assert(rt(PgBinary.Float8Oid, d.toString).toDouble === d)
    }
  }

  test("numeric golden vectors (base-10000 digit groups, dscale padding)") {
    assert(rt(PgBinary.NumericOid, "12345.6789") === "12345.6789")
    assert(rt(PgBinary.NumericOid, "0.00012") === "0.00012")
    assert(rt(PgBinary.NumericOid, "-0.5") === "-0.5")
    assert(rt(PgBinary.NumericOid, "10000") === "10000")
    assert(rt(PgBinary.NumericOid, "99999999.99999999") === "99999999.99999999")
    assert(rt(PgBinary.NumericOid, "0.000") === "0.000") // dscale survives zero
    assert(rt(PgBinary.NumericOid, "1000000000000.000001") === "1000000000000.000001")
    assert(rt(PgBinary.NumericOid, "NaN") === "NaN")
    // negative zero normalizes to positive zero (pg numeric has no -0)
    assert(rt(PgBinary.NumericOid, "-0.00") === "0.00")
  }

  test("numeric round-trip property over random scaled decimals") {
    val gen = for {
      unscaled <- Gen.chooseNum(Long.MinValue + 1, Long.MaxValue)
      scale <- Gen.chooseNum(0, 12)
    } yield java.math.BigDecimal.valueOf(unscaled, scale).toPlainString
    check(gen) { text =>
      assert(rt(PgBinary.NumericOid, text) === text)
    }
  }

  test("date / time / timestamp / timestamptz golden vectors") {
    assert(rt(PgBinary.DateOid, "2000-01-01") === "2000-01-01")
    assert(rt(PgBinary.DateOid, "1970-06-15") === "1970-06-15")
    assert(rt(PgBinary.DateOid, "2024-02-29") === "2024-02-29")
    assert(rt(PgBinary.TimeOid, "00:00:00") === "00:00:00")
    assert(rt(PgBinary.TimeOid, "23:59:59.000125") === "23:59:59.000125")
    // fraction trimming matches pg output (".5", not ".500000")
    assert(rt(PgBinary.TimestampOid, "2024-03-01 12:34:56.5") === "2024-03-01 12:34:56.5")
    assert(rt(PgBinary.TimestampOid, "1999-12-31 23:59:59.999999") === "1999-12-31 23:59:59.999999")
    assert(rt(PgBinary.TimestampOid, "2024-03-01 12:34:56") === "2024-03-01 12:34:56")
    assert(rt(PgBinary.TimestamptzOid, "2024-03-01 12:34:56.25+00") === "2024-03-01 12:34:56.25+00")
    assert(rt(PgBinary.TimestampOid, "infinity") === "infinity")
  }

  test("timestamp round-trip property over the pg epoch range") {
    check(Gen.chooseNum(-2208988800000000L, 4102444800000000L)) { us =>
      val text = PgBinary.render(PgBinary.TimestampOid,
        java.nio.ByteBuffer.allocate(8).putLong(us).array())
      assert(rt(PgBinary.TimestampOid, text) === text)
    }
  }

  test("uuid / bytea / jsonb / text golden vectors") {
    assert(rt(PgBinary.UuidOid, "a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11")
      === "a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11")
    assert(rt(PgBinary.ByteaOid, "\\x00ff10ab") === "\\x00ff10ab")
    assert(render(PgBinary.ByteaOid, Array.emptyByteArray) === "\\x")
    assert(rt(PgBinary.JsonbOid, """{"a": [1, 2], "b": "x"}""") === """{"a": [1, 2], "b": "x"}""")
    assert(rt(PgBinary.TextOid, "héllo wörld 世界") === "héllo wörld 世界")
    intercept[PgOutputDecodeException] { // jsonb version byte must be 1
      render(PgBinary.JsonbOid, Array[Byte](2, '{'.toByte, '}'.toByte))
    }
  }

  test("arrays: element quoting, NULLs, empty, non-default lower bound") {
    assert(rt(1007, "{1,2,NULL,-5}") === "{1,2,NULL,-5}")
    assert(rt(1009, "{a,NULL,\"x,y\",\"he said \\\"hi\\\"\",\"\"}")
      === "{a,NULL,\"x,y\",\"he said \\\"hi\\\"\",\"\"}")
    assert(rt(1009, "{\"NULL\"}") === "{\"NULL\"}") // literal string "NULL" stays quoted
    assert(rt(1007, "{}") === "{}")
    assert(rt(1231, "{1.50,NULL,-0.25}") === "{1.50,NULL,-0.25}")
    // non-default lower bound carries the dims prefix, as array_out does
    val withLb = PgBinary.encodeArray(PgBinary.Int4Oid,
      Seq(Some("7"), Some("8")), lbound = 0)
    assert(render(1007, withLb) === "[0:1]={7,8}")
  }

  test("interval golden vectors (postgres IntervalStyle, is_before '+' rule)") {
    assert(rt(PgBinary.IntervalOid, "1 year 2 mons 3 days 04:05:06.5")
      === "1 year 2 mons 3 days 04:05:06.5")
    assert(rt(PgBinary.IntervalOid, "-1 years -2 mons") === "-1 years -2 mons")
    assert(rt(PgBinary.IntervalOid, "-1 days +02:00:00") === "-1 days +02:00:00")
    // is_before carries ONLY the previous field's sign: '+' lands on days
    // (after negative mons) but NOT on the time (after positive days)
    assert(rt(PgBinary.IntervalOid, "-1 mons +5 days 01:00:00")
      === "-1 mons +5 days 01:00:00")
    // year/mon share the months field, so both always carry the same sign
    assert(rt(PgBinary.IntervalOid, "-1 years -1 mons") === "-1 years -1 mons")
    assert(rt(PgBinary.IntervalOid, "5 days -01:00:00") === "5 days -01:00:00")
    assert(rt(PgBinary.IntervalOid, "-1 years -1 mons +3 days -00:00:01.5")
      === "-1 years -1 mons +3 days -00:00:01.5")
    assert(rt(PgBinary.IntervalOid, "00:00:00") === "00:00:00")
    assert(rt(PgBinary.IntervalOid, "-00:00:01") === "-00:00:01")
    // time field is unnormalized hours — 25:00:00 stays 25:00:00
    assert(rt(PgBinary.IntervalOid, "25:00:00") === "25:00:00")
    assert(rt(PgBinary.IntervalOid, "1 mon") === "1 mon")
  }

  test("inet / cidr / macaddr golden vectors incl. IPv6 compression") {
    assert(rt(PgBinary.InetOid, "192.168.0.1") === "192.168.0.1")
    assert(rt(PgBinary.InetOid, "10.0.0.0/8") === "10.0.0.0/8")
    assert(rt(PgBinary.CidrOid, "10.0.0.0/8") === "10.0.0.0/8")
    assert(rt(PgBinary.InetOid, "::1") === "::1")
    assert(rt(PgBinary.InetOid, "fe80::1") === "fe80::1")
    assert(rt(PgBinary.InetOid, "2001:db8::ff00:42:8329") === "2001:db8::ff00:42:8329")
    assert(rt(PgBinary.InetOid, "2001:db8:1:2:3:4:5:6") === "2001:db8:1:2:3:4:5:6")
    // single zero group is NOT compressed (inet_ntop rule)
    assert(rt(PgBinary.InetOid, "2001:db8:0:1:1:1:1:1") === "2001:db8:0:1:1:1:1:1")
    // v4-mapped tail renders dotted (hand-built payload: Java's getByName
    // would collapse ::ffff:v4 to a plain Inet4Address)
    val mapped = Array[Byte](3, 128.toByte, 0, 16) ++
      Array.fill[Byte](10)(0) ++ Array[Byte](-1, -1) ++
      Array[Byte](192.toByte, 168.toByte, 0, 1)
    assert(render(PgBinary.InetOid, mapped) === "::ffff:192.168.0.1")
    assert(rt(PgBinary.MacaddrOid, "08:00:2b:01:02:03") === "08:00:2b:01:02:03")
  }

  test("unsupported oid raises the typed decode error") {
    val e = intercept[PgOutputDecodeException] {
      render(3614 /* tsvector */, Array[Byte](0, 0, 0, 0))
    }
    assert(e.getMessage.contains("3614"))
  }

  test("unsupported oid at the image boundary names the relation and column") {
    val rel = Relation(7, "public", "netlog", 'd', Vector(
      RelationColumn(partOfKey = true, "id", PgBinary.Int8Oid, -1),
      RelationColumn(partOfKey = false, "tsv", 3614 /* tsvector */, -1)))
    val tuple = TupleData(Vector(
      ColumnData('b', None, Some(ArraySeq.unsafeWrapArray(
        PgBinary.encode(PgBinary.Int8Oid, "1")))),
      ColumnData('b', None, Some(ArraySeq[Byte](0, 0, 0, 0)))))
    val builder = new ChangeEventBuilder(new SchemaRegistry)
    builder.process(1L, rel)
    builder.process(2L, Begin(100L, 0L, 1))
    val e = intercept[PgOutputDecodeException] {
      builder.process(3L, Insert(7, tuple))
    }
    assert(e.getMessage.contains("public.netlog.tsv"), e.getMessage)
    assert(e.getMessage.contains("3614"), e.getMessage)
  }

  test("binary Insert frame end-to-end: decode + builder yield the text-mode image") {
    val rel = Relation(42, "public", "typed", 'd', Vector(
      RelationColumn(partOfKey = true, "id", PgBinary.Int8Oid, -1),
      RelationColumn(partOfKey = false, "price", PgBinary.NumericOid, -1),
      RelationColumn(partOfKey = false, "ok", PgBinary.BoolOid, -1),
      RelationColumn(partOfKey = false, "ts", PgBinary.TimestampOid, -1),
      RelationColumn(partOfKey = false, "tags", 1009, -1),
      RelationColumn(partOfKey = false, "note", PgBinary.TextOid, -1)))
    def b(oid: Int, text: String) =
      ColumnData('b', None, Some(ArraySeq.unsafeWrapArray(PgBinary.encode(oid, text))))
    val tuple = TupleData(Vector(
      b(PgBinary.Int8Oid, "7"), b(PgBinary.NumericOid, "19.99"),
      b(PgBinary.BoolOid, "t"), b(PgBinary.TimestampOid, "2024-03-01 12:00:00.5"),
      b(1009, "{a,\"x y\"}"), ColumnData('n', None)))
    // encode → decode through the real wire framing ('b' categories survive)
    val frame = PgOutputEncoder.encode(Insert(42, tuple))
    val decoded = PgOutputDecoder.decode(frame).asInstanceOf[Insert]
    assert(decoded.newTuple === tuple)
    val reg = new SchemaRegistry
    val builder = new ChangeEventBuilder(reg)
    builder.process(1L, rel)
    builder.process(2L, Begin(100L, 5000L, 9))
    val ev = builder.process(3L, decoded).head
    assert(ev.after === Map(
      "id" -> "7", "price" -> "19.99", "ok" -> "t",
      "ts" -> "2024-03-01 12:00:00.5", "tags" -> "{a,\"x y\"}", "note" -> null))
    assert(ev.key === Map("id" -> "7"))
  }
}
