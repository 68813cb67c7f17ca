package graft.decode

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.time.{LocalDate, LocalDateTime, ZoneOffset}

/** PG binary transfer format for pgoutput `binary 'true'` (PG 14+).
  *
  * With the `binary` option, the walsender ships column values of every
  * type that has a binary send function in their binary representation
  * (TupleData category byte 'b' instead of 't') — the reference client is
  * text-only (decoders.py:125-158 knows only 'n'/'u'/'t'). At CDC scale the
  * binary form matters: the server skips the type output functions and a
  * numeric/timestamp-heavy row shrinks substantially on the wire.
  *
  * Design: binary values are rendered back to the CANONICAL TEXT the text
  * mode would have produced, at the decode boundary (`imageOf`), so the
  * entire downstream — string-map envelope, typed views, compaction,
  * sinks, oracles — is byte-identical between modes. Two documented
  * exceptions where we render a parse-equal but not byte-identical text:
  * float4/float8 (Java's round-trip-exact repr vs PG's Ryu shortest — the
  * typed view casts both to the identical IEEE value) and BC dates (no
  * " BC" suffix). The per-type wire layouts below are public knowledge:
  * each type's send/recv pair in the PostgreSQL sources (e.g.
  * numeric_send: ndigits/weight/sign/dscale + base-10000 digits,
  * array_send: ndim/hasnull/elemoid + dims + length-prefixed elements).
  *
  * The symmetric encoders exist for the synthetic producers and golden
  * tests — live coverage is `LivePgSpec`'s binary-mode leg against a real
  * walsender.
  */
object PgBinary {

  /** PG epoch (2000-01-01T00:00:00Z) in unix seconds. */
  private val PgEpochSec = 946684800L

  // ---- scalar type oids (pg_type.dat — public catalog constants) ----
  val BoolOid = 16; val ByteaOid = 17; val CharOid = 18; val NameOid = 19
  val Int8Oid = 20; val Int2Oid = 21; val Int4Oid = 23; val OidOid = 26
  val TextOid = 25; val JsonOid = 114; val Float4Oid = 700; val Float8Oid = 701
  val BpcharOid = 1042; val VarcharOid = 1043
  val DateOid = 1082; val TimeOid = 1083
  val TimestampOid = 1114; val TimestamptzOid = 1184
  val NumericOid = 1700; val UuidOid = 2950; val JsonbOid = 3802
  val IntervalOid = 1186; val InetOid = 869; val CidrOid = 650
  val MacaddrOid = 829

  /** array-type oid → element oid (the payload header repeats the element
    * oid; the map is what routes a column's declared type to array render). */
  val ArrayElem: Map[Int, Int] = Map(
    1000 -> BoolOid, 1001 -> ByteaOid, 1003 -> NameOid, 1005 -> Int2Oid,
    1007 -> Int4Oid, 1016 -> Int8Oid, 1021 -> Float4Oid, 1022 -> Float8Oid,
    1009 -> TextOid, 1014 -> BpcharOid, 1015 -> VarcharOid,
    1182 -> DateOid, 1183 -> TimeOid, 1115 -> TimestampOid,
    1185 -> TimestamptzOid, 1231 -> NumericOid, 2951 -> UuidOid,
    199 -> JsonOid, 3807 -> JsonbOid,
    1187 -> IntervalOid, 1041 -> InetOid, 651 -> CidrOid, 1040 -> MacaddrOid)

  private def be(bytes: Array[Byte]): ByteBuffer =
    ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)

  /** Render a binary wire value to the text the type's output function
    * produces. Throws [[PgOutputDecodeException]] for an oid outside the
    * supported matrix (the caller surfaces it; disable binary mode or
    * extend the matrix for exotic column types) AND for malformed
    * payloads — raw JVM errors (BufferUnderflow, index bounds) from
    * truncated/garbage bytes are converted to the typed error, the same
    * contract readTupleData pins for frame-level garbage. */
  def render(typeOid: Int, bytes: Array[Byte]): String =
    try renderUnsafe(typeOid, bytes)
    catch {
      case e: PgOutputDecodeException => throw e
      case e @ (_: java.nio.BufferUnderflowException |
                _: IndexOutOfBoundsException | _: NumberFormatException |
                _: java.time.DateTimeException) =>
        throw new PgOutputDecodeException(
          s"malformed binary value for type oid $typeOid " +
            s"(${bytes.length} bytes): $e", e)
    }

  private def renderUnsafe(typeOid: Int, bytes: Array[Byte]): String = typeOid match {
    case BoolOid => if (bytes(0) == 1) "t" else "f"
    case ByteaOid =>
      val sb = new StringBuilder(2 + bytes.length * 2); sb.append("\\x")
      bytes.foreach(b => sb.append(f"${b & 0xff}%02x")); sb.toString
    case CharOid | NameOid | TextOid | BpcharOid | VarcharOid | JsonOid =>
      new String(bytes, StandardCharsets.UTF_8)
    case Int2Oid => be(bytes).getShort.toString
    case Int4Oid => be(bytes).getInt.toString
    case Int8Oid => be(bytes).getLong.toString
    case OidOid => (be(bytes).getInt.toLong & 0xffffffffL).toString
    case Float4Oid => floatText(java.lang.Float.intBitsToFloat(be(bytes).getInt))
    case Float8Oid => doubleText(java.lang.Double.longBitsToDouble(be(bytes).getLong))
    case NumericOid => numericText(bytes)
    case DateOid => dateText(be(bytes).getInt)
    case TimeOid => timeText(be(bytes).getLong)
    case TimestampOid => timestampText(be(bytes).getLong, tz = false)
    case TimestamptzOid => timestampText(be(bytes).getLong, tz = true)
    case UuidOid =>
      val b = be(bytes)
      f"${b.getInt.toLong & 0xffffffffL}%08x-${b.getShort & 0xffff}%04x-" +
        f"${b.getShort & 0xffff}%04x-${b.getShort & 0xffff}%04x-" +
        f"${(b.getShort & 0xffff).toLong}%04x${b.getInt.toLong & 0xffffffffL}%08x"
    case JsonbOid =>
      if (bytes.isEmpty || bytes(0) != 1)
        throw new PgOutputDecodeException(
          s"jsonb binary version ${if (bytes.isEmpty) "<empty>" else bytes(0)} (expected 1)")
      new String(bytes, 1, bytes.length - 1, StandardCharsets.UTF_8)
    case IntervalOid =>
      val b = be(bytes); intervalText(b.getLong, b.getInt, b.getInt)
    case InetOid | CidrOid => inetText(bytes, cidr = typeOid == CidrOid)
    case MacaddrOid =>
      bytes.map(x => f"${x & 0xff}%02x").mkString(":")
    case oid if ArrayElem.contains(oid) => arrayText(bytes)
    case oid =>
      throw new PgOutputDecodeException(
        s"binary value for unsupported type oid $oid — extend PgBinary or run without binary mode")
  }

  /** interval_send layout: i64 time µs, i32 days, i32 months. Text is the
    * default `IntervalStyle = postgres` form: signed year/mon/day fields
    * when nonzero (plural unless the value is exactly 1), then the
    * [sign]HH:MM:SS[.ffffff] time — shown when nonzero or when nothing
    * else printed. Sign rule (EncodeInterval/AddPostgresIntPart): a
    * POSITIVE part directly after a NEGATIVE printed part gets an explicit
    * '+' — `is_before` carries only the PREVIOUS printed field's sign, so
    * '-1 mons 5 days 1 hour' renders "-1 mons +5 days 01:00:00" (plus on
    * days, none on the time, whose predecessor is the positive days). */
  private def intervalText(us: Long, days: Int, months: Int): String = {
    val years = months / 12
    val mons = months % 12
    val sb = new StringBuilder
    var isZero = true
    var isBefore = false
    def unit(v: Long, name: String): Unit = if (v != 0) {
      if (!isZero) sb.append(' ')
      if (isBefore && v > 0) sb.append('+')
      sb.append(v).append(' ').append(name)
      if (v != 1) sb.append('s')
      isBefore = v < 0
      isZero = false
    }
    unit(years.toLong, "year")
    unit(mons.toLong, "mon")
    unit(days.toLong, "day")
    if (us != 0 || isZero) {
      if (!isZero) sb.append(' ')
      if (us < 0) sb.append('-')
      else if (isBefore) sb.append('+')
      val a = math.abs(us)
      val sec = a / 1000000L
      sb.append(f"${sec / 3600}%02d:${(sec / 60) % 60}%02d:${sec % 60}%02d")
      sb.append(fracText(a % 1000000L))
    }
    sb.toString
  }

  /** inet_send layout: family (2 = IPv4, 3 = IPv6 in pg's private
    * numbering), bits, is_cidr, nb, address bytes. IPv6 renders with the
    * classic inet_ntop compression: longest ≥2-group zero run (leftmost on
    * tie) collapses to '::'; ::/::ffff: v4-embedded tails render dotted. */
  private def inetText(bytes: Array[Byte], cidr: Boolean): String = {
    val b = be(bytes)
    val family = b.get() & 0xff
    val bits = b.get() & 0xff
    b.get() // is_cidr flag (the declared type decides the suffix rule)
    val nb = b.get() & 0xff
    val addr = new Array[Byte](nb); b.get(addr)
    val host = family match {
      case 2 => addr.map(x => (x & 0xff).toString).mkString(".")
      case 3 =>
        val g = Array.tabulate(8)(i =>
          ((addr(2 * i) & 0xff) << 8) | (addr(2 * i + 1) & 0xff))
        // longest zero run of length >= 2, leftmost wins ties
        var bestStart = -1; var bestLen = 0
        var i = 0
        while (i < 8) {
          if (g(i) == 0) {
            var j = i
            while (j < 8 && g(j) == 0) j += 1
            if (j - i > bestLen) { bestStart = i; bestLen = j - i }
            i = j
          } else i += 1
        }
        if (bestLen < 2) { bestStart = -1; bestLen = 0 }
        val v4Tail = bestStart == 0 &&
          (bestLen == 6 || (bestLen == 5 && g(5) == 0xffff))
        val sb = new StringBuilder
        var k = 0
        while (k < 8) {
          if (k == bestStart) {
            sb.append("::"); k += bestLen
            if (v4Tail && k <= 6) {
              if (g(5) == 0xffff && bestLen == 5) sb.append("ffff:")
              sb.append(s"${addr(12) & 0xff}.${addr(13) & 0xff}." +
                s"${addr(14) & 0xff}.${addr(15) & 0xff}")
              k = 8
            }
          } else {
            if (sb.nonEmpty && sb.charAt(sb.length - 1) != ':') sb.append(':')
            sb.append(Integer.toHexString(g(k))); k += 1
          }
        }
        sb.toString
      case other =>
        throw new PgOutputDecodeException(s"inet family $other")
    }
    val full = if (family == 2) 32 else 128
    if (cidr || bits != full) s"$host/$bits" else host
  }

  // PG renders float special values as NaN/Infinity/-Infinity; Java agrees.
  // Finite values: Java's repr is round-trip exact (parse-equal with PG's
  // Ryu shortest; raw text can differ, e.g. 1.0E20 vs 1e+20 — documented).
  private def floatText(f: Float): String = f.toString
  private def doubleText(d: Double): String = d.toString

  /** numeric_send layout: u16 ndigits, i16 weight (base-10000 exponent of
    * the first digit), u16 sign, u16 dscale, ndigits×u16 base-10000 digits. */
  private def numericText(bytes: Array[Byte]): String = {
    val b = be(bytes)
    val ndig = b.getShort & 0xffff
    val weight = b.getShort.toInt
    val sign = b.getShort & 0xffff
    val dscale = b.getShort & 0xffff
    sign match {
      case 0xC000 => return "NaN"
      case 0xD000 => return "Infinity"
      case 0xF000 => return "-Infinity"
      case _ =>
    }
    val digits = Array.fill(ndig)(b.getShort & 0xffff)
    val sb = new StringBuilder
    if (sign == 0x4000) sb.append('-')
    if (weight < 0 || ndig == 0) sb.append('0')
    else {
      var e = weight
      while (e >= 0) {
        val k = weight - e
        val d = if (k < ndig) digits(k) else 0
        if (e == weight) sb.append(d) else sb.append(f"$d%04d")
        e -= 1
      }
    }
    if (dscale > 0) {
      sb.append('.')
      var produced = 0
      var e = -1
      while (produced < dscale) {
        val k = weight - e
        val d = if (k >= 0 && k < ndig) digits(k) else 0
        val s = f"$d%04d"
        val take = math.min(4, dscale - produced)
        sb.append(s.substring(0, take))
        produced += take
        e -= 1
      }
    }
    sb.toString
  }

  private def fracText(us: Long): String =
    if (us == 0) "" else {
      var s = f".$us%06d"
      while (s.endsWith("0")) s = s.substring(0, s.length - 1)
      s
    }

  private def dateText(days: Int): String = {
    if (days == Int.MaxValue) return "infinity"
    if (days == Int.MinValue) return "-infinity"
    LocalDate.of(2000, 1, 1).plusDays(days.toLong).toString
  }

  private def timeText(us: Long): String = {
    val sec = us / 1000000L
    f"${sec / 3600}%02d:${(sec / 60) % 60}%02d:${sec % 60}%02d" + fracText(us % 1000000L)
  }

  private def timestampText(us: Long, tz: Boolean): String = {
    if (us == Long.MaxValue) return "infinity"
    if (us == Long.MinValue) return "-infinity"
    val sec = Math.floorDiv(us, 1000000L) + PgEpochSec
    val frac = Math.floorMod(us, 1000000L)
    val t = LocalDateTime.ofEpochSecond(sec, 0, ZoneOffset.UTC)
    val base = f"${t.getYear}%04d-${t.getMonthValue}%02d-${t.getDayOfMonth}%02d " +
      f"${t.getHour}%02d:${t.getMinute}%02d:${t.getSecond}%02d" + fracText(frac)
    // our conduits pin the walsender session to timezone=UTC, so the text
    // twin always carries the +00 zone suffix
    if (tz) base + "+00" else base
  }

  /** array_send layout: i32 ndim, i32 hasnull, i32 elem oid, per-dim
    * (i32 length, i32 lower bound), then row-major elements as i32 length
    * (-1 = NULL) + that many bytes. Rendered with array_out's quoting
    * rules; non-default lower bounds get the `[lb:ub]=` dims prefix. */
  private def arrayText(bytes: Array[Byte]): String = {
    val b = be(bytes)
    val ndim = b.getInt
    b.getInt // hasnull (informational)
    val elemOid = b.getInt
    if (ndim == 0) return "{}"
    val dims = Array.fill(ndim)((b.getInt, b.getInt)) // (len, lbound)
    val total = dims.map(_._1.toLong).product
    if (total > Int.MaxValue || total < 0)
      throw new PgOutputDecodeException(s"array cardinality $total out of range")
    val elems = Array.fill(total.toInt) {
      val len = b.getInt
      if (len == -1) null
      else {
        if (len < 0 || len > b.remaining())
          throw new PgOutputDecodeException(
            s"array element length $len exceeds remainder ${b.remaining()}")
        val e = new Array[Byte](len); b.get(e); render(elemOid, e)
      }
    }
    def quote(s: String): String = {
      val needs = s.isEmpty || s.equalsIgnoreCase("null") ||
        s.exists(c => c == '{' || c == '}' || c == ',' || c == '"' ||
          c == '\\' || Character.isWhitespace(c))
      if (!needs) s
      else "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c => c.toString
      } + "\""
    }
    var pos = 0
    def level(d: Int): String =
      if (d == ndim) {
        val s = if (elems(pos) == null) "NULL" else quote(elems(pos)); pos += 1; s
      } else "{" + (0 until dims(d)._1).map(_ => level(d + 1)).mkString(",") + "}"
    val body = level(0)
    if (dims.exists(_._2 != 1))
      dims.map { case (len, lb) => s"[$lb:${lb + len - 1}]" }.mkString + "=" + body
    else body
  }

  // ------------------------------------------------------------------
  // Encoders (test/synthetic-producer side): text → binary wire value.
  // ------------------------------------------------------------------

  private def alloc(n: Int): ByteBuffer =
    ByteBuffer.allocate(n).order(ByteOrder.BIG_ENDIAN)

  /** Encode canonical text into the type's binary wire form — the inverse
    * of [[render]] for the supported matrix (used by synthetic frame
    * producers and the round-trip property). */
  def encode(typeOid: Int, text: String): Array[Byte] = typeOid match {
    case BoolOid => Array[Byte](if (text == "t" || text == "true") 1 else 0)
    case ByteaOid =>
      require(text.startsWith("\\x"), s"bytea text must be hex form: $text")
      val hex = text.substring(2)
      Array.tabulate(hex.length / 2)(i =>
        Integer.parseInt(hex.substring(i * 2, i * 2 + 2), 16).toByte)
    case CharOid | NameOid | TextOid | BpcharOid | VarcharOid | JsonOid =>
      text.getBytes(StandardCharsets.UTF_8)
    case Int2Oid => alloc(2).putShort(text.toShort).array()
    case Int4Oid => alloc(4).putInt(text.toInt).array()
    case Int8Oid => alloc(8).putLong(text.toLong).array()
    case OidOid => alloc(4).putInt(java.lang.Long.parseLong(text).toInt).array()
    case Float4Oid =>
      alloc(4).putInt(java.lang.Float.floatToIntBits(text.toFloat)).array()
    case Float8Oid =>
      alloc(8).putLong(java.lang.Double.doubleToLongBits(text.toDouble)).array()
    case NumericOid => numericBinary(text)
    case DateOid =>
      val days = text match {
        case "infinity" => Int.MaxValue
        case "-infinity" => Int.MinValue
        case t => java.time.temporal.ChronoUnit.DAYS
          .between(LocalDate.of(2000, 1, 1), LocalDate.parse(t)).toInt
      }
      alloc(4).putInt(days).array()
    case TimeOid =>
      val p = text.split("[:.]")
      val us = p(0).toLong * 3600000000L + p(1).toLong * 60000000L +
        p(2).toLong * 1000000L +
        (if (p.length > 3) (p(3) + "0" * (6 - p(3).length)).toLong else 0L)
      alloc(8).putLong(us).array()
    case TimestampOid | TimestamptzOid =>
      val us = text match {
        case "infinity" => Long.MaxValue
        case "-infinity" => Long.MinValue
        case t0 =>
          val t = t0.stripSuffix("+00")
          val dt = LocalDateTime.parse(t.replace(' ', 'T'))
          val sec = dt.toEpochSecond(ZoneOffset.UTC) - PgEpochSec
          sec * 1000000L + dt.getNano / 1000L
      }
      alloc(8).putLong(us).array()
    case UuidOid =>
      val u = java.util.UUID.fromString(text)
      alloc(16).putLong(u.getMostSignificantBits).putLong(u.getLeastSignificantBits).array()
    case JsonbOid =>
      val t = text.getBytes(StandardCharsets.UTF_8)
      val out = new Array[Byte](t.length + 1); out(0) = 1
      System.arraycopy(t, 0, out, 1, t.length); out
    case MacaddrOid =>
      text.split(':').map(h => Integer.parseInt(h, 16).toByte)
    case InetOid | CidrOid =>
      val (host, bitsOpt) = text.indexOf('/') match {
        case -1 => (text, None)
        case i => (text.substring(0, i), Some(text.substring(i + 1).toInt))
      }
      require(host.forall(c => c.isDigit || c == '.' || c == ':' ||
        ('a' <= c && c <= 'f') || ('A' <= c && c <= 'F')),
        s"inet text must be a literal address: $text")
      val addr = java.net.InetAddress.getByName(host).getAddress
      val v4 = addr.length == 4
      val b = alloc(4 + addr.length)
      b.put((if (v4) 2 else 3).toByte)
      b.put(bitsOpt.getOrElse(if (v4) 32 else 128).toByte)
      b.put((if (typeOid == CidrOid) 1 else 0).toByte)
      b.put(addr.length.toByte); b.put(addr)
      b.array()
    case IntervalOid => intervalBinary(text)
    case oid if ArrayElem.contains(oid) =>
      encodeArrayText(ArrayElem(oid), text)
    case oid =>
      throw new PgOutputDecodeException(s"no binary encoder for type oid $oid")
  }

  /** Postgres-style interval text → interval_send binary form. */
  private def intervalBinary(text: String): Array[Byte] = {
    var months = 0; var days = 0; var us = 0L
    val unitRe = "(-?\\d+) (year|mon|day)s?".r
    unitRe.findAllMatchIn(text).foreach { m =>
      val v = m.group(1).toInt
      m.group(2) match {
        case "year" => months += v * 12
        case "mon" => months += v
        case "day" => days += v
      }
    }
    val timeRe = "([+-]?)(\\d+):(\\d{2}):(\\d{2})(\\.\\d+)?".r
    timeRe.findFirstMatchIn(text).foreach { m =>
      val sign = if (m.group(1) == "-") -1L else 1L
      val frac = Option(m.group(5))
        .map(f => (f.substring(1) + "0" * (6 - f.length + 1)).toLong)
        .getOrElse(0L)
      us = sign * (m.group(2).toLong * 3600000000L +
        m.group(3).toLong * 60000000L + m.group(4).toLong * 1000000L + frac)
    }
    alloc(16).putLong(us).putInt(days).putInt(months).array()
  }

  /** Encode a 1-D array from element texts (null = SQL NULL element). */
  def encodeArray(elemOid: Int, elems: Seq[Option[String]], lbound: Int = 1): Array[Byte] = {
    val encoded = elems.map(_.map(encode(elemOid, _)))
    val size = 12 + 8 + encoded.map(e => 4 + e.map(_.length).getOrElse(0)).sum
    val b = alloc(size)
    b.putInt(1).putInt(if (encoded.exists(_.isEmpty)) 1 else 0).putInt(elemOid)
    b.putInt(elems.size).putInt(lbound)
    encoded.foreach {
      case Some(e) => b.putInt(e.length); b.put(e)
      case None => b.putInt(-1)
    }
    b.array()
  }

  /** Parse a canonical `{a,b,NULL,"q,x"}` array text into a 1-D binary
    * array (enough for the synthetic producers; live arrays of any shape
    * come from the real server). */
  private def encodeArrayText(elemOid: Int, text: String): Array[Byte] = {
    require(text.startsWith("{") && text.endsWith("}"), s"array text: $text")
    val inner = text.substring(1, text.length - 1)
    if (inner.isEmpty) return alloc(12).putInt(0).putInt(0).putInt(elemOid).array()
    val elems = scala.collection.mutable.ArrayBuffer.empty[Option[String]]
    val cur = new StringBuilder
    var inQ = false; var wasQ = false; var i = 0
    def flush(): Unit = {
      val s = cur.toString
      elems += (if (!wasQ && s.equalsIgnoreCase("null")) None else Some(s))
      cur.clear(); wasQ = false
    }
    while (i < inner.length) {
      val c = inner.charAt(i)
      if (inQ) {
        if (c == '\\') { cur.append(inner.charAt(i + 1)); i += 1 }
        else if (c == '"') inQ = false
        else cur.append(c)
      } else c match {
        case '"' => inQ = true; wasQ = true
        case ',' => flush()
        case '\\' => cur.append(inner.charAt(i + 1)); i += 1
        case other => cur.append(other)
      }
      i += 1
    }
    flush()
    encodeArray(elemOid, elems.toSeq)
  }

  /** Canonical numeric text → numeric_send binary form. */
  def numericBinary(text: String): Array[Byte] = {
    val (signBits, t0) = text match {
      case "NaN" => return alloc(8).putShort(0).putShort(0).putShort(0xC000.toShort).putShort(0).array()
      case "Infinity" => return alloc(8).putShort(0).putShort(0).putShort(0xD000.toShort).putShort(0).array()
      case "-Infinity" => return alloc(8).putShort(0).putShort(0).putShort(0xF000.toShort).putShort(0).array()
      case t if t.startsWith("-") => (0x4000, t.substring(1))
      case t => (0x0000, t.stripPrefix("+"))
    }
    val dot = t0.indexOf('.')
    val ip0 = if (dot == -1) t0 else t0.substring(0, dot)
    val fp = if (dot == -1) "" else t0.substring(dot + 1)
    val dscale = fp.length
    val ip = ip0.dropWhile(_ == '0')
    val ipPad = "0" * ((4 - ip.length % 4) % 4) + ip
    val fpPad = fp + "0" * ((4 - fp.length % 4) % 4)
    val intGroups = if (ipPad.isEmpty) Vector.empty else ipPad.grouped(4).toVector
    val fracGroups = if (fpPad.isEmpty) Vector.empty else fpPad.grouped(4).toVector
    var digits = (intGroups ++ fracGroups).map(_.toInt)
    var weight = intGroups.length - 1
    while (digits.nonEmpty && digits.head == 0) { digits = digits.tail; weight -= 1 }
    while (digits.nonEmpty && digits.last == 0) digits = digits.dropRight(1)
    if (digits.isEmpty) weight = 0
    val sign = if (digits.isEmpty) 0x0000 else signBits // -0 normalizes to +0
    val b = alloc(8 + 2 * digits.length)
    b.putShort(digits.length.toShort).putShort(weight.toShort)
    b.putShort(sign.toShort).putShort(dscale.toShort)
    digits.foreach(d => b.putShort(d.toShort))
    b.array()
  }
}
