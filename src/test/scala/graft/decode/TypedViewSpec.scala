package graft.decode

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** pg-oid → Catalyst mapping (the widened version of the reference's lossy
  * 5-way coercion, reader.py:61-72) and text→typed projection. */
class TypedViewSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("oid mapping: ints, floats, bool, timestamps, text catch-all") {
    import TypedView.Oid._
    assert(TypedView.sparkType(Int2, -1) === ShortType)
    assert(TypedView.sparkType(Int4, -1) === IntegerType)
    assert(TypedView.sparkType(Int8, -1) === LongType)
    assert(TypedView.sparkType(Float4, -1) === FloatType)
    assert(TypedView.sparkType(Float8, -1) === DoubleType)
    assert(TypedView.sparkType(Bool, -1) === BooleanType)
    assert(TypedView.sparkType(Timestamp, -1) === TimestampType)
    assert(TypedView.sparkType(Timestamptz, -1) === TimestampType)
    assert(TypedView.sparkType(Date, -1) === DateType)
    assert(TypedView.sparkType(Bytea, -1) === BinaryType)
    // the reference's catch-all: everything else stays text
    assert(TypedView.sparkType(Json, -1) === StringType)
    assert(TypedView.sparkType(Jsonb, -1) === StringType)
    assert(TypedView.sparkType(Uuid, -1) === StringType)
    assert(TypedView.sparkType(999999, -1) === StringType)
  }

  test("numeric(p,s) precision/scale recovered from atttypmod (not reference's lossy float)") {
    // atttypmod for numeric(p,s) = (p << 16 | s) + 4
    val tm = (10 << 16 | 2) + 4
    assert(TypedView.sparkType(TypedView.Oid.Numeric, tm) === DecimalType(10, 2))
    assert(TypedView.sparkType(TypedView.Oid.Numeric, -1) === DecimalType(38, 18))
  }

  test("typed projection casts pg text values incl. '+00' timestamps and NULLs") {
    import spark.implicits._
    val rel = Relation(1, "public", "t", 'd', Vector(
      RelationColumn(partOfKey = true, "id", TypedView.Oid.Int8, -1),
      RelationColumn(partOfKey = false, "price", TypedView.Oid.Numeric, (12 << 16 | 2) + 4),
      RelationColumn(partOfKey = false, "flag", TypedView.Oid.Bool, -1),
      RelationColumn(partOfKey = false, "created", TypedView.Oid.Timestamptz, -1),
      RelationColumn(partOfKey = false, "note", TypedView.Oid.Text, -1)))
    val env = Seq(
      Map("id" -> "42", "price" -> "123.45", "flag" -> "true",
        "created" -> "2021-04-20 20:13:16.867121+00", "note" -> null)
    ).toDF("after")
    val typed = TypedView.ofAfter(env, rel)
    assert(typed.schema("id").dataType === LongType)
    assert(typed.schema("price").dataType === DecimalType(12, 2))
    val row = typed.head()
    assert(row.getLong(0) === 42L)
    assert(row.getDecimal(1).toString === "123.45")
    assert(row.getBoolean(2) === true)
    assert(row.getTimestamp(3).toInstant.toString === "2021-04-20T20:13:16.867121Z")
    assert(row.isNullAt(4))
  }

  test("typed view over an evolved schema reads pre-evolution rows' missing columns as NULL") {
    import spark.implicits._
    val evolved = Relation(1, "public", "t", 'd', Vector(
      RelationColumn(partOfKey = true, "id", TypedView.Oid.Int8, -1),
      RelationColumn(partOfKey = false, "name", TypedView.Oid.Text, -1),
      RelationColumn(partOfKey = false, "email", TypedView.Oid.Text, -1)))
    // row 1 decoded before ALTER TABLE ADD COLUMN email (no such key in its
    // image map); row 2 after — one registry, one typed view over both
    val env = Seq(
      Map("id" -> "1", "name" -> "alice"),
      Map("id" -> "2", "name" -> "bob", "email" -> "b@x")
    ).toDF("after")
    val rows = TypedView.ofAfter(env, evolved).orderBy("id").collect()
    assert(rows(0).getLong(0) === 1L && rows(0).isNullAt(2))
    assert(rows(1).getLong(0) === 2L && rows(1).getString(2) === "b@x")
  }

  test("validated projection routes NOT NULL and cast failures to _errors (T4 error channel)") {
    import spark.implicits._
    val rel = Relation(1, "public", "t", 'd', Vector(
      RelationColumn(partOfKey = true, "id", TypedView.Oid.Int8, -1),
      RelationColumn(partOfKey = false, "qty", TypedView.Oid.Int4, -1),
      RelationColumn(partOfKey = false, "note", TypedView.Oid.Text, -1)))
    val env = Seq(
      // clean row
      (Map("id" -> "1", "qty" -> "5", "note" -> "ok"), Seq.empty[String]),
      // qty uncoercible; note (NOT NULL) absent
      (Map("id" -> "2", "qty" -> "not-a-number"), Seq.empty[String]),
      // note absent but TOASTed → NOT a violation
      (Map("id" -> "3", "qty" -> "7"), Seq("note")),
      // id (NOT NULL) explicitly null
      (Map[String, String]("id" -> null, "qty" -> "1", "note" -> "x"), Seq.empty[String])
    ).toDF("after", "after_toasted")
    val v = TypedView.ofAfterValidated(env, rel, notNull = Set("id", "note"))
    val rows = v.collect().map(r =>
      (r.getAs[Long]("id"), r.getAs[Seq[String]]("_errors").sorted)).toSeq
    assert(rows(0) === ((1L, Seq())))
    assert(rows(1) === ((2L, Seq("cast_error:qty", "not_null:note"))))
    assert(rows(2) === ((3L, Seq())))
    assert(rows(3)._2 === Seq("not_null:id"))
    // the error channel split: good rows flow on, bad rows route aside
    assert(v.filter(org.apache.spark.sql.functions.size(
      org.apache.spark.sql.functions.col("_errors")) === 0).count() === 2)
  }

  test("INCOMPATIBLE retype routes pre-retype images to the error channel: " +
      "old text values that cannot coerce under the re-announced type " +
      "surface as cast_error rows, never silent nulls") {
    import spark.implicits._
    // ALTER TABLE ... ALTER COLUMN code TYPE bigint USING ...: the server
    // re-announces the relation with code's new oid. Rows decoded BEFORE
    // the retype hold the old text-era images ('A7' — legal text, not a
    // number); a compatible value ('17') re-casts cleanly. The validated
    // view is where the split happens: coercible history flows on under
    // the new type, uncoercible history routes to the error channel for
    // the operator to reconcile (the USING expression is not on the wire).
    val retyped = Relation(1, "public", "t", 'd', Vector(
      RelationColumn(partOfKey = true, "id", TypedView.Oid.Int8, -1),
      RelationColumn(partOfKey = false, "code", TypedView.Oid.Int8, -1)))
    val env = Seq(
      (Map("id" -> "1", "code" -> "17"), Seq.empty[String]),   // re-casts
      (Map("id" -> "2", "code" -> "A7"), Seq.empty[String]),   // cannot
      (Map("id" -> "3", "code" -> "9000000000"), Seq.empty[String])
    ).toDF("after", "after_toasted")
    val v = TypedView.ofAfterValidated(env, retyped, notNull = Set.empty)
    val byId = v.collect().map(r =>
      r.getAs[Long]("id") -> r.getAs[Seq[String]]("_errors")).toMap
    assert(byId(1L) === Seq() && byId(3L) === Seq())
    assert(byId(2L) === Seq("cast_error:code"),
      "an uncoercible pre-retype image must surface, not null out")
    assert(v.filter(org.apache.spark.sql.functions.size(
      org.apache.spark.sql.functions.col("_errors")) === 0)
      .select("code").collect().map(_.getLong(0)).sorted === Seq(17L, 9000000000L))
  }

  test("numeric NaN/Infinity (legal pg numeric values DecimalType cannot hold) " +
      "route to the cast_error channel, never silent zeros") {
    import spark.implicits._
    val rel = Relation(1, "public", "t", 'd', Vector(
      RelationColumn(partOfKey = true, "id", TypedView.Oid.Int8, -1),
      RelationColumn(partOfKey = false, "amt", TypedView.Oid.Numeric, (12 << 16 | 2) + 4)))
    val env = Seq(
      (Map("id" -> "1", "amt" -> "12.34"), Seq.empty[String]),
      (Map("id" -> "2", "amt" -> "NaN"), Seq.empty[String]),      // pg numeric NaN
      (Map("id" -> "3", "amt" -> "Infinity"), Seq.empty[String]), // pg ≥ 14
      (Map("id" -> "4", "amt" -> "-Infinity"), Seq.empty[String])
    ).toDF("after", "after_toasted")
    val v = TypedView.ofAfterValidated(env, rel, notNull = Set.empty)
    val got = v.orderBy("id").collect().map(r =>
      (r.isNullAt(1), r.getAs[collection.Seq[String]]("_errors").toList))
    assert(got(0) === ((false, Nil)))
    assert(got(1) === ((true, List("cast_error:amt"))))
    assert(got(2) === ((true, List("cast_error:amt"))))
    assert(got(3) === ((true, List("cast_error:amt"))))
  }

  test("bytea decodes BOTH live hex (\\x..., the real pgoutput text format) " +
      "and the synthetic base64 envelope form") {
    import spark.implicits._
    val rel = Relation(1, "public", "t", 'd', Vector(
      RelationColumn(partOfKey = true, "id", TypedView.Oid.Int8, -1),
      RelationColumn(partOfKey = false, "payload", TypedView.Oid.Bytea, -1)))
    val env = Seq(
      Map("id" -> "1", "payload" -> "\\x00ff7a"),            // live hex
      Map("id" -> "2", "payload" ->
        java.util.Base64.getEncoder.encodeToString(Array[Byte](0, -1, 0x7a))),
      Map[String, String]("id" -> "3", "payload" -> null),
      // legacy escape-format text (bytea_output='escape'): NULL, never the
      // garbage a lenient base64 decode would fabricate
      Map("id" -> "4", "payload" -> "abc\\000\\\\def"),
      // escape-format PRINTABLE bytes match the base64 alphabet but not its
      // quad-length invariant (r5-advice low): NULL, not 3 fabricated bytes
      Map("id" -> "5", "payload" -> "hello")
    ).toDF("after")
    val rows = TypedView.ofAfter(env, rel).orderBy("id").collect()
    assert(rows(0).getAs[Array[Byte]]("payload").toSeq === Seq[Byte](0, -1, 0x7a))
    assert(rows(1).getAs[Array[Byte]]("payload").toSeq === Seq[Byte](0, -1, 0x7a))
    assert(rows(2).isNullAt(1))
    assert(rows(3).isNullAt(1))
    assert(rows(4).isNullAt(1))
    // and the validator flags the escape-format row as a cast error
    val v = TypedView.ofAfterValidated(
      env.withColumn("after_toasted",
        org.apache.spark.sql.functions.array().cast("array<string>")),
      rel, notNull = Set.empty)
    val errs = v.orderBy("id").collect()
      .map(_.getAs[collection.Seq[String]]("_errors").toList)
    assert(errs(3) === List("cast_error:payload"))
  }
}
