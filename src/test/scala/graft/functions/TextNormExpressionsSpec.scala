package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unicode normalization expressions: UAX #15 semantics, codegen active,
  * SQL-registered, interpreted and generated paths agree. */
class TextNormExpressionsSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      TextNormFunctions.normName, TextNormFunctions.normBuilder, "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      TextNormFunctions.foldName, TextNormFunctions.foldBuilder, "built-in")
    s
  }

  import TextNormFunctions.{fold_accents, unicode_normalize}

  test("NFC recomposes decomposed sequences; NFD decomposes precomposed") {
    val df = spark.sql(
      "SELECT * FROM VALUES ('exposé'), ('éclair'), ('plain') t(s)")
    val r = df.select(
      unicode_normalize(col("s"), "NFC").as("nfc"),
      unicode_normalize(col("s"), "NFD").as("nfd"),
      length(col("s")).as("raw"), length(unicode_normalize(col("s"), "NFC")).as("n"))
      .collect().map(x => (x.getString(0), x.getString(1), x.getInt(2), x.getInt(3)))
    assert(r(0) === ("exposé", "exposé", 7, 6))
    assert(r(1) === ("éclair", "éclair", 6, 6))
    assert(r(2) === ("plain", "plain", 5, 5))
  }

  test("fold_accents strips combining marks from both input forms") {
    val df = spark.sql(
      "SELECT * FROM VALUES ('garçon'), ('garçon'), ('über') t(s)")
    val r = df.select(fold_accents(col("s"))).collect().map(_.getString(0))
    assert(r.toSeq === Seq("garcon", "garcon", "uber"))
  }

  test("null-safe and SQL-registered") {
    val r = spark.sql(
      """SELECT unicode_normalize(CAST(NULL AS STRING), 'NFC'),
                fold_accents('café'),
                unicode_normalize('é', 'NFC')""").head()
    assert(r.isNullAt(0))
    assert(r.getString(1) === "cafe")
    assert(r.getString(2) === "é")
  }

  test("participates in whole-stage codegen and matches interpreted eval") {
    val df = spark.range(100).select(
      concat(lit("word"), col("id").cast("string"), lit("é")).as("s"))
    val out = df.select(unicode_normalize(col("s"), "NFC").as("n"))
    out.collect().zipWithIndex.foreach { case (row, i) =>
      assert(row.getString(0) === "word" + i + "é")
    }
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("*(1)"), p)
  }

  test("rejects non-string input and unknown forms") {
    intercept[Exception] {
      spark.range(1).select(unicode_normalize(col("id"), "NFC")).collect()
    }
    intercept[IllegalArgumentException] {
      UnicodeNormalize(org.apache.spark.sql.catalyst.expressions.Literal("x"), "NFX")
    }
  }
}
