package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Pins the Jaro-Winkler expression to DuckDB's vendored-rapidfuzz
  * semantics with values probed from DuckDB itself (exact doubles — the
  * cross-engine contract is bit-identity, not closeness). The full
  * conformance sweep is the q81_jaro_entity oracle (every blocked
  * candidate pair hash-compared). */
class StringMetricsSpec extends AnyFunSuite {

  private def jw(a: String, b: String): Double =
    StringMetrics.jaroWinkler(UTF8String.fromString(a), UTF8String.fromString(b))

  test("classic Winkler table values (probed from DuckDB, exact)") {
    assert(jw("MARTHA", "MARHTA") === 0.9611111111111111)
    assert(jw("DWAYNE", "DUANE") === 0.8400000000000001)
    assert(jw("DIXON", "DICKSONX") === 0.8133333333333332)
    assert(jw("TRATE", "TRACE") === 0.9066666666666667)
  }

  test("boost applies only above jaro 0.7") {
    // jaro = 2/3 with common prefix 0; even with a shared suffix char the
    // sub-threshold score is returned unboosted
    assert(jw("AB", "CB") === 0.6666666666666666)
    // above threshold but zero common prefix: unboosted too
    assert(jw("CRATE", "TRACE") === 0.7333333333333334)
  }

  test("prefix length caps at 4") {
    // common prefix 9, cap 4: 0.9333... + 0.4 * (1 - 0.9333...) = 0.96
    assert(jw("aaaaaaaaaa", "aaaaaaaaab") === 0.96)
    assert(jw("abcdefgh", "abcdxfgh") === 0.95)
  }

  test("transpositions halve with INTEGER division (rapidfuzz), not /2.0") {
    // 3 out-of-order matches -> t = 3/2 = 1 (classic t=1.5 would give
    // 0.9166...); probed from DuckDB: 0.9444...
    assert(jw("abcdef", "bcadef") === 0.9444444444444445)
    assert(jw("abcdefgh", "bcadefgh") === 0.9583333333333334)
  }

  test("empty and disjoint inputs follow the DuckDB convention") {
    assert(jw("", "") === 0.0) // textbook says 1.0; DuckDB says 0.0
    assert(jw("a", "") === 0.0)
    assert(jw("x", "y") === 0.0)
    assert(jw("ABCD", "ABCD") === 1.0)
  }

  test("expression evaluates through SQL registration and codegen") {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    // getOrCreate may return another suite's session (one JVM, shared
    // SparkContext) where the extensions never applied — register through
    // the same builder the extension uses (VectorExpressionsSpec pattern).
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      StringMetricFunctions.fnName, StringMetricFunctions.fnBuilder, "built-in")
    val r = spark.sql(
      """SELECT jaro_winkler_sim('MARTHA', 'MARHTA') AS a,
                jaro_winkler_sim(NULL, 'x') AS b""").head
    assert(r.getDouble(0) === 0.9611111111111111)
    assert(r.isNullAt(1))
  }
}
