package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import org.scalatest.funsuite.AnyFunSuite

/** The fused native dot product: bit-identical to the composable fold,
  * SQL-registered via GraftExtensions, codegen active, type errors clear. */
class VectorExpressionsSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // getOrCreate may return another suite's session (one JVM, shared
    // SparkContext) where the extensions config never applied — register
    // through the same builder the extension uses.
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      VectorFunctions.fnName, VectorFunctions.fnBuilder, "built-in")
    s
  }

  private val d = "/root/testdata/sf0.001"

  test("bit-identical to the aggregate/zip_with double fold on real embeddings") {
    val e = graft.Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding").as("a"),
        reverse(col("embedding")).as("b"))
    val both = e.select(
      VectorFunctions.vector_dot(col("a"), col("b")).as("fused"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
        lit(0.0), (acc, x) => acc + x).as("composed"))
    val diffs = both.filter(col("fused") =!= col("composed")).count()
    assert(diffs === 0)
    assert(both.count() > 0)
  }

  test("SQL-registered through SparkSessionExtensions") {
    graft.Tables.embeddings(spark, d).createOrReplaceTempView("emb_fn")
    val r = spark.sql(
      "SELECT vector_dot(embedding, embedding) AS sq FROM emb_fn ORDER BY vec_id LIMIT 1")
      .head().getDouble(0)
    assert(r > 0.0)
  }

  test("participates in whole-stage codegen") {
    val e = graft.Tables.embeddings(spark, d)
    val df = e.select(VectorFunctions.vector_dot(col("embedding"), col("embedding")).as("x"))
      .agg(sum(col("x")))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(1)"), p)
  }

  test("clear type error on non-float arrays") {
    val err = intercept[Exception] {
      spark.sql("SELECT vector_dot(array(1, 2), array(3, 4))").collect()
    }
    assert(err.getMessage.contains("array<float>") || err.getMessage.contains("DATATYPE"),
      err.getMessage)
  }

  test("null array yields null, not a crash") {
    graft.Tables.embeddings(spark, d).createOrReplaceTempView("emb_fn2")
    val r = spark.sql(
      "SELECT vector_dot(CAST(NULL AS ARRAY<FLOAT>), embedding) FROM emb_fn2 LIMIT 1")
      .head()
    assert(r.isNullAt(0))
  }
}
