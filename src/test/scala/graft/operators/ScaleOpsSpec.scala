package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale techniques as testable artifacts: salting equivalence, bucketed
  * co-located joins (no exchange), bounded top-k aggregation. */
class ScaleOpsSpec extends AnyFunSuite {

  private lazy val spark = {
    val wh = java.nio.file.Files.createTempDirectory("wh").toString
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  private val d = "/root/testdata/sf0.001"

  test("salted aggregation equals plain aggregation (skewed hot keys)") {
    val li = graft.Tables.lineitem(spark, d)
    val plain = li.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("q"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), (math.round(r.getDouble(1) * 100), r.getLong(2)))).toMap
    val salted = Skew.saltedAggregate(li, Seq("l_returnflag"), salts = 8,
      partialAggs = Seq(sum(col("l_quantity")).as("pq"), count(lit(1)).as("pn")),
      finalAggs = Seq(sum(col("pq")).as("q"), sum(col("pn")).as("n")))
      .collect().map(r => (r.getString(0), (math.round(r.getDouble(1) * 100), r.getLong(2)))).toMap
    assert(salted === plain)
  }

  test("salted join equals plain join (hot probe keys spread over salts)") {
    val o = graft.Tables.orders(spark, d).select(col("o_orderkey"), col("o_custkey"))
    val c = graft.Tables.customer(spark, d).select(col("c_custkey"), col("c_name"))
    val plain = o.join(c, o("o_custkey") === c("c_custkey"))
      .select(col("o_orderkey"), col("c_name"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val salted = Skew.saltedJoin(o, c, "o_custkey", "c_custkey", salts = 6)
      .select(col("o_orderkey"), col("c_name"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(salted === plain)
  }

  test("bucketed tables co-locate the join: no shuffle exchange in the plan") {
    // unique names per run: a shared session (full-suite runs) may carry a
    // default warehouse with stale tables from an earlier version
    val tag = System.nanoTime()
    val (ot, ct) = (s"orders_bkt_$tag", s"customer_bkt_$tag")
    val o = graft.Tables.orders(spark, d)
    val c = graft.Tables.customer(spark, d)
    o.write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable(ot)
    c.write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable(ct)
    val joined = spark.table(ot)
      .join(spark.table(ct),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey")).agg(count(lit(1)).as("n"))
    joined.collect()
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning(o_custkey"),
      s"probe side should read pre-bucketed, plan:\n$p")
    assert(!p.contains("Exchange hashpartitioning(c_custkey"),
      s"build side should read pre-bucketed, plan:\n$p")
  }

  test("TopKAggregator matches window-rank top-k with deterministic ties") {
    import spark.implicits._
    val data = Seq(
      (1L, 5.0, 10L), (1L, 7.0, 11L), (1L, 7.0, 9L), (1L, 1.0, 12L),
      (2L, 3.0, 20L), (2L, 4.0, 21L)).toDF("g", "score", "id")
    val agg = new TopKAggregator(2).toColumn
    val got = data.as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues { case (_, s, id) => (s, id) }
      .agg(agg.name("topk"))
      .collect().toMap
    assert(got(1L) === Seq((7.0, 9L), (7.0, 11L)))
    assert(got(2L) === Seq((4.0, 21L), (3.0, 20L)))
  }
}
