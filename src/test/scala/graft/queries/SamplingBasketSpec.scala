package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants behind q70_universe_sample and q68_market_basket —
  * the oracle gate pins cross-engine equality; these pin the MATH. */
class SamplingBasketSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val d = "/root/testdata/sf0.001"

  private def keep(c: org.apache.spark.sql.Column) =
    (conv(substring(md5(c.cast("string").cast(BinaryType)), 1, 6), 16, 10)
      .cast("long") % 16) === 0

  test("universe sampling identity: join of per-side samples IS the key-filtered join") {
    val li = graft.Tables.lineitem(spark, d)
    val o = graft.Tables.orders(spark, d)
    val joinOfSamples = li.filter(keep(col("l_orderkey")))
      .join(o.filter(keep(col("o_orderkey"))), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val sampleOfJoin = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .filter(keep(col("l_orderkey")))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(joinOfSamples.nonEmpty)
    assert(joinOfSamples === sampleOfJoin)
    // and the sample is a real subset, not everything
    assert(joinOfSamples.size < li.count())
  }

  test("market basket scores match a from-scratch driver-side recompute") {
    val op = graft.Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nOrders = op.map(_._1).distinct.length
    val partCount = op.groupBy(_._2).map { case (p, xs) => p -> xs.length.toLong }
    val pairCount = op.groupBy(_._1).values.flatMap { parts =>
      val ps = parts.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

    val got = graft.SparkEntry.queries("q68_market_basket")(spark, d).collect()
    assert(got.nonEmpty)
    for (r <- got) {
      val (a, b) = (r.getLong(0), r.getLong(1))
      val cAb = r.getLong(2)
      assert(cAb == pairCount((a, b)), s"c_ab for ($a,$b)")
      assert(r.getLong(3) == partCount(a) && r.getLong(4) == partCount(b))
      assert(cAb >= 3)
      val lift = (cAb.toDouble * nOrders) / (partCount(a).toDouble * partCount(b))
      assert(math.abs(r.getDouble(7) - lift) < 1e-5, s"lift for ($a,$b)")
    }
    // output really is the lift-descending head
    val lifts = got.map(_.getDouble(7)).toSeq
    assert(lifts === lifts.sorted.reverse)
  }
}
