package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Direct spec for the shared two-level prefix-sum operator (q80/q90/q91/
  * q93/text_pack_offsets all ride it): distributed ranks and running sums
  * must be BIT-IDENTICAL to the naive single-window form for any key
  * distribution — bucket boundaries may shift the partitioning, never the
  * output. */
class DistributedRankSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def check(keys: Seq[Long], buckets: Int): Unit = {
    import spark.implicits._
    val df = keys.zipWithIndex
      .map { case (k, i) => (k, i.toLong, (i % 17 + 1).toLong) }
      .toDF("k", "id", "v")
    val ord = Window.orderBy(col("k"), col("id"))
    val expected = df
      .withColumn("rank", row_number().over(ord).cast("long"))
      .withColumn("cum", sum(col("v")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("id"), col("rank"), col("cum"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = DistributedRank.withGlobalRank(
        df, col("k"), Seq(col("id")), buckets, "rank",
        runningSums = Seq((col("v"), "cum")))
      .select(col("id"), col("rank"), col("cum"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected, s"buckets=$buckets keys=${keys.take(8)}…")
  }

  test("bit-identical to the single-window form across seeded distributions " +
      "and bucket counts") {
    val rnd = new scala.util.Random(7)
    val uniform = Seq.fill(500)(rnd.nextInt(1000).toLong)
    // 80% of rows share one key: the degenerate bucket must stay CORRECT
    // (the documented cost is one big task, never a wrong rank)
    val skewed = Seq.fill(500)(if (rnd.nextInt(5) > 0) 42L
      else rnd.nextInt(1000).toLong)
    // negative + sparse keys exercise the (sk - min) rebasing and width math
    val negative = Seq.fill(300)(rnd.nextLong() % 1000000L - 500000L)
    val constant = Seq.fill(100)(9L) // min == max: width clamps to >= 1
    for (keys <- Seq(uniform, skewed, negative, constant); b <- Seq(1, 7, 64))
      check(keys, b)
  }

  test("duplicate sort keys rank deterministically under the tie column") {
    check(Seq(5L, 5L, 5L, 1L, 1L, 9L, 9L, 9L, 9L), buckets = 3)
  }
}
