package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

/** Property check for the binned interval-overlap engine: the equi-join
  * on grid cells plus the emit-once rule (keep a pair only in the cell
  * containing greatest(starts)) must reproduce the naive O(n²) overlap
  * join EXACTLY — same pair multiset, nothing dropped, nothing doubled —
  * on adversarial intervals the real session data never produces:
  * spans covering many cells, zero-length points ON cell boundaries,
  * shared endpoints, duplicate intervals, and bin sizes that don't
  * divide the timeline. */
class OverlapJoinPropertySpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** (user, start, end) with end − start ∈ [0, ~5 bins] and endpoints
    * often landing exactly on multiples of the bin width. */
  private def genIntervals(binUs: Long): Gen[List[(Long, Long, Long)]] = for {
    n <- Gen.choose(0, 50)
    ivs <- Gen.listOfN(n, for {
      user <- Gen.choose(0L, 5L)
      // starts snap to quarter-bins so exact boundary hits are common
      startQ <- Gen.choose(0L, 40L)
      lenQ <- Gen.frequency(
        (2, Gen.const(0L)),            // point intervals
        (5, Gen.choose(0L, 4L)),       // sub-bin
        (3, Gen.choose(4L, 20L)))      // multi-cell spans
    } yield (user, startQ * (binUs / 4), startQ * (binUs / 4) + lenQ * (binUs / 4)))
  } yield ivs

  private def naive(ivs: List[(Long, Long, Long)]): Seq[(Long, Long, Long, Long, Long, Long)] =
    (for {
      a @ (ua, sa, ea) <- ivs
      b @ (ub, sb, eb) <- ivs
      if ua < ub && sa <= eb && sb <= ea
    } yield (ua, ub, sa, ea, sb, eb)).sorted

  test("binned overlap join equals the naive join on adversarial intervals") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val binUs = 1000000L
    var seed = rng.Seed(20260814L)
    var checked = 0
    var i = 0
    while (i < 30) {
      genIntervals(binUs).apply(Gen.Parameters.default, seed).foreach { ivs =>
        val df = ivs.toDF("user_id", "s_us", "e_us")
        val got = RelationalQueries.binnedOverlapPairs(df, binUs)
          .select(col("user_a"), col("user_b"),
            col("sa"), col("ea"), col("sb"), col("eb"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4), r.getLong(5)))
          .toSeq.sorted
        assert(got === naive(ivs), s"case $i: $ivs")
        checked += 1
      }
      seed = seed.next
      i += 1
    }
    assert(checked > 25)
  }
}
