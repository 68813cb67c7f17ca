package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

/** Property check for the CEP engine: the two-window-pass batch plan
  * (`cepMatchesBatch`) must agree with an INDEPENDENT per-user
  * reference fold (the obvious sequential state machine) on randomly
  * generated event sequences — including the edge cases real data rarely
  * hits: multiple signups (re-anchoring), error-then-signup, the exact
  * 30-minute boundary, same-timestamp events ordered by event_id. */
class CepPropertySpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val HalfHourUs = 1800000000L

  /** (user, eventId, tsMicros, type) — small ts domain with repeats so
    * same-timestamp ordering and the exact boundary actually occur. */
  private val genEvents: Gen[List[(Long, Long, Long, String)]] = for {
    n <- Gen.choose(0, 60)
    evs <- Gen.listOfN(n, for {
      user <- Gen.choose(0L, 3L)
      // multiples of 10 minutes: gaps hit exactly 30 min often
      slot <- Gen.choose(0L, 12L)
      tpe <- Gen.oneOf("signup", "purchase", "error", "view")
    } yield (user, slot * 600000000L, tpe))
  } yield evs.zipWithIndex.map { case ((u, ts, tp), i) => (u, i.toLong, ts, tp) }

  /** The sequential reference: per user in (ts, event_id) order, track
    * (last signup ts, clean); purchase emits when clean and within 30
    * minutes (inclusive). */
  private def reference(evs: List[(Long, Long, Long, String)]): Seq[(Long, Long, Long, Long)] =
    evs.groupBy(_._1).flatMap { case (user, rows) =>
      var signup: Option[Long] = None
      var clean = false
      rows.sortBy(e => (e._3, e._2)).flatMap { case (_, _, ts, tpe) =>
        tpe match {
          case "signup" => signup = Some(ts); clean = true; None
          case "error"  => clean = false; None
          case "purchase" =>
            signup.collect {
              case su if clean && ts - su <= HalfHourUs =>
                (user, su, ts, (ts - su) / 1000000L)
            }
          case _ => None
        }
      }
    }.toSeq.sorted

  test("two-window-pass CEP plan equals the sequential state machine on random sequences") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    var seed = rng.Seed(20260813L)
    var checked = 0
    var i = 0
    while (i < 40) {
      genEvents.apply(Gen.Parameters.default, seed).foreach { evs =>
        val df = evs.toDF("user_id", "event_id", "us", "event_type")
          .withColumn("ts", timestamp_micros(col("us")))
          .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        val got = RelationalQueries.cepMatchesBatch(df)
          .select(col("user_id"), expr("unix_micros(signup_ts)"),
            expr("unix_micros(purchase_ts)"), col("gap_sec"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .toSeq.sorted
        // sorted MULTISET compare: duplicate matches (two same-ts
        // purchases after one signup) must appear with multiplicity
        assert(got === reference(evs), s"case $i: $evs")
        checked += 1
      }
      seed = seed.next
      i += 1
    }
    assert(checked > 30)
  }
}
