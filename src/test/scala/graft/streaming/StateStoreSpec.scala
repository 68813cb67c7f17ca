package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The CAS commit path under an ACTUAL conflict — the race `commitIf`
  * exists for (a backfill merge and a retirement publishing against the
  * same root). The happy paths ride the streaming suites; these pin the
  * refusal: the loser throws, the winner's state survives untouched. */
class StateStoreSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("commitIf refuses when a commit landed after the caller's load; the interloper's state survives") {
    val root = Files.createTempDirectory("cas").toString
    StateStore.commit(root, Map("data" -> "v-data-1"))
    val loaded = StateStore.load(root)
    // interloper lands a plain commit behind the caller's back
    StateStore.commit(root, Map("data" -> "v-data-interloper"))
    val e = intercept[StateStore.ConcurrentCommitException] {
      StateStore.commitIf(root, Map("data" -> "v-data-stale-rewrite"), loaded)
    }
    assert(e.expected === loaded)
    assert(e.found === Map("data" -> "v-data-interloper"))
    // the refused rewrite published NOTHING — the interloper's manifest is live
    assert(StateStore.load(root) === Map("data" -> "v-data-interloper"))
    // and a rerun computed from the CURRENT state goes through
    StateStore.commitIf(root, Map("data" -> "v-data-rerun"),
      StateStore.load(root))
    assert(StateStore.load(root) === Map("data" -> "v-data-rerun"))
  }

  test("commitIf refuses against a first-ever racing commit (expected = empty manifest)") {
    val root = Files.createTempDirectory("cas0").toString
    val loaded = StateStore.load(root) // no manifest yet
    assert(loaded.isEmpty)
    StateStore.commit(root, Map("hw" -> "42"))
    intercept[StateStore.ConcurrentCommitException] {
      StateStore.commitIf(root, Map("hw" -> "7"), loaded)
    }
    assert(StateStore.load(root) === Map("hw" -> "42"))
  }

  test("failoverRetire refuses LWW state: stored winners may carry foreign-WAL LSNs the retirement rule would mass-retire") {
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("retire-lww").toString
    val v = StateStore.newVersion("data")
    // LWW-shaped state: conflict metadata columns, one winner from a
    // foreign site whose lsn (from that site's WAL space) is numerically
    // below any local slot position
    spark.range(3).select(
        lit("U").as("__op"), lit(1700000000000000L).as("__ts"),
        lit("site_b").as("__origin"), lit(7L).as("__lsn"),
        lit(0L).as("__seq"), col("id").as("__k"))
      .write.parquet(s"$root/$v")
    StateStore.commit(root, Map("data" -> v, "applied" -> "0"))
    val e = intercept[IllegalArgumentException] {
      Streams.failoverRetire(spark, root, newSlotLsn = 1000L, expectedChunks = 1)
    }
    assert(e.getMessage.contains("LWW state"), e.getMessage)
    // nothing was retired or committed — the LWW state is untouched
    assert(StateStore.load(root) === Map("data" -> v, "applied" -> "0"))
    assert(spark.read.parquet(s"$root/$v").count() === 3L)
  }

  test("recoverFromSlotLoss preflight: refuses LWW and bucketed layouts; clears stale recovery bookkeeping before planning chunks") {
    import org.apache.spark.sql.functions._
    val opts = Map("host" -> "127.0.0.1", "port" -> "1", // nothing listens
      "slot" -> "s_new", "publication" -> "p")
    val rel = graft.cdc.CdcPipeline.ordersRelation
    // LWW layout → refuse before any connection
    val lww = Files.createTempDirectory("pre-lww").toString
    val v1 = StateStore.newVersion("data")
    spark.range(1).select(lit(1L).as("__ts"), col("id").as("__lsn"))
      .write.parquet(s"$lww/$v1")
    StateStore.commit(lww, Map("data" -> v1))
    val e1 = intercept[IllegalArgumentException] {
      Streams.recoverFromSlotLoss(spark, rel, lww, s"$lww-w", opts,
        "public.orders", "o_orderkey", 2)
    }
    assert(e1.getMessage.contains("LWW state"), e1.getMessage)
    // bucketed layout → refuse before any connection
    val bucketed = Files.createTempDirectory("pre-bkt").toString
    val v2 = StateStore.newVersion("b0")
    spark.range(1).select(col("id").as("__lsn")).write.parquet(s"$bucketed/$v2")
    StateStore.commit(bucketed, Map("b0" -> v2))
    val e2 = intercept[IllegalArgumentException] {
      Streams.recoverFromSlotLoss(spark, rel, bucketed, s"$bucketed-w", opts,
        "public.orders", "o_orderkey", 2)
    }
    assert(e2.getMessage.contains("bucketed"), e2.getMessage)
    // stale applied/coll from a crashed/timed-out attempt: cleared at
    // entry (colliding chunk ids of the NEXT attempt must not be skipped
    // as already-applied — retirement would mass-retire their keys). The
    // slot-creation connection then fails (port 1), proving the clear
    // happens before any server interaction.
    val stale = Files.createTempDirectory("pre-stale").toString
    val v3 = StateStore.newVersion("data")
    spark.range(2).select(col("id").as("__lsn")).write.parquet(s"$stale/$v3")
    StateStore.commit(stale,
      Map("data" -> v3, "applied" -> "0,1", "coll" -> "v-coll-gone", "hw" -> "9"))
    intercept[Exception] {
      Streams.recoverFromSlotLoss(spark, rel, stale, s"$stale-w", opts,
        "public.orders", "o_orderkey", 2)
    }
    val after = StateStore.load(stale)
    assert(!after.contains("applied") && !after.contains("coll"), after.toString)
    assert(after.get("data") === Some(v3) && after.get("hw") === Some("9"))
  }

  test("recoverFromSlotLoss refuses an option map without the replacement slot, before any connection") {
    val root = Files.createTempDirectory("recover-args").toString
    val e = intercept[IllegalArgumentException] {
      Streams.recoverFromSlotLoss(spark, graft.cdc.CdcPipeline.ordersRelation,
        s"$root/state", s"$root/work",
        Map("host" -> "127.0.0.1", "publication" -> "p"), "public.orders",
        "o_orderkey", nChunks = 4)
    }
    assert(e.getMessage.contains("REPLACEMENT slot"), e.getMessage)
  }

  test("failoverRetire surfaces a racing merge commit as the stop-the-backfill refusal; state unchanged") {
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("retire-race").toString
    // plausible recovery-complete state: 4 rows, 1 holding a pre-failover LSN
    val v = StateStore.newVersion("data")
    spark.range(4).select(col("id").as("__k"),
        when(col("id") === 0, lit(5L)).otherwise(lit(100L)).as("__lsn"))
      .write.parquet(s"$root/$v")
    StateStore.commit(root, Map("data" -> v, "applied" -> "0,1"))
    val interloperV = StateStore.newVersion("data")
    spark.range(1).select(col("id").as("__k"), lit(999L).as("__lsn"))
      .write.parquet(s"$root/$interloperV")
    Streams.beforeRetireCommit = () =>
      StateStore.commit(root, Map("data" -> interloperV, "applied" -> "0,1"))
    try {
      val e = intercept[IllegalStateException] {
        Streams.failoverRetire(spark, root, newSlotLsn = 50L, expectedChunks = 2)
      }
      assert(e.getMessage.contains("is the backfill query still running"),
        e.getMessage)
      assert(e.getCause.isInstanceOf[StateStore.ConcurrentCommitException])
    } finally Streams.beforeRetireCommit = () => ()
    // the retirement published nothing: the racing merge's commit is live
    // and its data version is intact
    assert(StateStore.load(root) ===
      Map("data" -> interloperV, "applied" -> "0,1"))
    assert(spark.read.parquet(s"$root/$interloperV").count() === 1L)
  }
}
