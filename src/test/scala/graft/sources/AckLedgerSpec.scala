package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Pins the WAL-confirmation ledger's central invariant: only CONSUMER
  * flush feedback can unlock keepalive auto-confirmation — an auto-advanced
  * position never satisfies its own guard. The loss scenario this prevents
  * (found by the round-5 advisory review): WAL records are contiguous, so a
  * keepalive's sentPtr routinely lands exactly at the NEXT commit record's
  * walStart; if that auto-advance can later satisfy the guard, the follow-up
  * keepalive (after the commit's frames were delivered but before Spark
  * checkpointed them) pushes confirmed_flush past the commit's END — and on
  * restart the server skips the whole transaction (end_lsn <=
  * confirmed_flush): silent event loss, violating the K2 at-least-once
  * contract (`setFlushedLSN` is documented strictly-after-durable-commit). */
class AckLedgerSpec extends AnyFunSuite {

  test("consumer flush is reported monotonically") {
    val a = new AckLedger
    a.onConsumerFlush(100L)
    assert(a.reported === 100L)
    a.onConsumerFlush(50L) // stale feedback never regresses
    assert(a.reported === 100L)
  }

  test("keepalive auto-confirms when the CONSUMER covers every delivered frame " +
      "(shutdown-unblock), including the commit-marker one-byte slack") {
    val a = new AckLedger
    // txn1: change frames at 100, 110; commit marker at 120 (no events, so
    // the consumer's offset watermark — and its flush — sits at 119)
    a.onData(100L); a.onData(110L); a.onData(120L)
    a.onConsumerFlush(119L)
    // sentPtr past the commit's end: nothing event-bearing is outstanding,
    // confirming unblocks a clean walsender shutdown
    assert(a.onKeepalive(140L))
    assert(a.reported === 140L)
  }

  test("LOSS SCENARIO: an auto-advanced position must not satisfy the guard " +
      "for the next keepalive once an unflushed commit was delivered") {
    val a = new AckLedger
    // txn1 fully delivered and consumer-flushed (commit marker at 120)
    a.onData(100L); a.onData(110L); a.onData(120L)
    a.onConsumerFlush(119L)
    // keepalive sentPtr lands exactly at txn2's commit record walStart (200):
    // legitimate auto-confirm — the commit record itself is not yet consumed
    // by the server's decoder, end_lsn(txn2) > 200, nothing can be skipped
    assert(a.onKeepalive(200L))
    assert(a.reported === 200L)
    // txn2's frames now arrive (changes at 150/160 assembled at the commit,
    // marker frame at 200); events are buffered but NOT Spark-checkpointed
    a.onData(150L); a.onData(160L); a.onData(200L)
    // next keepalive carries sentPtr past txn2's commit END. With a single
    // flushed field this would have advanced (flushed==200 >= 200-1) and the
    // server would skip txn2 on restart. The ledger must refuse: the
    // CONSUMER's flush (119) does not cover the delivered frames (200-1).
    assert(!a.onKeepalive(260L))
    assert(a.reported === 200L)
    // once the consumer durably checkpoints txn2, the same keepalive unlocks
    a.onConsumerFlush(199L)
    assert(a.onKeepalive(260L))
    assert(a.reported === 260L)
  }

  test("a keepalive below the reported position is a no-op") {
    val a = new AckLedger
    a.onConsumerFlush(500L)
    assert(!a.onKeepalive(400L))
    assert(a.reported === 500L)
  }

  test("start-of-stream: resume point counts as consumer ground truth") {
    val a = new AckLedger
    a.onConsumerFlush(1000L) // conduit.start(afterLsn)
    // idle stream, no data frames yet: keepalives confirm freely
    assert(a.onKeepalive(1200L))
    assert(a.reported === 1200L)
    // first delivered frame closes the free window until the consumer
    // catches up past it
    a.onData(1300L)
    assert(!a.onKeepalive(1400L))
    a.onConsumerFlush(1299L)
    assert(a.onKeepalive(1400L))
  }
}
