package graft.decode

import org.scalatest.funsuite.AnyFunSuite

/** Envelope semantics: the reference's transform rules T1/T3/T5/T6/T7/T8
  * (reader.py:203-398) against hand-built message sequences. */
class ChangeEventBuilderSpec extends AnyFunSuite {

  private val rel = Relation(99, "public", "acct", 'd', Vector(
    RelationColumn(partOfKey = true, "id", TypedView.Oid.Int8, -1),
    RelationColumn(partOfKey = false, "name", TypedView.Oid.Text, -1),
    RelationColumn(partOfKey = false, "payload", TypedView.Oid.Text, -1)))

  private def t(v: String) = ColumnData('t', Some(v))
  private def n = ColumnData('n', None)
  private def u = ColumnData('u', None)

  private def fresh(): (ChangeEventBuilder, SchemaRegistry) = {
    val reg = new SchemaRegistry
    val b = new ChangeEventBuilder(reg)
    b.process(1L, rel)
    (b, reg)
  }

  test("insert: no before image, key = pk projection of after, txn carried (T5/T6/T7)") {
    val (b, _) = fresh()
    assert(b.process(10L, Begin(100L, 5000L, 42)) === Nil)
    val ev = b.process(11L, Insert(99, TupleData(Vector(t("7"), t("alice"), n)))).head
    assert(ev.op === "I")
    assert(ev.txId === 42 && ev.beginLsn === 100L && ev.commitTsUs === 5000L)
    assert(ev.before === null)
    assert(ev.after === Map("id" -> "7", "name" -> "alice", "payload" -> null))
    assert(ev.key === Map("id" -> "7"))
    assert(b.process(12L, Commit(0, 100L, 101L, 5000L)) === Nil)
  }

  test("pk-changing update splits into D(old key) + I(new key), Debezium-style") {
    val (b, _) = fresh()
    b.process(10L, Begin(100L, 5000L, 1))
    val evs = b.process(11L, Update(99, Some('K'),
      Some(TupleData(Vector(t("7"), n, n))),
      TupleData(Vector(t("8"), t("bob"), t("x")))))
    // a single 'U' keyed by either pk would strand the old key or never
    // materialize the new one under last-LSN-wins compaction
    assert(evs.map(_.op) === Seq("D", "I"))
    val Seq(d, i) = evs
    assert(d.key === Map("id" -> "7") && d.before === Map("id" -> "7") && d.after === null)
    assert(i.key === Map("id" -> "8") && i.before === null && i.after("id") === "8")
    assert(d.lsn === i.lsn && d.seq < i.seq) // delete sorts strictly first
  }

  test("key-only old image with unchanged pk stays a single U keyed by before (T6)") {
    val (b, _) = fresh()
    b.process(10L, Begin(100L, 5000L, 1))
    val evs = b.process(11L, Update(99, Some('K'),
      Some(TupleData(Vector(t("7"), n, n))),
      TupleData(Vector(t("7"), t("bob"), t("x")))))
    assert(evs.map(_.op) === Seq("U"))
    assert(evs.head.key === Map("id" -> "7"))
  }

  test("update with REPLICA IDENTITY FULL old image keeps all old columns") {
    val (b, _) = fresh()
    b.process(10L, Begin(100L, 5000L, 1))
    val ev = b.process(11L, Update(99, Some('O'),
      Some(TupleData(Vector(t("7"), t("old"), t("big")))),
      TupleData(Vector(t("7"), t("new"), t("big"))))).head
    assert(ev.before === Map("id" -> "7", "name" -> "old", "payload" -> "big"))
    assert(ev.key === ev.before)
  }

  test("update without old image: key from after's pk") {
    val (b, _) = fresh()
    b.process(10L, Begin(100L, 5000L, 1))
    val ev = b.process(11L, Update(99, None, None,
      TupleData(Vector(t("7"), t("new"), t("p"))))).head
    assert(ev.before === null)
    assert(ev.key === Map("id" -> "7"))
  }

  test("unchanged-TOAST column is absent from after and listed in afterToasted (§7.2)") {
    val (b, _) = fresh()
    b.process(10L, Begin(100L, 5000L, 1))
    val ev = b.process(11L, Update(99, None, None,
      TupleData(Vector(t("7"), t("new"), u)))).head
    assert(ev.after === Map("id" -> "7", "name" -> "new"))
    assert(!ev.after.contains("payload"))
    assert(ev.afterToasted === Seq("payload"))
  }

  test("delete: after is null, key = before (T5/T6); 'O' kind keeps full row") {
    val (b, _) = fresh()
    b.process(10L, Begin(100L, 5000L, 1))
    val evK = b.process(11L, Delete(99, 'K', TupleData(Vector(t("7"), n, n)))).head
    assert(evK.op === "D" && evK.after === null)
    assert(evK.key === Map("id" -> "7"))
    val evO = b.process(12L, Delete(99, 'O', TupleData(Vector(t("8"), t("x"), t("y"))))).head
    assert(evO.before === Map("id" -> "8", "name" -> "x", "payload" -> "y"))
  }

  test("truncate fans out one event per relation (T8, reference bug fixed)") {
    val reg = new SchemaRegistry
    val b = new ChangeEventBuilder(reg)
    val rel2 = rel.copy(relationId = 100, name = "acct2")
    b.process(1L, rel); b.process(2L, rel2)
    b.process(10L, Begin(100L, 5000L, 1))
    val evs = b.process(11L, Truncate(0, Vector(99, 100)))
    assert(evs.map(_.table) === Seq("acct", "acct2"))
    assert(evs.forall(_.op === "T"))
  }

  test("replication origin ('O', stubbed in the reference D4) rides on the txn's events and clears at commit") {
    val (b, _) = fresh()
    b.process(10L, Begin(100L, 5000L, 1))
    b.process(10L, Origin(100L, "node_a"))
    val ev = b.process(11L, Insert(99, TupleData(Vector(t("1"), t("x"), t("y"))))).head
    assert(ev.origin === "node_a")
    b.process(12L, Commit(0, 100L, 101L, 5000L))
    // next transaction has no Origin message → local origin (null)
    b.process(20L, Begin(200L, 6000L, 2))
    val ev2 = b.process(21L, Insert(99, TupleData(Vector(t("2"), t("x"), t("y"))))).head
    assert(ev2.origin === null)
  }

  test("commit clears txn metadata; events outside txn get sentinel values") {
    val (b, _) = fresh()
    b.process(10L, Begin(100L, 5000L, 7))
    b.process(12L, Commit(0, 100L, 101L, 5000L))
    val ev = b.process(13L, Insert(99, TupleData(Vector(t("1"), t("z"), n)))).head
    assert(ev.txId === -1 && ev.beginLsn === -1L)
  }

  test("events for an unseen relation id raise a typed error") {
    val reg = new SchemaRegistry
    val b = new ChangeEventBuilder(reg)
    intercept[PgOutputDecodeException] {
      b.process(1L, Insert(12345, TupleData(Vector(t("1")))))
    }
  }

  test("PgType ('Y') messages pre-warm registry type names (D6, stubbed in the reference)") {
    val reg = new SchemaRegistry
    val b = new ChangeEventBuilder(reg)
    assert(b.process(1L, PgType(16385, "public", "my_enum")) === Nil)
    assert(reg.typeName(16385) === Some("public.my_enum"))
    assert(reg.typeName(99) === None)
  }

  test("relation re-send with an added column switches subsequent decoding (schema evolution, T2)") {
    val (b, reg) = fresh()
    b.process(10L, Begin(100L, 5000L, 1))
    val before = b.process(11L, Insert(99, TupleData(Vector(t("1"), t("alice"), n)))).head
    assert(before.after === Map("id" -> "1", "name" -> "alice", "payload" -> null))
    // ALTER TABLE ADD COLUMN email → Postgres re-sends Relation before the
    // first DML under the new shape; the registry entry is replaced in place
    val evolved = Relation(99, "public", "acct", 'd', rel.columns :+
      RelationColumn(partOfKey = false, "email", TypedView.Oid.Text, -1))
    assert(b.process(12L, evolved) === Nil)
    assert(reg.getOrThrow(99).columns.map(_.name) ===
      Seq("id", "name", "payload", "email"))
    val after = b.process(13L, Insert(99, TupleData(Vector(t("2"), t("bob"), n, t("b@x"))))).head
    assert(after.after === Map("id" -> "2", "name" -> "bob", "payload" -> null, "email" -> "b@x"))
    // pre-evolution rows simply lack the new column in their image map —
    // the typed view over the evolved schema reads them as NULL
    assert(!before.after.contains("email"))
  }

  test("seq is strictly monotonic within a builder (LSN tie-break)") {
    val (b, _) = fresh()
    b.process(10L, Begin(100L, 5000L, 1))
    val e1 = b.process(11L, Insert(99, TupleData(Vector(t("1"), n, n)))).head
    val e2 = b.process(11L, Insert(99, TupleData(Vector(t("2"), n, n)))).head
    assert(e1.seq < e2.seq)
  }

  test("streamed txns: interleaved segments reassemble on commit, aborted txn vanishes") {
    val (b, _) = fresh()
    def ins(id: String) = Insert(99, TupleData(Vector(t(id), t("x"), n)))
    // segments of txn 10 and txn 20 interleave; 20 aborts wholesale
    assert(b.process(100L, StreamStart(10, firstSegment = true)) === Nil)
    assert(b.process(101L, StreamedPart(10, ins("1"))) === Nil) // buffered, not emitted
    assert(b.process(102L, StreamStop) === Nil)
    assert(b.process(103L, StreamStart(20, firstSegment = true)) === Nil)
    assert(b.process(104L, StreamedPart(20, ins("2"))) === Nil)
    assert(b.process(105L, StreamStop) === Nil)
    assert(b.process(106L, StreamStart(10, firstSegment = false)) === Nil)
    assert(b.process(107L, StreamedPart(10, ins("3"))) === Nil)
    assert(b.process(108L, StreamStop) === Nil)
    assert(b.process(109L, StreamAbort(20, 20)) === Nil)
    val evs = b.process(110L, StreamCommit(10, 0, 200L, 201L, 7777L))
    assert(evs.map(e => e.after("id")) === Seq("1", "3")) // arrival order, txn 20 gone
    // commit metadata stamped at reassembly: top xid, first segment's lsn
    assert(evs.forall(e => e.txId == 10 && e.beginLsn == 100L && e.commitTsUs == 7777L))
    assert(evs.map(_.lsn) === Seq(101L, 107L)) // events keep their frame positions
    assert(evs.map(_.seq) === evs.map(_.seq).sorted)
  }

  test("subtransaction abort removes only that subxid's frames; txn still commits") {
    val (b, _) = fresh()
    def ins(id: String) = Insert(99, TupleData(Vector(t(id), t("x"), n)))
    b.process(100L, StreamStart(10, firstSegment = true))
    b.process(101L, StreamedPart(10, ins("1")))
    b.process(102L, StreamedPart(11, ins("2"))) // subxact 11
    b.process(103L, StreamedPart(10, ins("3")))
    b.process(104L, StreamStop)
    b.process(105L, StreamAbort(10, 11)) // surgical: only subxact 11 dies
    val evs = b.process(106L, StreamCommit(10, 0, 200L, 201L, 1L))
    assert(evs.map(e => e.after("id")) === Seq("1", "3"))
  }

  test("in-stream frame outside an open segment is a protocol error") {
    val (b, _) = fresh()
    intercept[PgOutputDecodeException] {
      b.process(100L, StreamedPart(10, Insert(99, TupleData(Vector(t("1"), n, n)))))
    }
  }

  test("logical messages: transactional rides txn meta, non-transactional is immediate with tx_id -1") {
    val reg = new SchemaRegistry
    val b = new ChangeEventBuilder(reg, emitMessages = true)
    b.process(1L, rel)
    b.process(10L, Begin(100L, 5000L, 42))
    val tx = b.process(11L, LogicalMessage(transactional = true, 11L, "audit", "a".getBytes("UTF-8"))).head
    assert(tx.op === "M" && tx.txId === 42 && tx.commitTsUs === 5000L)
    assert(tx.after === Map("prefix" -> "audit", "content" -> "a",
      "transactional" -> "true", "message_lsn" -> "11"))
    val nt = b.process(12L, LogicalMessage(transactional = false, 12L, "hb", "b".getBytes("UTF-8"))).head
    assert(nt.txId === -1 && nt.beginLsn === -1L) // outside the txn by definition
    b.process(13L, Commit(0, 100L, 101L, 5000L))
    // default builder (emitMessages = false) stays silent — sinks that fold
    // by table key never see keyless 'M' rows unless they opt in
    val (b2, _) = fresh()
    assert(b2.process(11L, LogicalMessage(transactional = false, 11L, "p", Array.emptyByteArray)) === Nil)
  }

  test("2PC: prepared txn buffers until COMMIT PREPARED, rollback leaves no trace, in-doubt held") {
    val (b, _) = fresh()
    def ins(id: String) = Insert(99, TupleData(Vector(t(id), t("x"), n)))
    // gid A commits, gid B rolls back, gid C stays in-doubt
    b.process(100L, BeginPrepare(102L, 102L, 5000L, 40, "A"))
    assert(b.process(101L, ins("1")) === Nil) // buffered
    b.process(102L, Prepare(0, 102L, 102L, 5000L, 40, "A"))
    b.process(110L, BeginPrepare(112L, 112L, 5000L, 41, "B"))
    b.process(111L, ins("2"))
    b.process(112L, Prepare(0, 112L, 112L, 5000L, 41, "B"))
    b.process(120L, BeginPrepare(122L, 122L, 5000L, 42, "C"))
    b.process(121L, ins("3"))
    b.process(122L, Prepare(0, 122L, 122L, 5000L, 42, "C"))
    // an unrelated plain txn between prepare and resolution flows normally
    b.process(130L, Begin(132L, 1L, 50))
    assert(b.process(131L, ins("4")).nonEmpty)
    b.process(132L, Commit(0, 132L, 132L, 1L))
    // resolutions: B rolls back, A commits with the COMMIT PREPARED ts
    assert(b.process(140L, RollbackPrepared(0, 112L, 140L, 5000L, 8000L, 41, "B")) === Nil)
    val evs = b.process(150L, CommitPrepared(0, 150L, 151L, 9000L, 40, "A"))
    assert(evs.map(e => e.after("id")) === Seq("1"))
    assert(evs.head.txId === 40 && evs.head.commitTsUs === 9000L && evs.head.beginLsn === 100L)
    assert(evs.head.lsn === 101L) // the DML frame's own WAL position
    // C was never resolved: in-doubt, held, nothing emitted
  }

  test("stream-prepare: streamed segments park under the gid and resolve via K/r") {
    val (b, _) = fresh()
    def ins(id: String) = Insert(99, TupleData(Vector(t(id), t("x"), n)))
    // txn 10 streams then prepares as gid "G", commits much later
    b.process(100L, StreamStart(10, firstSegment = true))
    b.process(101L, StreamedPart(10, ins("1")))
    b.process(102L, StreamStop)
    assert(b.process(103L, StreamPrepare(0, 103L, 103L, 5000L, 10, "G")) === Nil)
    // txn 20 streams, prepares as "H", rolls back
    b.process(110L, StreamStart(20, firstSegment = true))
    b.process(111L, StreamedPart(20, ins("2")))
    b.process(112L, StreamStop)
    b.process(113L, StreamPrepare(0, 113L, 113L, 5000L, 20, "H"))
    assert(b.process(120L, RollbackPrepared(0, 113L, 120L, 5000L, 6000L, 20, "H")) === Nil)
    val evs = b.process(130L, CommitPrepared(0, 130L, 131L, 9000L, 10, "G"))
    assert(evs.map(e => e.after("id")) === Seq("1"))
    assert(evs.head.txId === 10 && evs.head.commitTsUs === 9000L)
  }

  test("schema evolution inside a streamed txn re-projects at the re-send point") {
    val (b, _) = fresh()
    val relV2 = Relation(99, "public", "acct", 'd',
      rel.columns :+ RelationColumn(partOfKey = false, "email", TypedView.Oid.Text, -1))
    b.process(100L, StreamStart(10, firstSegment = true))
    b.process(101L, StreamedPart(10, Insert(99, TupleData(Vector(t("1"), t("a"), n)))))
    b.process(102L, StreamedPart(10, relV2)) // ADD COLUMN mid-stream
    b.process(103L, StreamedPart(10, Insert(99, TupleData(Vector(t("2"), t("b"), n, t("b@x"))))))
    b.process(104L, StreamStop)
    val evs = b.process(105L, StreamCommit(10, 0, 200L, 201L, 1L))
    // replay applies the Relation in arrival order: the 3-col tuple
    // projects under v1, the 4-col tuple under v2
    assert(evs.map(_.after) === Seq(
      Map("id" -> "1", "name" -> "a", "payload" -> null),
      Map("id" -> "2", "name" -> "b", "payload" -> null, "email" -> "b@x")))
  }

  test("streamed txn overflow spills to disk and replays identically (threshold 2)") {
    val reg = new SchemaRegistry
    val b = new ChangeEventBuilder(reg, spillThreshold = 2)
    b.process(1L, rel)
    def ins(id: Int) = Insert(99, TupleData(Vector(t(id.toString), t("x"), n)))
    b.process(100L, StreamStart(10, firstSegment = true))
    // 6 frames: 2 on-heap, 4 spilled; subxact 11 aborts AFTER its frames
    // spilled — the drop-set must filter the file replay too
    b.process(101L, StreamedPart(10, ins(1)))
    b.process(102L, StreamedPart(10, ins(2)))
    b.process(103L, StreamedPart(10, ins(3)))
    b.process(104L, StreamedPart(11, ins(4)))
    b.process(105L, StreamedPart(10, ins(5)))
    b.process(106L, StreamedPart(11, ins(6)))
    b.process(107L, StreamStop)
    b.process(108L, StreamAbort(10, 11))
    val evs = b.process(109L, StreamCommit(10, 0, 200L, 201L, 7L))
    assert(evs.map(e => e.after("id")) === Seq("1", "2", "3", "5"))
    assert(evs.map(_.lsn) === Seq(101L, 102L, 103L, 105L))
    assert(evs.forall(_.txId == 10))
    // prepared txns share the spill machinery: prepare 4 frames at
    // threshold 2, rollback must release without replay
    val b2 = new ChangeEventBuilder(reg, spillThreshold = 2)
    b2.process(1L, rel)
    b2.process(200L, BeginPrepare(205L, 205L, 1L, 50, "G"))
    (1 to 4).foreach(i => b2.process(200L + i, ins(i)))
    b2.process(205L, Prepare(0, 205L, 205L, 1L, 50, "G"))
    assert(b2.process(210L, RollbackPrepared(0, 205L, 210L, 1L, 2L, 50, "G")) === Nil)
    assert(b2.process(211L, CommitPrepared(0, 211L, 211L, 3L, 50, "G")) === Nil)
  }

  test("property: streamed delivery is invariant to segmentation and interleaving (200 arrangements)") {
    // k transactions, each inserting its own keys; a random subset aborts.
    // Streamed form: each txn's frames split into random segments, segments
    // of all txns interleaved randomly (per-txn order preserved), aborts
    // and commits appended. The final last-LSN-wins image per key must
    // equal plain sequential processing of just the committed txns.
    val rnd = new scala.util.Random(42)
    def ins(id: Int) = Insert(99, TupleData(Vector(t(id.toString), t(s"v$id"), n)))
    for (trial <- 1 to 200) {
      val nTxn = 1 + rnd.nextInt(4)
      val txns = (0 until nTxn).map { i =>
        val keys = (0 until 1 + rnd.nextInt(5)).map(j => i * 100 + j)
        val aborted = rnd.nextBoolean() && i > 0
        (1000 + i, keys, aborted)
      }
      // expected: plain processing of committed txns only
      val (bp, _) = fresh()
      val expected = txns.filterNot(_._3).flatMap { case (xid, keys, _) =>
        bp.process(1L, Begin(2L, 0L, xid))
        val evs = keys.flatMap(k => bp.process(10L + k, ins(k)))
        bp.process(2L, Commit(0, 2L, 2L, 0L))
        evs
      }.map(e => (e.after("id"), e.after("name"), e.lsn)).toSet
      // streamed arrangement: split each txn's frames into segments
      val segments = scala.collection.mutable.ArrayBuffer.empty[(Int, Seq[Int])]
      txns.foreach { case (xid, keys, _) =>
        var rest = keys
        while (rest.nonEmpty) {
          val take = 1 + rnd.nextInt(rest.size)
          segments += ((xid, rest.take(take)))
          rest = rest.drop(take)
        }
      }
      // interleave randomly while preserving each txn's own segment order:
      // repeatedly pick a txn that still has segments and emit its next one
      val byTxn = segments.toSeq.groupBy(_._1)
      val pending = scala.collection.mutable.Map(byTxn.view.mapValues(_.toList).toSeq: _*)
      val arrangement = scala.collection.mutable.ArrayBuffer.empty[(Int, Seq[Int])]
      while (pending.nonEmpty) {
        val xids = pending.keys.toSeq
        val x = xids(rnd.nextInt(xids.size))
        arrangement += pending(x).head
        pending(x) = pending(x).tail
        if (pending(x).isEmpty) pending.remove(x)
      }
      val (bs, _) = fresh()
      val got = scala.collection.mutable.ArrayBuffer.empty[ChangeEvent]
      arrangement.foreach { case (xid, keys) =>
        bs.process(1L, StreamStart(xid, firstSegment = true))
        keys.foreach(k => got ++= bs.process(10L + k, StreamedPart(xid, ins(k))))
        got ++= bs.process(1L, StreamStop)
      }
      txns.foreach { case (xid, _, aborted) =>
        if (aborted) got ++= bs.process(2L, StreamAbort(xid, xid))
        else got ++= bs.process(2L, StreamCommit(xid, 0, 2L, 2L, 0L))
      }
      val gotSet = got.map(e => (e.after("id"), e.after("name"), e.lsn)).toSet
      assert(gotSet === expected, s"trial $trial: $arrangement")
    }
  }

  test("spill buffer lifecycle: file created past threshold, deleted on drain and on discard") {
    val buf = new TxnSpillBuffer(spillThreshold = 1)
    def ins(id: String) = Insert(99, TupleData(Vector(t(id))))
    buf.append(0, 1L, ins("1")) // on heap
    buf.append(0, 2L, ins("2")) // spills
    buf.append(0, 3L, ins("3")) // spills
    val drained = buf.drain().toVector
    assert(drained.map(_._2) === Seq(1L, 2L, 3L))
    assert(drained.map(_._3).collect { case Insert(_, td) => td.columns.head.data.get }
      === Seq("1", "2", "3"))
    // discard on a fresh spilled buffer releases without replay
    val buf2 = new TxnSpillBuffer(spillThreshold = 1)
    buf2.append(0, 1L, ins("1"))
    buf2.append(0, 2L, ins("2"))
    buf2.discard()
    assert(buf2.drain().isEmpty)
  }

  test("stream edge cases: empty txn, unknown commit/abort are inert") {
    val (b, _) = fresh()
    b.process(1L, StreamStart(5, firstSegment = true))
    assert(b.process(2L, StreamStop) === Nil)
    assert(b.process(3L, StreamCommit(5, 0, 3L, 3L, 0L)) === Nil) // empty txn
    assert(b.process(4L, StreamCommit(999, 0, 4L, 4L, 0L)) === Nil) // unknown xid
    assert(b.process(5L, StreamAbort(998, 998)) === Nil)
    assert(b.process(6L, CommitPrepared(0, 6L, 6L, 0L, 7, "nope")) === Nil)
    assert(b.process(7L, RollbackPrepared(0, 1L, 7L, 0L, 0L, 7, "nope")) === Nil)
  }

  test("messages inside an aborted streamed txn are dropped with it") {
    val reg = new SchemaRegistry
    val b = new ChangeEventBuilder(reg, emitMessages = true)
    b.process(1L, rel)
    b.process(100L, StreamStart(10, firstSegment = true))
    b.process(101L, StreamedPart(10,
      LogicalMessage(transactional = true, 101L, "audit", "z".getBytes("UTF-8"))))
    b.process(102L, StreamStop)
    assert(b.process(103L, StreamAbort(10, 10)) === Nil)
    assert(b.process(104L, StreamCommit(10, 0, 200L, 201L, 1L)) === Nil) // buffer already gone
  }
}
