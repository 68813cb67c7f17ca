package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.decode._
import graft.sources.FrameLog

/** Sustained-throughput (soak) proof for the bucketed streaming sinks —
  * VERDICT r3 #4: the parity and crash specs show the sinks are CORRECT;
  * this spec shows they hold their per-batch cost as state grows, i.e. the
  * O(batch + touched buckets) claim empirically, not just by construction.
  *
  * Three angles, cheapest-first:
  *  1. STRUCTURAL: a batch whose keys fall in two buckets flips exactly
  *     those two manifest entries; every other bucket's version directory
  *     survives IDENTICALLY (never read, never rewritten). This is the
  *     O(touched buckets) property as a deterministic fact about the
  *     layout, immune to timing noise.
  *  2. LATENCY: 30 same-shaped update waves against a 60k-key state —
  *     median trigger duration of the last ten waves within 3x the first
  *     ten (an O(state)-per-batch regression, e.g. the flat mergeBatch,
  *     rewrites the full table every wave and blows this envelope; the
  *     3x headroom absorbs documented host variance).
  *  3. CORRECTNESS AFTER SOAK: the final materialized state equals the
  *     expected fold of seed + every wave (count and content sample).
  *
  * Wave construction: bucket membership is pmod(xxhash64(key-as-text), n)
  * (Streams.bucketOf); the spec precomputes it with the same expression so
  * each wave's 1000 updated keys land in exactly two buckets — the
  * hot-partition traffic shape the bucketed layout exists to absorb.
  */
class SoakSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val NBuckets = 64
  private val NKeys = 60000L
  private val rel = Relation(77001, "public", "soak", 'd', Vector(
    RelationColumn(partOfKey = true, "id", TypedView.Oid.Int8, -1),
    RelationColumn(partOfKey = false, "v", TypedView.Oid.Text, -1)))

  private def t(v: String) = ColumnData('t', Some(v))
  private def enc(m: PgOutputMessage) = PgOutputEncoder.encode(m)
  private def tup(id: Long, v: String) = TupleData(Vector(t(id.toString), t(v)))

  /** id → bucket under the sink's own hash (xxhash64 over the key's WIRE
    * TEXT, mod n — computed with the identical Spark expression). */
  private lazy val bucketsById: Map[Long, Long] = {
    val rows = spark.range(1, NKeys + 1)
      .select(col("id"),
        pmod(xxhash64(col("id").cast("string")), lit(NBuckets)).as("b"))
      .collect()
    rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
  }
  private lazy val idsByBucket: Map[Long, Seq[Long]] =
    bucketsById.toSeq.groupBy(_._2).view.mapValues(_.map(_._1).sorted).toMap

  private def writeSeedLog(path: String): Unit = {
    val frames = Iterator.single(FrameLog.Entry(0L, enc(rel))) ++
      Iterator.single(FrameLog.Entry(1L, enc(Begin(NKeys + 2, 0L, 1)))) ++
      (1L to NKeys).iterator.map(id =>
        FrameLog.Entry(id + 1, enc(Insert(rel.relationId, tup(id, s"v$id"))))) ++
      Iterator.single(FrameLog.Entry(NKeys + 2, enc(Commit(0, NKeys + 2, NKeys + 2, 0L))))
    FrameLog.write(path, frames)
  }

  /** Wave w updates 1000 keys drawn from buckets (2w, 2w+1) mod n; one
    * transaction per wave → 1002 frames, so maxFramesPerTrigger=1002 aligns
    * micro-batches exactly to waves. */
  private val WaveFrames = 1002L
  private def waveKeys(w: Int): Seq[Long] = {
    val b0 = (2L * w) % NBuckets
    val b1 = (2L * w + 1) % NBuckets
    (idsByBucket.getOrElse(b0, Nil).take(500) ++
      idsByBucket.getOrElse(b1, Nil).take(500)).take(1000)
  }
  private def writeWaveLog(path: String, waves: Range): Unit = {
    val base = 10000000L
    val frames = Iterator.single(FrameLog.Entry(0L, enc(rel))) ++
      waves.iterator.flatMap { w =>
        val lsn0 = base + w * 10000L
        val keys = waveKeys(w)
        Iterator.single(FrameLog.Entry(lsn0, enc(Begin(lsn0 + 1001, 0L, w + 2)))) ++
          keys.iterator.zipWithIndex.map { case (id, i) =>
            FrameLog.Entry(lsn0 + 1 + i,
              enc(Update(rel.relationId, None, None, tup(id, s"u${w}_$id")))) } ++
          Iterator.single(FrameLog.Entry(lsn0 + 1001,
            enc(Commit(0, lsn0 + 1001, lsn0 + 1001, 0L))))
      }
    FrameLog.write(path, frames)
  }

  private def runSink(logPath: String, stateDir: String,
      maxPerTrigger: Option[Long], lww: Boolean): Seq[(Long, Long)] = {
    val ckpt = Files.createTempDirectory("soak-ckpt").toString
    val env = Streams.envelopeStream(spark, logPath, maxPerTrigger)
    val q =
      if (lww) Streams.lwwUpsertSinkBucketed(env, rel, stateDir, ckpt, NBuckets)
      else Streams.cdcUpsertSinkBucketed(env, rel, stateDir, ckpt, NBuckets)
    q.processAllAvailable()
    val progress = q.recentProgress.toSeq
      .filter(_.numInputRows > 0)
      .map(p => (p.numInputRows, p.durationMs.get("triggerExecution").longValue()))
    q.stop()
    progress
  }

  test("structural: an update batch flips exactly its touched buckets; " +
      "all other bucket versions survive byte-identical") {
    val dir = Files.createTempDirectory("soak-struct")
    val seedLog = dir.resolve("seed.bin").toString
    val stateDir = dir.resolve("state").toString
    writeSeedLog(seedLog)
    runSink(seedLog, stateDir, None, lww = false)
    val before = StateStore.load(stateDir)
    assert(before.keys.count(_.matches("b\\d+")) > 50, "seed should populate most buckets")

    // one wave touching buckets {10, 11}
    val waveLog = dir.resolve("wave.bin").toString
    writeWaveLog(waveLog, 5 to 5) // wave 5 → buckets 10, 11
    runSink(waveLog, stateDir, None, lww = false)
    val after = StateStore.load(stateDir)

    val changed = (before.keySet ++ after.keySet)
      .filter(k => k.matches("b\\d+") && before.get(k) != after.get(k))
    assert(changed === Set("b10", "b11"),
      s"expected exactly buckets 10/11 to flip, got $changed")
    // untouched version dirs still exist on disk, unrewritten
    (before -- Seq("b10", "b11", "nbuckets")).foreach { case (k, v) =>
      if (k.matches("b\\d+"))
        assert(new java.io.File(s"$stateDir/$v").exists(), s"bucket $k dir vanished")
    }
  }

  test("soak: 30 update waves over 60k-key state — per-batch latency flat, " +
      "final state exact (cdc upsert, bucketed)") {
    val dir = Files.createTempDirectory("soak-cdc")
    val seedLog = dir.resolve("seed.bin").toString
    val stateDir = dir.resolve("state").toString
    writeSeedLog(seedLog)
    runSink(seedLog, stateDir, None, lww = false)

    val waveLog = dir.resolve("waves.bin").toString
    writeWaveLog(waveLog, 0 until 30)
    val prog = runSink(waveLog, stateDir, Some(WaveFrames), lww = false)
    // every wave was its own micro-batch (numInputRows triples the 1000
    // events: the un-persisted batch frame is re-read once per merge action)
    val waves = prog
    assert(waves.size === 30, s"expected 30 aligned wave batches, got ${prog.map(_._1)}")

    def median(xs: Seq[Long]): Long = xs.sorted.apply(xs.size / 2)
    val early = median(waves.slice(0, 10).map(_._2))
    val late = median(waves.slice(20, 30).map(_._2))
    info(s"per-wave trigger ms: early median=$early late median=$late")
    assert(late <= early * 3 + 50,
      s"per-batch latency grew $early → $late ms over constant-shape waves — " +
        "cost is tracking total state, not touched buckets")

    // correctness after soak: every key present once; waved keys carry the
    // LAST wave's value that touched them (waves 30+ wrap: here each bucket
    // pair is touched at most once, so u<w>_ values are final)
    val state = Streams.materializedState(spark, rel, stateDir)
    assert(state.count() === NKeys)
    val updated = (0 until 30).flatMap(w => waveKeys(w).map(id => (id, s"u${w}_$id"))).toMap
    val sample = state.filter(col("id").isin(updated.keys.take(50).toSeq.map(java.lang.Long.valueOf): _*))
      .select(col("id"), col("v")).collect()
    sample.foreach(r => assert(r.getString(1) === updated(r.getLong(0))))
    val untouched = state.filter(col("v").startsWith("v")).count()
    assert(untouched === NKeys - updated.size)
  }

  test("structural: the LWW bucketed sink also flips exactly its touched " +
      "buckets — untouched bucket versions survive byte-identical (r6 advice)") {
    val dir = Files.createTempDirectory("soak-lww-struct")
    val seedLog = dir.resolve("seed.bin").toString
    val stateDir = dir.resolve("state").toString
    writeSeedLog(seedLog)
    runSink(seedLog, stateDir, None, lww = true)
    val before = StateStore.load(stateDir)
    assert(before.keys.count(_.matches("b\\d+")) > 50, "seed should populate most buckets")

    val waveLog = dir.resolve("wave.bin").toString
    writeWaveLog(waveLog, 5 to 5) // wave 5 → buckets 10, 11
    runSink(waveLog, stateDir, None, lww = true)
    val after = StateStore.load(stateDir)

    val changed = (before.keySet ++ after.keySet)
      .filter(k => k.matches("b\\d+") && before.get(k) != after.get(k))
    assert(changed === Set("b10", "b11"),
      s"expected exactly buckets 10/11 to flip, got $changed")
    (before -- Seq("b10", "b11", "nbuckets")).foreach { case (k, v) =>
      if (k.matches("b\\d+"))
        assert(new java.io.File(s"$stateDir/$v").exists(), s"bucket $k dir vanished")
    }
  }

  test("soak: LWW bucketed sink holds the same envelope (10 waves)") {
    val dir = Files.createTempDirectory("soak-lww")
    val seedLog = dir.resolve("seed.bin").toString
    val stateDir = dir.resolve("state").toString
    writeSeedLog(seedLog)
    runSink(seedLog, stateDir, None, lww = true)

    val waveLog = dir.resolve("waves.bin").toString
    writeWaveLog(waveLog, 0 until 10)
    val prog = runSink(waveLog, stateDir, Some(WaveFrames), lww = true)
    val waves = prog
    assert(waves.size === 10, s"expected 10 aligned wave batches, got ${prog.map(_._1)}")
    def median(xs: Seq[Long]): Long = xs.sorted.apply(xs.size / 2)
    val early = median(waves.slice(0, 5).map(_._2))
    val late = median(waves.slice(5, 10).map(_._2))
    info(s"lww per-wave trigger ms: early median=$early late median=$late")
    assert(late <= early * 3 + 50)
    val state = Streams.materializedState(spark, rel, stateDir)
    assert(state.count() === NKeys)
  }

  // ---- online near-dup sink: band-key state is the interesting curve ----

  private val docsRel = graft.cdc.CdcPipeline.documentsRelation
  private def docTup(id: Long, text: String) = TupleData(Vector(
    t(id.toString), t(text), t("en"), t("web"), t(text.length.toString)))

  /** documentsToFrames' LSN discipline (base = id·4) so arrival ≡ id order. */
  private def writeDocLog(path: String, docs: Seq[(Long, String)]): Unit = {
    val frames = Iterator.single(FrameLog.Entry(0L, enc(docsRel))) ++
      docs.iterator.flatMap { case (id, text) =>
        val base = id * 4
        Iterator(
          FrameLog.Entry(base + 1, enc(Begin(base + 3, 0L, id.toInt))),
          FrameLog.Entry(base + 2, enc(Insert(docsRel.relationId, docTup(id, text)))),
          FrameLog.Entry(base + 3, enc(Commit(0, base + 3, base + 3, 0L))))
      }
    FrameLog.write(path, frames)
  }

  private def runNearDupSink(logPath: String, stateDir: String): Unit = {
    val ckpt = Files.createTempDirectory("soak-nd-ckpt").toString
    val env = Streams.envelopeStream(spark, logPath, None)
    val q = Streams.onlineNearDupSink(env, docsRel, "text", stateDir, ckpt,
      nBuckets = NBuckets)
    q.processAllAvailable(); q.stop()
  }

  test("structural: a near-dup ingest wave touches only its texts' band-key " +
      "buckets — the LSH index grows O(batch bands), not O(state)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("soak-neardup")
    // seed: 2000 distinct-vocabulary docs → band keys spread over the
    // bucket space (this is the grown state a wave must NOT rewrite)
    def seedText(id: Long) = (0 until 12).map(i => s"s${id}w$i").mkString(" ")
    val seedLog = dir.resolve("seed.bin").toString
    writeDocLog(seedLog, (1L to 2000L).map(id => id -> seedText(id)))
    val stateDir = dir.resolve("state").toString
    runNearDupSink(seedLog, stateDir)
    val before = StateStore.load(stateDir)
    assert(before.keys.count(_.matches("b\\d+")) > NBuckets / 2,
      "seed should populate most band buckets")

    // the wave: 300 docs sharing ONE text — its 4 band keys pin exactly
    // which buckets the merge may open, computed with the sink's own hashing
    val waveText = (0 until 12).map(i => s"wvTok$i").mkString(" ")
    val expectedBuckets = graft.queries.DedupQueries
      .bandKeysWithSig(graft.queries.DedupQueries.minhashSigsOf(
        Seq((0L, waveText)).toDF("doc_id", "text")))
      .select(pmod(xxhash64(col("bucket")), lit(NBuckets)).as("b"))
      .distinct().collect().map(r => s"b${r.getLong(0)}").toSet
    assert(expectedBuckets.nonEmpty && expectedBuckets.size <= 4)
    val waveLog = dir.resolve("wave.bin").toString
    writeDocLog(waveLog, (10001L to 10300L).map(id => id -> waveText))
    runNearDupSink(waveLog, stateDir)
    val after = StateStore.load(stateDir)

    // only the wave's band buckets (and the appended decision segment +
    // high-water) may differ; every other bucket version is untouched
    val changed = (before.keySet ++ after.keySet)
      .filter(k => k.matches("b\\d+") && before.get(k) != after.get(k))
    assert(changed === expectedBuckets,
      s"expected exactly ${expectedBuckets.mkString(",")} to flip, got $changed")
    // decisions: the wave's first doc anchors, every later one flags to it
    val dec = Streams.onlineNearDupDecisions(spark, stateDir)
      .filter(col("id") >= 10001L)
      .select(col("id").cast("long"), col("is_neardup"), col("dup_of").cast("long"))
      .collect().map(r =>
        (r.getLong(0), r.getBoolean(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
      .sortBy(_._1)
    assert(dec.length === 300)
    assert(dec.head === ((10001L, false, -1L)))
    assert(dec.tail.forall { case (_, nd, d) => nd && d == 10001L })
  }
}
