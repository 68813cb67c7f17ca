package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal queries: binary-column decode + frame sampling through the
  * per-partition codec plumbing (graft.operators.Multimodal). The fake
  * codec is a pure function of the payload bytes, so DuckDB reproduces it
  * arithmetically — the *plumbing* (binary schema, mapPartitions batches,
  * flatMap frame explosion) is the thing under test. */
object MultimodalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Content-addressable blob store view: identical media payloads stored
    // ONCE, every holder pointing at the canonical copy — the dedup layer
    // under any multimodal lake (image/video corpora are heavily
    // duplicated). Codec-independent: works on the opaque bytes. Scale
    // shape: one digest-keyed shuffle carrying (16-byte digest, 8-byte
    // length) per blob — never the payload bytes themselves.
    "mm_blob_dedup" -> ((s, d) => {
      graft.operators.Multimodal.mediaTable(s, d)
        .select(col("doc_id"), md5(col("payload")).as("digest"),
          length(col("payload")).cast("long").as("n_bytes"))
        .groupBy(col("digest"))
        .agg(min(col("doc_id")).as("canonical_id"),
          count(lit(1)).as("refcount"),
          min(col("n_bytes")).as("blob_bytes"),
          (sum(col("n_bytes")) - min(col("n_bytes"))).as("bytes_saved"))
        .orderBy(col("digest"))
    }),

    "mm_decode_meta" -> ((s, d) => {
      Multimodal.decodeMeta(Multimodal.mediaTable(s, d))
        .toDF().orderBy(col("doc_id"))
    }),

    "mm_frame_sample" -> ((s, d) => {
      Multimodal.sampleFrames(Multimodal.mediaTable(s, d))
        .toDF().orderBy(col("doc_id"), col("frame_idx"))
    }),

    // Shot-boundary (scene cut) detection over the sampled frame stream:
    // a cut wherever consecutive frames' probe features jump by >= 40 —
    // the standard video preprocessing step before frame dedup/sampling
    // in multimodal training pipelines (sample one frame per SCENE, not
    // per second). A real codec swaps the per-frame byte probe for a
    // histogram/embedding delta; the temporal plumbing — one doc-keyed
    // window over the frame sequence, lag diff, per-doc census — is
    // identical and is what's under test. Scale: frames ≪ payload bytes
    // and only (doc_id, frame_idx, feature) rows shuffle, never media.
    "mm_scene_cuts" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
      Multimodal.sampleFrames(Multimodal.mediaTable(s, d)).toDF()
        .withColumn("prev", lag(col("frame_byte"), 1).over(w))
        .withColumn("cut", when(col("prev").isNotNull &&
          abs(col("frame_byte") - col("prev")) >= 40, 1L).otherwise(0L))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_frames"), sum(col("cut")).as("n_cuts"),
          (sum(col("cut")) + lit(1L)).as("n_scenes"))
        .orderBy(col("doc_id"))
    }),

    // Scene-level frame SAMPLING — the reason shot boundaries matter in a
    // training pipeline: keep ONE representative frame per scene instead
    // of one per time interval (a 10-minute static shot contributes 1
    // frame, not 150 near-identical ones). scene_id = running cut count
    // per doc (same cut rule as mm_scene_cuts), representative = the
    // scene's first frame. One doc-keyed window + one (doc, scene) agg;
    // media bytes never shuffle.
    "mm_scene_frames" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val wSeq = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
      val wCum = wSeq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Multimodal.sampleFrames(Multimodal.mediaTable(s, d)).toDF()
        .withColumn("prev", lag(col("frame_byte"), 1).over(wSeq))
        .withColumn("cut", when(col("prev").isNotNull &&
          abs(col("frame_byte") - col("prev")) >= 40, 1L).otherwise(0L))
        .withColumn("scene_id", sum(col("cut")).over(wCum))
        .groupBy(col("doc_id"), col("scene_id"))
        .agg(min(col("frame_idx")).as("frame_idx"),
          min_by(col("frame_byte"), col("frame_idx")).as("frame_byte"),
          count(lit(1)).as("n_frames_in_scene"))
        .orderBy(col("doc_id"), col("scene_id"))
    }),

    // Feature-extract + resize through the per-partition codec batch.
    "mm_features" -> ((s, d) => {
      Multimodal.extractFeatures(Multimodal.mediaTable(s, d))
        .toDF().orderBy(col("doc_id"))
    }),

    // Unified text⋈vector wide view (SURVEY §2.2 north-star multimodal):
    // document metadata joined with its embedding row (vec_id = doc_id)
    // and the vector's norm — the per-example record a training pipeline
    // feeds downstream. Doc-keyed equi-join; norms are one narrow map.
    "mm_text_embedding_view" -> ((s, d) => {
      val e = graft.Tables.embeddings(s, d)
        .select(col("vec_id").as("doc_id"), col("label"),
          round(sqrt(DedupQueries.dotD(col("embedding"), col("embedding"))), 6)
            .as("emb_norm"))
      graft.Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .join(e, Seq("doc_id"), "left")
        .orderBy(col("doc_id"))
    }),

    // Modality-aware aggregate over decoded metadata: joins the decoded
    // stream back to document labels — the "unified wide view" shape.
    "mm_meta_stats" -> ((s, d) => {
      val meta = Multimodal.decodeMeta(Multimodal.mediaTable(s, d)).toDF()
      val docs = graft.Tables.documents(s, d).select(col("doc_id"), col("lang"))
      meta.join(docs, "doc_id")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_bytes")).as("total_bytes"),
          sum(col("n_frames")).as("total_frames"),
          max(col("width")).as("max_width"))
        .orderBy(col("lang"))
    }),

    // Media curation QUALITY GATE — the LAION-style pre-training filter
    // (mm's twin of text_quality_filter): decoded metadata gates on
    // minimum pixel count (w·h ≥ 128 — the min-resolution filter),
    // minimum width, minimum payload size, and frame count, with a
    // per-source keep/drop attrition census (the report a pipeline reads
    // before committing a crawl to training). Scale shape: decode is the
    // per-partition codec batch, every gate is a narrow boolean over
    // (width, height, bytes, frames) — the media payload never shuffles,
    // the census is source-sized. Determinism: all gates are INTEGER
    // comparisons (pixel cross-product, never a floating ratio).
    "mm_quality_gate" -> ((s, d) => {
      val meta = Multimodal.decodeMeta(Multimodal.mediaTable(s, d)).toDF()
      val docs = graft.Tables.documents(s, d).select(col("doc_id"), col("source"))
      meta.join(docs, "doc_id")
        .withColumn("pixels_ok", col("width") * col("height") >= 128)
        .withColumn("width_ok", col("width") >= 64)
        .withColumn("size_ok", col("n_bytes") >= 256)
        .withColumn("frames_ok", col("n_frames") >= 2)
        .withColumn("keep",
          col("pixels_ok") && col("width_ok") && col("size_ok") && col("frames_ok"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_media"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(!col("pixels_ok"), 1L).otherwise(0L)).as("drop_pixels"),
          sum(when(!col("width_ok"), 1L).otherwise(0L)).as("drop_width"),
          sum(when(!col("size_ok"), 1L).otherwise(0L)).as("drop_size"),
          sum(when(!col("frames_ok"), 1L).otherwise(0L)).as("drop_frames"),
          sum(when(col("keep"), col("n_bytes").cast("long")).otherwise(0L))
            .as("kept_bytes"))
        .orderBy(col("source"))
    }),

    // Perceptual hash per media payload (checks the codec-stage bit math
    // on every row — the media analog of dedup_simhash).
    "mm_phash" -> ((s, d) => {
      Multimodal.perceptualHashes(Multimodal.mediaTable(s, d))
        .orderBy(col("doc_id"))
    }),

    // Voice-activity detection over the audio modality: the payload
    // windows into 16-sample energies (decode stage, per-partition batch),
    // a window is "speech" iff its energy exceeds the per-doc mean
    // (integer-exact e·n_win > Σe, the aHash threshold convention), and
    // contiguous speech runs collapse to segments — the speech-census
    // report (n windows / speech windows / segments / longest run) that
    // decides whether an audio blob is worth transcribing in a training
    // pipeline. Scale shape: only (doc_id, w, energy) rows shuffle, never
    // audio bytes; both windows are doc-partitioned; runs via the
    // gaps-and-islands row_number trick — no self-join.
    "mm_audio_vad" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val win = Multimodal.audioWindows(Multimodal.mediaTable(s, d)).toDF()
      val tot = win.groupBy(col("doc_id"))
        .agg(sum(col("energy")).as("te"), count(lit(1)).as("nw"))
      val flagged = win.join(tot, "doc_id")
        .withColumn("speech",
          (col("energy") * col("nw") > col("te")).cast("long"))
      val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("w"))
      val runs = flagged.filter(col("speech") === 1)
        .withColumn("island", col("w") - row_number().over(byDoc))
        .groupBy(col("doc_id"), col("island")).agg(count(lit(1)).as("len"))
      val ragg = runs.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("nseg"), max(col("len")).as("lmax"))
      flagged.groupBy(col("doc_id"))
        .agg(max(col("nw")).as("n_windows"), sum(col("speech")).as("n_speech"))
        .join(ragg, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_windows"), col("n_speech"),
          coalesce(col("nseg"), lit(0L)).as("n_segments"),
          coalesce(col("lmax"), lit(0L)).as("longest"))
        .orderBy(col("doc_id"))
    }),

    // Media NEAR-dup pairs by perceptual-hash Hamming distance ≤ 3 — what
    // exact blob dedup (mm_blob_dedup) cannot see: re-encoded / slightly
    // altered payloads. Same sub-quadratic shape as text SimHash: 16-bit
    // pigeonhole blocks bucket the candidates (≤3 differing bits over 4
    // blocks ⇒ one block identical), exact bit_count verifies before the
    // distinct. The payload never joins — only the 8-byte hash shuffles.
    // Media dup clusters: connected components over the phash pair graph
    // (same hybrid CC operator as the text family — union-find under 2²⁰
    // edges, distributed label propagation above). Output = every doc in
    // a near-dup family with its canonical keeper.
    "mm_phash_clusters" -> ((s, d) => {
      val pairs = queries("mm_phash_pairs")(s, d).select(col("a_id"), col("b_id"))
      graft.operators.Graph.connectedComponents(pairs)
        .select(col("vertex").as("doc_id"), col("component").as("keeper"))
        .orderBy(col("doc_id"))
    }),

    "mm_phash_pairs" -> ((s, d) => {
      val ph = Multimodal.perceptualHashes(Multimodal.mediaTable(s, d))
      val blocked = ph.select(col("doc_id"), col("phash"),
          explode(expr("sequence(0, 3)")).as("p"))
        .withColumn("blk", expr("(phash >> (16 * p)) & 65535"))
      blocked.as("x").join(blocked.as("y"),
          col("x.p") === col("y.p") && col("x.blk") === col("y.blk") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
          expr("bit_count(x.phash ^ y.phash)").as("hamming"))
        .filter(col("hamming") <= 3)
        .distinct()
        .orderBy(col("a_id"), col("b_id"))
    }))

  private val DotSql =
    "list_reduce(list_transform(list_zip(%s, %s), r -> CAST(r[1] AS DOUBLE) * CAST(r[2] AS DOUBLE)), (acc, x) -> acc + x)"

  /** FakeCodec.aHash in SQL: 64 wrapped 4-byte block sums, bit i (i<63)
    * set iff block i × 64 > total. ord ≡ byte because the corpus is ASCII
    * (asserted: octet_length(text::BLOB) = length(text) corpus-wide). */
  private val PhashSql =
    """SELECT doc_id,
         list_reduce(list_transform(list_zip(bs, range(0, 64)),
           r -> CASE WHEN CAST(r[2] AS INT) < 63
                      AND r[1] * 64 > list_reduce(bs, (a, b) -> a + b)
                 THEN 1::BIGINT << CAST(r[2] AS INT) ELSE 0::BIGINT END),
           (a, b) -> a + b) AS phash
       FROM (
         SELECT doc_id,
           list_transform(range(0, 64), b ->
             ord(substr(text, CAST((b * 4) % n AS INT) + 1, 1))::BIGINT +
             ord(substr(text, CAST((b * 4 + 1) % n AS INT) + 1, 1)) +
             ord(substr(text, CAST((b * 4 + 2) % n AS INT) + 1, 1)) +
             ord(substr(text, CAST((b * 4 + 3) % n AS INT) + 1, 1))) AS bs
         FROM (SELECT doc_id, text, octet_length(text::BLOB) AS n FROM documents) b0) b1"""

  val oracleSql: Map[String, String] = Map(
    "mm_phash" ->
      s"""SELECT doc_id, phash FROM ($PhashSql) t ORDER BY doc_id""",

    // windowed byte energies + integer mean threshold + gaps-and-islands
    "mm_audio_vad" ->
      """WITH b0 AS (
           SELECT doc_id, text, octet_length(text::BLOB) // 16 AS nw
           FROM documents),
         t0 AS (
           SELECT doc_id, nw, list_transform(range(0, nw), w ->
             list_reduce(list_transform(range(0, 16), j ->
               ord(substr(text, CAST(w * 16 + j AS INT) + 1, 1))::BIGINT),
               (a, b) -> a + b)) AS e
           FROM b0 WHERE nw >= 1),
         t1 AS (SELECT doc_id, nw, e, list_reduce(e, (a, b) -> a + b) AS te FROM t0),
         w0 AS (SELECT doc_id, nw, te, e, unnest(range(0, nw)) AS w FROM t1),
         w1 AS (
           SELECT doc_id, nw, CAST(w AS BIGINT) AS w,
             CASE WHEN e[CAST(w AS INT) + 1] * nw > te
               THEN 1::BIGINT ELSE 0::BIGINT END AS speech
           FROM w0),
         sp AS (
           SELECT doc_id, w,
             w - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY w) AS island
           FROM w1 WHERE speech = 1),
         runs AS (SELECT doc_id, island, COUNT(*) AS len FROM sp GROUP BY doc_id, island),
         ragg AS (SELECT doc_id, COUNT(*) AS nseg, MAX(len) AS lmax FROM runs GROUP BY doc_id),
         nsp AS (
           SELECT doc_id, MAX(nw) AS n_windows,
             CAST(SUM(speech) AS BIGINT) AS n_speech
           FROM w1 GROUP BY doc_id)
         SELECT n.doc_id, n.n_windows, n.n_speech,
           CAST(COALESCE(r.nseg, 0) AS BIGINT) AS n_segments,
           CAST(COALESCE(r.lmax, 0) AS BIGINT) AS longest
         FROM nsp n LEFT JOIN ragg r USING (doc_id) ORDER BY doc_id""",

    // FakeCodec metadata arithmetic (mm_decode_meta's formulas) + integer
    // cross-product aspect gates
    "mm_quality_gate" ->
      """WITH m AS (
           SELECT doc_id, source,
             CAST(octet_length(text::BLOB) AS BIGINT) AS n_bytes,
             CAST(octet_length(text::BLOB) % 640 AS BIGINT) AS w,
             CAST((octet_length(text::BLOB) // 640) % 480 + 1 AS BIGINT) AS h,
             CAST(octet_length(text::BLOB) % 16 + 1 AS BIGINT) AS fr
           FROM documents),
         g AS (
           SELECT source, n_bytes,
             (w * h >= 128) AS pixels_ok,
             (w >= 64) AS width_ok,
             (n_bytes >= 256) AS size_ok,
             (fr >= 2) AS frames_ok
           FROM m)
         SELECT source, COUNT(*) AS n_media,
           CAST(SUM(CASE WHEN pixels_ok AND width_ok AND size_ok AND frames_ok
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN NOT pixels_ok THEN 1 ELSE 0 END) AS BIGINT) AS drop_pixels,
           CAST(SUM(CASE WHEN NOT width_ok THEN 1 ELSE 0 END) AS BIGINT) AS drop_width,
           CAST(SUM(CASE WHEN NOT size_ok THEN 1 ELSE 0 END) AS BIGINT) AS drop_size,
           CAST(SUM(CASE WHEN NOT frames_ok THEN 1 ELSE 0 END) AS BIGINT) AS drop_frames,
           CAST(SUM(CASE WHEN pixels_ok AND width_ok AND size_ok AND frames_ok
                    THEN n_bytes ELSE 0 END) AS BIGINT) AS kept_bytes
         FROM g GROUP BY source ORDER BY source""",

    "mm_phash_clusters" ->
      s"""WITH RECURSIVE ph AS ($PhashSql),
         pairs AS (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id
           FROM ph a JOIN ph b ON a.doc_id < b.doc_id
           WHERE bit_count(xor(a.phash, b.phash)::BIGINT) <= 3),
         edges AS (SELECT a_id AS u, b_id AS v FROM pairs
                   UNION SELECT b_id AS u, a_id AS v FROM pairs),
         reach AS (
           SELECT u, v FROM edges
           UNION
           SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)
         SELECT u AS doc_id, LEAST(u, MIN(v)) AS keeper
         FROM reach GROUP BY u ORDER BY doc_id""",

    "mm_phash_pairs" ->
      s"""WITH ph AS ($PhashSql)
         SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           bit_count(xor(a.phash, b.phash)::BIGINT) AS hamming
         FROM ph a JOIN ph b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.phash, b.phash)::BIGINT) <= 3
         ORDER BY a_id, b_id""",

    "mm_blob_dedup" ->
      """SELECT md5(text) AS digest,
           MIN(doc_id) AS canonical_id, COUNT(*) AS refcount,
           CAST(MIN(strlen(text)) AS BIGINT) AS blob_bytes,
           CAST(SUM(strlen(text)) - MIN(strlen(text)) AS BIGINT) AS bytes_saved
         FROM documents GROUP BY 1 ORDER BY digest""",

    "mm_text_embedding_view" ->
      s"""SELECT d.doc_id, d.lang, d.n_chars, e.label,
           CASE WHEN e.vec_id IS NULL THEN NULL
                ELSE round(sqrt(${DotSql.format("e.embedding", "e.embedding")}), 6)
           END AS emb_norm
         FROM documents d LEFT JOIN embeddings e ON d.doc_id = e.vec_id
         ORDER BY d.doc_id""",
    "mm_decode_meta" ->
      """SELECT doc_id, CAST(octet_length(text::BLOB) AS INTEGER) AS n_bytes,
           CAST(ord(substr(text, 1, 1)) AS INTEGER) AS magic,
           CAST(octet_length(text::BLOB) % 640 AS INTEGER) AS width,
           CAST((octet_length(text::BLOB) // 640) % 480 + 1 AS INTEGER) AS height,
           CAST(octet_length(text::BLOB) % 16 + 1 AS INTEGER) AS n_frames
         FROM documents ORDER BY doc_id""",

    "mm_frame_sample" ->
      """SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
           CAST(ord(substr(text, CAST(frame_idx % octet_length(text::BLOB) AS INTEGER) + 1, 1)) AS INTEGER) AS frame_byte
         FROM documents
         CROSS JOIN (SELECT unnest(range(0, 16, 4)) AS frame_idx) f
         WHERE frame_idx < octet_length(text::BLOB) % 16 + 1
         ORDER BY doc_id, frame_idx""",

    "mm_scene_cuts" ->
      """WITH f AS (
           SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
             ord(substr(text, CAST(frame_idx % octet_length(text::BLOB) AS INTEGER) + 1, 1)) AS fb
           FROM documents
           CROSS JOIN (SELECT unnest(range(0, 16, 4)) AS frame_idx) ff
           WHERE frame_idx < octet_length(text::BLOB) % 16 + 1),
         d AS (
           SELECT doc_id, fb,
             lag(fb) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS prev
           FROM f)
         SELECT doc_id, COUNT(*) AS n_frames,
           CAST(SUM(CASE WHEN prev IS NOT NULL AND abs(fb - prev) >= 40
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
           CAST(SUM(CASE WHEN prev IS NOT NULL AND abs(fb - prev) >= 40
                    THEN 1 ELSE 0 END) + 1 AS BIGINT) AS n_scenes
         FROM d GROUP BY doc_id ORDER BY doc_id""",

    "mm_scene_frames" ->
      """WITH f AS (
           SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
             ord(substr(text, CAST(frame_idx % octet_length(text::BLOB) AS INTEGER) + 1, 1)) AS fb
           FROM documents
           CROSS JOIN (SELECT unnest(range(0, 16, 4)) AS frame_idx) ff
           WHERE frame_idx < octet_length(text::BLOB) % 16 + 1),
         d AS (
           SELECT doc_id, frame_idx, fb,
             lag(fb) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS prev
           FROM f),
         sc AS (
           SELECT doc_id, frame_idx, fb,
             SUM(CASE WHEN prev IS NOT NULL AND abs(fb - prev) >= 40
                 THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY frame_idx
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS scene_id
           FROM d)
         SELECT doc_id, CAST(scene_id AS BIGINT) AS scene_id,
           MIN(frame_idx) AS frame_idx,
           CAST(min_by(fb, frame_idx) AS INTEGER) AS frame_byte,
           COUNT(*) AS n_frames_in_scene
         FROM sc GROUP BY doc_id, scene_id ORDER BY doc_id, scene_id""",

    "mm_features" ->
      """SELECT doc_id,
           CAST(least(64, octet_length(text::BLOB)) AS INTEGER) AS n_probe,
           list_reduce(list_prepend(0::BIGINT,
             list_transform(range(1, CAST(least(64, octet_length(text::BLOB)) AS INT) + 1),
               i -> ord(substr(text, CAST(i AS INT), 1))::BIGINT)),
             (acc, x) -> acc + x) AS byte_sum,
           CAST((octet_length(text::BLOB) % 640) // 2 + 1 AS INTEGER) AS resized_w,
           CAST(((octet_length(text::BLOB) // 640) % 480 + 1) // 2 + 1 AS INTEGER) AS resized_h
         FROM documents ORDER BY doc_id""",

    "mm_meta_stats" ->
      """SELECT lang, COUNT(*) AS n, CAST(SUM(octet_length(text::BLOB)) AS BIGINT) AS total_bytes,
           CAST(SUM(octet_length(text::BLOB) % 16 + 1) AS BIGINT) AS total_frames,
           CAST(MAX(octet_length(text::BLOB) % 640) AS INTEGER) AS max_width
         FROM documents GROUP BY lang ORDER BY lang""")
}
