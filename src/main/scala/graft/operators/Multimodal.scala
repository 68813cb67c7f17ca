package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star surface): media rides as an
  * opaque `binary` column with typed metadata; decode / feature-extract /
  * frame-sample run as per-partition batch functions over the binary
  * payloads — the Scala analog of `mapInPandas` (iterator-of-batches in,
  * iterator-of-batches out, no per-row driver involvement).
  *
  * The actual codec is STUBBED with a deterministic fake (this container
  * ships no image/audio libraries): `FakeCodec.decode` derives metadata
  * purely from the byte payload, so tests and oracles are exact. The
  * Spark-side shape — schema, partitioning, batch iteration, exploded
  * frame output — is real and is what would carry a true JNI/FFmpeg codec
  * at scale.
  */
object Multimodal {

  /** Decoded media metadata (what a real image/video probe would return). */
  final case class MediaMeta(
      doc_id: Long, n_bytes: Int, magic: Int,
      width: Int, height: Int, n_frames: Int)

  /** One sampled frame reference. */
  final case class FrameRef(doc_id: Long, frame_idx: Int, frame_byte: Int)

  /** Extracted features + resize target for one media payload. */
  final case class MediaFeatures(
      doc_id: Long, n_probe: Int, byte_sum: Long, resized_w: Int, resized_h: Int)

  /** Deterministic stand-in for the real decoder (??? in production terms:
    * swap for libjpeg/ffmpeg behind the same signature). Reads only the
    * payload bytes, so the SQL oracle can reproduce it exactly. */
  object FakeCodec {
    def decode(docId: Long, payload: Array[Byte]): MediaMeta = {
      val n = payload.length
      val magic = if (n > 0) payload(0) & 0xff else 0
      MediaMeta(docId, n, magic, n % 640, (n / 640) % 480 + 1, n % 16 + 1)
    }

    /** Every 4th frame, with a deterministic per-frame byte probe. */
    def sampleFrames(m: MediaMeta, payload: Array[Byte]): Iterator[FrameRef] =
      Iterator.range(0, m.n_frames, 4).map { idx =>
        val b = if (payload.length > 0) payload(idx % payload.length) & 0xff else 0
        FrameRef(m.doc_id, idx, b)
      }

    /** Perceptual hash (average-hash family): 64 wrapped 4-byte block sums
      * over the payload, bit i set iff block i exceeds the global mean
      * (63 bits — the sign bit stays clear so the hash compares cleanly as
      * a signed Long on both engines). A real codec computes the same
      * shape over decoded pixel blocks; near-dup media then reduces to
      * Hamming distance exactly like text SimHash. */
    def aHash(payload: Array[Byte]): Long = {
      val n = payload.length
      val bs = Array.tabulate(64) { b =>
        var s = 0L
        var j = 0
        while (j < 4) {
          s += (if (n > 0) payload((b * 4 + j) % n) & 0xff else 0)
          j += 1
        }
        s
      }
      val total = bs.sum
      var h = 0L
      var i = 0
      while (i < 63) { if (bs(i) * 64 > total) h |= 1L << i; i += 1 }
      h
    }

    /** Feature extraction + resize over the payload: byte-sum over the
      * first 64 bytes (the "embedding" of the fake codec) and halved
      * target dimensions. Real codecs slot in behind the same signature. */
    def extractFeatures(m: MediaMeta, payload: Array[Byte]): MediaFeatures = {
      val n = math.min(64, payload.length)
      var s = 0L
      var i = 0
      while (i < n) { s += payload(i) & 0xff; i += 1 }
      MediaFeatures(m.doc_id, n, s, m.width / 2 + 1, m.height / 2 + 1)
    }
  }

  /** documents → (doc_id, payload binary): the text bytes stand in for an
    * encoded media blob. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** Batch decode: one codec invocation pipeline per partition (the real
    * pattern: codec init amortized across the partition, vectorized I/O). */
  def decodeMeta(media: DataFrame): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it => it.map { case (id, p) => FakeCodec.decode(id, p) } }
  }

  /** Frame sampling: decode then explode sampled frames — output cardinality
    * is data-dependent per row, the flatMap shape of video pipelines. */
  def sampleFrames(media: DataFrame): Dataset[FrameRef] = {
    import media.sparkSession.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, p) => FakeCodec.sampleFrames(FakeCodec.decode(id, p), p) }
      }
  }

  /** Perceptual hashes: codec-stage feature pass, one batch per partition
    * (a real pipeline fuses this with decode — the pixels are already in
    * hand). Output is (doc_id, phash) — narrow, the only thing that ever
    * shuffles for media near-dup. */
  def perceptualHashes(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it => it.map { case (id, p) => (id, FakeCodec.aHash(p)) } }
      .toDF("doc_id", "phash")
  }

  /** Feature-extract + resize: decode → features, one batch per partition. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, p) => FakeCodec.extractFeatures(FakeCodec.decode(id, p), p) }
      }
  }

  /** One audio analysis window (16 "PCM samples" = payload bytes) with its
    * integer energy — the decode-stage output a real audio pipeline's VAD
    * consumes. */
  final case class AudioWindow(doc_id: Long, w: Int, energy: Long)

  /** Audio windowing: treat the payload as an 8-bit PCM stream (the
    * FakeCodec convention — a real decoder slots in behind the same
    * signature), cut it into 16-sample windows and emit per-window
    * integer energies. flatMap shape like [[sampleFrames]]; docs shorter
    * than one window emit nothing. Only (doc_id, w, energy) rows ever
    * shuffle — never the audio bytes. */
  def audioWindows(media: DataFrame): Dataset[AudioWindow] = {
    import media.sparkSession.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, p) =>
          Iterator.range(0, p.length / 16).map { w =>
            var s = 0L
            var j = 0
            while (j < 16) { s += p(w * 16 + j) & 0xff; j += 1 }
            AudioWindow(id, w, s)
          }
        }
      }
  }
}
