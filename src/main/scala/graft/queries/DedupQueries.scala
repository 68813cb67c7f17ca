package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Deduplication operators over `documents` / `embeddings` (north-star
  * surface): exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine
  * near-dup. Every variant is pure DataFrame ops with a DuckDB oracle —
  * hash functions are md5-based so both engines compute identical values.
  *
  * Scale design notes (100 TB):
  *  - exact dedup: one hash-keyed shuffle on a 16-byte digest, not the text;
  *  - n-gram Jaccard: inverted-index join on shingles (shuffle bounded by
  *    posting-list sizes), never an all-pairs cross product;
  *  - MinHash LSH: signatures are one agg; candidate pairs join on band
  *    buckets — the classic sub-quadratic near-dup pipeline;
  *  - SimHash: Hamming-≤3 pairs found by pigeonhole nibble-block join (a
  *    16-bit key split into 4 nibbles: ≤3 differing bits ⇒ ≥1 identical
  *    nibble), so candidates are bucket-joined, then verified exactly;
  *  - embedding near-dup: block off the label column (coarse quantizer
  *    stand-in), pairwise cosine only within blocks.
  */
object DedupQueries {

  /** Session-scoped cache of persisted derived tables (shingle index,
    * MinHash signatures, LSH candidate pairs) keyed by data dir: the five
    * minhash-family queries share one computation of each instead of
    * re-deriving the pipeline per query — the engine-level analog of a
    * materialized intermediate in a multi-query dedup job. Entries live for
    * the session (they are per-doc-derived, orders of magnitude smaller
    * than the corpus); `clearCache()` drops them. */
  private val derived =
    new scala.collection.concurrent.TrieMap[(SparkSession, String, String), DataFrame]()

  private def cached(s: SparkSession, name: String, d: String)(
      build: => DataFrame): DataFrame =
    derived.getOrElseUpdate((s, name, d), build.persist())

  /** Drop every cached derived table (test hook / memory release). */
  def clearCache(): Unit = {
    derived.values.foreach(_.unpersist())
    derived.clear()
  }

  private def withWords(df: DataFrame): DataFrame =
    df.withColumn("ws", split(col("text"), " "))

  /** (doc_id, sh) rows, one per 8-token span position, session-cached —
    * shared by the span-overlap and decontamination queries (one lead-
    * window pass over the corpus instead of one per query). */
  private def spanRows8(s: SparkSession, d: String): DataFrame =
    cached(s, "spanRows8", d) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("pos")
      Tables.documents(s, d)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w0")))
        .select(Seq(col("doc_id"), col("w0")) ++
          (1 until 8).map(i => lead("w0", i).over(w).as(s"w$i")): _*)
        .filter(col("w7").isNotNull)
        .select(col("doc_id"),
          concat_ws(" ", (0 until 8).map(i => col(s"w$i")): _*).as("sh"))
    }

  /** (doc_id, shingle) rows via explode + window lead: the split runs once
    * per document (a `transform` lambda referencing the split array gets
    * inlined by CollapseProject and re-splits the text per element — 7×
    * slower, measured). One narrow explode + one doc-keyed window sort.
    * Takes any (doc_id, text) frame — the ingest sink runs it per batch. */
  private[graft] def shinglesOf(docs: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("pos")
    docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w0")))
      .withColumn("w1", lead("w0", 1).over(w))
      .withColumn("w2", lead("w0", 2).over(w))
      .filter(col("w2").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("w0"), col("w1"), col("w2")).as("sh"))
  }

  private[queries] def shingleRows(s: SparkSession, d: String): DataFrame =
    shinglesOf(Tables.documents(s, d))

  /** Distinct (doc_id, shingle) pairs — the inverted-index base (persisted
    * once per data dir; feeds Jaccard and the MinHash family). */
  private def shingleIndex(s: SparkSession, d: String): DataFrame =
    cached(s, "shingleIndex", d) { shingleRows(s, d).distinct() }

  /** Document frequency per shingle ≤ maxDf: the stop-shingle cap. A
    * shingle shared by thousands of documents carries no dedup signal but
    * costs df² join rows — one runaway posting list ("the end of" at df=10⁶)
    * turns the inverted-index self-join into a 10¹² cross product. Dropping
    * df > maxDf bounds every posting list's contribution at maxDf², keeping
    * the join sub-quadratic on any corpus. Jaccard is then computed over the
    * capped shingle universe (both intersections AND set sizes — a coherent
    * similarity over informative shingles; the oracle applies the same cap). */
  private[queries] def cappedShingleIndex(s: SparkSession, d: String,
      maxDf: Int): DataFrame = {
    val idx = shingleIndex(s, d)
    // Anti-join against the DROPPED set, not an equi-join against the kept
    // set: the stop-shingle list is bounded by Σdf/maxDf (tiny — one entry
    // per runaway shingle), so it broadcasts at any corpus size, where the
    // kept set is vocabulary-sized and would force a shuffle join.
    val dropped = idx.groupBy(col("sh"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
      .select(col("sh"))
    idx.join(broadcast(dropped), Seq("sh"), "left_anti")
  }

  /** Posting-list cap for n-gram Jaccard (see [[cappedShingleIndex]]). */
  private[queries] val JaccardMaxDf = 1000

  /** 12 min-wise hashes per doc: minhash_i = min over shingles of
    * md5(i || ':' || shingle) (lexicographic min of hex — a valid min-wise
    * family, identical across engines).
    *
    * Computed as 12 per-position MIN aggregates over one shingle pass — no
    * 12× row explosion, one shuffle, partial aggregation does the min
    * map-side (the shape that survives a 100× scale-up). */
  private def minhashSignatures(s: SparkSession, d: String): DataFrame =
    cached(s, "minhashSignatures", d) { minhashSignatures0(s, d) }

  private def minhashSignatures0(s: SparkSession, d: String): DataFrame =
    sigsFromShingles(shingleIndex(s, d))

  /** Signatures from distinct (doc_id, sh) rows. 12 per-position MIN
    * aggregates: `hs[i]` with a literal index is rewritten by
    * SimplifyExtractValueOps into the single lambda body at i (one md5
    * each, no array materialization, map-side partial mins) — measured
    * ~25× faster than posexplode + two-level agg. */
  private def sigsFromShingles(shingles: DataFrame): DataFrame =
    shingles
      .withColumn("hs", expr(
        "transform(sequence(0, 11), i -> md5(concat(cast(i as string), ':', sh)))"))
      .groupBy(col("doc_id"))
      .agg(min(expr("hs[0]")).as("m0"),
        (1 until 12).map(i => min(expr(s"hs[$i]")).as(s"m$i")): _*)
      .select(col("doc_id"), array((0 until 12).map(i => col(s"m$i")): _*).as("sig"))

  /** MinHash signatures of an arbitrary (doc_id, text) frame — the
    * per-batch form `Streams.onlineNearDupSink` uses; identical hashing to
    * the corpus path, so streaming band keys match batch band keys. */
  private[graft] def minhashSigsOf(docs: DataFrame): DataFrame =
    sigsFromShingles(shinglesOf(docs).distinct())

  /** LSH band keys (4 bands × 3 rows) of a signature frame — same bucket
    * encoding as [[minhashCandidatePairs]]. */
  private[graft] def bandKeysOf(sigs: DataFrame): DataFrame =
    bandKeysWithSig(sigs).select(col("doc_id"), col("bucket"))

  /** Band keys carrying the full signature — the ingest sink's verified
    * mode stores these so candidate similarity re-ranks against the
    * partner's signature. */
  private[graft] def bandKeysWithSig(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"), explode(expr("sequence(0, 3)")).as("b"), col("sig"))
      .withColumn("bucket", concat_ws("|", col("b").cast(StringType),
        expr("sig[3*b]"), expr("sig[3*b+1]"), expr("sig[3*b+2]")))
      .select(col("doc_id"), col("bucket"), col("sig"))

  /** 64-bit SimHash per doc from token md5 bits: bit j uses bit (2·(j%2)+1)
    * of hex digit (j/2) — two independent bits per nibble, 64 total. (8/16
    * bits are too coarse on a shared-vocabulary corpus: ~28% of random
    * pairs land within Hamming 3 at 16 bits.)
    *
    * Shape: compress tokens to per-doc (token, count) first — weighted ±cnt
    * sums over distinct tokens equal the per-instance sums, at ~10× fewer
    * rows on a small vocabulary — then one narrow explode of 8 digit-group
    * indexes (4 hex digits = 8 bits per row, 8 conditional sums) and two
    * partial-agg levels. Exploding all 64 bit indexes individually measured
    * ~7 s at sf0.1 — 8× the shuffled rows for the same information; a
    * 64-column aggregate at the other extreme generates a class janino
    * takes ~20 s to compile (paid every bench run). 8×8 is the sweet spot:
    * small codegen, 8× fewer rows. */
  private[graft] def simhashes(s: SparkSession, d: String): DataFrame =
    cached(s, "simhashes", d) { simhashes0(s, d) }

  private def simhashes0(s: SparkSession, d: String): DataFrame = {
    // per row: digit group k covers hex digits g = 4k+m (m 0..3), providing
    // bits j = 2g+b = 8k+2m+b for b∈{0,1} (b picks nibble bit 1 or 3, as in
    // the j-indexed formula (nib(j/2) >> (2*(j%2)+1)) % 2)
    val digits = (0 until 4).map(m =>
      expr(s"cast(conv(substring(h, 4*k+${m + 1}, 1), 16, 10) as int)").as(s"d$m"))
    val sums = (0 until 8).map { i =>
      val (m, b) = (i / 2, i % 2)
      sum(when(expr(s"(d$m >> ${2 * b + 1}) % 2") === 1, col("cnt"))
        .otherwise(-col("cnt"))).as(s"s$i")
    }
    val contrib = (0 until 8).map { i =>
      // bit j = 8k+i; j=63 (k=7,i=7) is the sign bit — shiftleft(1L,63)
      // equals Long.MinValue anyway, but keep the literal for clarity/parity
      // with the DuckDB oracle's HUGEINT-guarded CASE.
      when(col(s"s$i") > 0,
        expr(s"CASE WHEN k = 7 AND $i = 7 THEN -9223372036854775808L ELSE shiftleft(1L, 8*k+$i) END"))
        .otherwise(0L)
    }.reduce(_ + _)
    withWords(Tables.documents(s, d))
      .select(col("doc_id"), explode(col("ws")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("cnt"))
      .withColumn("h", md5(col("w").cast(BinaryType)))
      .select(Seq(col("doc_id"), col("cnt"), explode(expr("sequence(0, 7)")).as("k")) ++
        Seq(col("h")): _*)
      .select(Seq(col("doc_id"), col("cnt"), col("k")) ++ digits: _*)
      .groupBy(col("doc_id"), col("k")).agg(sums.head, sums.tail: _*)
      .groupBy(col("doc_id"))
      .agg(sum(contrib).as("simhash"))
  }

  /** Left-fold double dot product — the fused native expression
    * (graft.functions.FloatVectorDot), bit-identical to
    * `aggregate(zip_with(a,b,(x,y)->double(x)*double(y)), 0d, +)` and to
    * the DuckDB oracle's list_reduce, but codegen'd without the
    * intermediate product array. */
  private[queries] def dotD(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vector_dot(a, b)

  /** Distinct candidate pairs (a_id < b_id) sharing any MinHash LSH band
    * bucket (4 bands × 3 rows). The banded table is persisted: it is tiny
    * (4 rows/doc) and feeds both self-join branches — recomputing the
    * signature pipeline per branch measured ~5× slower than the join. */
  private[graft] def minhashCandidatePairs(s: SparkSession, d: String): DataFrame =
    cached(s, "minhashCandidatePairs", d) { minhashCandidatePairs0(s, d) }

  private def minhashCandidatePairs0(s: SparkSession, d: String): DataFrame = {
    val banded = cached(s, "bandedKeys", d) { bandKeysOf(minhashSignatures(s, d)) }
    banded.as("x").join(banded.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
  }

  private[queries] def cosine(a: Column, b: Column): Column =
    dotD(a, b) / (sqrt(dotD(a, a)) * sqrt(dotD(b, b)))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup: shuffle on the digest, keep the smallest doc_id.
    "dedup_exact" -> ((s, d) => {
      Tables.documents(s, d)
        .groupBy(md5(col("text").cast(BinaryType)).as("content_hash"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
        .orderBy(col("content_hash"))
    }),

    // Blocklist contamination filter with a Bloom-sketch prefilter: find
    // every corpus document whose content hash appears in a blocklist (here
    // the doc_id % 37 == 0 docs — standing in for a banned/held-out digest
    // set). Scale shape: the Bloom filter over blocklist digests is a
    // mergeable sketch built tree-wise (~1.2 MB per 10⁶ entries at 1% fpp)
    // and shipped to every task; corpus rows that miss it are definitively
    // clean (no false negatives) and NEVER enter the join shuffle — at
    // 100 TB the exchange carries ~(true hits + 1%) of the corpus instead
    // of all of it. The exact semi join then removes the sketch's false
    // positives, so the result is EXACT — the oracle is the plain semi
    // join. (The UDF is a narrow prefilter outside any agg/join hot loop;
    // Spark's own runtime row-level filtering injects the same shape.)
    "dedup_bloom_blocklist" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), md5(col("text").cast(BinaryType)).as("content_hash"))
      val block = docs.filter(col("doc_id") % 37 === 0).select(col("content_hash"))
      val bf = block.stat.bloomFilter("content_hash", math.max(block.count(), 1L), 0.01)
      val bfB = s.sparkContext.broadcast(bf)
      val mightContain = udf((h: String) => bfB.value.mightContainString(h))
      docs.filter(mightContain(col("content_hash")))
        .join(block, Seq("content_hash"), "left_semi")
        .select(col("doc_id"), col("content_hash"))
        .orderBy(col("doc_id"))
    }),

    // Cross-document duplicate-span profile (exact-substring dedup signal,
    // after Lee et al. "Deduplicating Training Data Makes Language Models
    // Better"): per document, how many of its 8-word spans also occur in
    // ANOTHER document, and the resulting duplicate ratio / near-dup flag.
    // Scale shape: strictly LINEAR — span rows are one narrow explode + one
    // doc-keyed window (8 leads in a single pass); the duplicated-span set
    // is a hash agg over distinct (span, doc); marking a doc's positions is
    // a LEFT SEMI join on the span key (one row per distinct span on the
    // build side, so a hot span multiplies nothing — unlike the Jaccard
    // self-join there is no df² term, and AQE splits any skewed span key).
    "dedup_span_overlap" -> ((s, d) => {
      val spans = spanRows8(s, d)
      val dup = spans.distinct()
        .groupBy(col("sh")).agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2).select(col("sh"))
      val total = spans.groupBy(col("doc_id")).agg(count(lit(1)).as("n_spans"))
      val dupCnt = spans.join(dup, Seq("sh"), "left_semi")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup_spans"))
      Tables.documents(s, d).select(col("doc_id"))
        .join(total, Seq("doc_id"), "left")
        .join(dupCnt, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_spans"), lit(0L)).as("n_spans"),
          coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"))
        .withColumn("dup_ratio", when(col("n_spans") === 0, lit(0.0))
          .otherwise(round(col("n_dup_spans").cast("double") / col("n_spans"), 6)))
        .withColumn("near_dup", col("dup_ratio") >= 0.5)
        .orderBy(col("doc_id"))
    }),

    // Edit-distance verification of LSH candidates (the string-metric
    // re-rank the token/shingle metrics can't express — catches
    // transpositions and small in-word edits): each MinHash candidate
    // pair scores levenshtein over the first 128 chars. The prefix cap is
    // the standard cost guard — edit distance is O(n·m) per pair, so at
    // scale the comparison window is bounded and only LSH-bucketed pairs
    // (pair-graph-sized, ≪ corpus²) ever reach it. The dup flag compares
    // integers (dist·10 ≤ len); the normalized similarity is display.
    "dedup_edit_verify" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), substring(col("text"), 1, 128).as("t"))
      minhashCandidatePairs(s, d)
        .join(docs.select(col("doc_id").as("a_id"), col("t").as("ta")), "a_id")
        .join(docs.select(col("doc_id").as("b_id"), col("t").as("tb")), "b_id")
        .select(col("a_id"), col("b_id"),
          levenshtein(col("ta"), col("tb")).cast("long").as("edit_dist"),
          greatest(length(col("ta")), length(col("tb"))).cast("long").as("max_len"))
        .withColumn("sim",
          round(lit(1.0) - col("edit_dist").cast("double") / col("max_len"), 6))
        .withColumn("is_dup", col("edit_dist") * 10 <= col("max_len"))
        .orderBy(col("a_id"), col("b_id"))
    }),

    // Train/test decontamination (the GPT-3/PaLM-style n-gram overlap
    // check): docs with doc_id % 41 == 0 stand in for the HELD-OUT
    // benchmark set; every other document counts its 8-token span
    // positions whose span also occurs anywhere in the benchmark set, and
    // is flagged contaminated at ≥ 8 overlapping positions (an integer
    // threshold — no float compare). Scale shape: the benchmark span set
    // is distinct-collapsed (benchmarks ≪ corpus, so it usually
    // broadcasts); the corpus side anti-multiplies through a LEFT SEMI
    // join — one row per distinct benchmark span on the build side, so a
    // hot span multiplies nothing; per-doc counts are one two-phase agg.
    "dedup_decontaminate" -> ((s, d) => {
      val spans = spanRows8(s, d)
      val benchSpans = spans.filter(col("doc_id") % 41 === 0)
        .select(col("sh")).distinct()
      val corpus = spans.filter(col("doc_id") % 41 =!= 0)
      val total = corpus.groupBy(col("doc_id")).agg(count(lit(1)).as("n_spans"))
      val hit = corpus.join(benchSpans, Seq("sh"), "left_semi")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_contaminated"))
      Tables.documents(s, d).select(col("doc_id"))
        .filter(col("doc_id") % 41 =!= 0)
        .join(total, Seq("doc_id"), "left")
        .join(hit, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_spans"), lit(0L)).as("n_spans"),
          coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
        .withColumn("is_contaminated", col("n_contaminated") >= 8)
        .orderBy(col("doc_id"))
    }),

    // Exact substring removal (the Lee-et-al "Deduplicating Training Data
    // Makes Language Models Better" scrub, shingle-approximated at k=16):
    // every 16-token window that occurred EARLIER anywhere in the corpus —
    // first occurrence by (doc_id, pos) wins — marks its token span for
    // removal; per doc, overlapping spans union implicitly (removal is by
    // DISTINCT token index, which IS interval merging), and the document
    // is rebuilt from its surviving tokens in order, pinned by md5 so a
    // wrong drop or a reordered rebuild hash-fails. Scale shape: windows
    // travel as 16-byte digests, never text (a Rabin-Karp rolling hash —
    // the text_rolling_hash machinery — would drop the 16× hashing cost
    // at 100 TB); "first occurrence" is a MIN-struct hash agg, not a
    // window — partial (map-side) aggregation collapses each digest
    // before the exchange, no per-partition sort, and the surviving
    // duplicated-digest side is pair-graph-sized (≪ corpus), so AQE can
    // broadcast it and the gram side never shuffles; the span→index
    // explode is bounded by 16× the DUPLICATED windows only, not the
    // corpus; the rebuild is one doc-keyed agg.
    "dedup_substring_remove" -> ((s, d) => {
      val k = 16
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("pos")
      val grams = Tables.documents(s, d)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w0")))
        .select(Seq(col("doc_id"), col("pos"), col("w0")) ++
          (1 until k).map(i => lead("w0", i).over(w).as(s"w$i")): _*)
        .filter(col(s"w${k - 1}").isNotNull)
        .select(col("doc_id"), col("pos"),
          md5(concat_ws(" ", (0 until k).map(i => col(s"w$i")): _*)
            .cast(BinaryType)).as("h"))
      val first = grams.groupBy(col("h"))
        .agg(min(struct(col("doc_id"), col("pos"))).as("f"),
          count(lit(1)).as("cnt"))
        .filter(col("cnt") >= 2)
        .select(col("h"), col("f.doc_id").as("fdoc"), col("f.pos").as("fpos"))
      val removed = grams.join(first, "h")
        .filter(!(col("doc_id") === col("fdoc") && col("pos") === col("fpos")))
        .select(col("doc_id"), explode(expr(s"sequence(pos, pos + ${k - 1})")).as("i"))
        .distinct()
      Tables.documents(s, d)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("i", "tok")))
        .join(removed.withColumn("rm", lit(true)), Seq("doc_id", "i"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("rm"), 1L).otherwise(0L)).as("n_removed"),
          md5(expr("cast(array_join(transform(filter(" +
              "sort_array(collect_list(struct(i, rm, tok))), " +
              "x -> x.rm IS NULL), x -> x.tok), ' ') as binary)"))
            .as("cleaned_md5"))
        .orderBy(col("doc_id"))
    }),

    // n-gram Jaccard near-dup via inverted-index join (no cross product),
    // with posting lists capped at df ≤ JaccardMaxDf (stop-shingle drop —
    // the guard that keeps the self-join sub-quadratic at corpus scale).
    // The index feeds three plan branches (both join sides + sizes) — the
    // session cache persists it once; per-doc-derived, far smaller than the
    // corpus.
    "dedup_ngram_jaccard" -> ((s, d) => {
      val idx = cappedShingleIndex(s, d, JaccardMaxDf)
      val sizes = idx.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val a = idx.as("a"); val b = idx.as("b")
      val common = a.join(b, col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .agg(count(lit(1)).as("inter"))
      common
        .join(sizes.withColumnRenamed("doc_id", "a_id").withColumnRenamed("sz", "sz_a"), "a_id")
        .join(sizes.withColumnRenamed("doc_id", "b_id").withColumnRenamed("sz", "sz_b"), "b_id")
        .withColumn("jaccard", col("inter") / (col("sz_a") + col("sz_b") - col("inter")))
        .filter(col("jaccard") >= 0.25)
        .select(col("a_id"), col("b_id"), col("jaccard"))
        .orderBy(col("a_id"), col("b_id"))
    }),

    // Asymmetric shingle CONTAINMENT C(A→B) = |S(A)∩S(B)| / |S(A)| — the
    // subsumption detector symmetric Jaccard misses: a short document
    // wholly quoted inside a longer one scores containment ≈ 1 while its
    // Jaccard stays low (size mismatch inflates the union). Training
    // pipelines use it to drop docs subsumed by a superset copy. Directed
    // pairs (both orientations emitted); same inverted-index join and
    // stop-shingle df cap as dedup_ngram_jaccard — the denominator is the
    // CONTAINED side's size only, everything else shares the capped index.
    "dedup_containment" -> ((s, d) => {
      val idx = cappedShingleIndex(s, d, JaccardMaxDf)
      val sizes = idx.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val a = idx.as("a"); val b = idx.as("b")
      val common = a.join(b,
          col("a.sh") === col("b.sh") && col("a.doc_id") =!= col("b.doc_id"))
        .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .agg(count(lit(1)).as("inter"))
      common
        .join(sizes.withColumnRenamed("doc_id", "a_id")
          .withColumnRenamed("sz", "sz_a"), "a_id")
        .withColumn("containment", col("inter") / col("sz_a"))
        .filter(col("containment") >= 0.8)
        .select(col("a_id"), col("b_id"), col("inter"), col("sz_a"),
          col("containment"))
        .orderBy(col("a_id"), col("b_id"))
    }),

    // MinHash signatures (checks the min-wise hashing itself, every doc).
    // LSH band/row TUNING SWEEP: the same 12-position signature table
    // re-banded as (12×1), (6×2), (4×3), (3×4) — for each config the
    // candidate-pair count and how many candidates the signature itself
    // estimates as real dups (≥6 of 12 positions agree ≈ Jaccard ≥ 0.5).
    // This is the calibration report run BEFORE committing to a banding:
    // more rows per band moves the S-curve knee right (fewer, more
    // precise candidates); the sweep makes the recall/cost trade a
    // number. Bucket strings are engine-internal (only the GROUPING must
    // match); the output counts are exact integers. Scale shape: each
    // config is the standard band-bucket join over the shared cached
    // signature table — work is Σ bucket² per config, never corpus².
    "dedup_lsh_tuning" -> ((s, d) => {
      val sigs = minhashSigsOf(Tables.documents(s, d)).persist()
      val reports = Seq((12, 1), (6, 2), (4, 3), (3, 4)).map { case (nb, r) =>
        val banded = sigs
          .select(col("doc_id"), explode(expr(s"sequence(0, ${nb - 1})")).as("b"), col("sig"))
          .withColumn("bucket", concat_ws("|", (col("b").cast(StringType) +:
            (0 until r).map(j => expr(s"sig[$r*b+$j]"))): _*))
          .select(col("doc_id"), col("bucket"))
        val cands = banded.as("x").join(banded.as("y"),
            col("x.bucket") === col("y.bucket") && col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id")).distinct()
        cands
          .join(sigs.select(col("doc_id").as("a_id"), col("sig").as("sa")), "a_id")
          .join(sigs.select(col("doc_id").as("b_id"), col("sig").as("sb")), "b_id")
          .withColumn("mf", expr(
            "aggregate(zip_with(sa, sb, (x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END), 0, (a, v) -> a + v)")
            .cast("double") / lit(12.0))
          .agg(count(lit(1)).as("n_candidates"),
            sum(when(col("mf") >= 0.5, 1L).otherwise(0L)).as("n_est_dup"))
          .select(lit(nb).as("bands"), lit(r).as("rows_per_band"),
            col("n_candidates"), col("n_est_dup"))
      }
      reports.reduce(_ unionAll _)
        .withColumn("precision_est",
          when(col("n_candidates") > 0,
            round(col("n_est_dup").cast("double") / col("n_candidates").cast("double"), 6)))
        .orderBy(col("rows_per_band"))
    }),

    "dedup_minhash_sig" -> ((s, d) => {
      minhashSignatures(s, d)
        .select(col("doc_id"), concat_ws("|", col("sig")).as("signature"))
        .orderBy(col("doc_id"))
    }),

    // MinHash LSH candidate pairs: 4 bands × 3 rows; pairs sharing any
    // band bucket.
    "dedup_minhash_pairs" -> ((s, d) =>
      minhashCandidatePairs(s, d).orderBy(col("a_id"), col("b_id"))),

    // Near-dup clusters: connected components over the LSH candidate-pair
    // graph, each doc labeled with its cluster's canonical keeper (min
    // doc_id) — the step a training pipeline runs after pair finding to
    // keep exactly one representative per duplicate group (transitive:
    // a~b, b~c ⇒ one cluster even if a,c never share a bucket).
    //
    // Implemented as iterative min-label propagation: each round every
    // vertex takes the min label among itself and its neighbors; converges
    // in diameter(component) rounds — dup clusters are tiny, so 2-4 rounds.
    // Each round is one join + one agg (pk-partitioned); at 100 TB the same
    // loop holds (components stay small; the classic large-star/small-star
    // variant bounds rounds at O(log n) if ever needed).
    "dedup_clusters" -> ((s, d) =>
      graft.operators.Graph.connectedComponents(minhashCandidatePairs(s, d))
        .select(col("vertex").as("doc_id"), col("component").as("keeper"))
        .orderBy(col("doc_id"))),

    // PageRank over the near-dup candidate graph — centrality of each doc
    // in its duplication neighborhood (the "template" document of a boiler-
    // plate family ranks highest; useful for choosing cluster keepers by
    // connectivity rather than min-id). Ten power iterations in FIXED-POINT
    // integer arithmetic (ranks are 1e12-scaled BIGINTs, floor division):
    // every operation is exact on both engines, so an iterative numeric
    // algorithm gets a hash-exact oracle — no float summation-order terms
    // at all. Scale shape: per iteration one join on src + one dst-keyed
    // agg (the standard distributed PageRank step); lineage is truncated
    // per iteration (localCheckpoint locally, checkpoint dir on a cluster).
    // Execution rides Graph.pageRankFP's hybrid: the candidate-pair graph
    // is model-sized (near-dups only), so under 2²⁰ edges the 10 rounds
    // fold on the driver in the SAME fixed-point integer arithmetic (one
    // edge-table action instead of 10 join+agg rounds of pure scheduling
    // overhead — r9-opt: 3.2 s → the edge-build cost alone); above the
    // threshold the distributed join+agg loop runs, lineage truncated
    // every 3rd round.
    "dedup_pagerank" -> ((s, d) => {
      val pairs = minhashCandidatePairs(s, d)
      val edges = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
        .unionByName(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
      graft.operators.Graph.pageRankFP(edges, "src", "dst", None, 10)
        .select(col("v").as("doc_id"), col("r").as("rank_fp"))
        .orderBy(col("doc_id"))
    }),

    // End-to-end dedup DECISION: the keep/drop list a dedup pipeline
    // actually emits. Precedence: an exact duplicate (same content hash,
    // not the smallest doc_id) drops first; then a near-dup cluster member
    // that is not its cluster's canonical doc; everything else is kept.
    // Every dropped doc names its keeper — the audit trail for training-
    // data provenance. Scale: one digest-keyed agg + one doc-keyed left
    // join over the (pair-graph-sized) cluster table; the heavy lifting is
    // the shared session-cached LSH pipeline.
    "dedup_keep_list" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), md5(col("text").cast(BinaryType)).as("h"))
      val exactKeeper = docs.groupBy(col("h")).agg(min(col("doc_id")).as("ek"))
      val clusters = graft.operators.Graph
        .connectedComponents(minhashCandidatePairs(s, d))
        .select(col("vertex").as("doc_id"), col("component").as("ck"))
      docs.join(exactKeeper, "h")
        .join(clusters, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("doc_id") =!= col("ek"), lit("exact_dup"))
            .when(col("ck").isNotNull && col("ck") =!= col("doc_id"), lit("near_dup"))
            .otherwise(lit("kept")).as("reason"),
          when(col("doc_id") =!= col("ek"), col("ek"))
            .when(col("ck").isNotNull && col("ck") =!= col("doc_id"), col("ck"))
            .otherwise(col("doc_id")).as("keeper"))
        .withColumn("keep", col("reason") === "kept")
        .orderBy(col("doc_id"))
    }),

    // Leakage-safe train/val/test split: the split key is the NEAR-DUP
    // cluster representative (connected component over the banded-LSH
    // candidate graph; singleton docs key on themselves), so every member
    // of a dup cluster lands in the same split BY CONSTRUCTION — no
    // near-duplicate of a held-out document can leak into train. The
    // audit column quantifies the alternative: `naive_leaky_groups`
    // counts clusters whose members a per-doc-id hash split would have
    // scattered across splits (test-set contamination). Scale: the LSH
    // candidate pipeline is the shared df-capped band join (never
    // all-pairs), CC is the hybrid union-find/label-propagation operator,
    // and the rest is two group-keyed hash aggs — no windows, no
    // corpus-sized collects.
    "dedup_leakage_split" -> ((s, d) => {
      val clusters = graft.operators.Graph
        .connectedComponents(minhashCandidatePairs(s, d))
        .select(col("vertex").as("doc_id"), col("component").as("ck"))
      val labeled = Tables.documents(s, d).select(col("doc_id"))
        .join(clusters, Seq("doc_id"), "left")
        .withColumn("grp", coalesce(col("ck"), col("doc_id")))
        .withColumn("bucket", expr(
          "cast(conv(substring(md5(cast(grp as string)), 1, 2), 16, 10) as int)"))
        .withColumn("split",
          when(col("bucket") < 208, "train")
            .when(col("bucket") < 232, "val").otherwise("test"))
        .withColumn("nbucket", expr(
          "cast(conv(substring(md5(cast(doc_id as string)), 1, 2), 16, 10) as int)"))
        .withColumn("naive_split",
          when(col("nbucket") < 208, "train")
            .when(col("nbucket") < 232, "val").otherwise("test"))
      labeled
        .groupBy(col("grp"), col("split"))
        .agg(count(lit(1)).as("copies"),
          countDistinct(col("naive_split")).as("naive_splits"))
        .groupBy(col("split"))
        .agg(sum(col("copies")).as("n_docs"),
          count(lit(1)).as("n_groups"),
          sum(when(col("copies") > 1, col("copies")).otherwise(lit(0L)))
            .as("clustered_docs"),
          sum(when(col("naive_splits") > 1, 1L).otherwise(0L))
            .as("naive_leaky_groups"))
        .orderBy(col("split"))
    }),

    // Sketch-quality gate for the MinHash estimator: over the LSH candidate
    // pairs, the signature-agreement Jaccard ESTIMATE (matching positions /
    // 12) is compared against the EXACT capped-universe Jaccard; the query
    // emits the pair count, the mean absolute error (summed as exact
    // DECIMAL — order-free), and a boolean asserting the error bound —
    // the error-envelope pattern (NOTES #6) applied to the sketch itself.
    // The engine measures its own approximation quality instead of
    // assuming the textbook variance holds on this corpus.
    "dedup_minhash_estimate" -> ((s, d) => {
      val dec = DecimalType(28, 12)
      val sigs = minhashSignatures(s, d)
      val est = minhashCandidatePairs(s, d)
        .join(sigs.select(col("doc_id").as("a_id"), col("sig").as("a_sig")), "a_id")
        .join(sigs.select(col("doc_id").as("b_id"), col("sig").as("b_sig")), "b_id")
        .withColumn("est",
          expr("size(filter(sequence(0, 11), i -> a_sig[i] = b_sig[i])) / 12.0"))
      val idx = cappedShingleIndex(s, d, JaccardMaxDf)
      val sizes = idx.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val inter = idx.as("a").join(idx.as("b"),
          col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("inter"))
      val den = coalesce(col("sza"), lit(0L)) + coalesce(col("szb"), lit(0L)) -
        coalesce(col("inter"), lit(0L))
      est
        .join(inter, Seq("a_id", "b_id"), "left")
        .join(sizes.select(col("doc_id").as("a_id"), col("sz").as("sza")), Seq("a_id"), "left")
        .join(sizes.select(col("doc_id").as("b_id"), col("sz").as("szb")), Seq("b_id"), "left")
        .withColumn("jac", when(den === 0, lit(0.0))
          .otherwise(coalesce(col("inter"), lit(0L)).cast("double") / den))
        .agg(count(lit(1)).as("n_pairs"),
          round(sum(abs(col("est") - col("jac")).cast(dec)).cast("double") /
            count(lit(1)), 6).as("mean_abs_err"))
        .withColumn("within_bound", col("mean_abs_err") <= 0.2)
    }),

    // SimHash values (checks the bit math, every doc).
    "dedup_simhash" -> ((s, d) => {
      simhashes(s, d).select(col("doc_id"), col("simhash")).orderBy(col("doc_id"))
    }),

    // SimHash near-dup pairs (Hamming ≤ 3) via pigeonhole 16-bit blocking +
    // exact verify — no cross product (≤3 differing bits over 4 blocks ⇒ at
    // least one block identical; 16-bit blocks keep buckets small even on a
    // high-overlap corpus).
    "dedup_simhash_pairs" -> ((s, d) => {
      // the per-doc signature (one row/doc, session-cached) feeds both join
      // branches; verify (cheap bit_count) BEFORE the distinct so the
      // dedup shuffle carries true near-dups, not all bucket candidates.
      // Materialized eagerly: within one action the two join branches race
      // the cold cache and can both recompute the signature pipeline.
      val sh = simhashes(s, d)
      sh.count()
      val blocked = sh.select(col("doc_id"), col("simhash"),
          explode(expr("sequence(0, 3)")).as("p"))
        .withColumn("blk", expr("(simhash >> (16*p)) & 65535"))
      blocked.as("x").join(blocked.as("y"),
          col("x.p") === col("y.p") && col("x.blk") === col("y.blk") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
          expr("bit_count(x.simhash ^ y.simhash)").as("hamming"))
        .filter(col("hamming") <= 3)
        .distinct()
        .orderBy(col("a_id"), col("b_id"))
    }),

    // Embedding-cosine near-dup, blocked by the label column (coarse
    // quantizer stand-in: at scale the blocker is a learned/HASHED coarse
    // cell, here the provided label). Norms are precomputed once per vector
    // (narrow map before the join) — one dot product per pair, not three.
    "dedup_embedding" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .withColumn("nrm", sqrt(dotD(col("embedding"), col("embedding"))))
      e.as("a").join(e.as("b"),
          col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
        .withColumn("cos",
          dotD(col("a.embedding"), col("b.embedding")) / (col("a.nrm") * col("b.nrm")))
        .filter(col("cos") > 0.3)
        .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
          round(col("cos"), 6).as("cos_sim"))
        .orderBy(col("a_id"), col("b_id"))
    }),

    // ENSEMBLE near-dup agreement: pairs flagged by >= 2 of the three
    // INDEPENDENT detectors (MinHash-LSH bands, SimHash Hamming<=3,
    // same-label embedding cosine) — the agreement filter production
    // pipelines apply before destructive dedup, because each detector has
    // a different failure mode (LSH misses under banding variance,
    // simhash under vocabulary shift, embeddings flag paraphrases that
    // share no surface text). Composes the EXACT standalone definitions
    // (same queries, same oracles), so this gate also cross-checks them
    // against each other. Scale shape: the three pair lists are each
    // ≪ corpus (bucketed generation); the vote is one pair-keyed agg
    // over their union — never touches the corpus again.
    "dedup_ensemble_vote" -> ((s, d) => {
      val mh = queries("dedup_minhash_pairs")(s, d)
        .select(col("a_id"), col("b_id"), lit("minhash").as("m"))
      val sh = queries("dedup_simhash_pairs")(s, d)
        .select(col("a_id"), col("b_id"), lit("simhash").as("m"))
      val em = queries("dedup_embedding")(s, d)
        .select(col("a_id"), col("b_id"), lit("embedding").as("m"))
      mh.unionByName(sh).unionByName(em)
        .groupBy(col("a_id"), col("b_id"))
        .agg(countDistinct(col("m")).as("n_methods"),
          array_join(sort_array(collect_set(col("m"))), ",").as("methods"))
        .filter(col("n_methods") >= 2)
        .orderBy(col("a_id"), col("b_id"))
    }),

    // Cross-modal near-dup verification: textual LSH candidates re-scored
    // by embedding cosine — the two independent signals a production dedup
    // pipeline fuses (surface n-gram overlap can be boilerplate; embedding
    // agreement says the MEANING matches too). Scale shape: the pair list
    // (≪ corpus) joins the embedding store twice by id — two broadcast-or-
    // shuffle hash joins on a tiny left side; one dot product per pair,
    // never a pairwise scan.
    "dedup_semantic_verify" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .withColumn("nrm", sqrt(dotD(col("embedding"), col("embedding"))))
        .select(col("vec_id"), col("embedding"), col("nrm"))
      minhashCandidatePairs(s, d)
        .join(e.as("ea"), col("a_id") === col("ea.vec_id"))
        .join(e.as("eb"), col("b_id") === col("eb.vec_id"))
        .withColumn("cos", dotD(col("ea.embedding"), col("eb.embedding")) /
          (col("ea.nrm") * col("eb.nrm")))
        .select(col("a_id"), col("b_id"), round(col("cos"), 6).as("cos_sim"),
          (col("cos") >= 0.5).as("semantic_dup"))
        .orderBy(col("a_id"), col("b_id"))
    }))

  private val WsSql = "string_split(text, ' ')"
  private val ShIdxSql =
    s"""SELECT DISTINCT doc_id, unnest(list_transform(range(1, greatest(len(ws)-1, 1)),
          i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
        FROM (SELECT doc_id, $WsSql AS ws FROM documents) t"""
  private val MinhashSql =
    s"""SELECT doc_id, list(mh ORDER BY i) AS sig FROM (
          SELECT doc_id, i, min(md5(CAST(i AS VARCHAR) || ':' || sh)) AS mh
          FROM ($ShIdxSql) s CROSS JOIN (SELECT unnest(range(12)) AS i) ii
          GROUP BY doc_id, i) m GROUP BY doc_id"""
  private val SimhashSql =
    s"""SELECT doc_id,
          CAST(SUM(CASE WHEN s > 0 THEN
                 CASE WHEN j = 63 THEN -9223372036854775808::HUGEINT
                      ELSE ((1::BIGINT) << j)::HUGEINT END
               ELSE 0::HUGEINT END) AS BIGINT) AS simhash FROM (
          SELECT doc_id, j,
            SUM(CASE WHEN ((strpos('0123456789abcdef', substr(md5(w), CAST(j // 2 AS INT) + 1, 1)) - 1)
                           >> (2 * (j % 2) + 1)) % 2 = 1
                     THEN 1 ELSE -1 END) AS s
          FROM (SELECT doc_id, unnest($WsSql) AS w FROM documents) tw
          CROSS JOIN (SELECT unnest(range(64)) AS j) jj
          GROUP BY doc_id, j) b GROUP BY doc_id"""
  private val DotSql = // left-fold double dot product, same order as Spark's aggregate()
    "list_reduce(list_transform(list_zip(%s, %s), r -> CAST(r[1] AS DOUBLE) * CAST(r[2] AS DOUBLE)), (acc, x) -> acc + x)"
  private def cosSql(a: String, b: String) =
    s"${DotSql.format(a, b)} / (sqrt(${DotSql.format(a, a)}) * sqrt(${DotSql.format(b, b)}))"

  val oracleSql: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keeper, COUNT(*) AS n_copies
         FROM documents GROUP BY 1 ORDER BY content_hash""",

    "dedup_bloom_blocklist" ->
      """SELECT d.doc_id, md5(d.text) AS content_hash
         FROM documents d
         WHERE EXISTS (SELECT 1 FROM documents b
                       WHERE b.doc_id % 37 = 0 AND md5(b.text) = md5(d.text))
         ORDER BY d.doc_id""",

    "dedup_substring_remove" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         g AS (
           SELECT doc_id, CAST(i - 1 AS INT) AS pos,
             md5(array_to_string(ws[CAST(i AS INT):CAST(i + 15 AS INT)], ' ')) AS h
           FROM w, unnest(range(1, len(ws) - 14)) t(i)),
         dup AS (
           SELECT doc_id, pos FROM (
             SELECT doc_id, pos,
               ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
             FROM g) WHERE rn > 1),
         rm AS (
           SELECT DISTINCT doc_id, CAST(j AS INT) AS i
           FROM dup, unnest(range(pos, pos + 16)) t(j)),
         tk AS (
           SELECT doc_id, CAST(i - 1 AS INT) AS i, ws[CAST(i AS INT)] AS tok
           FROM w, unnest(range(1, len(ws) + 1)) t(i))
         SELECT tk.doc_id, COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN rm.i IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removed,
           md5(COALESCE(array_to_string(list_transform(list_filter(
             list_sort(list({'i': tk.i, 'rm': rm.i IS NOT NULL, 'tok': tk.tok})),
             x -> NOT x.rm), x -> x.tok), ' '), '')) AS cleaned_md5
         FROM tk LEFT JOIN rm ON tk.doc_id = rm.doc_id AND tk.i = rm.i
         GROUP BY tk.doc_id ORDER BY tk.doc_id""",

    "dedup_edit_verify" ->
      s"""WITH sigs AS ($MinhashSql),
         banded AS (
           SELECT doc_id, CAST(b AS VARCHAR) || '|' || sig[3*b+1] || '|' || sig[3*b+2] || '|' || sig[3*b+3] AS bucket
           FROM sigs CROSS JOIN (SELECT unnest(range(4)) AS b) bb),
         pairs AS (
           SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
           FROM banded x JOIN banded y ON x.bucket = y.bucket AND x.doc_id < y.doc_id),
         d128 AS (SELECT doc_id, substr(text, 1, 128) AS t FROM documents)
         SELECT p.a_id, p.b_id,
           CAST(levenshtein(a.t, b.t) AS BIGINT) AS edit_dist,
           CAST(greatest(length(a.t), length(b.t)) AS BIGINT) AS max_len,
           ROUND(1.0 - CAST(levenshtein(a.t, b.t) AS DOUBLE) /
             greatest(length(a.t), length(b.t)), 6) AS sim,
           (levenshtein(a.t, b.t) * 10 <= greatest(length(a.t), length(b.t)))
             AS is_dup
         FROM pairs p
         JOIN d128 a ON p.a_id = a.doc_id
         JOIN d128 b ON p.b_id = b.doc_id
         ORDER BY p.a_id, p.b_id""",

    "dedup_decontaminate" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         sp AS (
           SELECT doc_id, array_to_string(ws[i:i+7], ' ') AS sh
           FROM (SELECT doc_id, ws,
                   unnest(range(1, greatest(len(ws) - 6, 1))) AS i FROM w)),
         bench AS (SELECT DISTINCT sh FROM sp WHERE doc_id % 41 = 0),
         corp AS (SELECT doc_id, sh FROM sp WHERE doc_id % 41 <> 0),
         tot AS (SELECT doc_id, COUNT(*) AS n_spans FROM corp GROUP BY doc_id),
         hits AS (
           SELECT doc_id, COUNT(*) AS n_contaminated FROM corp
           WHERE sh IN (SELECT sh FROM bench) GROUP BY doc_id)
         SELECT d.doc_id,
           CAST(COALESCE(tot.n_spans, 0) AS BIGINT) AS n_spans,
           CAST(COALESCE(hits.n_contaminated, 0) AS BIGINT) AS n_contaminated,
           COALESCE(hits.n_contaminated, 0) >= 8 AS is_contaminated
         FROM documents d
         LEFT JOIN tot ON d.doc_id = tot.doc_id
         LEFT JOIN hits ON d.doc_id = hits.doc_id
         WHERE d.doc_id % 41 <> 0
         ORDER BY d.doc_id""",

    "dedup_span_overlap" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         sp AS (
           SELECT doc_id, array_to_string(ws[i:i+7], ' ') AS sh
           FROM (SELECT doc_id, ws,
                   unnest(range(1, greatest(len(ws) - 6, 1))) AS i FROM w)),
         dup AS (
           SELECT sh FROM (SELECT DISTINCT doc_id, sh FROM sp)
           GROUP BY sh HAVING COUNT(*) >= 2),
         tot AS (SELECT doc_id, COUNT(*) AS n_spans FROM sp GROUP BY doc_id),
         dc AS (
           SELECT doc_id, COUNT(*) AS n_dup_spans FROM sp
           WHERE sh IN (SELECT sh FROM dup) GROUP BY doc_id)
         SELECT doc_id, n_spans, n_dup_spans, dup_ratio,
           dup_ratio >= 0.5 AS near_dup
         FROM (
           SELECT d.doc_id,
             COALESCE(tot.n_spans, 0) AS n_spans,
             COALESCE(dc.n_dup_spans, 0) AS n_dup_spans,
             CASE WHEN COALESCE(tot.n_spans, 0) = 0 THEN 0.0
                  ELSE round(CAST(COALESCE(dc.n_dup_spans, 0) AS DOUBLE)
                             / tot.n_spans, 6) END AS dup_ratio
           FROM documents d
           LEFT JOIN tot ON d.doc_id = tot.doc_id
           LEFT JOIN dc ON d.doc_id = dc.doc_id)
         ORDER BY doc_id""",

    // same stop-shingle cap as the Spark side: Jaccard over shingles with
    // df <= JaccardMaxDf
    "dedup_ngram_jaccard" ->
      s"""WITH idx0 AS ($ShIdxSql),
            kept AS (SELECT sh FROM idx0 GROUP BY sh HAVING COUNT(*) <= $JaccardMaxDf),
            idx AS (SELECT i.doc_id, i.sh FROM idx0 i JOIN kept USING (sh)),
            sizes AS (SELECT doc_id, COUNT(*) AS sz FROM idx GROUP BY doc_id),
            common AS (
              SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
              FROM idx a JOIN idx b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
         SELECT a_id, b_id, inter / (sa.sz + sb.sz - inter) AS jaccard
         FROM common JOIN sizes sa ON sa.doc_id = a_id JOIN sizes sb ON sb.doc_id = b_id
         WHERE inter / (sa.sz + sb.sz - inter) >= 0.25
         ORDER BY a_id, b_id""",

    // same capped index as the jaccard oracle; denominator = contained
    // side's size, directed pairs
    "dedup_containment" ->
      s"""WITH idx0 AS ($ShIdxSql),
            kept AS (SELECT sh FROM idx0 GROUP BY sh HAVING COUNT(*) <= $JaccardMaxDf),
            idx AS (SELECT i.doc_id, i.sh FROM idx0 i JOIN kept USING (sh)),
            sizes AS (SELECT doc_id, COUNT(*) AS sz FROM idx GROUP BY doc_id),
            common AS (
              SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
              FROM idx a JOIN idx b ON a.sh = b.sh AND a.doc_id <> b.doc_id
              GROUP BY 1, 2)
         SELECT a_id, b_id, inter, sz_a, containment FROM (
           SELECT a_id, b_id, inter, sa.sz AS sz_a, inter / sa.sz AS containment
           FROM common JOIN sizes sa ON sa.doc_id = a_id) t
         WHERE containment >= 0.8
         ORDER BY a_id, b_id""",

    "dedup_minhash_sig" ->
      s"""SELECT doc_id, list_aggregate(sig, 'string_agg', '|') AS signature
         FROM ($MinhashSql) t ORDER BY doc_id""",

    "dedup_minhash_pairs" ->
      s"""WITH sigs AS ($MinhashSql),
            banded AS (
              SELECT doc_id, CAST(b AS VARCHAR) || '|' || sig[3*b+1] || '|' || sig[3*b+2] || '|' || sig[3*b+3] AS bucket
              FROM sigs CROSS JOIN (SELECT unnest(range(4)) AS b) bb)
         SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
         FROM banded x JOIN banded y ON x.bucket = y.bucket AND x.doc_id < y.doc_id
         ORDER BY a_id, b_id""",

    // fixed-point power iteration, 10 steps unrolled as chained CTEs
    // (aggregates are not allowed in a recursive term); `//` and Spark's
    // `div` agree on truncated division for non-negative operands
    "dedup_pagerank" -> {
      val iters = (1 to 10).map { i =>
        s""", pr$i AS (
             SELECT e.t AS v,
               CAST(tele.tp + (85 * SUM(p.r // dd.dg)) // 100 AS BIGINT) AS r
             FROM pr${i - 1} p
             JOIN edges e ON p.v = e.s
             JOIN deg dd ON dd.s = p.v
             CROSS JOIN tele
             GROUP BY e.t, tele.tp)"""
      }.mkString
      s"""WITH sigs AS ($MinhashSql),
            banded AS (
              SELECT doc_id, CAST(b AS VARCHAR) || '|' || sig[3*b+1] || '|' || sig[3*b+2] || '|' || sig[3*b+3] AS bucket
              FROM sigs CROSS JOIN (SELECT unnest(range(4)) AS b) bb),
            prs AS (
              SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
              FROM banded x JOIN banded y ON x.bucket = y.bucket AND x.doc_id < y.doc_id),
            edges AS (
              SELECT a_id AS s, b_id AS t FROM prs
              UNION ALL SELECT b_id, a_id FROM prs),
            deg AS (SELECT s, COUNT(*) AS dg FROM edges GROUP BY s),
            nn AS (SELECT COUNT(*) AS n FROM deg),
            tele AS (SELECT (15 * (1000000000000 // n)) // 100 AS tp FROM nn),
            pr0 AS (SELECT s AS v, (1000000000000 // n) AS r FROM deg CROSS JOIN nn)
            $iters
         SELECT v AS doc_id, r AS rank_fp FROM pr10 ORDER BY doc_id"""
    },

    // transitive closure by recursive CTE: reach(u,v) = v reachable from u;
    // keeper = min over {self} ∪ reachable set
    "dedup_clusters" ->
      s"""WITH RECURSIVE sigs AS ($MinhashSql),
            banded AS (
              SELECT doc_id, CAST(b AS VARCHAR) || '|' || sig[3*b+1] || '|' || sig[3*b+2] || '|' || sig[3*b+3] AS bucket
              FROM sigs CROSS JOIN (SELECT unnest(range(4)) AS b) bb),
            pairs AS (
              SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
              FROM banded x JOIN banded y ON x.bucket = y.bucket AND x.doc_id < y.doc_id),
            edges AS (SELECT a_id AS u, b_id AS v FROM pairs
                      UNION SELECT b_id AS u, a_id AS v FROM pairs),
            reach AS (
              SELECT u, v FROM edges
              UNION
              SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)
         SELECT u AS doc_id, LEAST(u, MIN(v)) AS keeper
         FROM reach GROUP BY u ORDER BY doc_id""",

    "dedup_keep_list" ->
      s"""WITH RECURSIVE sigs AS ($MinhashSql),
            banded AS (
              SELECT doc_id, CAST(b AS VARCHAR) || '|' || sig[3*b+1] || '|' || sig[3*b+2] || '|' || sig[3*b+3] AS bucket
              FROM sigs CROSS JOIN (SELECT unnest(range(4)) AS b) bb),
            pairs AS (
              SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
              FROM banded x JOIN banded y ON x.bucket = y.bucket AND x.doc_id < y.doc_id),
            edges AS (SELECT a_id AS u, b_id AS v FROM pairs
                      UNION SELECT b_id AS u, a_id AS v FROM pairs),
            reach AS (
              SELECT u, v FROM edges
              UNION
              SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
            comp AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS ck FROM reach GROUP BY u),
            ex AS (SELECT doc_id, md5(text) AS h FROM documents),
            ek AS (SELECT h, MIN(doc_id) AS ek FROM ex GROUP BY h)
         SELECT doc_id, reason, keeper, reason = 'kept' AS keep FROM (
           SELECT e.doc_id,
             CASE WHEN e.doc_id <> k.ek THEN 'exact_dup'
                  WHEN c.ck IS NOT NULL AND c.ck <> e.doc_id THEN 'near_dup'
                  ELSE 'kept' END AS reason,
             CASE WHEN e.doc_id <> k.ek THEN k.ek
                  WHEN c.ck IS NOT NULL AND c.ck <> e.doc_id THEN c.ck
                  ELSE e.doc_id END AS keeper
           FROM ex e JOIN ek k USING (h) LEFT JOIN comp c ON e.doc_id = c.doc_id) t
         ORDER BY doc_id""",

    "dedup_leakage_split" ->
      s"""WITH RECURSIVE sigs AS ($MinhashSql),
            banded AS (
              SELECT doc_id, CAST(b AS VARCHAR) || '|' || sig[3*b+1] || '|' || sig[3*b+2] || '|' || sig[3*b+3] AS bucket
              FROM sigs CROSS JOIN (SELECT unnest(range(4)) AS b) bb),
            pairs AS (
              SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
              FROM banded x JOIN banded y ON x.bucket = y.bucket AND x.doc_id < y.doc_id),
            edges AS (SELECT a_id AS u, b_id AS v FROM pairs
                      UNION SELECT b_id AS u, a_id AS v FROM pairs),
            reach AS (
              SELECT u, v FROM edges
              UNION
              SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
            comp AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS ck FROM reach GROUP BY u),
            g AS (
              SELECT d.doc_id, COALESCE(c.ck, d.doc_id) AS grp
              FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id),
            sp AS (
              SELECT grp,
                CASE WHEN gb < 208 THEN 'train' WHEN gb < 232 THEN 'val' ELSE 'test' END AS split,
                CASE WHEN nb < 208 THEN 'train' WHEN nb < 232 THEN 'val' ELSE 'test' END AS naive_split
              FROM (
                SELECT doc_id, grp,
                  (strpos('0123456789abcdef', substr(md5(CAST(grp AS VARCHAR)), 1, 1)) - 1) * 16 +
                  (strpos('0123456789abcdef', substr(md5(CAST(grp AS VARCHAR)), 2, 1)) - 1) AS gb,
                  (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16 +
                  (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS nb
                FROM g) b),
            pg AS (
              SELECT grp, split, COUNT(*) AS copies, COUNT(DISTINCT naive_split) AS naive_splits
              FROM sp GROUP BY 1, 2)
         SELECT split, CAST(SUM(copies) AS BIGINT) AS n_docs, COUNT(*) AS n_groups,
           CAST(SUM(CASE WHEN copies > 1 THEN copies ELSE 0 END) AS BIGINT) AS clustered_docs,
           CAST(SUM(CASE WHEN naive_splits > 1 THEN 1 ELSE 0 END) AS BIGINT) AS naive_leaky_groups
         FROM pg GROUP BY 1 ORDER BY split""",

    "dedup_minhash_estimate" ->
      s"""WITH sigs AS ($MinhashSql),
            banded AS (
              SELECT doc_id, CAST(b AS VARCHAR) || '|' || sig[3*b+1] || '|' || sig[3*b+2] || '|' || sig[3*b+3] AS bucket
              FROM sigs CROSS JOIN (SELECT unnest(range(4)) AS b) bb),
            pairs AS (
              SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
              FROM banded x JOIN banded y ON x.bucket = y.bucket AND x.doc_id < y.doc_id),
            withsig AS (
              SELECT p.a_id, p.b_id,
                len(list_filter(range(12), i -> sa.sig[i+1] = sb.sig[i+1])) / 12.0 AS est
              FROM pairs p JOIN sigs sa ON p.a_id = sa.doc_id
                           JOIN sigs sb ON p.b_id = sb.doc_id),
            idx0 AS ($ShIdxSql),
            kept AS (SELECT sh FROM idx0 GROUP BY sh HAVING COUNT(*) <= $JaccardMaxDf),
            idx AS (SELECT i.doc_id, i.sh FROM idx0 i JOIN kept USING (sh)),
            sizes AS (SELECT doc_id, COUNT(*) AS sz FROM idx GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
              FROM idx a JOIN idx b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            j AS (
              SELECT w.est,
                CASE WHEN COALESCE(sa.sz, 0) + COALESCE(sb.sz, 0) - COALESCE(i.inter, 0) = 0
                     THEN 0.0
                     ELSE CAST(COALESCE(i.inter, 0) AS DOUBLE) /
                          (COALESCE(sa.sz, 0) + COALESCE(sb.sz, 0) - COALESCE(i.inter, 0)) END AS jac
              FROM withsig w
              LEFT JOIN inter i ON w.a_id = i.a_id AND w.b_id = i.b_id
              LEFT JOIN sizes sa ON w.a_id = sa.doc_id
              LEFT JOIN sizes sb ON w.b_id = sb.doc_id)
         SELECT n_pairs, mean_abs_err, mean_abs_err <= 0.2 AS within_bound FROM (
           SELECT COUNT(*) AS n_pairs,
             round(CAST(SUM(CAST(ABS(est - jac) AS DECIMAL(28,12))) AS DOUBLE)
                   / COUNT(*), 6) AS mean_abs_err
           FROM j) t""",

    "dedup_simhash" ->
      s"""SELECT doc_id, simhash FROM ($SimhashSql) t ORDER BY doc_id""",

    "dedup_simhash_pairs" ->
      s"""WITH sh AS ($SimhashSql)
         SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           bit_count(xor(a.simhash, b.simhash)::BIGINT) AS hamming
         FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.simhash, b.simhash)::BIGINT) <= 3
         ORDER BY a_id, b_id""",

    "dedup_embedding" ->
      s"""SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           round(${cosSql("a.embedding", "b.embedding")}, 6) AS cos_sim
         FROM embeddings a JOIN embeddings b
           ON a.label = b.label AND a.vec_id < b.vec_id
         WHERE ${cosSql("a.embedding", "b.embedding")} > 0.3
         ORDER BY a_id, b_id""",

    // re-banded from the same signature CTE; bucket strings only need to
    // produce the same GROUPING per engine, counts are exact integers
    "dedup_lsh_tuning" -> {
      val blocks = Seq((12, 1), (6, 2), (4, 3), (3, 4)).map { case (nb, r) =>
        val key = (0 until r).map(j => s"sig[$r*b+$j+1]").mkString(" || '|' || ")
        s"""SELECT $nb AS bands, $r AS rows_per_band, COUNT(*) AS n_candidates,
              CAST(SUM(CASE WHEN mf >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_est_dup
            FROM (
              SELECT CAST(list_reduce(list_transform(list_zip(xa.sig, xb.sig),
                  p -> CASE WHEN p[1] = p[2] THEN 1 ELSE 0 END), (a, b) -> a + b) AS DOUBLE)
                / 12.0 AS mf
              FROM (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
                    FROM (SELECT doc_id, CAST(b AS VARCHAR) || '|' || $key AS bucket
                          FROM sigs CROSS JOIN (SELECT unnest(range($nb)) AS b) bb) x
                    JOIN (SELECT doc_id, CAST(b AS VARCHAR) || '|' || $key AS bucket
                          FROM sigs CROSS JOIN (SELECT unnest(range($nb)) AS b) bb) y
                      ON x.bucket = y.bucket AND x.doc_id < y.doc_id) pr
              JOIN sigs xa ON pr.a_id = xa.doc_id
              JOIN sigs xb ON pr.b_id = xb.doc_id) t"""
      }
      s"""WITH sigs AS ($MinhashSql)
         SELECT bands, rows_per_band, n_candidates, n_est_dup,
           CASE WHEN n_candidates > 0
                THEN round(CAST(n_est_dup AS DOUBLE) / CAST(n_candidates AS DOUBLE), 6)
           END AS precision_est
         FROM (${blocks.mkString(" UNION ALL ")}) u
         ORDER BY rows_per_band"""
    },

    // the three detectors' EXACT standalone definitions, re-composed
    "dedup_ensemble_vote" ->
      s"""WITH sigs AS ($MinhashSql),
            banded AS (
              SELECT doc_id, CAST(b AS VARCHAR) || '|' || sig[3*b+1] || '|' || sig[3*b+2] || '|' || sig[3*b+3] AS bucket
              FROM sigs CROSS JOIN (SELECT unnest(range(4)) AS b) bb),
            mh AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
                   FROM banded x JOIN banded y ON x.bucket = y.bucket AND x.doc_id < y.doc_id),
            shh AS ($SimhashSql),
            sh AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
                   FROM shh a JOIN shh b ON a.doc_id < b.doc_id
                   WHERE bit_count(xor(a.simhash, b.simhash)::BIGINT) <= 3),
            em AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id
                   FROM embeddings a JOIN embeddings b
                     ON a.label = b.label AND a.vec_id < b.vec_id
                   WHERE ${cosSql("a.embedding", "b.embedding")} > 0.3),
            u AS (SELECT a_id, b_id, 'minhash' AS m FROM mh
                  UNION ALL SELECT a_id, b_id, 'simhash' AS m FROM sh
                  UNION ALL SELECT a_id, b_id, 'embedding' AS m FROM em)
         SELECT a_id, b_id, CAST(COUNT(DISTINCT m) AS BIGINT) AS n_methods,
           array_to_string(list_sort(list(DISTINCT m)), ',') AS methods
         FROM u GROUP BY a_id, b_id HAVING COUNT(DISTINCT m) >= 2
         ORDER BY a_id, b_id""",

    "dedup_semantic_verify" ->
      s"""WITH sigs AS ($MinhashSql),
            banded AS (
              SELECT doc_id, CAST(b AS VARCHAR) || '|' || sig[3*b+1] || '|' || sig[3*b+2] || '|' || sig[3*b+3] AS bucket
              FROM sigs CROSS JOIN (SELECT unnest(range(4)) AS b) bb),
            prs AS (
              SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
              FROM banded x JOIN banded y ON x.bucket = y.bucket AND x.doc_id < y.doc_id)
         SELECT p.a_id, p.b_id,
           round(${cosSql("ea.embedding", "eb.embedding")}, 6) AS cos_sim,
           ${cosSql("ea.embedding", "eb.embedding")} >= 0.5 AS semantic_dup
         FROM prs p
         JOIN embeddings ea ON p.a_id = ea.vec_id
         JOIN embeddings eb ON p.b_id = eb.vec_id
         ORDER BY a_id, b_id""")
}
