package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Text-analysis operators over `documents` (north-star surface): token
  * counting, quality scoring, n-gram/stopword language ID, fingerprinting,
  * corpus term frequency. All pure built-in expressions (codegen'd; no
  * UDFs), each with a DuckDB oracle.
  *
  * Scale: every per-document query is a narrow map over the scan (no
  * shuffle); term frequency is one partial+final hash agg. At 100 TB these
  * all stream — the only wide op is the term-freq groupBy.
  */
object TextQueries {

  /** Words by single-space split (the corpus is single-spaced). */
  private def withWords(df: DataFrame): DataFrame =
    df.withColumn("ws", split(col("text"), " "))

  private val Stop = Map(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "los", "y"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "les", "des", "et", "une"))

  private def hits(lang: String) = {
    val set = Stop(lang).map(w => s"'$w'").mkString(", ")
    expr(s"size(filter(ws, w -> w IN ($set)))")
  }
  private def hitsSql(lang: String) = {
    val set = Stop(lang).map(w => s"'$w'").mkString(", ")
    s"len(list_filter(ws, w -> w IN ($set)))"
  }

  /** Documents with the shared quality-score ingredients (n_tokens,
    * stop_hits, punct) and the UNROUNDED composite `score` — the ONE
    * definition the quality family (text_quality, the quantile gate, the
    * approx-threshold gate) derives from, so the scoring formula cannot
    * silently diverge between its consumers and their oracles. */
  private def scoredDocs(s: SparkSession, d: String): DataFrame =
    withWords(Tables.documents(s, d))
      .withColumn("n_tokens", size(col("ws")))
      .withColumn("stop_hits", hits("en"))
      .withColumn("punct", regexp_count(col("text"), lit("[.,;:!?]")))
      .withColumn("score",
        col("stop_hits") / col("n_tokens") * 0.5 +
          (lit(1.0) - col("punct") / length(col("text"))) * 0.3 +
          least(col("n_tokens") / 100.0, lit(1.0)) * 0.2)

  /** The composite C4/Gopher-style keep/drop decision frame (langid +
    * quality score + repetition + contamination + the keep boolean) — ONE
    * definition feeding text_quality_filter AND the composed
    * text_pipeline_e2e, so the gate cannot diverge between the standalone
    * query and the pipeline. Unordered; callers sort. */
  private def qualityDecisions(s: SparkSession, d: String): DataFrame = {
    val scored = withWords(Tables.documents(s, d))
      .withColumn("n_tokens", size(col("ws")))
      .withColumn("stop_hits", hits("en"))
      .withColumn("punct", regexp_count(col("text"), lit("[.,;:!?]")))
      .withColumn("en", hits("en")).withColumn("es", hits("es"))
      .withColumn("de", hits("de")).withColumn("fr", hits("fr"))
      .withColumn("lang_guess",
        when(col("en") > 0 && col("en") >= col("es") && col("en") >= col("de") && col("en") >= col("fr"), "en")
          .when(col("es") > 0 && col("es") >= col("de") && col("es") >= col("fr"), "es")
          .when(col("de") > 0 && col("de") >= col("fr"), "de")
          .when(col("fr") > 0, "fr")
          .otherwise("und"))
      .withColumn("quality_score", round(
        col("stop_hits") / col("n_tokens") * 0.5 +
          (lit(1.0) - col("punct") / length(col("text"))) * 0.3 +
          least(col("n_tokens") / 100.0, lit(1.0)) * 0.2, 6))
      .select(col("doc_id"), col("lang_guess"), col("quality_score"))
    val rep = DedupQueries.shingleRows(s, d)
      .groupBy(col("doc_id"))
      .agg(round(lit(1.0) - countDistinct(col("sh")) / count(lit(1)), 6)
        .as("rep_ratio"))
    val w5 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val grams5 = withWords(Tables.documents(s, d))
      .select(col("doc_id"), posexplode(col("ws")).as(Seq("pos", "w0")))
      .select(col("doc_id"), col("w0"),
        lead("w0", 1).over(w5).as("w1"), lead("w0", 2).over(w5).as("w2"),
        lead("w0", 3).over(w5).as("w3"), lead("w0", 4).over(w5).as("w4"))
      .filter(col("w4").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("w0"), col("w1"), col("w2"),
        col("w3"), col("w4")).as("g"))
      .distinct()
    val bench = grams5.filter(col("doc_id") % 97 === 0).select(col("g")).distinct()
    val contam = grams5.filter(col("doc_id") % 97 =!= 0)
      .join(broadcast(bench), "g")
      .select(col("doc_id")).distinct()
      .withColumn("contaminated", lit(true))
    scored
      .join(rep, Seq("doc_id"), "left")
      .join(contam, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang_guess"), col("quality_score"),
        coalesce(col("rep_ratio"), lit(0.0)).as("rep_ratio"),
        coalesce(col("contaminated"), lit(false)).as("contaminated"))
      .withColumn("keep",
        col("lang_guess") =!= "und" && col("quality_score") >= 0.42 &&
          col("rep_ratio") <= 0.02 && !col("contaminated") &&
          col("doc_id") % 97 =!= 0)
  }

  /** BM25 (Robertson k1=1.2, b=0.75) of a fixed query term set over an
    * arbitrary (doc_id, text) frame — text_bm25's engine, also served
    * over the CDC-materialized corpus by cdc_bm25_serving. One
    * definition, every consumer. Top-50 by (rounded score desc, doc_id). */
  /** THE retrieval query term set — single definition for the BM25
    * family and the nDCG gate, on BOTH engines (the Spark call sites use
    * the Seq, the oracle SQL interpolates [[QueryTermsSql]]). */
  private[queries] val QueryTerms = Seq("spark", "stream", "window")
  private[queries] val QueryTermsSql = QueryTerms.map(t => s"'$t'").mkString(", ")

  /** nDCG@10 discount weights w_i = 1/log2(i+1), computed ONCE here and
    * embedded as the SAME double literals in the Spark plan and the
    * DuckDB oracle (Double.toString round-trips exactly on both
    * parsers) — no libm log runs inside either query. */
  private[queries] val NdcgW: Seq[Double] =
    (1 to 10).map(i => math.log(2) / math.log(i + 1.0))

  private[queries] def bm25Of(docs0: DataFrame, qterms: Seq[String]): DataFrame = {
    import docs0.sparkSession.implicits._
    bm25OverTerms(docs0, qterms.toDF("term"))
  }

  /** [[bm25Of]] with the query term set as a DataFrame (`term` column) —
    * the form a data-dependent term set (pseudo-relevance-feedback
    * expansion) needs: the tiny term table broadcasts into the tf filter,
    * so no term list ever collects to the driver. */
  private[queries] def bm25OverTerms(docs0: DataFrame, qterms: DataFrame): DataFrame = {
    val docs = withWords(docs0)
    val dl = docs.select(col("doc_id"), size(col("ws")).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val tf = docs.select(col("doc_id"), explode(col("ws")).as("term"))
      .join(broadcast(qterms.select(col("term")).distinct()), Seq("term"), "left_semi")
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(df_), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl",
        col("sum_dl").cast("double") / col("n_docs").cast("double"))
      .withColumn("idf", log(lit(1.0) +
        (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5))))
      .withColumn("ts", round(
        col("idf") * (col("tf").cast("double") * lit(2.2)) /
          (col("tf").cast("double") +
            lit(1.2) * (lit(0.25) + lit(0.75) * col("dl").cast("double") / col("avgdl"))),
        6))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_match"),
        round(aggregate(sort_array(collect_list(col("ts"))), lit(0.0),
          (a, x) => a + x), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(50)
      .select(col("doc_id"), col("n_match"), col("bm25"))
  }

  /** The hybrid-retrieval engine (text_hybrid_retrieval + the CDC-served
    * cdc_hybrid_serving), split at its natural seams so both consumers run
    * the SAME definitions: lexical ranks off [[bm25Of]]'s top-50, dense
    * ranks from one broadcast query vector against a corpus scan (bounded
    * by TakeOrdered), and Cormack/Clarke RRF (k=60) fusion of the two
    * 50-row lists. [[hybridSql]] is the one DuckDB twin. */
  private[queries] def lexRanksOf(docs: DataFrame, qterms: Seq[String]): DataFrame =
    bm25Of(docs, qterms)
      .withColumn("lex_rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("bm25").desc, col("doc_id"))))
      .select(col("doc_id"), col("lex_rank"))

  /** Dense cosine top-50 ranks for query vector `qId` over `vecs`
    * (`vec_id`, `emb: array<double>`) — the fold is the same left-to-right
    * double sum as [[SimilarityQueries]]'s DotSql, so parquet-float and
    * CDC-text-parsed vectors rank identically. */
  private[queries] def denseRanksOf(vecs: DataFrame, qId: Long): DataFrame = {
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val n = vecs.withColumn("nrm", sqrt(dot(col("emb"), col("emb"))))
    val q = n.filter(col("vec_id") === qId)
      .select(col("emb").as("q_emb"), col("nrm").as("q_nrm"))
    n.filter(col("vec_id") =!= qId)
      .crossJoin(broadcast(q))
      .withColumn("cos", dot(col("emb"), col("q_emb")) / (col("nrm") * col("q_nrm")))
      .orderBy(col("cos").desc, col("vec_id")).limit(50)
      .withColumn("dense_rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("cos").desc, col("vec_id"))))
      .select(col("vec_id").as("doc_id"), col("dense_rank"))
  }

  /** RRF fusion: score(d) = Σ_lists 1/(60 + rank_list(d)), absent lists
    * contribute 0; top-20 by (score, doc_id). Two correctly-rounded double
    * divisions added in a fixed order — identical on both engines. */
  private[queries] def rrfFused(lex: DataFrame, dense: DataFrame): DataFrame =
    lex.join(dense, Seq("doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(60) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + col("dense_rank")), lit(0.0)))
      .orderBy(col("rrf").desc, col("doc_id")).limit(20)
      .select(col("doc_id"), col("lex_rank"), col("dense_rank"),
        round(col("rrf"), 6).as("rrf_score"))

  /** 24-bit content hash (first 6 md5 hex digits), the shared bucketing
    * key of text_mix_sample and text_export_shards; [[Hash24Sql]] is its
    * DuckDB twin. */
  private def contentHash24(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(c.cast(BinaryType)), 1, 6), 16, 10).cast("long")
  private val Hash24Sql = "CAST(concat('0x', substr(md5(text), 1, 6)) AS BIGINT)"

  /** Session cache of the exploded (term) corpus — text_heavy_hitters
    * reads it three times (candidates, total, recount); one scan feeds
    * all three. Released by [[clearCache]]. */
  private val derived =
    new scala.collection.concurrent.TrieMap[(SparkSession, String, String), DataFrame]()

  private def cachedTerms(s: SparkSession, d: String): DataFrame =
    derived.getOrElseUpdate((s, "terms", d),
      withWords(Tables.documents(s, d))
        .select(explode(col("ws")).as("term")).filter(length(col("term")) > 0)
        .persist())

  /** Drop every cached derived table (test hook / memory release). */
  def clearCache(): Unit = {
    derived.values.foreach(_.unpersist())
    derived.clear()
    bpeModels.clear()
  }

  /** BPE training building blocks shared by the text_bpe_* family. The
    * corpus collapses to its weighted vocabulary once (pair extraction and
    * merge application then cost O(vocab·word_len), not O(corpus)); each
    * learned merge is a 1-row broadcast (model state). Words travel as
    * symbol arrays `sy`; a merge rewrites them through the DOUBLE-separator
    * string form `|a||b||c|`: the pattern `|a||b|` anchors BOTH symbol
    * boundaries, so it can only match two complete adjacent symbols — a
    * single-separator form would let `r|y` falsely match the tail of a
    * merged symbol `er` — and each symbol owns its wrappers, so leftmost
    * non-overlapping replace (the BPE rule, identical on both engines)
    * still catches back-to-back occurrences (`x y x y` → `xy xy`). */
  private def bpeVocab(s: SparkSession, d: String): DataFrame =
    withWords(Tables.documents(s, d))
      .select(explode(col("ws")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("c"))
      .withColumn("sy", split(col("word"), ""))

  /** Adjacent-symbol pair counts `(a, b, n)` weighted by word frequency.
    * element_at stays in bounds via the filtered index sequence
    * (ANSI-safe); 1-symbol words contribute no pairs. */
  private def bpePairs(sym: DataFrame): DataFrame =
    sym.select(col("c"), explode(expr(
        "transform(filter(sequence(1, greatest(size(sy) - 1, 1)), i -> i < size(sy)), " +
          "i -> struct(element_at(sy, i) AS a, element_at(sy, i + 1) AS b))"))
        .as("pr"))
      .groupBy(col("pr.a").as("a"), col("pr.b").as("b"))
      .agg(sum(col("c")).as("n"))

  /** Apply the argmax pair of `pairs` (count desc, pair asc — a total tie
    * order, so the learned rule is deterministic) to every word. */
  private def bpeMergeTop(sym: DataFrame, pairs: DataFrame): DataFrame = {
    val top = pairs.orderBy(col("n").desc, col("a"), col("b")).limit(1)
      .select(col("a"), col("b"))
    sym.crossJoin(broadcast(top))
      .select(col("word"), col("c"),
        split(expr("trim(BOTH '|' FROM replace(concat('|', array_join(sy, '||'), '|'), " +
          "concat('|', a, '||', b, '|'), concat('|', a, b, '|')))"), "\\|\\|").as("sy"))
  }

  /** One LITERAL merge (a, b → ab): the corpus alphabet is a–z, so rule
    * tokens interpolate safely as SQL string literals. A literal rewrite
    * is a narrow map — no crossJoin subtree — which keeps a trained
    * chain's lineage linear. */
  private def bpeMergeLit(sym: DataFrame, a: String, b: String): DataFrame =
    sym.select(col("word"), col("c"),
      split(expr("trim(BOTH '|' FROM replace(concat('|', array_join(sy, '||'), '|'), " +
        s"'|$a||$b|', '|$a$b|'))"), "\\|\\|").as("sy"))

  private val bpeModels =
    new scala.collection.concurrent.TrieMap[(SparkSession, String), Seq[(String, String, Long)]]()

  /** The 8-rule BPE model, trained once per (session, data dir) and
    * session-cached — model state collects to the driver by design (the
    * lloydCentroids convention): each round is ONE distributed vocab-sized
    * pair count whose 1-row argmax re-enters the next round as a literal
    * rewrite. Without the collect, round i's plan embeds round i−1's tree
    * twice (argmax + merge) — an exponentially self-referencing plan that
    * measured 12 s at sf0.1 where this trains in ~2 s. */
  private def bpeTrainedRules(s: SparkSession, d: String): Seq[(String, String, Long)] =
    bpeModels.getOrElseUpdate((s, d), {
      val vocab = bpeVocab(s, d).persist()
      try {
        var sym = vocab
        val rules = Seq.newBuilder[(String, String, Long)]
        var exhausted = false
        (1 to 8).foreach { _ =>
          if (!exhausted) {
            // headOption: a degenerate corpus (all words fully merged or
            // 1-symbol) runs out of pairs before round 8 — stop training
            // rather than throw; the oracle's CTE chain goes empty at the
            // same round, so both engines emit the same truncated table.
            bpePairs(sym).orderBy(col("n").desc, col("a"), col("b"))
              .limit(1).collect().headOption match {
              case Some(top) =>
                val (a, b, n) = (top.getString(0), top.getString(1), top.getLong(2))
                sym = bpeMergeLit(sym, a, b)
                rules += ((a, b, n))
              case None => exhausted = true
            }
          }
        }
        rules.result()
      } finally vocab.unpersist()
    })

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Token counting: whitespace tokens, alpha tokens, BPE-ish subword
    // chunks (greedy ≤4-char pieces — same greedy semantics both engines).
    "text_tokens" -> ((s, d) => {
      withWords(Tables.documents(s, d))
        .select(
          col("doc_id"),
          size(col("ws")).as("n_ws_tokens"),
          regexp_count(col("text"), lit("[a-z]+")).as("n_alpha_tokens"),
          regexp_count(col("text"), lit("[a-z]{1,4}")).as("n_subword_chunks"))
        .orderBy(col("doc_id"))
    }),

    // Quality scoring: stopword ratio, punctuation ratio, length prior —
    // the standard pretraining-corpus heuristics.
    "text_quality" -> ((s, d) => {
      scoredDocs(s, d)
        .select(
          col("doc_id"), col("n_tokens"),
          round(col("stop_hits") / col("n_tokens"), 6).as("stopword_ratio"),
          round(col("punct") / length(col("text")), 6).as("punct_ratio"),
          round(col("score"), 6).as("quality_score"))
        .orderBy(col("doc_id"))
    }),

    // Stopword-profile language ID (n-gram heuristic family); emits the
    // guess and whether it matches the labeled lang.
    "text_langid" -> ((s, d) => {
      withWords(Tables.documents(s, d))
        .withColumn("en", hits("en")).withColumn("es", hits("es"))
        .withColumn("de", hits("de")).withColumn("fr", hits("fr"))
        .withColumn("lang_guess",
          when(col("en") > 0 && col("en") >= col("es") && col("en") >= col("de") && col("en") >= col("fr"), "en")
            .when(col("es") > 0 && col("es") >= col("de") && col("es") >= col("fr"), "es")
            .when(col("de") > 0 && col("de") >= col("fr"), "de")
            .when(col("fr") > 0, "fr")
            .otherwise("und"))
        .select(col("doc_id"), col("lang"), col("en"), col("es"), col("de"), col("fr"),
          col("lang_guess"), (col("lang_guess") === col("lang")).as("agrees"))
        .orderBy(col("doc_id"))
    }),

    // Document fingerprinting: full-content hash + minimal shingle hash
    // (the 1-hash degenerate of winnowing — SURVEY.md §2.2 text analysis).
    // Classifier EVALUATION: the language-ID confusion matrix against the
    // ground-truth lang column — per (true, predicted) cell count and the
    // cell's share of its true class (= per-class recall on the diagonal).
    // Composes the EXACT text_langid definition, so this also regression-
    // gates the classifier itself: any scoring change shifts a cell.
    // Scale shape: one narrow scoring pass + one (true, pred) agg — the
    // matrix is |langs|² rows; the share division is the only float op.
    "text_langid_eval" -> ((s, d) => {
      val scored = queries("text_langid")(s, d)
        .select(col("lang"), col("lang_guess"))
      val trueTotals = scored.groupBy(col("lang")).agg(count(lit(1)).as("n_true"))
      scored.groupBy(col("lang"), col("lang_guess")).agg(count(lit(1)).as("n"))
        .join(broadcast(trueTotals), "lang")
        .select(col("lang"), col("lang_guess"), col("n"),
          round(col("n").cast("double") / col("n_true").cast("double"), 6).as("share_of_true"))
        .orderBy(col("lang"), col("lang_guess"))
    }),

    "text_fingerprint" -> ((s, d) => {
      val mins = DedupQueries.shingleRows(s, d)
        .groupBy(col("doc_id"))
        .agg(min(md5(col("sh").cast(BinaryType))).as("msh"))
      Tables.documents(s, d)
        .select(col("doc_id"), md5(col("text").cast(BinaryType)).as("content_hash"))
        .join(mins, Seq("doc_id"), "left")
        .select(col("doc_id"), col("content_hash"),
          coalesce(col("msh"), lit("")).as("min_shingle_hash"))
        .orderBy(col("doc_id"))
    }),

    // Polynomial rolling hash over the character stream (base 131 mod
    // 1e9+7) — the classic content-defined fingerprint primitive; exact
    // integer arithmetic, identical across engines.
    "text_rolling_hash" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          expr("""aggregate(transform(split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
                           0L, (acc, x) -> (acc * 131 + x) % 1000000007)""").as("rolling_hash"))
        .orderBy(col("doc_id"))
    }),

    // Deterministic train/val/test split by content-hash bucket (md5 of the
    // doc id, first byte → 256 buckets: 208/24/24 ≈ 81/9/9%). The
    // reproducible alternative to TABLESAMPLE for corpus assembly: the same
    // doc lands in the same split on any cluster, any partitioning, any day.
    "text_sample_split" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("bucket",
          expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 2), 16, 10) as int)"))
        .withColumn("split",
          when(col("bucket") < 208, "train")
            .when(col("bucket") < 232, "val").otherwise("test"))
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"))
        .orderBy(col("lang"), col("split"))
    }),

    // TF-IDF: top-3 characteristic terms per document. Three hash aggs
    // (doc-term tf, term df, corpus N) + one broadcast of the tiny df/N
    // sides; ranking window partitioned by doc — the shape that holds at
    // corpus scale (df table ≈ vocabulary, broadcastable or bucket-joined).
    "text_tfidf" -> ((s, d) => {
      val tf = withWords(Tables.documents(s, d))
        .select(col("doc_id"), explode(col("ws")).as("term"))
        .filter(length(col("term")) > 0)
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val df_ = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val n = Tables.documents(s, d).agg(count(lit(1)).as("n_total"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("term"))
      tf.join(broadcast(df_), "term")
        .crossJoin(broadcast(n))
        .withColumn("score", col("tf") * log(col("n_total") / col("df")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("doc_id"), col("rn"), col("term"), col("tf"), col("df"),
          round(col("score"), 6).as("tfidf"))
        .orderBy(col("doc_id"), col("rn"))
    }),

    // BM25 ranked retrieval (Robertson k1=1.2, b=0.75) for a fixed query
    // term set — the lexical scorer behind retrieval-based data curation
    // (finding training docs relevant to a target domain, retrieval-
    // augmented filtering). Scale shape: the corpus collapses to per-doc
    // (term, tf) rows FILTERED to the query terms before any shuffle
    // (query terms ≪ vocabulary, so the filter prunes almost everything);
    // df and corpus stats are scalar-sized broadcasts; no corpus shuffle.
    // Determinism: tf/dl/df/N integers; avgdl = one exact-int division;
    // per-(doc,term) score is a fixed-operand-order double expression
    // rounded to 6, and the per-doc sum folds the ≤3 rounded terms in
    // sorted order (text_lm_perplexity's pattern).
    "text_bm25" -> ((s, d) =>
      bm25Of(Tables.documents(s, d), QueryTerms)),

    // Ranking-quality metric: nDCG@10 of the BM25 ranking against a
    // frequency-graded relevance proxy (grade = total query-term
    // occurrences, capped at 15 — graded relevance is conventionally
    // capped; BM25's length normalization makes its ranking genuinely
    // differ from the raw-frequency ideal, so the metric discriminates).
    // DCG = Σ (2^rel − 1)·w_rank
    // summed in rank order; IDCG re-ranks the full graded pool ideally.
    // The log2 discount weights are PRE-COMPUTED ONCE here and embedded
    // as identical double literals in both engines' expressions — the
    // only libm call leaves the query entirely, so there is no
    // platform-log determinism exposure at all. Scale shape: both
    // rankings live on the term-filtered subset (≪ corpus, the bm25
    // shape) and cut to their top-10 by TakeOrdered (per-partition heaps;
    // a common query term can match corpus-scale doc counts, so the
    // cutoff must happen BEFORE any single-partition rank window — the
    // row_number that assigns ranks then runs over exactly 10 rows); the
    // metric itself folds 10 rows.
    "text_ndcg" -> ((s, d) => {
      val pool = withWords(Tables.documents(s, d))
        .select(col("doc_id"), explode(col("ws")).as("term"))
        .filter(col("term").isin(QueryTerms: _*))
        .groupBy(col("doc_id")).agg(least(count(lit(1)), lit(15L)).as("rel"))
      val wArr = typedLit(NdcgW)
      val gain = expr("cast(shiftleft(1, cast(rel as int)) - 1 as double)")
      val ranked = bm25Of(Tables.documents(s, d), QueryTerms)
        .orderBy(col("bm25").desc, col("doc_id")).limit(10)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("bm25").desc, col("doc_id"))))
        .drop("n_match")
        .join(pool, "doc_id") // every retrieved doc has >= 1 term, so inner is total
        .withColumn("contrib", gain * element_at(wArr, col("rank").cast("int")))
      val ideal = pool
        .orderBy(col("rel").desc, col("doc_id")).limit(10)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("rel").desc, col("doc_id"))))
        .withColumn("contrib", gain * element_at(wArr, col("rank").cast("int")))
      def foldSum(df: DataFrame, out: String) = df.agg(
        aggregate(sort_array(collect_list(struct(col("rank"), col("contrib")))),
          lit(0.0), (a, x) => a + x.getField("contrib")).as(out))
      foldSum(ranked, "dcg").crossJoin(foldSum(ideal, "idcg"))
        .select(round(col("dcg"), 6).as("dcg"), round(col("idcg"), 6).as("idcg"),
          round(col("dcg") / col("idcg"), 6).as("ndcg"))
    }),

    // Corpus term frequency: tokenize → explode → hash agg; top 20 terms.
    // PMI collocation mining: top bigrams by pointwise mutual information
    //   pmi(a,b) = ln( P(a,b) / (P(a)·P(b)) )
    // with the joint from adjacent-bigram counts and marginals from
    // unigram counts — the classic corpus-analysis lens for "words that
    // belong together" (multiword expressions, named entities), and the
    // statistic behind phrase-merging in tokenizer/embedding pipelines
    // (word2vec-style phrase detection). A c_ab >= 5 support floor drops
    // the unstable one-off pairs that dominate raw PMI.
    //
    // Scale shape: one tokenize pass feeds both count tables; bigram and
    // unigram counts are VOCABULARY-sized (Zipf-bounded), so the two
    // marginal joins move vocab rows, never the corpus; totals ride a
    // 1-row broadcast. Determinism: the ln argument is assembled with
    // identical operand order on both engines; ordering is on the rounded
    // score with a full lexicographic tiebreak.
    "text_collocations" -> ((s, d) => {
      val toks = withWords(Tables.documents(s, d)).select(col("ws"))
      val uni = toks.select(explode(col("ws")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy(col("w")).agg(count(lit(1)).as("c1"))
      val biAll = toks
        .select(col("ws"), posexplode(col("ws")).as(Seq("i", "a")))
        .filter(col("i") < size(col("ws")) - 1)
        .withColumn("b", element_at(col("ws"), col("i") + 2))
        .filter(length(col("a")) > 0 && length(col("b")) > 0)
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
        .persist() // vocab²-bounded counts; feeds the total AND the kept set
      val bi = biAll.filter(col("c_ab") >= 5)
      // joint and marginal distributions each normalize over their own
      // universe: all valid bigram slots / all nonempty tokens
      val totals = uni.agg(sum(col("c1")).as("n_uni"))
        .crossJoin(biAll.agg(sum(col("c_ab")).as("n_bi")))
      bi.join(uni.withColumnRenamed("w", "a").withColumnRenamed("c1", "c_a"), "a")
        .join(uni.withColumnRenamed("w", "b").withColumnRenamed("c1", "c_b"), "b")
        .crossJoin(broadcast(totals))
        .withColumn("pmi", round(
          log(col("c_ab").cast("double") * col("n_uni") * col("n_uni") /
            (col("n_bi").cast("double") * col("c_a") * col("c_b"))), 6))
        .select(col("a"), col("b"), col("c_ab"), col("c_a"), col("c_b"), col("pmi"))
        .orderBy(col("pmi").desc, col("a"), col("b"))
        .limit(20)
    }),

    // Tokenizer VOCAB-SIZING curve: what fraction of corpus token
    // occurrences the top-k vocabulary covers, at k ∈ {5, 10, 20, 30}
    // (sized to the synthetic corpus's vocab) — the OOV-rate estimate that decides vocab size before BPE
    // training (the complement of coverage is the byte-fallback rate).
    // Scale shape: one corpus tokenize pass collapses to VOCABULARY-sized
    // counts, then a TakeOrdered top-30 (distributed per-partition heaps,
    // never a full-vocab sort through one task — a real vocabulary is
    // millions of terms at corpus scale) feeds the rank window, which
    // therefore runs over exactly 30 rows; the cumulative sum at rank k
    // only reads the top-k rows, so the truncation is exact, and the
    // total rides a 1-row broadcast. Determinism: running sums of exact
    // int64 counts under a full (count desc, term) tiebreak; one division
    // at the end.
    "text_vocab_coverage" -> ((s, d) => {
      val counts = withWords(Tables.documents(s, d))
        .select(explode(col("ws")).as("term")).filter(length(col("term")) > 0)
        .groupBy(col("term")).agg(count(lit(1)).as("c"))
      val ord = Window.orderBy(col("c").desc, col("term"))
      val ranked = counts
        .orderBy(col("c").desc, col("term")).limit(30)
        .withColumn("rk", row_number().over(ord))
        .withColumn("cum", sum(col("c")).over(
          ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val total = counts.agg(sum(col("c")).as("n"))
      ranked.filter(col("rk").isin(5, 10, 20, 30))
        .crossJoin(broadcast(total))
        .select(col("rk").as("vocab_k"), col("cum").as("n_covered"),
          round(col("cum").cast("double") / col("n"), 6).as("coverage"))
        .orderBy(col("vocab_k"))
    }),

    // T5-style SPAN CORRUPTION (Raffel et al.): turn each document into a
    // denoising (input, target) training pair — 3-token spans are replaced
    // by <extra_id_k> sentinels in the input, and the target lists each
    // sentinel followed by the tokens it hid. Spans here are DETERMINISTIC
    // (every 5th 3-token span, i.e. ~20% corruption rate at the T5-paper
    // granularity) so both engines derive identical pairs — production
    // would hash (doc_id, position) for pseudo-randomness with the same
    // narrow-map shape. Scale: pure per-row array arithmetic over the
    // token positions — no shuffle, no state, trivially parallel; exactly
    // the shape a 100 TB pretraining-pair generation job wants.
    "text_span_corrupt" -> ((s, d) => {
      val docs = withWords(Tables.documents(s, d))
        .withColumn("n", size(col("ws")))
      // position p (0-based): span = p div 3; masked ⇔ span % 5 == 0;
      // sentinel id = span div 5 (== p div 15)
      val inputExpr = expr(
        """array_join(filter(transform(sequence(0, n - 1), p ->
             CASE WHEN ((p div 3) % 5) = 0 THEN
               CASE WHEN p % 3 = 0
                 THEN concat('<extra_id_', cast(p div 15 as string), '>')
                 ELSE NULL END
             ELSE element_at(ws, p + 1) END), x -> x IS NOT NULL), ' ')""")
      val targetExpr = expr(
        """array_join(flatten(filter(transform(sequence(0, n - 1), p ->
             CASE WHEN ((p div 3) % 5) = 0 THEN
               CASE WHEN p % 3 = 0
                 THEN array(concat('<extra_id_', cast(p div 15 as string), '>'),
                   element_at(ws, p + 1))
                 ELSE array(element_at(ws, p + 1)) END
             ELSE NULL END), x -> x IS NOT NULL)), ' ')""")
      val nMaskedExpr = expr(
        "size(filter(sequence(0, n - 1), p -> ((p div 3) % 5) = 0))")
      docs.select(col("doc_id"), inputExpr.as("input"), targetExpr.as("target"),
          nMaskedExpr.as("n_masked"))
        .orderBy(col("doc_id"))
    }),

    // Count-Min-Sketch term-frequency estimation (Cormode & Muthukrishnan):
    // the BOUNDED-MEMORY point-frequency path for corpora whose vocabulary
    // no longer fits a hash agg — the sketch is width×depth int64 counters
    // REGARDLESS of corpus size, and Spark's count_min_sketch aggregate
    // merges per-partition sketches map-side (TypedImperativeAggregate
    // partial merge), so the full corpus is one narrow pass + a
    // constant-size all-reduce. Verified with the error-envelope pattern
    // (NOTES #6): for the top-20 exact terms, the one-sided CMS guarantee
    // est ≥ exact must hold ALWAYS, and est ≤ exact + ε·N (ε = 0.001) holds
    // with the sketch's confidence — both emitted as booleans the oracle
    // expects TRUE (deterministic: fixed seed 42, fixed corpus). The exact
    // counts themselves are hash-checked, so the gate carries real content.
    "text_cms_freq" -> ((s, d) => {
      val terms = withWords(Tables.documents(s, d))
        .select(explode(col("ws")).as("term")).filter(length(col("term")) > 0)
      val row = terms.agg(
        count_min_sketch(col("term"), lit(0.001), lit(0.999), lit(42)).as("sk"),
        count(lit(1)).as("n")).head()
      val sketch = org.apache.spark.util.sketch.CountMinSketch
        .readFrom(row.getAs[Array[Byte]](0))
      val nTotal = row.getLong(1)
      val top = terms.groupBy(col("term")).agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("term")).limit(20).collect()
      val checked = top.toSeq.map { r =>
        val t = r.getString(0); val ex = r.getLong(1)
        val est = sketch.estimateCount(t)
        (t, ex, est >= ex, est <= ex + 0.001 * nTotal)
      }
      val spark = s
      import spark.implicits._
      checked.toDF("term", "n_exact", "est_ge_exact", "est_within_eps")
        .orderBy(col("n_exact").desc, col("term"))
    }),

    // TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank over
    // the word co-occurrence graph — vertices are corpus terms, edges
    // connect ADJACENT words (window 2) weighted by corpus-wide
    // co-occurrence count — surfacing the terms most central to the
    // corpus's phrase structure (keyword/keyphrase labeling for curation,
    // topical tagging). Weighted power iteration in the same FIXED-POINT
    // integer arithmetic as dedup_pagerank (1e12-scaled BIGINT ranks,
    // contribution = (rank·w) div weighted-degree, floor division): every
    // op is exact on both engines, so the 6-iteration numeric fixpoint is
    // hash-exact — no float summation-order terms. Scale shape: the graph
    // is VOCABULARY-sized (Zipf-bounded), not corpus-sized — one tokenize
    // pass builds edge counts, then each iteration is one vocab-keyed join
    // + agg; the corpus is scanned exactly once.
    "text_textrank" -> ((s, d) => {
      val toks = withWords(Tables.documents(s, d)).select(col("ws"))
      val adj = toks.select(col("ws"), posexplode(col("ws")).as(Seq("i", "a")))
        .filter(col("i") < size(col("ws")) - 1)
        .withColumn("b", element_at(col("ws"), col("i") + 2))
        .filter(length(col("a")) > 0 && length(col("b")) > 0 && col("a") =!= col("b"))
        .select(col("a"), col("b"))
      // Execution rides Graph.pageRankFP's hybrid: the co-occurrence graph
      // is VOCABULARY-sized (Zipf-bounded), so under 2²⁰ edges the 6
      // weighted rounds fold on the driver in the SAME fixed-point integer
      // arithmetic — the corpus is tokenized exactly ONCE (the edge-list
      // collect), where the previous in-query loop re-tokenized it three
      // times (wdeg.count, the edgesD persist build, r₀'s lineage) and
      // paid 6 join+agg rounds of scheduling on model-sized data; above
      // the threshold the distributed loop runs unchanged.
      val edges = adj.select(col("a").as("s"), col("b").as("t"))
        .unionByName(adj.select(col("b").as("s"), col("a").as("t")))
        .groupBy(col("s"), col("t")).agg(count(lit(1)).as("w"))
      graft.operators.Graph.pageRankFP(edges, "s", "t", Some("w"), 6)
        .select(col("v").as("term"), col("r").cast("long").as("rank_fp"))
        .orderBy(col("rank_fp").desc, col("term")).limit(20)
    }),

    "text_termfreq" -> ((s, d) => {
      withWords(Tables.documents(s, d))
        .select(col("doc_id"), explode(col("ws")).as("term"))
        .filter(length(col("term")) > 0)
        .groupBy(col("term"))
        .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("n_docs"))
        .orderBy(col("n").desc, col("term"))
        .limit(20)
    }),

    // WordPiece INFERENCE (greedy longest-match-first, the BERT tokenizer's
    // runtime algorithm — the subword family's third member next to BPE
    // train/tokenize): the piece vocabulary is corpus-derived (top-30
    // multi-char 2..4-grams by weighted frequency + every single char for
    // totality), and each DISTINCT word greedily consumes its longest
    // matching piece left to right. Production trick mirrored here:
    // tokenize the DICTIONARY, not the corpus — the fold runs once per
    // distinct word (vocab-sized), then broadcast piece lists rejoin the
    // corpus through the word counts. Determinism: longest-match over a
    // (length DESC, piece ASC)-sorted list has no float anywhere. Scale
    // shape: corpus → word counts is the only corpus shuffle; the greedy
    // fold is O(|word| × |vocab|) per DISTINCT word (a real tokenizer
    // swaps the scan for a trie — same output, same plan shape).
    "text_wordpiece" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("f").desc, col("g")) // candidate-gram-vocab-sized
      // NO use-site fanout (r10-opt measured): the corpus→word-count
      // reduction is sub-second at sf0.1 and `words` feeds three branches —
      // a fanout tripled the exchange work (wall 1.2 -> 1.9-2.0 s, CPU
      // 0.3 -> 6.7 s); the r9 loader-fanout negative repeats at use sites
      // whose per-row work is light.
      val words = withWords(Tables.documents(s, d))
        .select(explode(col("ws")).as("w")).filter(length(col("w")) > 0)
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
      val grams = words.select(col("c"), explode(expr(
          """flatten(transform(sequence(2, 4), n ->
               if(length(w) >= n,
                 transform(sequence(1, length(w) - n + 1), i -> substring(w, i, n)),
                 cast(array() as array<string>))))""")).as("g"))
        .groupBy(col("g")).agg(sum(col("c")).as("f"))
      val topk = grams.withColumn("r", row_number().over(w))
        .filter(col("r") <= 30).select(col("g"))
      val chars = words.select(explode(expr(
          "transform(sequence(1, length(w)), i -> substring(w, i, 1))")).as("g"))
        .distinct()
      val vlist = topk.unionByName(chars).distinct()
        .agg(array_sort(collect_list(
          struct((lit(4) - length(col("g"))).as("lk"), col("g").as("p")))).as("vs"))
        .select(expr("transform(vs, x -> x.p)").as("vlist"))
      // the inner transform-over-singleton binds the matched piece ONCE per
      // step (named_struct fields can't reference each other, and Catalyst
      // does not CSE higher-order-function lambdas — without the binding
      // the vocab scan would run twice per position)
      val toks = words.crossJoin(broadcast(vlist))
        .withColumn("ps", expr("""
          aggregate(sequence(1, length(w)),
            named_struct('pos', 1, 'ps', cast(array() as array<string>)),
            (st, _i) -> if(st.pos > length(w), st,
              element_at(transform(
                array(element_at(
                  filter(vlist, p -> substring(w, st.pos, length(p)) = p), 1)),
                x -> named_struct(
                  'pos', st.pos + length(x),
                  'ps', concat(st.ps, array(x)))), 1)),
            st -> st.ps)"""))
      toks.select(col("w"), col("c"), explode(col("ps")).as("piece"))
        .groupBy(col("piece"))
        .agg(countDistinct(col("w")).as("n_words"), sum(col("c")).as("n_uses"))
        .orderBy(col("piece"))
    }),

    // Zipf's-law fit: OLS of ln(freq) on ln(rank) over the rank-frequency
    // distribution — the corpus-statistics diagnostic that tells whether a
    // crawl slice looks like natural language (slope ≈ -1) or like
    // boilerplate/spam (flat head or cliff). Float determinism: the
    // moments are sums of ≤vocab-many ln() products rounded at 4 decimals
    // (engine log/summation-order drift is ~1e-12 — six orders below the
    // rounding grain; same per-row-ln precedent as text_collocations).
    // Scale shape: one corpus explode+agg to vocab-sized counts; the
    // row_number window is VOCAB-sized (domain-bounded, the audited
    // global-window class), and the fit is a 5-number aggregate.
    "text_zipf_fit" -> ((s, d) => {
      val uni = withWords(Tables.documents(s, d))
        .select(explode(col("ws")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy(col("w")).agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("n").desc, col("w")) // vocab-sized: domain-bounded
      val ranked = uni
        .withColumn("r", row_number().over(w))
        .select(log(col("r").cast("double")).as("x"),
          log(col("n").cast("double")).as("y"))
      ranked
        .agg(count(lit(1)).cast("double").as("k"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .withColumn("slope_raw",
          (col("k") * col("sxy") - col("sx") * col("sy")) /
            (col("k") * col("sxx") - col("sx") * col("sx")))
        .select(col("k").cast("long").as("n_terms"),
          round(col("slope_raw"), 4).as("slope"),
          round((col("sy") - col("slope_raw") * col("sx")) / col("k"), 4)
            .as("intercept"),
          round(((col("k") * col("sxy") - col("sx") * col("sy")) *
              (col("k") * col("sxy") - col("sx") * col("sy"))) /
            ((col("k") * col("sxx") - col("sx") * col("sx")) *
              (col("k") * col("syy") - col("sy") * col("sy"))), 4).as("r2"))
    }),

    // Benchmark decontamination: flag training docs sharing any 5-gram with
    // the held-out eval set (docs with doc_id % 97 == 0 stand in for the
    // benchmark). The standard pre-training hygiene step: n-gram overlap
    // against eval suites, run BEFORE training, at corpus scale.
    //
    // Scale shape: the eval set is tiny relative to the corpus, so its
    // distinct-shingle set BROADCASTS; the corpus side stays one narrow
    // scan + explode + broadcast join — no corpus shuffle at all. The final
    // per-doc count is a hash agg keyed by doc_id.
    "text_decontaminate" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("pos"))
      val grams5 = withWords(Tables.documents(s, d))
        .select(col("doc_id"), posexplode(col("ws")).as(Seq("pos", "w0")))
        .withColumn("w1", lead("w0", 1).over(w))
        .withColumn("w2", lead("w0", 2).over(w))
        .withColumn("w3", lead("w0", 3).over(w))
        .withColumn("w4", lead("w0", 4).over(w))
        .filter(col("w4").isNotNull)
        .select(col("doc_id"),
          concat_ws(" ", col("w0"), col("w1"), col("w2"), col("w3"), col("w4")).as("g"))
        .distinct()
      val bench = grams5.filter(col("doc_id") % 97 === 0)
        .select(col("g")).distinct()
      grams5.filter(col("doc_id") % 97 =!= 0)
        .join(broadcast(bench), "g")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_contaminated_grams"))
        .orderBy(col("doc_id"))
    }),

    // Within-document repetition (Gopher-style quality signal): the
    // fraction of 3-gram instances that are repeats of an earlier 3-gram in
    // the same document. High values mark boilerplate/spam. One doc-keyed
    // hash agg over the shingle explode — no cross-doc shuffle.
    "text_repetition" -> ((s, d) => {
      DedupQueries.shingleRows(s, d)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          countDistinct(col("sh")).as("n_distinct"))
        .select(col("doc_id"), col("n_grams"),
          round(lit(1.0) - col("n_distinct") / col("n_grams"), 6).as("rep_ratio"))
        .orderBy(col("doc_id"))
    }),

    // Composite pretraining document gate (C4/Gopher-style): fuse the
    // individual quality signals — language ID, heuristic quality score,
    // within-doc repetition, benchmark contamination — into one keep/drop
    // decision per document, with each criterion exposed for auditing.
    // This is the operator a data pipeline actually runs; the single-signal
    // queries are its diagnostics. Scale shape: union of the constituent
    // shapes — one narrow scoring pass, one doc-keyed shingle agg, one
    // BROADCAST benchmark-gram join, then doc-keyed left joins (no new
    // shuffle class). Thresholds are explicit constants of the operator.
    // Per-document token entropy — the information-theoretic quality
    // signal (templated/boilerplate text scores low, diverse prose high;
    // complements the ratio-based heuristics of text_quality). Float
    // determinism: the per-doc Σ p·ln p folds left-to-right over the
    // SORTED count list on both engines (the DistSql trick applied to an
    // aggregation), so summation order is pinned; ln() differs across
    // libms only in final ulps, absorbed by round-6. Scale shape: one
    // explode + (doc, token) hash agg + doc-keyed agg — same class as
    // text_termfreq.
    "text_entropy" -> ((s, d) => {
      val tf = withWords(Tables.documents(s, d))
        .select(col("doc_id"), explode(col("ws")).as("w"))
        .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("n"))
      tf.groupBy(col("doc_id"))
        .agg(sort_array(collect_list(col("n"))).as("ns"),
          sum(col("n")).as("tot"))
        .select(col("doc_id"),
          round(-aggregate(col("ns"), lit(0.0), (acc, x) =>
            acc + (x.cast("double") / col("tot").cast("double")) *
              log(x.cast("double") / col("tot").cast("double"))), 6)
            .as("entropy"),
          col("tot").as("n_tokens"))
        .orderBy(col("doc_id"))
    }),

    // One-row corpus health report — the dashboard snapshot a pipeline
    // publishes per ingest run: volumes, language/source diversity, and
    // the exact-duplicate footprint. Scale shape: one full-scan agg plus
    // one digest-keyed agg (the dedup shuffle already priced elsewhere);
    // the single ratio is one division of exact integers (round 6), so no
    // float summation-order terms exist.
    "text_corpus_report" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val base = docs.agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("source")).as("n_sources"),
        sum(col("n_chars")).as("total_chars"))
      val dup = docs
        .groupBy(md5(col("text").cast(BinaryType)).as("h"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= 2)
        .agg(coalesce(sum(col("n")), lit(0L)).as("dup_docs"),
          count(lit(1)).as("dup_groups"))
      base.crossJoin(dup)
        .select(col("n_docs"), col("n_langs"), col("n_sources"),
          col("total_chars"),
          round(col("total_chars") / col("n_docs"), 6).as("avg_chars"),
          col("dup_docs"), col("dup_groups"))
    }),

    "text_quality_filter" -> ((s, d) =>
      qualityDecisions(s, d).orderBy(col("doc_id"))),

    // End-to-end curation pipeline: quality gate → exact dedup
    // (first-occurrence-wins among survivors) → deterministic split — the
    // composed run a user executes as ONE job, hash-checked as one result.
    // Each stage is the SAME definition its standalone query uses
    // (qualityDecisions, md5 first-id dedup, the 208/232 hash-bucket
    // split), so the composition cannot drift from the parts. Scale shape:
    // the quality gate is narrow maps + one broadcast contamination join;
    // dedup adds one digest-keyed shuffle over SURVIVORS only (the gate
    // prunes before the expensive stage — pipeline ordering matters at
    // 100 TB); the split is a narrow map.
    "text_pipeline_e2e" -> ((s, d) => {
      val kept = qualityDecisions(s, d).filter(col("keep"))
        .select(col("doc_id"), col("lang_guess"), col("quality_score"))
      val hashes = Tables.documents(s, d)
        .select(col("doc_id"), md5(col("text").cast(BinaryType)).as("h"))
      val wh = org.apache.spark.sql.expressions.Window.partitionBy(col("h"))
      kept.join(hashes, "doc_id")
        .withColumn("first_id", min(col("doc_id")).over(wh))
        .filter(col("doc_id") === col("first_id"))
        .withColumn("bucket",
          expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 2), 16, 10) as int)"))
        .withColumn("split",
          when(col("bucket") < 208, "train")
            .when(col("bucket") < 232, "val").otherwise("test"))
        .select(col("doc_id"), col("lang_guess"), col("quality_score"),
          col("split"))
        .orderBy(col("doc_id"))
    }),

    "text_pipeline_e2e_report" -> ((s, d) => {
      // the pipeline's per-stage attrition report (docs surviving each
      // stage) — the run summary a curation job publishes; derived from
      // the same stage definitions as text_pipeline_e2e.
      val q = qualityDecisions(s, d)
      val kept = q.filter(col("keep"))
      val hashes = Tables.documents(s, d)
        .select(col("doc_id"), md5(col("text").cast(BinaryType)).as("h"))
      val deduped = kept.join(hashes, "doc_id")
        .groupBy(col("h")).agg(min(col("doc_id")).as("doc_id"))
      q.agg(count(lit(1)).as("n_input"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_quality_kept"))
        .crossJoin(broadcast(deduped.agg(count(lit(1)).as("n_deduped"))))
        .select(col("n_input"), col("n_quality_kept"), col("n_deduped"),
          (col("n_quality_kept") - col("n_deduped")).as("n_dup_dropped"))
    }),

    // Pareto frontier over (quality_score, n_tokens) — multi-objective doc
    // selection: keep documents not strictly dominated in BOTH dimensions
    // (a doc is dropped iff some other doc has strictly higher score AND
    // strictly more tokens). The naive dominance test is an O(n²)
    // self-join; this is the scalable sweep: collapse to per-score max
    // tokens (hash agg), one running-max window over DISTINCT scores (rows
    // = |distinct scores| ≪ corpus — the only single-partition step, like
    // q58's bucket-offset pass), then a score-keyed join back. A doc is on
    // the frontier iff the max token count among strictly-higher scores
    // does not exceed its own.
    "text_pareto_frontier" -> ((s, d) => {
      val t = scoredDocs(s, d)
        .select(col("doc_id"), round(col("score"), 6).as("q"), col("n_tokens"))
      val g = t.groupBy(col("q")).agg(max(col("n_tokens")).as("mt"))
      // BOUNDED DOMAIN: scores are round(·, 6) of a [0,1] quality score, so
      // g has at most 10⁶+1 rows at ANY corpus size — a constant, not a
      // function of the data; the partitionless window below sorts only g
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("q").desc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val g2 = g.withColumn("mprev", max(col("mt")).over(w)).select(col("q"), col("mprev"))
      t.join(g2, "q")
        .filter(col("mprev").isNull || col("mprev") <= col("n_tokens"))
        .select(col("doc_id"), col("q").as("quality_score"), col("n_tokens"))
        .orderBy(col("doc_id"))
    }),

    // Deterministic source-weighted mixture (the pretraining data-mixing
    // step): each source gets a sampling weight; a document yields
    // floor(w) full copies plus one more iff its content-hash bucket falls
    // under the fractional part — so a weight of 2.5 repeats every doc
    // twice and half the docs (chosen by hash, not RNG) a third time.
    // Reproducible on any cluster/partitioning (pure function of doc_id),
    // and fully narrow: one map + one bounded explode, no shuffle.
    "text_mixture_sample" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
        .withColumn("w", lit(0.25) +
          (expr("CAST(substring(source, 4) AS INT)") % 8) * lit(0.5))
        .withColumn("base", floor(col("w")))
        .withColumn("bucket", expr(
          "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 1, 1)) - 1) * 16 + " +
          "(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 2, 1)) - 1)"))
        .withColumn("n_copies", (col("base") +
          when(col("bucket") < (col("w") - col("base")) * 256, 1).otherwise(0)).cast("int"))
      docs.filter(col("n_copies") > 0)
        .select(col("doc_id"), col("source"), col("n_copies"),
          explode(expr("sequence(0L, cast(n_copies as long) - 1)")).as("copy_idx"))
        .orderBy(col("doc_id"), col("copy_idx"))
    }),

    // Fixed-budget chunking: split each document into sequential chunks of
    // ≤ 32 tokens (the pre-tokenization step before packing sequences for
    // training). Narrow: one sequence-explode per doc, no shuffle; chunk
    // boundaries are deterministic functions of position, so the operation
    // is reproducible under any partitioning.
    "text_chunks" -> ((s, d) => {
      withWords(Tables.documents(s, d))
        .withColumn("n", size(col("ws")))
        .select(col("doc_id"), col("n"), col("ws"),
          explode(expr("sequence(0, int(ceil(n / 32.0)) - 1)")).as("chunk_id"))
        .select(col("doc_id"), col("chunk_id").cast(LongType).as("chunk_id"),
          least(col("n") - col("chunk_id") * 32, lit(32)).cast(LongType).as("n_tokens"),
          expr("ws[chunk_id * 32]").as("first_token"))
        .orderBy(col("doc_id"), col("chunk_id"))
    }),

    // RAG-style OVERLAPPING chunking (size 32, stride 24 → 8-token
    // overlap): retrieval chunks carry context across boundaries, so the
    // sentence that answers a query isn't severed from its lead-in — the
    // standard retrieval-index preprocessing (vs text_chunks' disjoint
    // training windows; text_pack_* are the packing forms). Chunk starts
    // are 0, 24, 48, …; a trailing start is emitted only while the
    // previous chunk did not already reach the end (i ≤ ceil((n−32)/24) in
    // exact integer arithmetic — no float ceil), so every token is covered
    // exactly once by a chunk's FRESH tail and no fully-contained
    // duplicate chunk exists. Chunks are content-addressed (md5) — the
    // currency dedup and the incremental CDC chunk index share. One
    // narrow explode, no shuffle before the final sort.
    "text_rag_chunks" -> ((s, d) =>
      ragChunksOf(withWords(Tables.documents(s, d)))
        .orderBy(col("doc_id"), col("chunk_id"))),

    // GPT-style sequence packing (concatenate-and-chunk): documents are
    // laid end-to-end in deterministic order and cut into fixed 256-token
    // training sequences; a document may straddle a cut (the standard
    // pretraining packing — zero padding waste). Distributed shape: docs
    // are first bucketed by a content-addressed hash (each bucket packs
    // independently — buckets are the parallel unit at corpus scale), the
    // per-bucket token offset is ONE window cumsum, and each doc explodes
    // into just the sequences it overlaps. Output: per (bucket, seq_id)
    // manifest with doc count and token occupancy (the tail sequence of a
    // bucket may be short).
    "text_pack_sequences" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("bucket")).orderBy(col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      withWords(Tables.documents(s, d))
        .select(col("doc_id"),
          expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 2), 16, 10) as int) % 8")
            .as("bucket"),
          size(col("ws")).cast(LongType).as("n"))
        .withColumn("end_off", sum(col("n")).over(w))
        .withColumn("start_off", col("end_off") - col("n"))
        .select(col("bucket"), col("doc_id"), col("end_off"),
          explode(expr("sequence(bigint(floor(start_off / 256)), bigint(floor((end_off - 1) / 256)))"))
            .as("seq_id"))
        .groupBy(col("bucket"), col("seq_id"))
        .agg(count(lit(1)).as("n_docs"),
          (least(col("seq_id") * 256 + 256, max(col("end_off"))) - col("seq_id") * 256)
            .cast(LongType).as("n_tokens"))
        .orderBy(col("bucket"), col("seq_id"))
    }),

    // Winnowing fingerprints (Schleimer, Wilkerson, Aiken 2003 — the MOSS
    // algorithm): per document, hash every 3-word shingle to a 32-bit int
    // (md5-derived — cross-engine exact), slide a w=4 window over the hash
    // sequence, and keep the minimum of each full window; the distinct
    // selected hashes are the document's fingerprint set. Guarantees any
    // shared run of ≥ w+2 words yields a shared fingerprint — the
    // position-robust exact-substring dedup signal (text_fingerprint's
    // 1-hash form is its degenerate case). Scale shape: one narrow explode
    // + ONE doc-keyed window pass (the same partitioning serves the lead,
    // the count, and the min frames) + a doc-keyed agg. No cross-doc work.
    "text_winnowing" -> ((s, d) => {
      val byDoc = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("pos")
      // fingerprint hash = first 8 hex chars of md5(shingle): fixed-width
      // lowercase hex, so lexicographic MIN ≡ numeric MIN on both engines.
      // NO use-site fanout (r10-opt measured): split+posexplode before the
      // doc-keyed exchange is ~0.4 s CPU at sf0.1; a fanout made it
      // 0.7-0.9 -> 1.1-1.3 s wall / 0.4 -> 6 s CPU.
      val sh = withWords(Tables.documents(s, d))
        .select(col("doc_id"), posexplode(col("ws")).as(Seq("pos", "w0")))
        .withColumn("w1", lead("w0", 1).over(byDoc))
        .withColumn("w2", lead("w0", 2).over(byDoc))
        .filter(col("w2").isNotNull)
        .select(col("doc_id"), col("pos"),
          substring(md5(concat_ws(" ", col("w0"), col("w1"), col("w2"))
            .cast(BinaryType)), 1, 8).as("fh"))
      sh.withColumn("n", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
        .withColumn("wmin", min(col("fh")).over(byDoc.rowsBetween(0, 3)))
        .filter(col("pos") <= col("n") - 4) // full w=4 windows only
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_windows"),
          countDistinct(col("wmin")).as("n_fingerprints"),
          min(col("wmin")).as("min_fp"), max(col("wmin")).as("max_fp"))
        .orderBy(col("doc_id"))
    }),

    // PII detection + redaction (the scrubbing pass every pretraining
    // pipeline runs): count and mask emails, phone numbers, and IPv4
    // addresses, emitting per-class counts plus a hash of the redacted text
    // (so the exact redaction output is gate-checked, not just the counts).
    // The corpus is synthetic word-soup with no natural PII, so the operator
    // runs over a deterministically PII-AUGMENTED view (doc_id-derived
    // contact strings appended to ~1/3, 1/5, 1/7 of docs) — the regex
    // machinery is the real operator; the augmentation only gives it signal.
    // Patterns use the common Java-regex/RE2 subset so both engines match
    // identically. Scale shape: pure narrow map over the scan — no shuffle.
    "text_pii_redact" -> ((s, d) => {
      val email = "[a-z0-9]+@[a-z]+\\.[a-z]+"
      val phone = "\\+1-555-[0-9]{4}"
      val ip = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
      val aug = Tables.documents(s, d).withColumn("aug", concat(col("text"),
        when(col("doc_id") % 3 === 0, concat(lit(" mail user"),
          col("doc_id").cast(StringType), lit("@example.com"))).otherwise(lit("")),
        when(col("doc_id") % 5 === 0, concat(lit(" call +1-555-"),
          lpad((col("doc_id") % 10000).cast(StringType), 4, "0"))).otherwise(lit("")),
        when(col("doc_id") % 7 === 0, concat(lit(" host 10."),
          (col("doc_id") % 256).cast(StringType), lit(".0."),
          (col("doc_id") % 100).cast(StringType))).otherwise(lit(""))))
      val redacted = regexp_replace(regexp_replace(regexp_replace(col("aug"),
        email, "<EMAIL>"), phone, "<PHONE>"), ip, "<IP>")
      aug.select(col("doc_id"),
          regexp_count(col("aug"), lit(email)).as("n_emails"),
          regexp_count(col("aug"), lit(phone)).as("n_phones"),
          regexp_count(col("aug"), lit(ip)).as("n_ips"),
          length(redacted).as("redacted_len"),
          md5(redacted.cast(BinaryType)).as("redacted_hash"))
        .orderBy(col("doc_id"))
    }),

    // Unicode canonicalization (UAX #15) — the prerequisite of every
    // hash-based text operation: the SAME word arriving precomposed
    // ("é" U+00E9) vs decomposed ("e"+U+0301) must dedup/fingerprint
    // identically, and accent-insensitive matching needs a diacritic fold.
    // Runs through the engine's native codegen'd expressions
    // (UnicodeNormalize / StripAccents over JDK java.text.Normalizer —
    // SURVEY §2.2 preference (b), no UDF, stays in whole-stage codegen).
    // The ASCII corpus is deterministically augmented with decomposed
    // suffixes (doc_id-derived) so the normalizer has real work; NFC and
    // folded outputs are hash-gated, lengths prove the recomposition
    // (raw_len − nfc_len = dropped combining marks). Pure narrow map.
    "text_normalize" -> ((s, d) => {
      import graft.functions.TextNormFunctions.{fold_accents, unicode_normalize}
      // decomposed forms (base + combining mark, explicit escapes so no
      // editor/tool ever precomposes them), mirroring the oracle's
      // chr(769)/chr(776)/chr(807) — NFC must do real work
      val suffix = when(col("doc_id") % 3 === 0, lit(" expose\u0301"))
        .when(col("doc_id") % 3 === 1, lit(" u\u0308ber"))
        .otherwise(lit(" garc\u0327on"))
      val aug = Tables.documents(s, d)
        .withColumn("aug", concat(col("text"), suffix))
      val nfc = unicode_normalize(col("aug"), "NFC")
      aug.select(col("doc_id"),
          length(col("aug")).as("raw_len"),
          length(nfc).as("nfc_len"),
          md5(nfc.cast(BinaryType)).as("nfc_hash"),
          md5(fold_accents(col("aug")).cast(BinaryType)).as("folded_hash"))
        .orderBy(col("doc_id"))
    }),

    // Stratified sampling: a deterministic per-language quota (10 docs per
    // lang, ranked by content-addressed hash) — balanced-mixture corpus
    // assembly that reproduces bit-identically on any cluster. The window
    // ranks within each stratum; at scale the same contract runs through
    // the bounded TopKAggregator (operators/TopK.scala) when strata are
    // huge and k is small.
    "text_stratified_sample" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang"))
        .orderBy(md5(col("doc_id").cast(StringType)), col("doc_id"))
      Tables.documents(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 10)
        .select(col("lang"), col("rn"), col("doc_id"))
        .orderBy(col("lang"), col("rn"))
    }),

    // CCNet-style language-model quality score: a unigram LM is fit on the
    // corpus itself and every document is scored by its average negative
    // log-likelihood (nats/token) + perplexity — the classic "does this
    // look like the reference distribution" filter (low ppl ≈ stereotyped,
    // high ppl ≈ noise/OOV-heavy). avg_nll = ln N − (Σ_w k_w·ln c_w)/len,
    // so the only float sum is Σ k·ln c — folded over a SORTED list
    // (text_entropy's determinism trick; equal values commute, so order
    // among ties is irrelevant). Scale shape: two hash aggs (doc-term,
    // term), the vocab-sized LM broadcasts back to the doc-term side, and
    // the scalar N crosses in as one broadcast row — the corpus text is
    // never shuffled, only (doc, term, count) triples.
    "text_lm_perplexity" -> ((s, d) => {
      val tf = withWords(Tables.documents(s, d))
        .select(col("doc_id"), explode(col("ws")).as("w"))
        .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("k"))
      val lm = tf.groupBy(col("w")).agg(sum(col("k")).as("c"))
      val tot = lm.agg(sum(col("c")).as("n_total"))
      tf.join(broadcast(lm), "w")
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(
            col("k").cast("double") * log(col("c").cast("double")))).as("xs"),
          sum(col("k")).as("len"))
        .crossJoin(broadcast(tot))
        .withColumn("avg_nll", log(col("n_total").cast("double")) -
          aggregate(col("xs"), lit(0.0), (a, x) => a + x) / col("len").cast("double"))
        .select(col("doc_id"), col("len").as("n_tokens"),
          round(col("avg_nll"), 6).as("avg_nll"),
          round(exp(col("avg_nll")), 6).as("ppl"))
        .orderBy(col("doc_id"))
    }),

    // Bigram-LM perplexity with add-one smoothing — the context-aware
    // upgrade of text_lm_perplexity's unigram scorer (CCNet uses a real
    // LM; a bigram model is its smallest honest form): per-doc avg
    // negative log-likelihood of P(w1|w0) = (c(w0w1)+1)/(c(w0·)+V), where
    // c(w0·) counts w0 as a bigram PREFIX and V is the unigram vocabulary.
    // Scale shape: the corpus collapses to per-doc bigram counts; the
    // bigram LM (zipf-bounded, ≪ corpus) and prefix counts broadcast
    // back; V crosses as one row. Determinism: all counts integer; the
    // per-doc float sum folds SORTED per-bigram terms; one final division.
    "text_bigram_perplexity" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("pos"))
      val toks = withWords(Tables.documents(s, d))
        .select(col("doc_id"), posexplode(col("ws")).as(Seq("pos", "w0")))
      val bi = toks.withColumn("w1", lead("w0", 1).over(w))
        .filter(col("w1").isNotNull)
        .select(col("doc_id"), col("w0"), col("w1"))
      val dk = bi.groupBy(col("doc_id"), col("w0"), col("w1"))
        .agg(count(lit(1)).as("k"))
      val cb = dk.groupBy(col("w0"), col("w1")).agg(sum(col("k")).as("cb"))
      val cp = bi.groupBy(col("w0")).agg(count(lit(1)).as("cp"))
      val v = toks.agg(countDistinct(col("w0")).as("vsz"))
      dk.join(broadcast(cb), Seq("w0", "w1"))
        .join(broadcast(cp), Seq("w0"))
        .crossJoin(broadcast(v))
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(
            col("k").cast("double") * (log(col("cb").cast("double") + lit(1.0)) -
              log(col("cp").cast("double") + col("vsz").cast("double"))))).as("xs"),
          sum(col("k")).as("n_bigrams"))
        .withColumn("avg_nll", round(
          -aggregate(col("xs"), lit(0.0), (a, x) => a + x) /
            col("n_bigrams").cast("double"), 6))
        .select(col("doc_id"), col("n_bigrams"), col("avg_nll"),
          round(exp(col("avg_nll")), 6).as("ppl"))
        .orderBy(col("doc_id"))
    }),

    // Interpolated Kneser–Ney bigram perplexity (absolute discount
    // D = 0.75) — the smoothing family real LM-based quality filters use
    // (KenLM/CCNet are modified-KN): P(w1|w0) = max(c(w0w1)−D, 0)/c(w0·)
    // + λ(w0)·P_cont(w1), λ(w0) = D·N1+(w0·)/c(w0·), P_cont(w1) =
    // N1+(·w1)/|bigram types|. Scoring the training corpus itself means
    // every scored bigram has c ≥ 1, so the discounted term is positive
    // and the back-off interpolation is exercised on every term. Scale
    // shape: corpus collapses to per-doc bigram counts; the four count
    // tables (cb/cp/N1+pre/N1+post) are vocab-bounded and broadcast; the
    // type total crosses as one row. Determinism: counts integer; p is a
    // fixed-order chain of correctly-rounded double ops on both engines;
    // per-doc terms fold SORTED; one division; round 6.
    "text_kneser_ney" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("pos"))
      val toks = withWords(Tables.documents(s, d))
        .select(col("doc_id"), posexplode(col("ws")).as(Seq("pos", "w0")))
      val bi = toks.withColumn("w1", lead("w0", 1).over(w))
        .filter(col("w1").isNotNull)
        .select(col("doc_id"), col("w0"), col("w1"))
      val dk = bi.groupBy(col("doc_id"), col("w0"), col("w1"))
        .agg(count(lit(1)).as("k"))
      val cb = dk.groupBy(col("w0"), col("w1")).agg(sum(col("k")).as("cb"))
      val cp = bi.groupBy(col("w0")).agg(count(lit(1)).as("cp"))
      val n1pre = cb.groupBy(col("w0")).agg(count(lit(1)).as("n1pre"))
      val n1post = cb.groupBy(col("w1")).agg(count(lit(1)).as("n1post"))
      val nbt = cb.agg(count(lit(1)).as("nbt"))
      val p = (col("cb").cast("double") - lit(0.75)) / col("cp").cast("double") +
        lit(0.75) * col("n1pre").cast("double") / col("cp").cast("double") *
          (col("n1post").cast("double") / col("nbt").cast("double"))
      dk.join(broadcast(cb), Seq("w0", "w1"))
        .join(broadcast(cp), Seq("w0"))
        .join(broadcast(n1pre), Seq("w0"))
        .join(broadcast(n1post), Seq("w1"))
        .crossJoin(broadcast(nbt))
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(col("k").cast("double") * log(p))).as("xs"),
          sum(col("k")).as("n_bigrams"))
        .withColumn("avg_nll", round(
          -aggregate(col("xs"), lit(0.0), (a, x) => a + x) /
            col("n_bigrams").cast("double"), 6))
        .select(col("doc_id"), col("n_bigrams"), col("avg_nll"),
          round(exp(col("avg_nll")), 6).as("ppl"))
        .orderBy(col("doc_id"))
    }),

    // Pseudo-relevance-feedback query expansion (Rocchio/RM flavor): BM25
    // top-10 for the base query is the feedback set; its terms (minus the
    // query's own) rank by feedback-tf × corpus-idf and the top-5 join the
    // query; the corpus re-ranks under the expanded term set. All three
    // stages are the SAME engines the retrieval family already gates
    // (bm25Of / bm25OverTerms), so the expansion loop is fully distributed
    // — the term set travels as a broadcast table, never a driver collect.
    // Scale shape: feedback docs ≪ corpus (left-semi join on 10 ids);
    // candidate terms are feedback-vocab-bounded; corpus df for candidates
    // is one distinct+agg semi-joined down to that vocab; the re-rank is
    // one more bm25 pass. Determinism: weights round 6, ties break on the
    // term; both engines pick identical expansion sets or hash-fail.
    "text_prf_expand" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val fb = bm25Of(docs, QueryTerms)
        .orderBy(col("bm25").desc, col("doc_id")).limit(10)
        .select(col("doc_id"))
      // ONE tokenize pass computes BOTH feedback-term counts and corpus df
      // (previously: one pass for ft, a second + distinct + semi-join for
      // cdf — guide §1.2 "don't compute things twice"). Equivalence: cnt_fb
      // = term occurrences within the 10 feedback docs (the broadcast fb
      // left-join marks them), df = countDistinct(doc_id) ≡ the old
      // distinct-then-count; terms with cnt_fb = 0 were absent from the
      // old ft and are dropped, query terms excluded identically.
      val words = withWords(docs)
        .select(col("doc_id"), explode(col("ws")).as("term"))
        .filter(length(col("term")) > 0)
      val ftcdf = words
        .filter(!col("term").isin(QueryTerms: _*))
        .join(broadcast(fb.withColumn("fbhit", lit(1))), Seq("doc_id"), "left")
        .groupBy(col("term"))
        .agg(sum(when(col("fbhit") === 1, 1L).otherwise(0L)).as("cnt_fb"),
          countDistinct(col("doc_id")).as("df"))
        .filter(col("cnt_fb") > 0)
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val expTerms = ftcdf.crossJoin(broadcast(nDocs))
        .withColumn("wt", round(col("cnt_fb").cast("double") *
          log(lit(1.0) +
            (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
              (col("df").cast("double") + lit(0.5))), 6))
        .orderBy(col("wt").desc, col("term")).limit(5)
        .select(col("term"))
      val allTerms = QueryTerms.toDF("term").unionByName(expTerms)
      bm25OverTerms(docs, allTerms)
        .orderBy(col("bm25").desc, col("doc_id")).limit(20)
    }),

    // DoReMi-flavored domain reweighting — one multiplicative-weights step
    // of the "train on the domains the model finds hard" loop: each
    // source's loss proxy is its average unigram-LM NLL (the corpus-fit LM
    // of text_lm_perplexity aggregated per source), and the next mixture
    // weight is share · exp(η · excess-loss), renormalized. Determinism:
    // all counts integer; the two cross-row float reductions (per-source
    // Σ k·ln c and the final weight normalization) run as SORTED folds —
    // the order-pinned form both engines reproduce bit-for-bit; NLLs round
    // to 6 before entering exp, matching the text_lm_perplexity precedent.
    // Scale shape: two hash aggs (corpus→(source,term), terms→LM) + a
    // broadcast LM join; per-source state is vocab-bounded, sources are
    // few — the driver-sized model update a data-mixing controller runs
    // between epochs.
    "text_domain_reweight" -> ((s, d) => {
      val tf = withWords(Tables.documents(s, d))
        .select(col("source"), explode(col("ws")).as("w"))
        .groupBy(col("source"), col("w")).agg(count(lit(1)).as("k"))
      val lm = tf.groupBy(col("w")).agg(sum(col("k")).as("c"))
      val tot = lm.agg(sum(col("c")).as("n_total"))
      val docs = Tables.documents(s, d)
        .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      val nll = tf.join(broadcast(lm), "w")
        .groupBy(col("source"))
        .agg(sort_array(collect_list(
            col("k").cast("double") * log(col("c").cast("double")))).as("xs"),
          sum(col("k")).as("len"))
        .crossJoin(broadcast(tot))
        .withColumn("avg_nll", round(log(col("n_total").cast("double")) -
          aggregate(col("xs"), lit(0.0), (a, x) => a + x) /
            col("len").cast("double"), 6))
        .select(col("source"), col("avg_nll"))
      val raw = nll
        .crossJoin(broadcast(nll.agg(min(col("avg_nll")).as("min_nll"))))
        .join(docs, "source")
        .crossJoin(broadcast(docs.agg(sum(col("n_docs")).as("nd"))))
        .withColumn("share", round(col("n_docs").cast("double") / col("nd"), 6))
        .withColumn("raw_w",
          col("share") * exp(lit(0.5) * (col("avg_nll") - col("min_nll"))))
      raw.crossJoin(broadcast(raw.agg(
          aggregate(sort_array(collect_list(col("raw_w"))), lit(0.0),
            (a, x) => a + x).as("total"))))
        .select(col("source"), col("n_docs"), col("share"), col("avg_nll"),
          round(col("raw_w") / col("total"), 6).as("new_weight"))
        .orderBy(col("source"))
    }),

    // Tokenizer induction — the first BPE training iteration: corpus-wide
    // counts of adjacent symbol pairs (weighted by word frequency), whose
    // argmax is the first merge rule. The expensive part of BPE training
    // at 100 TB is exactly this count, and it runs here as two hash aggs:
    // word→count first (collapses the corpus to its vocabulary — pair
    // extraction then costs O(vocab·word_len), not O(corpus)), then
    // pair→Σ count. Top-20 with a total tie order (count desc, pair asc)
    // keeps the result deterministic; all-integer arithmetic.
    "text_bpe_merges" -> ((s, d) => {
      val vocab = withWords(Tables.documents(s, d))
        .select(explode(col("ws")).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("c"))
      vocab
        // NB sequence(1, 0) is DESCENDING in Spark — clamp at 1 and drop
        // the empty-second-char pair a 1-char word produces
        .select(col("c"), explode(expr(
          "transform(sequence(1, greatest(length(word) - 1, 1)), " +
            "i -> struct(substring(word, i, 1) AS a, substring(word, i + 1, 1) AS b))"))
          .as("pr"))
        .filter(col("pr.b") =!= "")
        .groupBy(col("pr.a").as("a"), col("pr.b").as("b"))
        .agg(sum(col("c")).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(20)
    }),

    // Corpus-mix drift monitor (the text-side companion of
    // sim_centroid_drift): per-language share of a reference vs a current
    // ingest window (doc_id parity = the deterministic window split) and
    // the absolute share shift — the "did my source mix move" gate a
    // pretraining pipeline runs before each training batch. Shares are
    // one integer-count agg + one division each; no cross-row float
    // summation exists, so round-6 outputs are bit-stable. Scale shape:
    // one two-phase hash agg on (lang, window), then a per-lang pivot of
    // two counts — monitoring cost is O(langs), data cost is one scan.
    "text_dist_drift" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("win", col("doc_id") % 2 === 0)
        .groupBy(col("lang"))
        .agg(sum(when(col("win"), 1L).otherwise(0L)).as("n_ref"),
          sum(when(!col("win"), 1L).otherwise(0L)).as("n_cur"))
        .crossJoin(broadcast(Tables.documents(s, d).agg(
          sum(when(col("doc_id") % 2 === 0, 1L).otherwise(0L)).as("tot_ref"),
          sum(when(col("doc_id") % 2 =!= 0, 1L).otherwise(0L)).as("tot_cur"))))
        .select(col("lang"), col("n_ref"), col("n_cur"),
          round(col("n_ref").cast("double") / col("tot_ref"), 6).as("share_ref"),
          round(col("n_cur").cast("double") / col("tot_cur"), 6).as("share_cur"),
          round(abs(col("n_ref").cast("double") / col("tot_ref") -
            col("n_cur").cast("double") / col("tot_cur")), 6).as("share_shift"))
        .orderBy(col("lang"))
    }),

    // The SECOND BPE training iteration — proves the training loop closes:
    // the round-1 argmax pair (data-derived on BOTH engines, not baked in)
    // is merged into every word's symbol sequence ('|'-separated; the
    // corpus alphabet is a–z so the separator cannot collide), and
    // adjacent-pair counts are recomputed over symbols — the merged token
    // now pairs as ONE unit (e.g. 'm'+'er'), exactly standard BPE.
    // replace() is non-overlapping left-to-right on both engines, which IS
    // the BPE merge rule for self-adjacent pairs. Scale shape: both
    // rounds run on the vocabulary; the argmax is a 1-row broadcast
    // (model state, like the k-means centroids). element_at stays in
    // bounds via the filtered index sequence (ANSI-safe).
    "text_bpe_round2" -> ((s, d) => {
      val sym0 = bpeVocab(s, d)
      bpePairs(bpeMergeTop(sym0, bpePairs(sym0)))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(10)
    }),

    // FULL BPE training, 8 rounds: the complete merge-rule table (round,
    // pair, count) learned iteratively — each round counts adjacent
    // symbol pairs over the current vocabulary segmentation, takes the
    // argmax under the total tie order, and applies it via the
    // boundary-anchored double-separator rewrite, which is safe for
    // ARBITRARY stacked merges (both pattern symbols are anchored on both
    // sides, so multi-char tokens can never false-match; see bpeMergeTop
    // / bpeTrainedRules for the training loop and its driver-collected
    // model state). The oracle unrolls the same 8 rounds as chained CTEs
    // (the dedup_pagerank precedent).
    "text_bpe_train" -> ((s, d) => {
      import s.implicits._
      bpeTrainedRules(s, d).zipWithIndex
        .map { case ((a, b, n), i) => (i + 1, a, b, n) }
        .toDF("round", "a", "b", "n")
        .orderBy(col("round"))
    }),

    // Closes the BPE loop train→apply with the FULL text_bpe_train model:
    // the 8 learned merges apply to the VOCABULARY in training order, and
    // the corpus is then tokenized by broadcasting the word→token-count
    // map over the exploded corpus — the standard shape of tokenizer
    // application at 100 TB: the model (eight 1-row broadcasts) and the
    // per-word rewrite are O(vocab); the corpus crosses the map-side join
    // as narrow (doc_id, word) pairs and is never shuffled except the
    // final doc-keyed agg. All-integer until the one final division.
    "text_bpe_tokenize" -> ((s, d) => {
      var sym = bpeVocab(s, d)
      bpeTrainedRules(s, d).foreach { case (a, b, _) => sym = bpeMergeLit(sym, a, b) }
      val ntok = sym.select(col("word"), size(col("sy")).as("nt"))
      // NO use-site fanout (r10-opt measured): the corpus tokenize pass is
      // 0.2 s CPU steady-state at sf0.1 (the query's median cost is the
      // one-time session-cached BPE training); a fanout exchange made it
      // 0.9 -> 1.4-1.6 s wall / 0.2 -> 4-6 s CPU (text bodies through a
      // round-robin exchange + 32-task scheduling for trivial work).
      withWords(Tables.documents(s, d))
        .select(col("doc_id"), explode(col("ws")).as("word"))
        .join(broadcast(ntok), "word")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"), sum(col("nt")).as("n_tokens"))
        .select(col("doc_id"), col("n_words"), col("n_tokens"),
          round(col("n_tokens").cast("double") / col("n_words"), 6)
            .as("avg_tok_per_word"))
        .orderBy(col("doc_id"))
    }),

    // Dataset export sharding (the "write N balanced training shards"
    // step): each document lands in one of 16 shards by content hash —
    // deterministic on any cluster, stable across reruns, and
    // content-addressed so a re-ingested duplicate lands in the same
    // shard. The report is the per-shard manifest (docs, tokens, chars)
    // plus each shard's load ratio against the ideal 1/16 — the balance
    // gate an export job checks before publishing. One narrow map + one
    // 16-group agg; nothing corpus-sized shuffles except the 16-row cell
    // exchange.
    "text_export_shards" -> ((s, d) => {
      val docs = withWords(Tables.documents(s, d))
        .select(
          (contentHash24(col("text")) % 16).as("shard"),
          size(col("ws")).cast("long").as("n_tok"), col("n_chars"))
      val tot = docs.agg(count(lit(1)).as("total_docs"))
      docs.groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
          sum(col("n_chars")).as("total_chars"))
        .crossJoin(broadcast(tot))
        .select(col("shard"), col("n_docs"), col("n_tokens"), col("total_chars"),
          round(col("n_docs").cast("double") * 16 / col("total_docs"), 6)
            .as("load_ratio"))
        .orderBy(col("shard"))
    }),

    // Sequence packing (the GPT-style pretraining batch layout): documents
    // concatenate in doc_id order and chop into fixed 512-token training
    // sequences; each doc reports its global token offset, the sequences
    // it lands in, and whether it straddles a boundary (the packing-waste
    // / attention-mask signal). The global running offset is the q58
    // two-level prefix sum — per-bucket window sums plus a bucket-offset
    // table that is BUCKET-count sized (broadcast back), so no global
    // single-partition sort ever happens; all arithmetic is integer.
    "text_pack_offsets" -> ((s, d) => {
      // rides the shared DistributedRank operator: FIXED bucket COUNT (64
      // here; width derives from the doc_id range), so the level-2 offset
      // window is O(64) rows at ANY corpus size — the earlier fixed-WIDTH
      // `doc_id div 64` bucketing grew the single-partition offset table
      // with the corpus. Ranks/sums are a pure function of the doc_id
      // order, so the output (and oracle hash) is unchanged.
      val b = withWords(Tables.documents(s, d))
        .select(col("doc_id"), size(col("ws")).cast("long").as("n_tokens"))
        .persist() // 2 longs/doc; three consumers (range agg + both levels)
      graft.operators.DistributedRank.withGlobalRank(
          b, col("doc_id"), Nil, buckets = 64, rankName = "rk",
          runningSums = Seq((col("n_tokens"), "cum")))
        .withColumn("start_offset", col("cum") - col("n_tokens"))
        .withColumn("first_seq", expr("start_offset div 512"))
        .withColumn("last_seq", expr("(start_offset + n_tokens - 1) div 512"))
        .select(col("doc_id"), col("n_tokens"), col("start_offset"),
          col("first_seq"), col("last_seq"),
          (col("first_seq") =!= col("last_seq")).as("crosses_boundary"))
        .orderBy(col("doc_id"))
    }),

    // Exact heavy hitters at bounded memory (the scale twin of
    // text_termfreq, which shuffles the whole vocabulary): pass 1 runs
    // Misra-Gries with k=4096 counters PER PARTITION (mapPartitions is the
    // honest tier here — a decrement-all sketch is per-partition
    // imperative state no Catalyst expression provides); by the averaging
    // argument any term with global count > N/k exceeds n_p/k in some
    // partition, so the union of per-partition candidates covers every
    // such term. Pass 2 recounts ONLY the candidates exactly (broadcast
    // join — the exchange carries candidate terms, ≤ 4096·partitions,
    // instead of the vocabulary), so the top-20 is EXACT and
    // deterministic whenever the 20th count clears the N/k floor — the
    // per-row `above_mg_floor` boolean machine-checks that envelope, q41
    // style, and a silent coverage failure would hash-fail against the
    // oracle's true top-20 anyway. This is how exact frequent-items runs
    // when the vocabulary (URLs, hashes) dwarfs executor memory.
    "text_heavy_hitters" -> ((s, d) => {
      import s.implicits._
      val terms = cachedTerms(s, d)
      val cands = terms.as[String].mapPartitions { it =>
        val k = 4096
        val m = scala.collection.mutable.HashMap.empty[String, Long]
        it.foreach { t =>
          if (m.contains(t)) m(t) += 1L
          else if (m.size < k) m.update(t, 1L)
          else {
            val dead = m.iterator.collect { case (key, 1L) => key }.toList
            m.mapValuesInPlace((_, v) => v - 1L)
            dead.foreach(m.remove)
          }
        }
        m.keysIterator
      }.toDF("term").distinct()
      val tot = terms.agg(count(lit(1)).as("n_total"))
      terms.join(broadcast(cands), "term")
        .groupBy(col("term")).agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(tot))
        .orderBy(col("n").desc, col("term")).limit(20)
        .select(col("term"), col("n"),
          (col("n") * 4096 > col("n_total")).as("above_mg_floor"))
    }),

    // Per-language quality-quantile gating (the CCNet-style "keep the best
    // q% per language" filter): documents rank within their language by
    // the text_quality score (identical float expression both engines —
    // ranking needs only ORDER equality, stricter-than-needed bitwise
    // equality already proven by text_quality's green gate) with doc_id as
    // the total tie-break; keep = rank·10 ≤ n·7, an integer compare. Scale
    // note: the per-lang row_number is one sort-partition per language —
    // fine while languages are many or corpora per language fit a
    // partition spill; at 100 TB the scale path is the q28 pattern (an
    // approx_percentile score threshold per language, broadcast back as a
    // filter), with this exact-rank form as the correctness gate.
    "text_quality_quantile" -> ((s, d) => {
      val scored = scoredDocs(s, d)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("score").desc, col("doc_id"))
      val wc = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
      scored
        .withColumn("rnk", row_number().over(w).cast("long"))
        .withColumn("n_lang", count(lit(1)).over(wc))
        .select(col("doc_id"), col("lang"), col("rnk"), col("n_lang"),
          (col("rnk") * 10 <= col("n_lang") * 7).as("kept"))
        .orderBy(col("doc_id"))
    }),

    // The SCALE path of text_quality_quantile (the promise in its
    // comment, q28-style): instead of ranking every document under a
    // per-language sort partition, compute each language's 30th-percentile
    // score with approx_percentile (t-digest — mergeable, bounded memory,
    // two-phase) and broadcast the thresholds back as a filter. The
    // envelope is machine-checked the q28 way: the kept fraction must land
    // within the envelope band of the 70% target, asserted as booleans the oracle pins
    // to TRUE — a sketch drifting past its bound hash-fails the gate.
    "text_quality_threshold" -> ((s, d) => {
      val scored = scoredDocs(s, d)
      val thr = scored.groupBy(col("lang"))
        .agg(expr("approx_percentile(score, 0.3, 10000)").as("thr"))
      scored.join(broadcast(thr), "lang")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("score") >= col("thr"), 1L).otherwise(0L)).as("kept"))
        .select(col("lang"), col("n_docs"),
          // Envelope with a statistical floor: under ~50 docs the 1/n
          // granularity (and tie mass at the threshold score — duplicate
          // docs tie exactly) can legitimately push the kept fraction
          // past any fixed band, so small languages pass vacuously and
          // the 7.5% band is asserted only where it must hold.
          (col("n_docs") < 50 ||
            abs(col("kept").cast("double") / col("n_docs") - 0.7) <= 0.075)
            .as("kept_frac_in_envelope"))
        .orderBy(col("lang"))
    }),

    // Temperature-based data mixing (the multilingual-pretraining
    // resampling rule, τ = 1/2): target language shares ∝ √(observed
    // share), so minority languages are boosted; each language gets the
    // acceptance rate that moves the corpus toward the target (capped at
    // 1 — this operator only downsamples), and each DOCUMENT gets a
    // deterministic accept/reject by content hash against the rate's
    // 24-bit integer threshold — reproducible on any cluster, any
    // partitioning, no RNG state. Float discipline: √ and ÷ are IEEE
    // correctly-rounded (engine-identical); the one cross-language float
    // SUM folds over a SORTED list; thresholds cross into the comparison
    // as integers. Scale shape: the mixture model is a lang-count agg +
    // a few-row broadcast; the corpus pass is one narrow map + broadcast
    // join — nothing corpus-sized shuffles.
    "text_mix_sample" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_l"))
      val tot = docs.agg(count(lit(1)).as("n_tot"))
      val w = counts.crossJoin(broadcast(tot))
        .withColumn("w_l", sqrt(col("n_l").cast("double") / col("n_tot")))
      val z = w.agg(aggregate(sort_array(collect_list(col("w_l"))),
        lit(0.0), (a, x) => a + x).as("z"))
      val rates = w.crossJoin(broadcast(z))
        .withColumn("r_l",
          least(lit(1.0), col("w_l") / col("z") * col("n_tot") / col("n_l")))
        .select(col("lang"),
          floor(col("r_l") * lit(16777216)).cast("long").as("thr"))
      docs.select(col("doc_id"), col("lang"),
          contentHash24(col("text")).as("h"))
        .join(broadcast(rates), "lang")
        .select(col("doc_id"), col("lang"), (col("h") < col("thr")).as("accepted"))
        .orderBy(col("doc_id"))
    }),

    // Within-document repetition signals (the Gopher/MassiveText quality
    // gates): fraction of 2-gram occurrences whose 2-gram repeats inside
    // the doc, and the share of the single most frequent 2-gram. The flag
    // thresholds (dup ≥ 30%, top ≥ 10%) compare INTEGERS (n·10 ≥ total·3)
    // so no float crosses the gate — the rounded fractions are display
    // only. Scale shape: one (doc, 2-gram) hash agg + one doc agg, both
    // two-phase; the corpus text never shuffles, only (doc, gram, count)
    // triples — and a repetitive doc cannot skew a partition because its
    // triples collapse map-side first.
    "text_repetition_filter" -> ((s, d) => {
      val tf2 = withWords(Tables.documents(s, d))
        .select(col("doc_id"), explode(expr(
          "transform(filter(sequence(1, greatest(size(ws) - 1, 1)), i -> i < size(ws)), " +
            "i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))")).as("g2"))
        .groupBy(col("doc_id"), col("g2")).agg(count(lit(1)).as("c"))
      tf2.groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_2grams"),
          sum(when(col("c") > 1, col("c")).otherwise(0L)).as("n_dup_occ"),
          max(col("c")).as("top_c"))
        .select(col("doc_id"), col("n_2grams"),
          round(col("n_dup_occ").cast("double") / col("n_2grams"), 6)
            .as("frac_dup_2gram"),
          round(col("top_c").cast("double") / col("n_2grams"), 6)
            .as("frac_top_2gram"),
          (col("n_dup_occ") * 10 >= col("n_2grams") * 3 ||
            col("top_c") * 10 >= col("n_2grams")).as("flag_repetitive"))
        .orderBy(col("doc_id"))
    }),

    // Line-level dedup (the FineWeb/RefinedWeb within-corpus boilerplate
    // scrub — removes repeated PASSAGES while keeping the documents): the
    // corpus is cut into deterministic 32-token chunks (the corpus has no
    // sentence punctuation, so chunking IS the line proxy), each chunk
    // occurrence after the first — ordered by (doc_id, position) — is
    // dropped, and every document is rebuilt from its kept chunks in
    // order. Output pins the reconstruction by md5, so a wrong drop or a
    // reordered rebuild hash-fails. Scale shape: one shuffle on the chunk
    // text (the first-occurrence window) + one doc-keyed agg; chunk rows
    // carry ~32 tokens each, so the shuffle is corpus-sized but narrow —
    // the standard shape of passage-level dedup (hash the chunk instead
    // of shipping its text when bytes dominate).
    // CONTENT-DEFINED chunking (the Rabin/FastCDC family, word-grained):
    // a chunk boundary falls after any word whose polynomial hash ≡ 0
    // mod 16, so boundaries derive from content alone — inserting a word
    // shifts only its own chunk, not every chunk after it (the property
    // fixed-size chunking lacks, and the reason storage/near-dup systems
    // chunk this way). Per doc: chunk census + how many of its chunks
    // recur elsewhere in the corpus + an order-pinned digest of the chunk
    // sequence. Scale shape: one narrow posexplode + ONE doc-keyed window
    // (boundary cumsum) + hash aggs keyed on (doc, chunk) and chunk_hash —
    // chunk text never joins, only 16-byte hashes shuffle.
    "text_cdc_chunks" -> ((s, d) => {
      val wordHash = expr(
        """aggregate(transform(split(word, ''), c -> CAST(ascii(c) AS BIGINT)),
                     0L, (acc, x) -> (acc * 131 + x) % 1000000007)""")
      val wp = withWords(Tables.documents(s, d))
        .select(col("doc_id"), posexplode(col("ws")).as(Seq("pos", "word")))
        .filter(length(col("word")) > 0)
        .withColumn("h", wordHash)
      val wPrev = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("pos"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val chunks = wp
        .withColumn("chunk_id", coalesce(
          sum(when(col("h") % 16 === 0, 1L).otherwise(0L)).over(wPrev), lit(0L)))
        .groupBy(col("doc_id"), col("chunk_id"))
        .agg(sort_array(collect_list(struct(col("pos"), col("word")))).as("wpz"))
        .select(col("doc_id"), col("chunk_id"), size(col("wpz")).as("n_words"),
          md5(expr("cast(array_join(transform(wpz, x -> x.word), ' ') as binary)"))
            .as("chunk_hash"))
      val occ = chunks.groupBy(col("chunk_hash")).agg(count(lit(1)).as("n_occ"))
      chunks.join(occ, "chunk_hash")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          max(col("n_words")).as("max_chunk_words"),
          sum(when(col("n_occ") > 1, 1L).otherwise(0L)).as("n_shared_chunks"),
          md5(expr("cast(array_join(transform(" +
              "sort_array(collect_list(struct(chunk_id, chunk_hash))), " +
              "x -> x.chunk_hash), '') as binary)")).as("chunks_digest"))
        .orderBy(col("doc_id"))
    }),

    "text_chunk_dedup" -> ((s, d) => {
      val ch = withWords(Tables.documents(s, d))
        .withColumn("n", size(col("ws")))
        .select(col("doc_id"), col("ws"),
          explode(expr("sequence(0, int(ceil(n / 32.0)) - 1)")).as("ci"))
        .select(col("doc_id"), col("ci").cast(LongType).as("ci"),
          expr("array_join(slice(ws, ci * 32 + 1, 32), ' ')").as("chunk"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("chunk")).orderBy(col("doc_id"), col("ci"))
      ch.withColumn("keep", row_number().over(w) === 1)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
          md5(expr("cast(array_join(transform(filter(" +
              "sort_array(collect_list(struct(ci, keep, chunk))), " +
              "x -> x.keep), x -> x.chunk), ' ') as binary)"))
            .as("cleaned_md5"))
        .orderBy(col("doc_id"))
    }),

    // HYBRID retrieval with reciprocal-rank fusion (Cormack/Clarke RRF,
    // k=60): the lexical BM25 top-50 (text_bm25's exact engine) fused
    // with the dense cosine top-50 for one query embedding (vec_id 3 —
    // documents and embeddings are 1:1 by id). score(d) = Σ_lists
    // 1/(60 + rank_list(d)), absent lists contribute 0 — the standard
    // lexical+vector fusion a retrieval stack runs over this corpus.
    // Scale shape: each list is already a bounded top-k (BM25 ends in
    // TakeOrdered; the dense side is ONE broadcast query row against a
    // corpus scan collapsed by TakeOrderedAndProject) — fusion joins two
    // 50-row frames, never the corpus. Determinism: ranks are integers;
    // the RRF score adds two correctly-rounded double divisions in a
    // fixed order — identical on both engines.
    "text_hybrid_retrieval" -> ((s, d) => {
      val vecs = Tables.embeddings(s, d).select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("emb"))
      rrfFused(
        lexRanksOf(Tables.documents(s, d), QueryTerms),
        denseRanksOf(vecs, 3L))
    }),

    // DSIR-style data selection (Xie et al. 2023, arXiv:2302.03169):
    // importance RESAMPLING in a hashed-unigram feature space. Target =
    // the corpus's 'en' slice (the domain to match); raw = the whole
    // corpus. A document's importance weight is Σ_b n_d(b) ·
    // [ln p_tgt(b) − ln p_raw(b)] over B = 64 md5-hashed buckets
    // (add-one smoothed); selection is Gumbel top-k — key = log-weight
    // + Gumbel noise from an md5-uniform — the paper's resampling
    // scheme made deterministic by a content-hash uniform. Scale
    // shape: corpus → per-(doc, bucket) counts (one doc-keyed hash
    // agg); both LMs are ≤64-row aggregates broadcast back; the
    // per-doc fold sorts its ≤64 terms before summing; selection is
    // TakeOrdered top-100. Nothing wide ever carries text.
    "text_dsir_sample" -> ((s, d) => {
      val toks = withWords(Tables.documents(s, d))
        .select(col("doc_id"), col("lang"), explode(col("ws")).as("w"))
        .filter(length(col("w")) > 0)
        .withColumn("b",
          conv(substring(md5(col("w").cast(BinaryType)), 1, 6), 16, 10)
            .cast("long") % 64)
      val perDoc = toks.groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("n"))
      val raw = toks.groupBy(col("b")).agg(count(lit(1)).as("cr"))
      val tgt = toks.filter(col("lang") === "en")
        .groupBy(col("b")).agg(count(lit(1)).as("ct"))
      val tot = toks.agg(count(lit(1)).as("nr"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("nt"))
      val lm = raw.join(tgt, Seq("b"), "left").crossJoin(tot)
        .select(col("b"), round(
          log((coalesce(col("ct"), lit(0L)).cast("double") + lit(1.0)) /
            (col("nt").cast("double") + lit(64.0))) -
            log((col("cr").cast("double") + lit(1.0)) /
              (col("nr").cast("double") + lit(64.0))), 6).as("lr"))
      perDoc.join(broadcast(lm), "b")
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(col("n").cast("double") * col("lr"))).as("xs"),
          sum(col("n")).as("n_tokens"))
        .withColumn("log_w", aggregate(col("xs"), lit(0.0), (a, x) => a + x))
        .withColumn("u",
          (conv(substring(md5(col("doc_id").cast("string").cast(BinaryType)), 1, 6), 16, 10)
            .cast("double") + lit(1.0)) / lit(16777217.0))
        .withColumn("skey", round(col("log_w") - log(-log(col("u"))), 6))
        .orderBy(col("skey").desc, col("doc_id")).limit(100)
        .select(col("doc_id"), col("n_tokens"),
          round(col("log_w"), 6).as("log_w"), col("skey"))
    }))

  /** Shared overlapping-chunk expansion (size 32, stride 24) over any
    * frame carrying (doc_id, ws): the engine of text_rag_chunks and the
    * CDC-maintained chunk index (cdc_incremental_chunks). */
  private[graft] def ragChunksOf(docs: DataFrame): DataFrame =
    docs
      .withColumn("n", size(col("ws")))
      .withColumn("maxi",
        when(col("n") <= 32, lit(0)).otherwise(expr("(n - 32 + 23) div 24")))
      .select(col("doc_id"), col("ws"), col("n"),
        explode(expr("sequence(0, maxi)")).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id").cast(LongType).as("chunk_id"),
        (col("chunk_id") * 24).cast(LongType).as("start_tok"),
        least(col("n") - col("chunk_id") * 24, lit(32)).cast(LongType).as("n_tokens"),
        md5(expr("array_join(slice(ws, chunk_id * 24 + 1, 32), ' ')")).as("chunk_md5"))

  /** DuckDB twin of [[ragChunksOf]] over any `(doc_id, text)` source. */
  private[queries] def ragChunkSql(docsSrc: String): String =
    s"""WITH src AS ($docsSrc),
       d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM src),
       n AS (SELECT doc_id, ws, len(ws) AS nt FROM d),
       c AS (
         SELECT doc_id, ws, nt,
           unnest(range(0,
             1 + CASE WHEN nt <= 32 THEN 0 ELSE (nt - 32 + 23) // 24 END)) AS chunk_id
         FROM n)
       SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
         CAST(chunk_id * 24 AS BIGINT) AS start_tok,
         CAST(least(nt - chunk_id * 24, 32) AS BIGINT) AS n_tokens,
         md5(array_to_string(ws[chunk_id * 24 + 1 : chunk_id * 24 + 32], ' ')) AS chunk_md5
       FROM c ORDER BY doc_id, chunk_id"""

  private val WsSql = "string_split(text, ' ')"

  /** Shared BPE oracle scaffolding: weighted vocab + the double-separator
    * symbol string s0 (`|a||b||c|`; see bpeMergeTop for why the double
    * separator is the boundary-safe form). */
  private val BpeBaseSql =
    """vocab AS (
           SELECT w AS word, COUNT(*) AS c
           FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
           GROUP BY w),
         s0 AS (
           SELECT word, c,
             '|' || array_to_string(string_split(word, ''), '||') || '|' AS s
           FROM vocab)"""

  /** `n` chained BPE training rounds (r_i pair counts, top_i argmax under
    * the total tie order, s_i merged segmentation), CTE-unrolled. */
  private def bpeRoundsSql(n: Int): String = (1 to n).map { i =>
    s"""r$i AS (
             SELECT sy[CAST(j AS INT)] AS a, sy[CAST(j AS INT) + 1] AS b,
               CAST(SUM(c) AS BIGINT) AS n
             FROM (SELECT string_split(trim(s, '|'), '||') AS sy, c FROM s${i - 1}),
               unnest(range(1, len(sy))) t(j)
             GROUP BY 1, 2),
           top$i AS (SELECT a, b, n FROM r$i ORDER BY n DESC, a, b LIMIT 1),
           s$i AS (
             SELECT word, c,
               replace(s, '|' || a || '||' || b || '|', '|' || a || b || '|') AS s
             FROM s${i - 1} CROSS JOIN top$i)"""
  }.mkString(",\n         ")
  private val ShinglesSql =
    "list_transform(range(1, greatest(len(ws)-1, 1)), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])"

  /** Hybrid-retrieval oracle SQL over arbitrary (doc_id, text) and
    * (vec_id, embedding) subqueries — the one DuckDB twin of
    * lexRanksOf → denseRanksOf → rrfFused, shared by
    * text_hybrid_retrieval and cdc_hybrid_serving. */
  private[queries] def hybridSql(corpusSql: String, embSql: String): String =
    s"""WITH lexb AS (${bm25Sql(corpusSql)}),
         lex AS (
           SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS INT) AS lex_rank
           FROM lexb),
         esurv AS ($embSql),
         q AS (SELECT embedding AS q_emb FROM esurv WHERE vec_id = 3),
         dense0 AS (
           SELECT e.vec_id AS doc_id,
             ${SimilarityQueries.cosSql("e.embedding", "q.q_emb")} AS cos
           FROM esurv e CROSS JOIN q WHERE e.vec_id <> 3
           ORDER BY cos DESC, e.vec_id LIMIT 50),
         dense AS (
           SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS INT) AS dense_rank
           FROM dense0),
         fused AS (
           SELECT COALESCE(l.doc_id, dn.doc_id) AS doc_id, l.lex_rank, dn.dense_rank,
             COALESCE(1.0 / (60 + l.lex_rank), 0.0)
               + COALESCE(1.0 / (60 + dn.dense_rank), 0.0) AS rrf
           FROM lex l FULL OUTER JOIN dense dn ON l.doc_id = dn.doc_id)
         SELECT doc_id, lex_rank, dense_rank, round(rrf, 6) AS rrf_score
         FROM fused ORDER BY rrf DESC, doc_id LIMIT 20"""

  /** BM25 oracle SQL over an arbitrary (doc_id, text) corpus subquery —
    * [[bm25Of]]'s DuckDB twin, shared by text_bm25 and cdc_bm25_serving;
    * `termsPred` swaps the query-term membership test (text_prf_expand
    * filters against its expansion CTE instead of the literal list). */
  private[queries] def bm25Sql(
      corpusSql: String,
      termsPred: String = s"term IN ($QueryTermsSql)"): String =
    s"""WITH corpus AS ($corpusSql),
         dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM corpus),
         st AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dl),
         tf AS (
           SELECT doc_id, term, COUNT(*) AS tf
           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM corpus) t
           WHERE $termsPred
           GROUP BY doc_id, term),
         dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
         sc AS (
           SELECT tf.doc_id,
             ROUND(
               ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                        / (CAST(df AS DOUBLE) + 0.5))
               * (CAST(tf AS DOUBLE) * 2.2)
               / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE)
                   / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))), 6) AS ts
           FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN st)
         SELECT doc_id, COUNT(*) AS n_match,
           ROUND(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_sort(list(ts))), (a, x) -> a + x), 6) AS bm25
         FROM sc GROUP BY doc_id
         ORDER BY bm25 DESC, doc_id LIMIT 50"""

  /** The full keep/drop decision SELECT of text_quality_filter (nested
    * WITH — usable as a CTE body or derived table); the one SQL twin of
    * [[qualityDecisions]], shared by the standalone oracle and both
    * text_pipeline_e2e oracles. */
  private lazy val QualityDecSql: String =
    s"""WITH t AS (SELECT doc_id, lang, text, $WsSql AS ws FROM documents),
         sc AS (
           SELECT doc_id, len(ws) AS n_tokens, ${hitsSql("en")} AS stop_hits,
             len(regexp_extract_all(text, '[.,;:!?]')) AS punct,
             ${hitsSql("en")} AS en, ${hitsSql("es")} AS es,
             ${hitsSql("de")} AS de, ${hitsSql("fr")} AS fr, text
           FROM t),
         sc2 AS (
           SELECT doc_id,
             CASE WHEN en > 0 AND en >= es AND en >= de AND en >= fr THEN 'en'
                  WHEN es > 0 AND es >= de AND es >= fr THEN 'es'
                  WHEN de > 0 AND de >= fr THEN 'de'
                  WHEN fr > 0 THEN 'fr' ELSE 'und' END AS lang_guess,
             round(stop_hits / n_tokens * 0.5 + (1.0 - punct / length(text)) * 0.3
                   + least(n_tokens / 100.0, 1.0) * 0.2, 6) AS quality_score
           FROM sc),
         rep AS (
           SELECT doc_id,
             round(1.0 - len(list_distinct(sh)) / len(sh), 6) AS rep_ratio
           FROM (SELECT doc_id, $ShinglesSql AS sh FROM t WHERE len(ws) >= 3) r),
         g AS (
           SELECT DISTINCT doc_id, unnest(list_transform(range(1, greatest(len(ws)-3, 1)),
             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])) AS g
           FROM t),
         bench AS (SELECT DISTINCT g FROM g WHERE doc_id % 97 = 0),
         cont AS (SELECT DISTINCT doc_id FROM g JOIN bench USING (g) WHERE doc_id % 97 <> 0)
         SELECT doc_id, lang_guess, quality_score, rep_ratio, contaminated,
           (lang_guess <> 'und' AND quality_score >= 0.42 AND rep_ratio <= 0.02
            AND NOT contaminated AND doc_id % 97 <> 0) AS keep
         FROM (
           SELECT s.doc_id, s.lang_guess, s.quality_score,
             COALESCE(rep.rep_ratio, 0.0) AS rep_ratio,
             (cont.doc_id IS NOT NULL) AS contaminated
           FROM sc2 s
           LEFT JOIN rep ON s.doc_id = rep.doc_id
           LEFT JOIN cont ON s.doc_id = cont.doc_id)"""

  val oracleSql: Map[String, String] = Map(
    "text_bpe_round2" ->
      """WITH vocab AS (
           SELECT w AS word, COUNT(*) AS c
           FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
           GROUP BY w),
         r1 AS (
           SELECT word[CAST(i AS INT)] AS a, word[CAST(i AS INT) + 1] AS b,
             CAST(SUM(c) AS BIGINT) AS n
           FROM vocab, unnest(range(1, len(word))) t(i)
           GROUP BY 1, 2),
         top1 AS (SELECT a, b FROM r1 ORDER BY n DESC, a, b LIMIT 1),
         sym AS (
           SELECT replace(array_to_string(string_split(word, ''), '|'),
             a || '|' || b, a || b) AS s, c
           FROM vocab CROSS JOIN top1),
         r2 AS (
           SELECT sy[CAST(i AS INT)] AS a, sy[CAST(i AS INT) + 1] AS b,
             CAST(SUM(c) AS BIGINT) AS n
           FROM (SELECT string_split(s, '|') AS sy, c FROM sym),
             unnest(range(1, len(sy))) t(i)
           GROUP BY 1, 2)
         SELECT a, b, n FROM r2 ORDER BY n DESC, a, b LIMIT 10""",

    // 8 unrolled training rounds over the double-separator symbol form.
    "text_bpe_train" -> {
      val tops = (1 to 8).map(i =>
        s"SELECT $i AS round, a, b, n FROM top$i").mkString("\n         UNION ALL ")
      s"""WITH $BpeBaseSql,
         ${bpeRoundsSql(8)}
         SELECT * FROM ($tops) t ORDER BY round"""
    },

    // Tokenize with the full 8-rule trained model (same round chain as
    // text_bpe_train; the pattern '|a||b|' anchors both symbol boundaries).
    "text_bpe_tokenize" ->
      s"""WITH $BpeBaseSql,
         ${bpeRoundsSql(8)},
         nt AS (SELECT word, len(string_split(trim(s, '|'), '||')) AS nt FROM s8),
         dw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
         SELECT doc_id, COUNT(*) AS n_words, CAST(SUM(nt) AS BIGINT) AS n_tokens,
           ROUND(CAST(SUM(nt) AS DOUBLE) / COUNT(*), 6) AS avg_tok_per_word
         FROM dw JOIN nt USING (word)
         GROUP BY doc_id ORDER BY doc_id""",

    "text_export_shards" ->
      s"""WITH s AS (
           SELECT $Hash24Sql % 16 AS shard,
             len(string_split(text, ' ')) AS n_tok, n_chars
           FROM documents),
         t AS (SELECT COUNT(*) AS total_docs FROM s)
         SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           ROUND(CAST(COUNT(*) AS DOUBLE) * 16 / total_docs, 6) AS load_ratio
         FROM s CROSS JOIN t
         GROUP BY shard, total_docs ORDER BY shard""",

    "text_pack_offsets" ->
      """WITH w AS (
           SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents),
         b AS (SELECT doc_id, n_tokens, doc_id // 64 AS bucket FROM w),
         r AS (
           SELECT doc_id, n_tokens, bucket,
             COALESCE(SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS run_in
           FROM b),
         t AS (SELECT bucket, SUM(n_tokens) AS tot FROM b GROUP BY bucket),
         o AS (
           SELECT bucket, COALESCE(SUM(tot) OVER (ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
           FROM t)
         SELECT r.doc_id, CAST(r.n_tokens AS BIGINT) AS n_tokens,
           CAST(o.off + r.run_in AS BIGINT) AS start_offset,
           CAST((o.off + r.run_in) // 512 AS BIGINT) AS first_seq,
           CAST((o.off + r.run_in + r.n_tokens - 1) // 512 AS BIGINT) AS last_seq,
           ((o.off + r.run_in) // 512 <> (o.off + r.run_in + r.n_tokens - 1) // 512)
             AS crosses_boundary
         FROM r JOIN o USING (bucket)
         ORDER BY r.doc_id""",

    "text_heavy_hitters" ->
      """WITH t AS (
           SELECT w AS term
           FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
           WHERE length(w) > 0),
         n AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM t GROUP BY term),
         tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM t)
         SELECT term, n, (n * 4096 > n_total) AS above_mg_floor
         FROM n CROSS JOIN tot
         ORDER BY n DESC, term LIMIT 20""",

    "text_quality_threshold" ->
      """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           TRUE AS kept_frac_in_envelope
         FROM documents GROUP BY lang ORDER BY lang""",

    "text_quality_quantile" ->
      s"""WITH sc AS (
           SELECT doc_id, lang,
             stop_hits / n_tokens * 0.5 + (1.0 - punct / length(text)) * 0.3
               + least(n_tokens / 100.0, 1.0) * 0.2 AS score
           FROM (SELECT doc_id, lang, text, len(ws) AS n_tokens,
                   ${hitsSql("en")} AS stop_hits,
                   len(regexp_extract_all(text, '[.,;:!?]')) AS punct
                 FROM (SELECT doc_id, lang, text, $WsSql AS ws FROM documents) t) t2),
         r AS (
           SELECT doc_id, lang,
             CAST(ROW_NUMBER() OVER (PARTITION BY lang
               ORDER BY score DESC, doc_id) AS BIGINT) AS rnk,
             CAST(COUNT(*) OVER (PARTITION BY lang) AS BIGINT) AS n_lang
           FROM sc)
         SELECT doc_id, lang, rnk, n_lang, (rnk * 10 <= n_lang * 7) AS kept
         FROM r ORDER BY doc_id""",

    "text_mix_sample" ->
      s"""WITH c AS (SELECT lang, COUNT(*) AS n_l FROM documents GROUP BY lang),
         t AS (SELECT COUNT(*) AS n_tot FROM documents),
         w AS (SELECT lang, n_l, n_tot,
                 sqrt(CAST(n_l AS DOUBLE) / n_tot) AS w_l
               FROM c CROSS JOIN t),
         z AS (SELECT list_reduce(list_sort(list(w_l)), (a, b) -> a + b) AS z
               FROM w),
         r AS (SELECT lang,
                 CAST(floor(least(1.0, w_l / z * n_tot / n_l) * 16777216)
                   AS BIGINT) AS thr
               FROM w CROSS JOIN z)
         SELECT d.doc_id, d.lang,
           ${Hash24Sql.replace("md5(text)", "md5(d.text)")} < r.thr
             AS accepted
         FROM documents d JOIN r USING (lang)
         ORDER BY d.doc_id""",

    "text_repetition_filter" ->
      """WITH tf2 AS (
           SELECT doc_id, g2, COUNT(*) AS c
           FROM (
             SELECT doc_id,
               ws[CAST(i AS INT)] || ' ' || ws[CAST(i AS INT) + 1] AS g2
             FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
               unnest(range(1, len(ws))) t(i))
           GROUP BY doc_id, g2),
         agg AS (
           SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_2grams,
             CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS n_dup_occ,
             CAST(MAX(c) AS BIGINT) AS top_c
           FROM tf2 GROUP BY doc_id)
         SELECT doc_id, n_2grams,
           ROUND(CAST(n_dup_occ AS DOUBLE) / n_2grams, 6) AS frac_dup_2gram,
           ROUND(CAST(top_c AS DOUBLE) / n_2grams, 6) AS frac_top_2gram,
           (n_dup_occ * 10 >= n_2grams * 3 OR top_c * 10 >= n_2grams)
             AS flag_repetitive
         FROM agg ORDER BY doc_id""",

    "text_dist_drift" ->
      """WITH t AS (
           SELECT CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tot_ref,
             CAST(SUM(CASE WHEN doc_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS tot_cur
           FROM documents),
         g AS (
           SELECT lang,
             CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
             CAST(SUM(CASE WHEN doc_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
           FROM documents GROUP BY lang)
         SELECT lang, n_ref, n_cur,
           round(CAST(n_ref AS DOUBLE) / tot_ref, 6) AS share_ref,
           round(CAST(n_cur AS DOUBLE) / tot_cur, 6) AS share_cur,
           round(abs(CAST(n_ref AS DOUBLE) / tot_ref - CAST(n_cur AS DOUBLE) / tot_cur), 6)
             AS share_shift
         FROM g CROSS JOIN t ORDER BY lang""",

    "text_cdc_chunks" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         wp AS (
           SELECT doc_id, CAST(i AS BIGINT) AS pos, ws[CAST(i AS INT)] AS word
           FROM w, unnest(range(1, len(ws) + 1)) AS t(i)
           WHERE length(ws[CAST(i AS INT)]) > 0),
         h AS (
           SELECT doc_id, pos, word,
             list_reduce(list_prepend(0::BIGINT,
               list_transform(string_split(word, ''), c -> ord(c)::BIGINT)),
               (acc, x) -> (acc * 131 + x) % 1000000007) AS h
           FROM wp),
         ck AS (
           SELECT doc_id, pos, word,
             COALESCE(SUM(CASE WHEN h % 16 = 0 THEN 1 ELSE 0 END) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
           FROM h),
         chunks AS (
           SELECT doc_id, chunk_id, COUNT(*) AS n_words,
             md5(string_agg(word, ' ' ORDER BY pos)) AS chunk_hash
           FROM ck GROUP BY doc_id, chunk_id),
         occ AS (SELECT chunk_hash, COUNT(*) AS n_occ
                 FROM chunks GROUP BY chunk_hash)
         SELECT c.doc_id, COUNT(*) AS n_chunks,
           CAST(MAX(n_words) AS BIGINT) AS max_chunk_words,
           CAST(SUM(CASE WHEN o.n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared_chunks,
           md5(string_agg(c.chunk_hash, '' ORDER BY c.chunk_id)) AS chunks_digest
         FROM chunks c JOIN occ o USING (chunk_hash)
         GROUP BY c.doc_id ORDER BY c.doc_id""",

    "text_chunk_dedup" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         ch AS (
           SELECT doc_id, CAST(i AS BIGINT) AS ci,
             array_to_string(ws[(CAST(i AS INT) * 32 + 1):((CAST(i AS INT) + 1) * 32)], ' ') AS chunk
           FROM w, unnest(range(0, CAST(ceil(len(ws) / 32.0) AS INT))) AS t(i)),
         k AS (
           SELECT doc_id, ci, chunk,
             ROW_NUMBER() OVER (PARTITION BY chunk ORDER BY doc_id, ci) = 1 AS keep
           FROM ch)
         SELECT doc_id, COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           md5(array_to_string(list_transform(
             list_filter(list_sort(list({'ci': ci, 'keep': keep, 'chunk': chunk})),
               x -> x.keep), x -> x.chunk), ' ')) AS cleaned_md5
         FROM k GROUP BY doc_id ORDER BY doc_id""",

    // range(1, len) is end-EXCLUSIVE in DuckDB (empty for 1-char words),
    // mirroring the Spark side's clamp-and-filter guard.
    "text_bpe_merges" ->
      """WITH vocab AS (
           SELECT w AS word, COUNT(*) AS c
           FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
           GROUP BY w),
         pr AS (
           SELECT unnest(list_transform(range(1, len(word)),
             i -> {'a': word[i], 'b': word[i + 1]})) AS p, c
           FROM vocab)
         SELECT p.a AS a, p.b AS b, CAST(SUM(c) AS BIGINT) AS n
         FROM pr GROUP BY p.a, p.b
         ORDER BY n DESC, a, b LIMIT 20""",

    "text_domain_reweight" ->
      """WITH tf AS (
           SELECT source, w, COUNT(*) AS k
           FROM (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)
           GROUP BY source, w),
         lm AS (SELECT w, CAST(SUM(k) AS BIGINT) AS c FROM tf GROUP BY w),
         tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total FROM lm),
         ps AS (
           SELECT source,
             list_sort(list(CAST(k AS DOUBLE) * ln(CAST(c AS DOUBLE)))) AS xs,
             CAST(SUM(k) AS BIGINT) AS len
           FROM tf JOIN lm USING (w) GROUP BY source),
         nll AS (
           SELECT source,
             round(ln(CAST(n_total AS DOUBLE)) -
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE), xs),
                 (a, x) -> a + x) / CAST(len AS DOUBLE), 6) AS avg_nll
           FROM ps CROSS JOIN tot),
         dc AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
         dt AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS nd FROM dc),
         mn AS (SELECT MIN(avg_nll) AS min_nll FROM nll),
         raw AS (
           SELECT source, n_docs,
             round(CAST(n_docs AS DOUBLE) / nd, 6) AS share, avg_nll,
             round(CAST(n_docs AS DOUBLE) / nd, 6) *
               exp(0.5 * (avg_nll - min_nll)) AS raw_w
           FROM nll JOIN dc USING (source) CROSS JOIN dt CROSS JOIN mn),
         tw AS (
           SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_sort(list(raw_w))), (a, x) -> a + x) AS total
           FROM raw)
         SELECT source, n_docs, share, avg_nll,
           round(raw_w / total, 6) AS new_weight
         FROM raw CROSS JOIN tw ORDER BY source""",

    "text_lm_perplexity" ->
      """WITH tf AS (
           SELECT doc_id, w, COUNT(*) AS k
           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
           GROUP BY doc_id, w),
         lm AS (SELECT w, CAST(SUM(k) AS BIGINT) AS c FROM tf GROUP BY w),
         tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total FROM lm),
         pd AS (
           SELECT doc_id,
             list_sort(list(CAST(k AS DOUBLE) * ln(CAST(c AS DOUBLE)))) AS xs,
             CAST(SUM(k) AS BIGINT) AS len
           FROM tf JOIN lm USING (w) GROUP BY doc_id),
         sc AS (
           SELECT doc_id, len,
             ln(CAST(n_total AS DOUBLE)) - list_reduce(xs, (a, b) -> a + b) / len AS avg_nll
           FROM pd CROSS JOIN tot)
         SELECT doc_id, len AS n_tokens, ROUND(avg_nll, 6) AS avg_nll,
           ROUND(exp(avg_nll), 6) AS ppl
         FROM sc ORDER BY doc_id""",

    "text_bigram_perplexity" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         bi AS (
           SELECT doc_id, ws[i] AS w0, ws[i+1] AS w1
           FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM t) x),
         dk AS (SELECT doc_id, w0, w1, COUNT(*) AS k FROM bi GROUP BY 1, 2, 3),
         cb AS (SELECT w0, w1, CAST(SUM(k) AS BIGINT) AS cb FROM dk GROUP BY 1, 2),
         cp AS (SELECT w0, COUNT(*) AS cp FROM bi GROUP BY 1),
         v AS (SELECT COUNT(DISTINCT w) AS vsz
               FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)),
         pd AS (
           SELECT doc_id,
             list_sort(list(CAST(k AS DOUBLE) *
               (ln(CAST(cb AS DOUBLE) + 1.0) -
                ln(CAST(cp AS DOUBLE) + CAST(vsz AS DOUBLE))))) AS xs,
             CAST(SUM(k) AS BIGINT) AS n_bigrams
           FROM dk JOIN cb USING (w0, w1) JOIN cp USING (w0) CROSS JOIN v
           GROUP BY doc_id),
         sc AS (
           SELECT doc_id, n_bigrams,
             round(-list_reduce(xs, (a, b) -> a + b) / n_bigrams, 6) AS avg_nll
           FROM pd)
         SELECT doc_id, n_bigrams, avg_nll, round(exp(avg_nll), 6) AS ppl
         FROM sc ORDER BY doc_id""",

    // Same count tables as the Spark side; p's arithmetic is written in
    // the exact same association so both engines round identically.
    "text_kneser_ney" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         bi AS (
           SELECT doc_id, ws[i] AS w0, ws[i+1] AS w1
           FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM t) x),
         dk AS (SELECT doc_id, w0, w1, COUNT(*) AS k FROM bi GROUP BY 1, 2, 3),
         cb AS (SELECT w0, w1, CAST(SUM(k) AS BIGINT) AS cb FROM dk GROUP BY 1, 2),
         cp AS (SELECT w0, COUNT(*) AS cp FROM bi GROUP BY 1),
         n1pre AS (SELECT w0, COUNT(*) AS n1pre FROM cb GROUP BY 1),
         n1post AS (SELECT w1, COUNT(*) AS n1post FROM cb GROUP BY 1),
         nbt AS (SELECT COUNT(*) AS nbt FROM cb),
         pd AS (
           SELECT doc_id,
             list_sort(list(CAST(k AS DOUBLE) * ln(
               (CAST(cb AS DOUBLE) - 0.75) / CAST(cp AS DOUBLE) +
               0.75 * CAST(n1pre AS DOUBLE) / CAST(cp AS DOUBLE) *
                 (CAST(n1post AS DOUBLE) / CAST(nbt AS DOUBLE))))) AS xs,
             CAST(SUM(k) AS BIGINT) AS n_bigrams
           FROM dk JOIN cb USING (w0, w1) JOIN cp USING (w0)
             JOIN n1pre USING (w0) JOIN n1post USING (w1) CROSS JOIN nbt
           GROUP BY doc_id),
         sc AS (
           SELECT doc_id, n_bigrams,
             round(-list_reduce(xs, (a, b) -> a + b) / n_bigrams, 6) AS avg_nll
           FROM pd)
         SELECT doc_id, n_bigrams, avg_nll, round(exp(avg_nll), 6) AS ppl
         FROM sc ORDER BY doc_id""",

    "text_prf_expand" ->
      s"""WITH fb AS (
           SELECT doc_id
           FROM (${bm25Sql("SELECT doc_id, text FROM documents")}) p1
           ORDER BY bm25 DESC, doc_id LIMIT 10),
         words AS (
           SELECT doc_id, term
           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                 FROM documents) t
           WHERE length(term) > 0),
         ft AS (
           SELECT term, COUNT(*) AS cnt_fb FROM words
           WHERE doc_id IN (SELECT doc_id FROM fb)
             AND term NOT IN ($QueryTermsSql)
           GROUP BY term),
         cdf AS (
           SELECT term, COUNT(*) AS df
           FROM (SELECT DISTINCT doc_id, term FROM words) dt
           WHERE term IN (SELECT term FROM ft) GROUP BY term),
         nn AS (SELECT COUNT(*) AS n_docs FROM documents),
         ranked AS (
           SELECT term, ROUND(CAST(cnt_fb AS DOUBLE) *
             ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                      / (CAST(df AS DOUBLE) + 0.5)), 6) AS wt
           FROM ft JOIN cdf USING (term) CROSS JOIN nn),
         expt AS (SELECT term FROM ranked ORDER BY wt DESC, term LIMIT 5),
         allt AS (SELECT term FROM expt
                  UNION SELECT unnest([$QueryTermsSql]) AS term)
         SELECT doc_id, n_match, bm25
         FROM (${bm25Sql("SELECT doc_id, text FROM documents",
                          "term IN (SELECT term FROM allt)")}) p2
         ORDER BY bm25 DESC, doc_id LIMIT 20""",

    "text_entropy" ->
      """WITH tf AS (
           SELECT doc_id, w, COUNT(*) AS n
           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
           GROUP BY doc_id, w),
         l AS (
           SELECT doc_id, list_sort(list(n)) AS ns,
             CAST(SUM(n) AS BIGINT) AS tot
           FROM tf GROUP BY doc_id)
         SELECT doc_id,
           ROUND(-list_reduce(list_transform(ns,
             x -> (CAST(x AS DOUBLE) / CAST(tot AS DOUBLE)) *
                  ln(CAST(x AS DOUBLE) / CAST(tot AS DOUBLE))),
             (a, b) -> a + b), 6) AS entropy,
           tot AS n_tokens
         FROM l ORDER BY doc_id""",

    "text_corpus_report" ->
      """WITH base AS (
           SELECT COUNT(*) AS n_docs, COUNT(DISTINCT lang) AS n_langs,
             COUNT(DISTINCT source) AS n_sources,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars
           FROM documents),
         dup AS (
           SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS dup_docs,
             COUNT(*) AS dup_groups
           FROM (SELECT md5(text) AS h, COUNT(*) AS n
                 FROM documents GROUP BY 1 HAVING COUNT(*) >= 2))
         SELECT n_docs, n_langs, n_sources, total_chars,
           ROUND(CAST(total_chars AS DOUBLE) / n_docs, 6) AS avg_chars,
           dup_docs, dup_groups
         FROM base CROSS JOIN dup""",

    "text_sample_split" ->
      """WITH b AS (
           SELECT lang, doc_id,
             (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16 +
             (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS bucket
           FROM documents)
         SELECT lang,
           CASE WHEN bucket < 208 THEN 'train' WHEN bucket < 232 THEN 'val' ELSE 'test' END AS split,
           COUNT(*) AS n_docs, MIN(doc_id) AS min_doc
         FROM b GROUP BY 1, 2 ORDER BY lang, split""",

    "text_tokens" ->
      s"""SELECT doc_id, len(ws) AS n_ws_tokens,
           len(regexp_extract_all(text, '[a-z]+')) AS n_alpha_tokens,
           len(regexp_extract_all(text, '[a-z]{1,4}')) AS n_subword_chunks
         FROM (SELECT doc_id, text, $WsSql AS ws FROM documents) t ORDER BY doc_id""",

    "text_quality" ->
      s"""SELECT doc_id, n_tokens,
           round(stop_hits / n_tokens, 6) AS stopword_ratio,
           round(punct / length(text), 6) AS punct_ratio,
           round(stop_hits / n_tokens * 0.5 + (1.0 - punct / length(text)) * 0.3
                 + least(n_tokens / 100.0, 1.0) * 0.2, 6) AS quality_score
         FROM (SELECT doc_id, text, len(ws) AS n_tokens, ${hitsSql("en")} AS stop_hits,
                 len(regexp_extract_all(text, '[.,;:!?]')) AS punct
               FROM (SELECT doc_id, text, $WsSql AS ws FROM documents) t) t2
         ORDER BY doc_id""",

    "text_langid" ->
      s"""SELECT doc_id, lang, en, es, de, fr,
           CASE WHEN en > 0 AND en >= es AND en >= de AND en >= fr THEN 'en'
                WHEN es > 0 AND es >= de AND es >= fr THEN 'es'
                WHEN de > 0 AND de >= fr THEN 'de'
                WHEN fr > 0 THEN 'fr' ELSE 'und' END AS lang_guess,
           (CASE WHEN en > 0 AND en >= es AND en >= de AND en >= fr THEN 'en'
                WHEN es > 0 AND es >= de AND es >= fr THEN 'es'
                WHEN de > 0 AND de >= fr THEN 'de'
                WHEN fr > 0 THEN 'fr' ELSE 'und' END = lang) AS agrees
         FROM (SELECT doc_id, lang, ${hitsSql("en")} AS en, ${hitsSql("es")} AS es,
                 ${hitsSql("de")} AS de, ${hitsSql("fr")} AS fr
               FROM (SELECT doc_id, lang, $WsSql AS ws FROM documents) t) t2
         ORDER BY doc_id""",

    "text_langid_eval" ->
      s"""WITH scored AS (
           SELECT lang,
             CASE WHEN en > 0 AND en >= es AND en >= de AND en >= fr THEN 'en'
                  WHEN es > 0 AND es >= de AND es >= fr THEN 'es'
                  WHEN de > 0 AND de >= fr THEN 'de'
                  WHEN fr > 0 THEN 'fr' ELSE 'und' END AS lang_guess
           FROM (SELECT doc_id, lang, ${hitsSql("en")} AS en, ${hitsSql("es")} AS es,
                   ${hitsSql("de")} AS de, ${hitsSql("fr")} AS fr
                 FROM (SELECT doc_id, lang, $WsSql AS ws FROM documents) t) t2),
         tt AS (SELECT lang, COUNT(*) AS n_true FROM scored GROUP BY lang)
         SELECT s.lang, s.lang_guess, COUNT(*) AS n,
           round(CAST(COUNT(*) AS DOUBLE) / CAST(ANY_VALUE(tt.n_true) AS DOUBLE), 6) AS share_of_true
         FROM scored s JOIN tt ON s.lang = tt.lang
         GROUP BY s.lang, s.lang_guess
         ORDER BY s.lang, s.lang_guess""",

    "text_fingerprint" ->
      s"""SELECT doc_id, md5(text) AS content_hash,
           COALESCE(list_aggregate(list_transform(shingles, s -> md5(s)), 'min'), '') AS min_shingle_hash
         FROM (SELECT doc_id, text, $ShinglesSql AS shingles
               FROM (SELECT doc_id, text, $WsSql AS ws FROM documents) t) t2
         ORDER BY doc_id""",

    "text_rolling_hash" ->
      """SELECT doc_id,
           list_reduce(list_prepend(0::BIGINT,
             list_transform(string_split(text, ''), c -> ord(c)::BIGINT)),
             (acc, x) -> (acc * 131 + x) % 1000000007) AS rolling_hash
         FROM documents ORDER BY doc_id""",

    "text_tfidf" ->
      s"""WITH tf AS (
           SELECT doc_id, term, COUNT(*) AS tf
           FROM (SELECT doc_id, unnest($WsSql) AS term FROM documents) t
           WHERE length(term) > 0 GROUP BY doc_id, term),
         df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
         n AS (SELECT COUNT(*) AS n_total FROM documents),
         scored AS (
           SELECT doc_id, term, tf, df, tf * ln(n_total / df) AS score,
             ROW_NUMBER() OVER (PARTITION BY doc_id
               ORDER BY tf * ln(n_total / df) DESC, term) AS rn
           FROM tf JOIN df USING (term) CROSS JOIN n)
         SELECT doc_id, rn, term, tf, df, round(score, 6) AS tfidf
         FROM scored WHERE rn <= 3 ORDER BY doc_id, rn""",

    // same full (count desc, term) tiebreak drives rank and running sum
    "text_vocab_coverage" ->
      s"""WITH c AS (
           SELECT term, COUNT(*) AS c
           FROM (SELECT unnest($WsSql) AS term FROM documents) t
           WHERE length(term) > 0 GROUP BY term),
         r AS (SELECT term, c,
             ROW_NUMBER() OVER (ORDER BY c DESC, term) AS rk,
             SUM(c) OVER (ORDER BY c DESC, term
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM c),
         t AS (SELECT SUM(c) AS n FROM c)
         SELECT rk AS vocab_k, CAST(cum AS BIGINT) AS n_covered,
           round(CAST(cum AS DOUBLE) / n, 6) AS coverage
         FROM r CROSS JOIN t
         WHERE rk IN (5, 10, 20, 30) ORDER BY vocab_k""",

    // identical 0-based position arithmetic (p // 3, % 5, // 15); DuckDB
    // lists are 1-indexed hence ws[p + 1]
    "text_span_corrupt" ->
      s"""WITH t AS (SELECT doc_id, $WsSql AS ws, len($WsSql) AS n FROM documents)
         SELECT doc_id,
           COALESCE(array_to_string(list_filter(list_transform(range(0, n), p ->
             CASE WHEN ((p // 3) % 5) = 0 THEN
               CASE WHEN p % 3 = 0
                 THEN '<extra_id_' || CAST(p // 15 AS VARCHAR) || '>'
                 ELSE NULL END
             ELSE ws[CAST(p AS INT) + 1] END), x -> x IS NOT NULL), ' '), '')
             AS input,
           COALESCE(array_to_string(flatten(list_filter(list_transform(range(0, n), p ->
             CASE WHEN ((p // 3) % 5) = 0 THEN
               CASE WHEN p % 3 = 0
                 THEN ['<extra_id_' || CAST(p // 15 AS VARCHAR) || '>',
                   ws[CAST(p AS INT) + 1]]
                 ELSE [ws[CAST(p AS INT) + 1]] END
             ELSE NULL END), x -> x IS NOT NULL)), ' '), '') AS target,
           CAST(len(list_filter(range(0, n), p -> ((p // 3) % 5) = 0)) AS INT)
             AS n_masked
         FROM t ORDER BY doc_id""",

    // error-envelope gate: exact top-20 counts + the CMS guarantees as
    // booleans (the sketch itself is Spark-side state DuckDB cannot build;
    // the oracle pins the exact counts and expects both bounds to hold)
    "text_cms_freq" ->
      s"""SELECT term, n_exact, TRUE AS est_ge_exact, TRUE AS est_within_eps
         FROM (
           SELECT term, COUNT(*) AS n_exact
           FROM (SELECT unnest($WsSql) AS term FROM documents) t
           WHERE length(term) > 0
           GROUP BY term ORDER BY n_exact DESC, term LIMIT 20) x
         ORDER BY n_exact DESC, term""",

    // weighted fixed-point power iteration, 6 steps unrolled as chained
    // CTEs (the dedup_pagerank pattern); `//` and Spark's `div` agree on
    // truncated division for non-negative operands
    "text_textrank" -> {
      val iters = (1 to 6).map { i =>
        s""", tr$i AS (
             SELECT e.t AS v,
               CAST(tele.tp + (85 * SUM((p.r * e.w) // dd.wd)) // 100 AS BIGINT) AS r
             FROM tr${i - 1} p
             JOIN edges e ON p.v = e.s
             JOIN wdeg dd ON dd.s = p.v
             CROSS JOIN tele
             GROUP BY e.t, tele.tp)"""
      }.mkString
      s"""WITH toks AS (SELECT $WsSql AS ws FROM documents),
            adj AS (
              SELECT p.a AS a, p.b AS b
              FROM (SELECT unnest(list_transform(range(1, len(ws)),
                      i -> {'a': ws[i], 'b': ws[i+1]})) AS p FROM toks) t0
              WHERE length(p.a) > 0 AND length(p.b) > 0 AND p.a <> p.b),
            edges AS (
              SELECT s, t, COUNT(*) AS w FROM (
                SELECT a AS s, b AS t FROM adj
                UNION ALL SELECT b AS s, a AS t FROM adj) u
              GROUP BY s, t),
            wdeg AS (SELECT s, CAST(SUM(w) AS BIGINT) AS wd FROM edges GROUP BY s),
            nn AS (SELECT COUNT(*) AS n FROM wdeg),
            tele AS (SELECT (15 * (1000000000000 // n)) // 100 AS tp FROM nn),
            tr0 AS (SELECT s AS v, (1000000000000 // n) AS r FROM wdeg CROSS JOIN nn)
            $iters
         SELECT v AS term, r AS rank_fp FROM tr6
         ORDER BY rank_fp DESC, term LIMIT 20"""
    },

    "text_termfreq" ->
      s"""SELECT term, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
         FROM (SELECT doc_id, unnest($WsSql) AS term FROM documents) t
         WHERE length(term) > 0
         GROUP BY term ORDER BY n DESC, term LIMIT 20""",

    // same greedy longest-match recursion: vlist sorted (length DESC,
    // piece ASC) via list()'s ORDER BY, the per-word recursive CTE eats
    // one piece per step, terminal rows sit at pos = length + 1
    "text_wordpiece" ->
      s"""WITH RECURSIVE words AS (
           SELECT w, COUNT(*) AS c
           FROM (SELECT unnest($WsSql) AS w FROM documents) t
           WHERE length(w) > 0 GROUP BY w),
         grams AS (
           SELECT g, SUM(c) AS f FROM (
             SELECT c, unnest(flatten(list_transform(range(2, 5), n ->
               list_transform(range(1, greatest(length(w) - n + 2, 1)),
                 i -> substr(w, CAST(i AS INT), CAST(n AS INT)))))) AS g
             FROM words) t GROUP BY g),
         topk AS (
           SELECT g FROM (
             SELECT g, ROW_NUMBER() OVER (ORDER BY f DESC, g) AS r FROM grams) t
           WHERE r <= 30),
         chars AS (
           SELECT DISTINCT unnest(list_transform(range(1, length(w) + 1),
             i -> substr(w, CAST(i AS INT), 1))) AS g
           FROM words),
         vl AS (
           SELECT list(g ORDER BY length(g) DESC, g) AS vlist
           FROM (SELECT DISTINCT g FROM (
             SELECT g FROM topk UNION ALL SELECT g FROM chars) u) v),
         rec AS (
           SELECT w, c, 1 AS pos, CAST([] AS VARCHAR[]) AS ps, vlist
           FROM words CROSS JOIN vl
           UNION ALL
           SELECT w, c, pos + length(nxt), ps || [nxt], vlist
           FROM (
             SELECT w, c, pos, ps, vlist,
               list_filter(vlist, p -> substr(w, pos, length(p)) = p)[1] AS nxt
             FROM rec WHERE pos <= length(w)) s),
         use AS (
           SELECT w, c, unnest(ps) AS piece
           FROM rec WHERE pos = length(w) + 1)
         SELECT piece, COUNT(DISTINCT w) AS n_words,
           CAST(SUM(c) AS BIGINT) AS n_uses
         FROM use GROUP BY piece ORDER BY piece""",

    // same ln-moment derivation; round 4 absorbs engine log/sum-order ulps
    "text_zipf_fit" ->
      s"""WITH uni AS (
           SELECT w, COUNT(*) AS n
           FROM (SELECT unnest($WsSql) AS w FROM documents) t
           WHERE length(w) > 0 GROUP BY w),
         ranked AS (
           SELECT ln(CAST(ROW_NUMBER() OVER (ORDER BY n DESC, w) AS DOUBLE)) AS x,
             ln(CAST(n AS DOUBLE)) AS y
           FROM uni),
         m AS (
           SELECT CAST(COUNT(*) AS DOUBLE) AS k, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
           FROM ranked)
         SELECT CAST(k AS BIGINT) AS n_terms,
           round((k * sxy - sx * sy) / (k * sxx - sx * sx), 4) AS slope,
           round((sy - ((k * sxy - sx * sy) / (k * sxx - sx * sx)) * sx) / k, 4) AS intercept,
           round(((k * sxy - sx * sy) * (k * sxy - sx * sy)) /
             ((k * sxx - sx * sx) * (k * syy - sy * sy)), 4) AS r2
         FROM m""",

    // identical ln-argument operand order as the Spark side
    "text_collocations" ->
      s"""WITH toks AS (SELECT $WsSql AS ws FROM documents),
           uni AS (SELECT w, COUNT(*) AS c1
                   FROM (SELECT unnest(ws) AS w FROM toks) t
                   WHERE length(w) > 0 GROUP BY w),
           bi_src AS (
             SELECT unnest(list_transform(range(1, len(ws)),
               i -> {'a': ws[i], 'b': ws[i+1]})) AS p FROM toks),
           bi_all AS (
             SELECT p.a AS a, p.b AS b, COUNT(*) AS c_ab FROM bi_src
             WHERE length(p.a) > 0 AND length(p.b) > 0 GROUP BY p.a, p.b),
           tot AS (SELECT (SELECT SUM(c1) FROM uni) AS n_uni,
                          (SELECT SUM(c_ab) FROM bi_all) AS n_bi)
         SELECT a, b, c_ab, c_a, c_b,
           round(ln(CAST(c_ab AS DOUBLE) * n_uni * n_uni /
             (CAST(n_bi AS DOUBLE) * c_a * c_b)), 6) AS pmi
         FROM (
           SELECT bi.a, bi.b, bi.c_ab, ua.c1 AS c_a, ub.c1 AS c_b,
                  t.n_uni, t.n_bi
           FROM bi_all bi JOIN uni ua ON bi.a = ua.w
                JOIN uni ub ON bi.b = ub.w
           CROSS JOIN tot t WHERE bi.c_ab >= 5) x
         ORDER BY pmi DESC, a, b LIMIT 20""",

    // identical operand order/parenthesization as the Spark side; per-term
    // scores round to 6 before the sorted-fold doc sum
    "text_bm25" -> bm25Sql("SELECT doc_id, text FROM documents"),

    // same literal discount weights as the Spark plan (NdcgW); folds in
    // rank order via list(... ORDER BY rank)
    "text_ndcg" -> {
      val wList = NdcgW.mkString("[", ", ", "]")
      s"""WITH bm AS (${bm25Sql("SELECT doc_id, text FROM documents")}),
           pool AS (
             SELECT doc_id, least(COUNT(*), 15) AS rel
             FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents) t
             WHERE term IN ($QueryTermsSql) GROUP BY doc_id),
           ranked AS (
             SELECT b.doc_id, p.rel,
               ROW_NUMBER() OVER (ORDER BY b.bm25 DESC, b.doc_id) AS rank
             FROM bm b JOIN pool p ON b.doc_id = p.doc_id),
           ideal AS (
             SELECT doc_id, rel,
               ROW_NUMBER() OVER (ORDER BY rel DESC, doc_id) AS rank
             FROM pool),
           dcg AS (
             SELECT list_reduce(list(
               CAST((1 << CAST(rel AS INT)) - 1 AS DOUBLE) * list_extract(($wList)::DOUBLE[], CAST(rank AS INT))
               ORDER BY rank), (a, b) -> a + b) AS dcg
             FROM ranked WHERE rank <= 10),
           idcg AS (
             SELECT list_reduce(list(
               CAST((1 << CAST(rel AS INT)) - 1 AS DOUBLE) * list_extract(($wList)::DOUBLE[], CAST(rank AS INT))
               ORDER BY rank), (a, b) -> a + b) AS idcg
             FROM ideal WHERE rank <= 10)
         SELECT round(dcg, 6) AS dcg, round(idcg, 6) AS idcg,
           round(dcg / idcg, 6) AS ndcg
         FROM dcg CROSS JOIN idcg"""
    },

    "text_decontaminate" ->
      s"""WITH g AS (
           SELECT DISTINCT doc_id, unnest(list_transform(range(1, greatest(len(ws)-3, 1)),
             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])) AS g
           FROM (SELECT doc_id, $WsSql AS ws FROM documents) t),
         bench AS (SELECT DISTINCT g FROM g WHERE doc_id % 97 = 0)
         SELECT doc_id, COUNT(*) AS n_contaminated_grams
         FROM (SELECT doc_id, g FROM g WHERE doc_id % 97 <> 0) c
         JOIN bench USING (g)
         GROUP BY doc_id ORDER BY doc_id""",

    "text_repetition" ->
      s"""SELECT doc_id, len(shingles) AS n_grams,
           round(1.0 - len(list_distinct(shingles)) / len(shingles), 6) AS rep_ratio
         FROM (SELECT doc_id, $ShinglesSql AS shingles
               FROM (SELECT doc_id, $WsSql AS ws FROM documents) t
               WHERE len(ws) >= 3) t2
         ORDER BY doc_id""",

    "text_quality_filter" ->
      s"""SELECT * FROM ($QualityDecSql) q ORDER BY doc_id""",

    "text_pipeline_e2e" ->
      s"""WITH dec AS ($QualityDecSql),
         kept AS (SELECT doc_id, lang_guess, quality_score FROM dec WHERE keep),
         hashes AS (SELECT doc_id, md5(text) AS h FROM documents),
         dd AS (
           SELECT k.doc_id, k.lang_guess, k.quality_score
           FROM kept k JOIN hashes USING (doc_id)
           QUALIFY k.doc_id = MIN(k.doc_id) OVER (PARTITION BY h))
         SELECT doc_id, lang_guess, quality_score,
           CASE WHEN bucket < 208 THEN 'train'
                WHEN bucket < 232 THEN 'val' ELSE 'test' END AS split
         FROM (
           SELECT doc_id, lang_guess, quality_score,
             (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16 +
             (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS bucket
           FROM dd) t
         ORDER BY doc_id""",

    "text_pareto_frontier" ->
      s"""WITH t AS (
           SELECT doc_id,
             round(stop_hits / n_tokens * 0.5 + (1.0 - punct / length(text)) * 0.3
                   + least(n_tokens / 100.0, 1.0) * 0.2, 6) AS q,
             n_tokens
           FROM (
             SELECT doc_id, text, len(ws) AS n_tokens,
               ${hitsSql("en")} AS stop_hits,
               len(regexp_extract_all(text, '[.,;:!?]')) AS punct
             FROM (SELECT doc_id, text, $WsSql AS ws FROM documents) w) s),
         g AS (SELECT q, MAX(n_tokens) AS mt FROM t GROUP BY q),
         g2 AS (
           SELECT q, MAX(mt) OVER (ORDER BY q DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mprev
           FROM g)
         SELECT doc_id, q AS quality_score, n_tokens
         FROM t JOIN g2 USING (q)
         WHERE mprev IS NULL OR mprev <= n_tokens
         ORDER BY doc_id""",

    "text_pipeline_e2e_report" ->
      s"""WITH dec AS ($QualityDecSql),
         kept AS (SELECT doc_id FROM dec WHERE keep),
         hashes AS (SELECT doc_id, md5(text) AS h FROM documents),
         dd AS (
           SELECT h, MIN(doc_id) AS doc_id
           FROM kept JOIN hashes USING (doc_id) GROUP BY h)
         SELECT
           (SELECT COUNT(*) FROM dec) AS n_input,
           (SELECT COUNT(*) FROM kept) AS n_quality_kept,
           (SELECT COUNT(*) FROM dd) AS n_deduped,
           (SELECT COUNT(*) FROM kept) - (SELECT COUNT(*) FROM dd) AS n_dup_dropped""",

    "text_mixture_sample" ->
      """WITH w AS (
           SELECT doc_id, source,
             0.25 + (CAST(substr(source, 4) AS INT) % 8) * 0.5 AS w,
             (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16 +
             (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS bucket
           FROM documents),
         c AS (
           SELECT doc_id, source,
             CAST(FLOOR(w) + CASE WHEN bucket < (w - FLOOR(w)) * 256
                                  THEN 1 ELSE 0 END AS INT) AS n_copies
           FROM w)
         SELECT doc_id, source, n_copies, unnest(range(n_copies)) AS copy_idx
         FROM c WHERE n_copies > 0 ORDER BY doc_id, copy_idx""",

    "text_chunks" ->
      s"""SELECT doc_id, chunk_id,
           least(n - chunk_id * 32, 32) AS n_tokens,
           ws[chunk_id * 32 + 1] AS first_token
         FROM (SELECT doc_id, len(ws) AS n, ws,
                 unnest(range(0, CAST(ceil(len(ws) / 32.0) AS INT))) AS chunk_id
               FROM (SELECT doc_id, $WsSql AS ws FROM documents) t) t2
         ORDER BY doc_id, chunk_id""",

    "text_rag_chunks" -> ragChunkSql("SELECT doc_id, text FROM documents"),

    "text_pack_sequences" ->
      s"""WITH d AS (
           SELECT doc_id,
             ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16 +
              (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)) % 8 AS bucket,
             len($WsSql) AS n
           FROM documents),
         o AS (
           SELECT bucket, doc_id, n,
             SUM(n) OVER (PARTITION BY bucket ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_off
           FROM d),
         e AS (
           SELECT bucket, doc_id, end_off,
             unnest(range(CAST((end_off - n) // 256 AS BIGINT),
                          CAST((end_off - 1) // 256 + 1 AS BIGINT))) AS seq_id
           FROM o)
         SELECT bucket, seq_id, COUNT(*) AS n_docs,
           CAST(least(seq_id * 256 + 256, MAX(end_off)) - seq_id * 256 AS BIGINT) AS n_tokens
         FROM e GROUP BY bucket, seq_id ORDER BY bucket, seq_id""",

    "text_winnowing" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         s AS (
           SELECT doc_id, unnest(range(1, greatest(len(ws)-1, 1))) AS i, ws
           FROM t),
         f AS (
           SELECT doc_id, i,
             substr(md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]), 1, 8) AS fh,
             COUNT(*) OVER (PARTITION BY doc_id) AS n
           FROM s),
         w AS (
           SELECT doc_id, i, n,
             MIN(fh) OVER (PARTITION BY doc_id ORDER BY i
               ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
           FROM f)
         SELECT doc_id, COUNT(*) AS n_windows,
           COUNT(DISTINCT wmin) AS n_fingerprints,
           MIN(wmin) AS min_fp, MAX(wmin) AS max_fp
         FROM w WHERE i <= n - 3
         GROUP BY doc_id ORDER BY doc_id""",

    "text_pii_redact" ->
      """WITH aug AS (
           SELECT doc_id,
             text ||
             CASE WHEN doc_id % 3 = 0 THEN ' mail user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END ||
             CASE WHEN doc_id % 5 = 0 THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END ||
             CASE WHEN doc_id % 7 = 0 THEN ' host 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST(doc_id % 100 AS VARCHAR) ELSE '' END AS aug
           FROM documents),
         red AS (
           SELECT doc_id, aug,
             regexp_replace(regexp_replace(regexp_replace(aug,
               '[a-z0-9]+@[a-z]+\.[a-z]+', '<EMAIL>', 'g'),
               '\+1-555-[0-9]{4}', '<PHONE>', 'g'),
               '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g') AS r
           FROM aug)
         SELECT doc_id,
           len(regexp_extract_all(aug, '[a-z0-9]+@[a-z]+\.[a-z]+')) AS n_emails,
           len(regexp_extract_all(aug, '\+1-555-[0-9]{4}')) AS n_phones,
           len(regexp_extract_all(aug, '([0-9]{1,3}\.){3}[0-9]{1,3}')) AS n_ips,
           length(r) AS redacted_len, md5(r) AS redacted_hash
         FROM red ORDER BY doc_id""",

    "text_normalize" ->
      """WITH aug AS (
           SELECT doc_id,
             text || CASE WHEN doc_id % 3 = 0 THEN ' expos' || 'e' || chr(769)
                          WHEN doc_id % 3 = 1 THEN ' u' || chr(776) || 'ber'
                          ELSE ' gar' || 'c' || chr(807) || 'on' END AS aug
           FROM documents)
         SELECT doc_id, length(aug) AS raw_len,
           length(nfc_normalize(aug)) AS nfc_len,
           md5(nfc_normalize(aug)) AS nfc_hash,
           md5(strip_accents(aug)) AS folded_hash
         FROM aug ORDER BY doc_id""",

    "text_stratified_sample" ->
      """SELECT lang, rn, doc_id FROM (
           SELECT lang, doc_id,
             ROW_NUMBER() OVER (PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
           FROM documents) t
         WHERE rn <= 10 ORDER BY lang, rn""",

    "text_hybrid_retrieval" -> hybridSql(
      "SELECT doc_id, text FROM documents",
      "SELECT vec_id, embedding FROM embeddings"),

    "text_dsir_sample" ->
      """WITH toks AS (
           SELECT doc_id, lang, w,
             CAST(concat('0x', substr(md5(w), 1, 6)) AS BIGINT) % 64 AS b
           FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents)
           WHERE length(w) > 0),
         per_doc AS (SELECT doc_id, b, COUNT(*) AS n FROM toks GROUP BY 1, 2),
         raw AS (SELECT b, COUNT(*) AS cr FROM toks GROUP BY 1),
         tgt AS (SELECT b, COUNT(*) AS ct FROM toks WHERE lang = 'en' GROUP BY 1),
         tot AS (SELECT COUNT(*) AS nr,
                   SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS nt FROM toks),
         lm AS (
           SELECT raw.b, round(
               ln((CAST(COALESCE(ct, 0) AS DOUBLE) + 1.0) / (CAST(nt AS DOUBLE) + 64.0))
             - ln((CAST(cr AS DOUBLE) + 1.0) / (CAST(nr AS DOUBLE) + 64.0)), 6) AS lr
           FROM raw LEFT JOIN tgt ON raw.b = tgt.b CROSS JOIN tot),
         wts AS (
           SELECT doc_id,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_sort(list(CAST(n AS DOUBLE) * lr))), (a, x) -> a + x) AS log_w,
             CAST(SUM(n) AS BIGINT) AS n_tokens
           FROM per_doc JOIN lm ON per_doc.b = lm.b GROUP BY doc_id),
         keyed AS (
           SELECT doc_id, n_tokens, log_w,
             round(log_w - ln(-ln(
               (CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) AS DOUBLE) + 1.0)
                 / 16777217.0)), 6) AS skey
           FROM wts)
         SELECT doc_id, n_tokens, round(log_w, 6) AS log_w, skey
         FROM keyed ORDER BY skey DESC, doc_id LIMIT 100""")
}
