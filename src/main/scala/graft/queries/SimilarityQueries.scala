package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import DedupQueries.dotD

/** Approximate-nearest-neighbor similarity search over the embedding column
  * (north-star surface): brute-force cosine top-k as the exactness baseline,
  * and a random-hyperplane LSH bucketed variant as the scale path.
  *
  * Determinism: hyperplanes are the embeddings of vec_id 0..7 (data-derived,
  * no RNG), so the DuckDB oracle reproduces the exact same buckets. Dot
  * products fold left-to-right in double on both engines → bit-identical.
  *
  * Scale: brute force is queries × corpus — a broadcast of the (small) query
  * set against a full scan, the right plan when queries ≪ corpus. The LSH
  * variant buckets the corpus once (one narrow map + one shuffle on the
  * 8-bit signature) and probes only matching buckets — the sub-linear path;
  * recall/latency trade via band count.
  */
object SimilarityQueries {

  /** 8-bit signature from sign of dot with the 8 seed vectors; carries the
    * precomputed norm so downstream re-ranks pay one dot per pair. */
  private def withSignature(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .withColumn("nrm", sqrt(dotD(col("embedding"), col("embedding"))))
    val planes = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("p_id"), col("embedding").as("p_emb"))
    e.crossJoin(broadcast(planes))
      .withColumn("bit", when(dotD(col("embedding"), col("p_emb")) > 0,
        expr("shiftleft(1L, cast(p_id as int))")).otherwise(0L))
      .groupBy(col("vec_id"), col("label"))
      .agg(sum(col("bit")).as("sig"), first(col("embedding")).as("embedding"),
        first(col("nrm")).as("nrm"))
  }

  /** Squared L2 distance of the `embedding` column to a literal centroid —
    * same left-to-right double fold as the DuckDB oracle's DistSql. */
  private def sqDist(cent: Seq[Double]): org.apache.spark.sql.Column =
    aggregate(zip_with(col("embedding"), typedLit(cent),
        (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
      lit(0.0), (acc, v) => acc + v)

  /** Nearest literal centroid as a (dist, cid) struct: argmin via
    * array_min over k per-centroid distances — a NARROW map, no join, no
    * shuffle; ties break on cluster id (struct comparison is
    * lexicographic). */
  private[queries] def nearest(cents: Seq[(Long, Seq[Double])]): org.apache.spark.sql.Column =
    array_min(array(cents.map { case (cid, c) =>
      struct(sqDist(c).as("dist"), lit(cid).as("cid")) }: _*))

  private def assign(e: DataFrame, cents: Seq[(Long, Seq[Double])]): DataFrame =
    e.withColumn("m", nearest(cents))
      .select(col("vec_id"), col("embedding"),
        col("m.cid").as("cid"), col("m.dist").as("dist"))

  /** PQ encode→decode shared by sim_pq_adc and the composed sim_ivf_pq:
    * 8 sub-spaces × 8 dims, codebooks = the seed embeddings' (vec_id < 8)
    * sub-vectors; returns each vector's dequantized reconstruction
    * `(vec_id, deq)`. The deq array is built with LITERAL subspace
    * indexes: element_at(codes, j+1) with a non-literal j would make
    * CollapseProject inline (and recompute) the whole 64-argmin codes
    * array once per lambda element — 8× the encode work (measured; the
    * NOTES.md literal-index trap). Unrolled, each subspace's argmin
    * evaluates exactly once per row. */
  /** The PQ codebook model: the seed embeddings' (vec_id < 8) sub-vectors,
    * collected once (k×dims doubles — model state, broadcast-sized). */
  private[queries] def pqSeeds(s: SparkSession, d: String): Seq[Seq[Double]] =
    Tables.embeddings(s, d).filter(col("vec_id") < 8)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toSeq))
      .sortBy(_._1).map(_._2).toSeq

  /** Appends the PQ reconstruction `deq` to any frame with an `embedding`
    * column — a NARROW map (literal codebooks), so consumers encode in
    * place instead of joining a side table. */
  private[queries] def withPqDeq(df: DataFrame, seeds: Seq[Seq[Double]]): DataFrame = {
    val m = 8; val sw = 8 // m subspaces × sw dims
    // squared L2 of subspace j's slice to a literal codebook sub-vector
    def subDist(j: Int, cv: Seq[Double]) =
      aggregate(zip_with(slice(col("embedding"), j * sw + 1, sw), typedLit(cv),
          (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
        lit(0.0), (acc, v) => acc + v)
    def codeFor(j: Int) =
      array_min(array((0 until 8).map { c =>
        struct(subDist(j, seeds(c).slice(j * sw, j * sw + sw)).as("dist"),
          lit(c).as("c")) }: _*)).getField("c")
    val cbLit = typedLit(seeds.map(s0 => (0 until m).map(j => s0.slice(j * sw, j * sw + sw))))
    df.withColumn("cb", cbLit)
      .withColumn("deq", flatten(array((0 until m).map(j =>
        element_at(element_at(col("cb"), codeFor(j) + 1), j + 1)): _*)))
      .drop("cb")
  }

  private[queries] def pqDeq(s: SparkSession, d: String): DataFrame =
    withPqDeq(Tables.embeddings(s, d), pqSeeds(s, d))
      .select(col("vec_id"), col("deq"))

  /** One-update Lloyd centroids (k = 8, init = the embeddings of vec_id
    * 0..7): assign to the seed vectors, then per-(cluster, dim) exact
    * DECIMAL means. Centroids are MODEL state (k×dims doubles), collected
    * to the driver by design — they broadcast into every later pass. The
    * trained model is session-cached per data dir: sim_kmeans profiles it,
    * sim_ivf_trained uses it as the coarse quantizer. */
  private val models =
    new scala.collection.concurrent.TrieMap[(SparkSession, String), Seq[(Long, Seq[Double])]]()

  private def lloydCentroids(s: SparkSession, d: String): Seq[(Long, Seq[Double])] =
    models.getOrElseUpdate((s, d), {
      val dec = org.apache.spark.sql.types.DecimalType(28, 12)
      val e = Tables.embeddings(s, d)
      val c0 = e.filter(col("vec_id") < 8)
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => (r.getLong(0),
          r.getSeq[Float](1).map(_.toDouble).toSeq)).toSeq.sortBy(_._1)
      assign(e, c0)
        .select(col("cid"), posexplode(col("embedding")).as(Seq("i", "x")))
        .groupBy(col("cid"), col("i"))
        .agg((sum(col("x").cast(dec)).cast("double") / count(lit(1))).as("c"))
        .groupBy(col("cid"))
        .agg(expr("transform(array_sort(collect_list(struct(i, c))), t -> t.c)")
          .as("centroid"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toSeq))
        .toSeq.sortBy(_._1)
    })

  /** Session cache of the kNN edge table (per data dir): the graph query
    * and the cluster query's TWO mutual-join sides share one computation
    * of the within-cell pair join — the expensive part (|cell|² dots). */
  private val knnCache =
    new scala.collection.concurrent.TrieMap[(SparkSession, String), DataFrame]()

  private def knnEdges(s: SparkSession, d: String): DataFrame =
    knnCache.getOrElseUpdate((s, d), knnEdgesPlan(s, d).persist())

  /** Drop cached derived tables and trained models (test hook / memory
    * release — the DedupQueries.clearCache convention). */
  def clearCache(): Unit = {
    knnCache.values.foreach(_.unpersist())
    knnCache.clear()
    models.clear()
  }

  /** Directed exact k-NN edges (src, rank, dst, cos): each vector's top-3
    * cosine neighbors WITHIN its coarse cell (label = the IVF-cell
    * stand-in, the same blocking convention as dedup_embedding). Scale
    * shape: the pair join is quadratic in CELL size, never corpus size —
    * the quantizer caps cell width at scale (split oversized cells;
    * multi-probe recovers recall across cell borders) — and the
    * per-source top-3 rank window group-limits to k rows per partition
    * before its shuffle. Determinism: dots fold left-to-right in double,
    * norms computed once per row, ties break on neighbor id. */
  private def knnEdgesPlan(s: SparkSession, d: String): DataFrame = {
    // the codegen'd FloatVectorDot kernel — same left-to-right
    // float→double fold as the DuckDB oracle's list_reduce
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      graft.functions.VectorFunctions.vector_dot(a, b)
    val e = Tables.embeddings(s, d)
      .withColumn("nrm", sqrt(dot(col("embedding"), col("embedding"))))
    val w = Window.partitionBy(col("src")).orderBy(col("cos").desc, col("dst"))
    e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("src"), col("b.vec_id").as("dst"),
        (dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm"))).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
  }

  /** The power-iteration engine behind sim_pca_power / sim_pca_deflate:
    * n iterations of v ← AᵀAv over any (vec_id, embedding) frame
    * (float or double arrays), each one narrow broadcast-literal dot
    * pass + one posexplode per-position DECIMAL-exact sum; ∞-norm
    * normalization with round-9 quantization between iterations keeps
    * every step bit-identical cross-engine. Returns (v_n, last growth
    * factor ≈ the dominant eigenvalue of AᵀA). */
  private def powerIterate(e: DataFrame, iters: Int): (Seq[Double], Double) = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 12)
    def step(v: Seq[Double]): (Seq[Double], Double) = {
      val vArr = array(v.map(lit): _*)
      val scored = e.withColumn("s",
        aggregate(zip_with(col("embedding"), vArr,
          (x, y) => x.cast("double") * y), lit(0.0), (acc, t) => acc + t))
      // ONE action per iteration: collect the 64-row u vector, then pick
      // the pivot and quantize locally (a second Spark action would
      // re-run the whole corpus pass — nothing here is cached).
      // (r9-opt note: an 8-digit-group × 8-decimal-sum variant — less row
      // explosion, fewer agg groups — MEASURED ~15% slower than this
      // posexplode+groupBy form at sf0.1 and was reverted; the per-
      // iteration cost here is action/codegen overhead, not the 64-group
      // hash. The flat 64-column agg stays out per the janino trap,
      // NOTES.md.)
      val u = scored
        .select(posexplode(col("embedding")).as(Seq("j", "x")), col("s"))
        .groupBy(col("j"))
        .agg(sum((col("x").cast("double") * col("s")).cast(dec))
          .cast("double").as("u"))
        .orderBy(col("j")).collect().map(_.getDouble(1)).toSeq
      val m = u.zipWithIndex.maxBy { case (x, j) => (math.abs(x), -j) }._1
      // driver-side ≡ Spark round(x, 9): shortest-repr BigDecimal, HALF_UP
      val vn = u.map(x => java.math.BigDecimal.valueOf(x / m)
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue())
      (vn, m)
    }
    val v0 = Seq.fill(64)(0.125) // 1/√64 — exactly representable
    (1 to iters).foldLeft((v0, 0.0)) { case ((v, _), _) => step(v) }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Brute-force exact top-10 cosine neighbors for 5 query vectors:
    // broadcast the queries, scan the corpus once (norms precomputed per
    // vector — one dot product per pair), TakeOrdered per query.
    "sim_topk_brute" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .withColumn("nrm", sqrt(dotD(col("embedding"), col("embedding"))))
      val qs = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
      e.crossJoin(broadcast(qs))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("cos", dotD(col("embedding"), col("q_emb")) / (col("nrm") * col("q_nrm")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
          round(col("cos"), 6).as("cos_sim"))
        .orderBy(col("q_id"), col("rank"))
    }),

    // HARD-NEGATIVE mining for contrastive training: for each query
    // vector, the top-3 highest-cosine vectors with a DIFFERENT label —
    // "near but wrong-class" examples, the negatives that actually teach
    // (random negatives are trivially separable). Same broadcast-queries ×
    // one-corpus-scan shape as sim_topk_brute with the label inequality
    // fused into the join predicate — the corpus is filtered before
    // ranking, never materialized per query; at index scale the ANN
    // candidate gate runs first and this re-ranks candidates.
    "sim_hard_negatives" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .withColumn("nrm", sqrt(dotD(col("embedding"), col("embedding"))))
      val qs = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("label").as("q_label"),
          col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
      e.crossJoin(broadcast(qs))
        .filter(col("label") =!= col("q_label"))
        .withColumn("cos", dotD(col("embedding"), col("q_emb")) / (col("nrm") * col("q_nrm")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("q_id"), col("rank"), col("vec_id").as("negative_id"),
          col("label").as("neg_label"), round(col("cos"), 6).as("cos_sim"))
        .orderBy(col("q_id"), col("rank"))
    }),

    // LSH bucket histogram (checks the hyperplane/signature math over the
    // whole corpus — always non-empty).
    "sim_lsh_buckets" -> ((s, d) => {
      withSignature(s, d)
        .groupBy(col("sig"))
        .agg(count(lit(1)).as("n_vectors"), min(col("vec_id")).as("min_vec_id"))
        .orderBy(col("sig"))
    }),

    // IVF-style ANN (the second scale path beside LSH): corpus vectors are
    // assigned to their nearest of 8 coarse cells (centroids = embeddings of
    // vec_id 0..7 — a deterministic stand-in for trained k-means centroids);
    // queries probe their nprobe=2 nearest cells and re-rank exactly inside.
    // Scale shape: assignment is a narrow broadcast map over the corpus (one
    // pass, no shuffle), the probe is a broadcast join on cell id — scan
    // cost drops from O(corpus) per query to O(probed cells).
    "sim_ivf_ann" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .withColumn("nrm", sqrt(dotD(col("embedding"), col("embedding"))))
      val cents = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"), col("nrm").as("c_nrm"))
      val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("c_id"))
      val assigned = e.crossJoin(broadcast(cents))
        .withColumn("ccos", dotD(col("embedding"), col("c_emb")) / (col("nrm") * col("c_nrm")))
        .withColumn("crank", row_number().over(wAssign))
        .persist()
      val corpus = assigned.filter(col("crank") === 1)
        .select(col("vec_id"), col("c_id").as("cell"), col("embedding"), col("nrm"))
      val probes = assigned.filter(col("vec_id") < 5 && col("crank") <= 2)
        .select(col("vec_id").as("q_id"), col("c_id").as("q_cell"),
          col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
      corpus.join(broadcast(probes),
          col("cell") === col("q_cell") && col("vec_id") =!= col("q_id"))
        .withColumn("cos", dotD(col("embedding"), col("q_emb")) / (col("nrm") * col("q_nrm")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
          round(col("cos"), 6).as("cos_sim"))
        .orderBy(col("q_id"), col("rank"))
    }),

    // kNN LABEL CLASSIFIER over the IVF-cell-blocked candidate graph —
    // the model-based filter shape of LLM data curation (FineWeb/CCNet
    // quality classifiers, label-noise audits): every vector is classified
    // by the MAJORITY label of its 5 nearest same-cell neighbors
    // (leave-one-out — the vector itself never votes), and the per-label
    // confusion census (n, correct, accuracy) is the filter's calibration
    // report. Ties: neighbor rank breaks on (cos DESC, vec_id), the vote
    // on (count DESC, label ASC) — bit-determined. Scale shape: the pair
    // join is quadratic in CELL size, never corpus size (the sim_ivf_ann
    // blocking convention — the trained quantizer caps cell width at
    // scale), the top-5 window group-limits per source vector, and votes
    // collapse to ≤ labels rows per vector before the label-sized final
    // agg; centroids broadcast, the corpus never collects.
    "sim_knn_classify" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .withColumn("nrm", sqrt(dotD(col("embedding"), col("embedding"))))
      val cents = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
          col("nrm").as("c_nrm"))
      val wAssign = Window.partitionBy(col("vec_id"))
        .orderBy(col("ccos").desc, col("c_id"))
      // persisted: feeds BOTH sides of the pair join (sim_ivf_ann's
      // assignment-reuse convention) — without it the centroid cross-join
      // and assignment window run twice
      val corpus = e.crossJoin(broadcast(cents))
        .withColumn("ccos",
          dotD(col("embedding"), col("c_emb")) / (col("nrm") * col("c_nrm")))
        .withColumn("crank", row_number().over(wAssign))
        .filter(col("crank") === 1)
        .select(col("vec_id"), col("label"), col("c_id").as("cell"),
          col("embedding"), col("nrm"))
        .persist()
      val wRank = Window.partitionBy(col("a_id"))
        .orderBy(col("cos").desc, col("b_id"))
      val neigh = corpus.as("a").join(corpus.as("b"),
          col("a.cell") === col("b.cell") && col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("a_id"), col("a.label").as("true_label"),
          col("b.vec_id").as("b_id"), col("b.label").as("n_label"),
          (dotD(col("a.embedding"), col("b.embedding")) /
            (col("a.nrm") * col("b.nrm"))).as("cos"))
        .withColumn("rank", row_number().over(wRank))
        .filter(col("rank") <= 5)
      val wVote = Window.partitionBy(col("a_id"))
        .orderBy(col("votes").desc, col("n_label"))
      val pred = neigh
        .groupBy(col("a_id"), col("true_label"), col("n_label"))
        .agg(count(lit(1)).as("votes"))
        .withColumn("vrank", row_number().over(wVote))
        .filter(col("vrank") === 1)
      pred.groupBy(col("true_label"))
        .agg(count(lit(1)).as("n_classified"),
          sum(when(col("n_label") === col("true_label"), 1L).otherwise(0L))
            .as("n_correct"))
        .withColumn("accuracy",
          round(col("n_correct").cast("double") / col("n_classified"), 6))
        .orderBy(col("true_label"))
    }),

    // Greedy k-center CORESET selection (Gonzalez farthest-point
    // traversal): pick 8 maximally-spread vectors — seed = vec_id 0, then
    // repeatedly the vector FARTHEST (squared L2) from every already-
    // selected center (ties → min vec_id). The classic diversity/coverage
    // subset selector for training-data curation (active-learning coreset,
    // "don't fine-tune on 1M near-identical examples") with a 2-approx
    // guarantee on the k-center objective. Each step's max-min distance
    // (the covering radius as selection proceeds) is the output — the
    // radius curve a curation run reports. Scale shape: k passes over the
    // corpus, each a NARROW literal-centroid map + one all-reduce max (no
    // shuffle at all — partial max map-side); centers are driver-held
    // model state (k×dims doubles), exactly the lloydCentroids convention.
    // Determinism: same left-to-right double fold as the oracle's DistSql;
    // argmax tiebreak by min vec_id via lexicographic struct max.
    "sim_kcenter" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val seed = e.filter(col("vec_id") === 0).select(col("embedding"))
        .head().getSeq[Float](0).map(_.toDouble).toSeq
      var centers = Vector[(Long, Seq[Double], Double)]((0L, seed, 0.0))
      for (_ <- 2 to 8) {
        val dmin = array_min(array(centers.map { case (_, c, _) => sqDist(c) }: _*))
        val top = e
          .agg(max(struct(dmin.as("d"), (lit(0L) - col("vec_id")).as("nid"),
            col("embedding").as("emb")))).head().getStruct(0)
        centers = centers :+ ((-top.getLong(1),
          top.getSeq[Float](2).map(_.toDouble).toSeq, top.getDouble(0)))
      }
      val spark = s
      import spark.implicits._
      centers.zipWithIndex
        .map { case ((id, _, dist), i) => (i + 1, id, dist) }
        .toDF("step", "vec_id", "d0")
        // Spark round ≡ DuckDB round on doubles (same half-away-from-zero)
        .select(col("step"), col("vec_id"), round(col("d0"), 6).as("dist"))
        .orderBy(col("step"))
    }),

    // IVF nprobe TUNING SWEEP (the dedup_lsh_tuning pattern for the vector
    // index): candidate volume and recall@3 at nprobe ∈ {1, 2, 4} from ONE
    // shared assignment pass — the measured cost/recall curve that picks
    // the serving operating point (more probed cells = linearly more scan,
    // diminishing recall). Ground truth is the brute-force top-3. Scale
    // shape: assignment is the usual broadcast-centroid pass; the THREE
    // sweep points fold into ONE candidate pass (r10-opt, guide §1.2/§2.4):
    // candidates are built once at the widest nprobe with the probe's cell
    // rank (`pcrank`) carried along; nprobe=k's candidate set is exactly
    // `pcrank <= k`, its per-query rank is a conditional running count over
    // the SAME (cos DESC, vec_id) window (row_number within the filtered
    // subset ≡ running count of subset rows — vec_id makes the order
    // total), and all nine counts come out of one aggregate. The r9 form
    // ran 7 actions (per-np candidate count + per-np semi-join + ground-
    // truth count) and recomputed the brute-force top-3 up to 4 times; now
    // the ground truth collects once (15 rows — 5 queries × top-3, bounded
    // by construction) and everything else is one job.
    "sim_nprobe_sweep" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .withColumn("nrm", sqrt(dotD(col("embedding"), col("embedding"))))
      val cents = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
          col("nrm").as("c_nrm"))
      val wAssign = Window.partitionBy(col("vec_id"))
        .orderBy(col("ccos").desc, col("c_id"))
      val assigned = e.crossJoin(broadcast(cents))
        .withColumn("ccos",
          dotD(col("embedding"), col("c_emb")) / (col("nrm") * col("c_nrm")))
        .withColumn("crank", row_number().over(wAssign))
        .persist()
      val corpus = assigned.filter(col("crank") === 1)
        .select(col("vec_id"), col("c_id").as("cell"), col("embedding"), col("nrm"))
      val b3 = queries("sim_topk_brute")(s, d).filter(col("rank") <= 3)
        .select(col("q_id"), col("neighbor_id")).collect()
      val nTrue = b3.length.toLong
      val spark = s
      import spark.implicits._
      val hits = b3.map(r => (r.getLong(0), r.getLong(1))).toSeq
        .toDF("h_q", "h_n").withColumn("hit", lit(1))
      // widest probe set; pcrank tags which sweep points see the candidate
      val probes = assigned.filter(col("vec_id") < 5 && col("crank") <= 4)
        .select(col("vec_id").as("q_id"), col("c_id").as("q_cell"),
          col("embedding").as("q_emb"), col("nrm").as("q_nrm"),
          col("crank").as("pcrank"))
      val wRank = Window.partitionBy(col("q_id"))
        .orderBy(col("cos").desc, col("vec_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      def rankIn(np: Int) =
        sum(when(col("pcrank") <= np, 1).otherwise(0)).over(wRank)
      val scored = corpus.join(broadcast(probes),
          col("cell") === col("q_cell") && col("vec_id") =!= col("q_id"))
        .withColumn("cos",
          dotD(col("embedding"), col("q_emb")) / (col("nrm") * col("q_nrm")))
        .join(broadcast(hits),
          col("q_id") === col("h_q") && col("vec_id") === col("h_n"), "left")
        .select(col("q_id"), col("vec_id"), col("cos"), col("pcrank"), col("hit"))
        .select(col("pcrank"), col("hit"),
          rankIn(1).as("r1"), rankIn(2).as("r2"), rankIn(4).as("r4"))
      def nc(np: Int) = sum(when(col("pcrank") <= np, 1L).otherwise(0L))
      def nh(np: Int, rk: String) = sum(when(
        col("pcrank") <= np && col(rk) <= 3 && col("hit").isNotNull,
        1L).otherwise(0L))
      val a = scored.agg(
        nc(1).as("c1"), nc(2).as("c2"), nc(4).as("c4"),
        nh(1, "r1").as("h1"), nh(2, "r2").as("h2"), nh(4, "r4").as("h4")).head()
      assigned.unpersist()
      val rows = Seq(
        (1, a.getLong(0), a.getLong(3), nTrue),
        (2, a.getLong(1), a.getLong(4), nTrue),
        (4, a.getLong(2), a.getLong(5), nTrue))
      rows.toDF("nprobe", "n_candidates", "n_hits", "n_true")
        .select(col("nprobe"), col("n_candidates"), col("n_hits"), col("n_true"),
          round(col("n_hits").cast("double") / col("n_true"), 6).as("recall_at_3"))
        .orderBy(col("nprobe"))
    }),

    // Embedding-corpus health: per-label centroids + cosine dispersion (the
    // drift/quality profile a pipeline runs before training on an embedding
    // store — collapsed or polluted labels show as low avg/min cosine).
    // Scale shape: centroids are one (label, dim)-keyed hash agg over a
    // narrow posexplode (partial sums map-side; (label × dims) rows total),
    // then BROADCAST back — the corpus is scanned twice, shuffled never.
    // Determinism: per-dim means and the cosine average sum as exact
    // DECIMAL before the double division (order-free ⇒ cross-engine exact).
    "sim_label_centroids" -> ((s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(28, 12)
      def dotMixed(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, v) => acc + v)
      val e = Tables.embeddings(s, d)
      val cents = e.select(col("label"), posexplode(col("embedding")).as(Seq("i", "x")))
        .groupBy(col("label"), col("i"))
        .agg((sum(col("x").cast(dec)).cast("double") / count(lit(1))).as("c"))
        .groupBy(col("label"))
        .agg(expr("transform(array_sort(collect_list(struct(i, c))), t -> t.c)")
          .as("centroid"))
      e.join(broadcast(cents), "label")
        .withColumn("cos", dotMixed(col("embedding"), col("centroid")) /
          (sqrt(dotMixed(col("embedding"), col("embedding"))) *
            sqrt(dotMixed(col("centroid"), col("centroid")))))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_vectors"),
          round(sqrt(first(dotMixed(col("centroid"), col("centroid")))), 6)
            .as("centroid_norm"),
          round(sum(col("cos").cast(dec)).cast("double") / count(lit(1)), 6)
            .as("avg_cos"),
          round(min(col("cos")), 6).as("min_cos"))
        .orderBy(col("label"))
    }),

    // Embedding OUTLIER sweep: each vector's cosine to its label centroid,
    // flagged when it falls more than 2σ below the label's mean cosine —
    // the mislabeled/polluted-vector detector a pipeline runs before
    // training on an embedding store (sim_label_centroids profiles labels;
    // this names the offending vectors). Scale shape: same narrow
    // (label, dim) centroid agg broadcast back, one corpus scan for the
    // cosines, label-sized stats broadcast for the gate — the corpus never
    // shuffles. Determinism: μ and E[cos²] ride exact DECIMAL sums
    // (order-free); σ = sqrt(max(m2 − μ², 0)) and the z-gate comparison
    // are identical IEEE ops on both engines.
    "sim_outliers" -> ((s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(28, 12)
      def dotMixed(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, v) => acc + v)
      val e = Tables.embeddings(s, d)
      val cents = e.select(col("label"), posexplode(col("embedding")).as(Seq("i", "x")))
        .groupBy(col("label"), col("i"))
        .agg((sum(col("x").cast(dec)).cast("double") / count(lit(1))).as("c"))
        .groupBy(col("label"))
        .agg(expr("transform(array_sort(collect_list(struct(i, c))), t -> t.c)")
          .as("centroid"))
      val withCos = e.join(broadcast(cents), "label")
        .withColumn("cos", dotMixed(col("embedding"), col("centroid")) /
          (sqrt(dotMixed(col("embedding"), col("embedding"))) *
            sqrt(dotMixed(col("centroid"), col("centroid")))))
        .select(col("vec_id"), col("label"), col("cos"))
      val stats = withCos.groupBy(col("label"))
        .agg((sum(col("cos").cast(dec)).cast("double") / count(lit(1))).as("mu"),
          (sum((col("cos") * col("cos")).cast(dec)).cast("double") /
            count(lit(1))).as("m2"))
        .withColumn("sigma",
          sqrt(greatest(col("m2") - col("mu") * col("mu"), lit(0.0))))
      withCos.join(broadcast(stats), "label")
        .filter(col("cos") < col("mu") - lit(2.0) * col("sigma"))
        .select(col("vec_id"), col("label"), round(col("cos"), 6).as("cos_sim"),
          round(col("mu") - lit(2.0) * col("sigma"), 6).as("threshold"))
        .orderBy(col("vec_id"))
    }),

    // Scalar-quantized (int8) similarity: per-dimension [min,max] over the
    // corpus → 8-bit codes → search on the DEQUANTIZED vectors. The memory
    // path for 100 TB embedding stores: codes are 4× smaller than float32
    // (16× vs float64), quantization is one narrow map, and the bounds
    // table is 2×dims doubles — broadcast everywhere. Quantize-time
    // rounding is floor(u·255 + 0.5): identical semantics on both engines
    // (plain `round` half-cases differ across engines). Exactness contract:
    // the top-k is exact OVER THE QUANTIZED representation, hash-checked —
    // the quality loss vs float is the quantization error itself, which is
    // the documented trade.
    "sim_quantized_topk" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val bounds = e.select(posexplode(col("embedding")).as(Seq("i", "x")))
        .groupBy(col("i"))
        .agg(min(col("x").cast("double")).as("mn"), max(col("x").cast("double")).as("mx"))
        .agg(array_sort(collect_list(struct(col("i"), col("mn"), col("mx")))).as("b"))
        .select(expr("transform(b, t -> t.mn)").as("mns"),
          expr("transform(b, t -> t.mx)").as("mxs"))
      val coded = e.crossJoin(broadcast(bounds))
        .withColumn("codes", expr(
          """transform(embedding, (x, i) ->
               CASE WHEN mxs[i] = mns[i] THEN 0L
                    ELSE bigint(floor((double(x) - mns[i]) / (mxs[i] - mns[i]) * 255.0 + 0.5d)) END)"""))
        .withColumn("deq", expr(
          "transform(codes, (c, i) -> mns[i] + double(c) * (mxs[i] - mns[i]) / 255.0)"))
        .select(col("vec_id"), col("deq"))
      def dotDbl(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
      val qs = coded.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("deq").as("q_deq"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("qcos").desc, col("vec_id"))
      coded.join(broadcast(qs), col("vec_id") =!= col("q_id"))
        .withColumn("qcos", dotDbl(col("deq"), col("q_deq")) /
          (sqrt(dotDbl(col("deq"), col("deq"))) * sqrt(dotDbl(col("q_deq"), col("q_deq")))))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
          round(col("qcos"), 6).as("cos_sim"))
        .orderBy(col("q_id"), col("rank"))
    }),

    // Product quantization (PQ) ANN: the 64-dim vector splits into m=8
    // subspaces of 8 dims; each subspace has its own 8-entry codebook (the
    // sub-vectors of the seed embeddings vec_id 0..7 — data-derived, no
    // RNG, consistent with the LSH/IVF seed convention), so a vector
    // compresses to 8 one-byte codes (8 B vs 256 B float32 — the memory
    // path beyond sim_quantized_topk's int8). Search is ADC (asymmetric
    // distance computation): the FULL query vector scores against the
    // RECONSTRUCTED corpus vectors, top-10 by cosine.
    // Scale shape: the codebook is MODEL state (m×k×(dims/m) doubles —
    // bytes), broadcast everywhere; encoding is a NARROW map (argmin over
    // k literal centroid sub-vectors per subspace — no join, no shuffle);
    // at warehouse scale only the 8-byte codes ship to the searcher and
    // reconstruction happens from the resident codebook.
    // Exactness contract (same as sim_quantized_topk): the top-k is exact
    // OVER THE QUANTIZED representation, hash-checked; quantization error
    // is the documented trade. Determinism: sub-distances and dots fold
    // left-to-right in double; argmin ties break on code id.
    "sim_pq_adc" -> ((s, d) => {
      def dotDbl(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, v) => acc + v)
      val corpus = pqDeq(s, d)
        .withColumn("dn", sqrt(dotDbl(col("deq"), col("deq"))))
      val qs = Tables.embeddings(s, d).filter(col("vec_id") < 5)
        .withColumn("qn", sqrt(dotDbl(col("embedding"), col("embedding"))))
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("qn"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
      corpus.join(broadcast(qs), col("vec_id") =!= col("q_id"))
        .withColumn("cos", dotDbl(col("deq"), col("q_emb")) / (col("dn") * col("qn")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
          round(col("cos"), 6).as("cos_sim"))
        .orderBy(col("q_id"), col("rank"))
    }),

    // IVF+PQ — the composed FAISS-style serving index: the coarse
    // quantizer routes each query to its nprobe=2 nearest cells (exactly
    // sim_ivf_ann's assignment) and the candidates inside those cells
    // re-rank by ASYMMETRIC distance — exact query embedding against the
    // corpus's 8-byte PQ reconstructions (exactly sim_pq_adc's scorer).
    // This is the memory shape a 100 TB vector store actually serves:
    // cells bound the candidates scanned, codes bound the bytes per
    // candidate; both components reuse the SAME shared definitions their
    // standalone queries gate. Top-3 per query.
    "sim_ivf_pq" -> ((s, d) => {
      def dotDbl(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, v) => acc + v)
      val e = Tables.embeddings(s, d)
        .withColumn("nrm", sqrt(dotD(col("embedding"), col("embedding"))))
      val cents = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"), col("nrm").as("c_nrm"))
      val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("c_id"))
      val assigned = e.crossJoin(broadcast(cents))
        .withColumn("ccos", dotD(col("embedding"), col("c_emb")) / (col("nrm") * col("c_nrm")))
        .withColumn("crank", row_number().over(wAssign))
        .persist()
      val corpus = withPqDeq(
          assigned.filter(col("crank") === 1)
            .select(col("vec_id"), col("c_id").as("cell"), col("embedding")),
          pqSeeds(s, d))
        .withColumn("dn", sqrt(dotDbl(col("deq"), col("deq"))))
      val probes = assigned.filter(col("vec_id") < 5 && col("crank") <= 2)
        .select(col("vec_id").as("q_id"), col("c_id").as("q_cell"),
          col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
      corpus.join(broadcast(probes),
          col("cell") === col("q_cell") && col("vec_id") =!= col("q_id"))
        .withColumn("cos", dotDbl(col("deq"), col("q_emb")) / (col("dn") * col("q_nrm")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
          round(col("cos"), 6).as("cos_sim"))
        .orderBy(col("q_id"), col("rank"))
    }),

    // Deterministic Lloyd k-means (k=8, init = the embeddings of vec_id
    // 0..7, one centroid update + reassignment): the coarse quantizer an
    // IVF index trains before bucketing a 100 TB embedding store.
    // Scale shape: centroids are MODEL state (k×dims doubles — bytes, not
    // data), so they ride the driver/broadcast path by design; each
    // assignment pass is then a NARROW map over the corpus (argmin via
    // array_min over k literal-centroid distances — no crossJoin, no
    // shuffle), and the centroid update is one (cluster, dim)-keyed hash
    // agg over a posexplode, partial-aggregated map-side. Per iteration:
    // one narrow pass + one bounded shuffle of k×dims rows.
    // Determinism: init is data-derived (no RNG); distances fold
    // left-to-right in double; per-dim means and inertia sum as exact
    // DECIMAL before the double cast; argmin ties break on cluster id.
    "sim_kmeans" -> ((s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(28, 12)
      assign(Tables.embeddings(s, d), lloydCentroids(s, d))
        .groupBy(col("cid"))
        .agg(count(lit(1)).as("n_vectors"),
          round(sum(col("dist").cast(dec)).cast("double"), 6).as("inertia"))
        .select(col("cid").as("cluster_id"), col("n_vectors"), col("inertia"))
        .orderBy(col("cluster_id"))
    }),

    // Clustering-quality gate: per-point SIMPLIFIED silhouette over the
    // seed-centroid assignment — a = distance to own centroid, b = to the
    // runner-up, s = (b−a)/max(a,b). The self-measuring health check a
    // pipeline runs on its quantizer before trusting IVF routing (collapsed
    // or overlapping cells surface as s ≈ 0). Scale shape: one NARROW pass
    // (k literal-centroid distances per row, argmin + runner-up from one
    // sorted k-array — no join, no shuffle); per-point outputs avoid
    // cross-row double summation entirely, so round-6 is exact on both
    // engines.
    // k-NN GRAPH construction (the input to semantic clustering and
    // graph-based dedup): each vector's exact top-3 cosine neighbors
    // WITHIN its coarse cell — see [[knnEdges]] for the scale shape.
    "sim_knn_graph" -> ((s, d) =>
      knnEdges(s, d)
        .select(col("src"), col("rank"), col("dst"),
          round(col("cos"), 6).as("cos_sim"))
        .orderBy(col("src"), col("rank"))),

    // Greedy NSW graph search — the navigable-small-world walk that HNSW
    // layers stack: start from a fixed entry point and repeatedly move to
    // the neighbor (from the k-NN graph's adjacency lists) closest to the
    // query, stopping at a local optimum. This is the third ANN *search
    // strategy* in the suite (scan-based LSH/IVF buckets, code-based PQ,
    // now graph-traversal) — at index scale the walk touches O(hops·k)
    // vectors instead of a cell scan. Walk state is queries-sized (5
    // rows); each of the 6 unrolled hops is one state⋈edges join + one
    // state-sized rank — the corpus is only probed for candidate
    // embeddings. Entry = the cell's minimum vec_id (deterministic, no
    // oracle leakage); the result reports whether the greedy walk reached
    // the cell's true top-1 (it can honestly stall at a local optimum —
    // that's the known NSW trade-off the recall column measures).
    "sim_nsw_search" -> ((s, d) => {
      // NOT fanned out (r9-opt measured both ways): a 32-partition corpus
      // frame makes every per-hop checkpoint/join schedule 32 tasks on
      // queries-sized state — interleaved A/B put the fanned form at
      // 5.4-9.0 s vs 4.2-4.5 s unfanned; the pair-join parallelism gain
      // is smaller than the walk-side scheduling loss.
      val e = Tables.embeddings(s, d)
        .withColumn("nrm", sqrt(dotD(col("embedding"), col("embedding"))))
      val qs = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("label").as("q_label"),
          col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
      val corpus = e.select(col("vec_id"), col("label"), col("embedding"), col("nrm"))
      val scoredCell = corpus.join(broadcast(qs),
          col("label") === col("q_label") && col("vec_id") =!= col("q_id"))
        .withColumn("cos",
          dotD(col("embedding"), col("q_emb")) / (col("nrm") * col("q_nrm")))
        .select(col("q_id"), col("vec_id"), col("cos"))
      // walk graph: within-cell top-8 out-edges (the search graph is
      // denser than the top-3 analysis graph — degree is the NSW
      // navigability knob, like HNSW's M)
      val wEdges = e.as("a").join(e.as("b"),
          col("a.label") === col("b.label") && col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("src"), col("b.vec_id").as("dst"),
          (dotD(col("a.embedding"), col("b.embedding")) /
            (col("a.nrm") * col("b.nrm"))).as("ecos"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("src")).orderBy(col("ecos").desc, col("dst"))))
        .filter(col("rk") <= 8).select(col("src"), col("dst"))
        // eager + lineage-truncated: every hop's job joins this — without
        // the checkpoint each of the 6 hop jobs re-runs the cell pair
        // join. Together with the per-hop state checkpoints this took the
        // sf0.1 run from 12.9 s to 6.9 s; the remainder is the one-time
        // graph build (3.1M-pair rank), the walk itself is milliseconds.
        .localCheckpoint()
      val scoredCk = scoredCell.localCheckpoint()
      val entry = scoredCk.groupBy(col("q_id")).agg(min(col("vec_id")).as("cur"))
      def hop(state: DataFrame): DataFrame = {
        val cand = state.join(wEdges, state("cur") === wEdges("src"))
          .select(col("q_id"), col("dst").as("cand"))
          .union(state.select(col("q_id"), col("cur").as("cand")))
          .distinct()
        val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("cand"))
        cand.join(scoredCk,
            cand("q_id") === scoredCk("q_id") && col("cand") === col("vec_id"))
          .select(cand("q_id"), col("cand"), col("cos"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3) // beam width (HNSW's ef)
          .select(col("q_id"), col("cand").as("cur"))
          // state is ≤ 15 rows; truncating lineage per hop keeps the
          // final plan hop-sized instead of 6 nested join+window layers
          .localCheckpoint()
      }
      val beam = (1 to 6).foldLeft(entry)((st, _) => hop(st))
      val w1 = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("cur"))
      val found = beam.join(scoredCk,
          beam("q_id") === scoredCk("q_id") && col("cur") === col("vec_id"))
        .select(beam("q_id"), col("cur"), col("cos"))
        .withColumn("rk", row_number().over(w1)).filter(col("rk") === 1)
        .select(col("q_id"), col("cur").as("found_id"), col("cos").as("found_cos"))
      val best = scoredCk
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))))
        .filter(col("rk") === 1)
        .select(col("q_id"), col("vec_id").as("best_id"), col("cos").as("best_cos"))
      found
        .join(entry.select(col("q_id"), col("cur").as("entry_id")), Seq("q_id"))
        .join(best, Seq("q_id"))
        .select(col("q_id"), col("entry_id"), col("found_id"),
          round(col("found_cos"), 6).as("found_cos"),
          (col("found_id") === col("best_id")).as("reached_cell_best"),
          round(col("found_cos") / col("best_cos"), 6).as("quality_ratio"))
        .orderBy(col("q_id"))
    }),

    // Semantic clusters (the SemDeDup shape): MUTUAL top-3 neighbors form
    // the undirected edge set — mutuality is the standard symmetrization
    // that keeps hub vectors from chaining unrelated regions — and
    // connected components label each cluster by its minimum vec_id.
    // Scale shape: the mutual-edge join is kNN-graph-sized (≤ 3N rows per
    // side), and Graph.connectedComponents runs driver union-find below
    // 2²⁰ edges with distributed min-label propagation above (both paths
    // equivalence-tested in GraphSpec).
    "sim_knn_clusters" -> ((s, d) => {
      val knn = knnEdges(s, d).select(col("src"), col("dst"))
      val mutual = knn.as("x").join(knn.as("y"),
          col("x.src") === col("y.dst") && col("x.dst") === col("y.src"))
        .filter(col("x.src") < col("x.dst"))
        .select(col("x.src").as("a_id"), col("x.dst").as("b_id"))
      graft.operators.Graph.connectedComponents(mutual)
        .select(col("vertex").as("vec_id"), col("component").as("cluster"))
        .orderBy(col("vec_id"))
    }),

    // Triangle census of the mutual-kNN graph — the local-density signal
    // (clustering coefficient numerator) that separates tight semantic
    // clusters from hub-chained sprawl before trusting graph dedup. Scale
    // shape: edges are oriented by id (each triangle counted once) and the
    // two-hop join keys on a shared vertex — cost Σ deg², bounded because
    // kNN degree ≤ k by construction (the reason triangle counting is
    // tractable on kNN graphs and hopeless on raw similarity graphs); at
    // larger scale the standard refinement orients by degree instead.
    "sim_triangles" -> ((s, d) => {
      val knn = knnEdges(s, d).select(col("src"), col("dst"))
      val mutual = knn.as("x").join(knn.as("y"),
          col("x.src") === col("y.dst") && col("x.dst") === col("y.src"))
        .filter(col("x.src") < col("x.dst"))
        .select(col("x.src").as("a"), col("x.dst").as("b"))
      val tri = mutual.as("e1")
        .join(mutual.as("e2"), col("e1.b") === col("e2.a"))
        .join(mutual.as("e3"),
          col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
        .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
      tri.select(explode(array(col("x"), col("y"), col("z"))).as("vec_id"))
        .groupBy(col("vec_id")).agg(count(lit(1)).as("n_triangles"))
        .orderBy(col("vec_id"))
    }),

    // BFS shortest hop counts from the mutual-kNN graph's minimum vertex,
    // bounded at 6 hops — the iterative traversal primitive (reachability,
    // "how semantically far is this doc from a seed") that complements
    // connected components (membership) and PageRank (centrality). Scale
    // shape: classic frontier expansion — each hop is ONE join of the
    // (tiny) frontier against the edge table plus an anti-join against
    // visited, all distributed; the driver holds only loop control and the
    // seed scalar, never vertex data, and the hop bound caps total work at
    // 6 joins regardless of graph size (the persisted edge table is
    // scanned once per hop, exactly how Pregel supersteps schedule).
    "sim_bfs_hops" -> ((s, d) => {
      val knn = knnEdges(s, d).select(col("src"), col("dst"))
      val mutual = knn.as("x").join(knn.as("y"),
          col("x.src") === col("y.dst") && col("x.dst") === col("y.src"))
        .filter(col("x.src") < col("x.dst"))
        .select(col("x.src").as("a"), col("x.dst").as("b"))
      // Execution rides Graph.bfsHops' hybrid: the mutual-kNN graph is
      // model-sized, so under 2²⁰ edges the 6-level walk runs on the
      // driver over the collected adjacency (hop level = shortest
      // distance — traversal-order independent); above the threshold the
      // per-level frontier loop with localCheckpoint truncation runs
      // unchanged inside the operator.
      val edges = mutual.select(col("a").as("u"), col("b").as("w"))
        .unionByName(mutual.select(col("b").as("u"), col("a").as("w")))
      graft.operators.Graph.bfsHops(edges, "u", "w", 6)
        .select(col("v").as("vec_id"), col("hops"))
        .orderBy(col("vec_id"))
    }),

    // Top principal direction of the embedding corpus by POWER ITERATION —
    // the dimensionality-reduction / whitening primitive (dominant
    // variance axis; uncentered Gram, i.e. the top right-singular vector
    // of A). Three iterations of v ← AᵀAv, each TWO distributed passes
    // with NO d×d matrix ever formed: (1) s_i = ⟨a_i, v⟩ — a narrow map
    // with v as a broadcast literal (the lloydCentroids model-state
    // convention); (2) u_j = Σ_i a_ij·s_i — posexplode + per-position
    // DECIMAL-exact sums (64 groups; the 64-column agg alternative is the
    // janino-compile trap NOTES.md pins). Normalization is by the
    // ∞-norm — the component of max |u|, sign kept so the leading loading
    // is exactly 1.0 — which needs only exact selection + one division +
    // round(9) quantization, so every iteration's v is bit-identical on
    // both engines (no sqrt, no float summation anywhere). The growth
    // factor |m| of the last step estimates the top eigenvalue of AᵀA.
    // Scale shape: cost = 3 × (corpus scan + n·d-row shuffle into d
    // groups); model state (64 doubles) lives on the driver exactly like
    // the kmeans centroids. Oracle: the same three iterations unrolled as
    // DuckDB CTEs — identical fold order, decimal sums, and rounding.
    "sim_pca_power" -> ((s, d) => {
      val (v3, m3) = powerIterate(Tables.embeddings(s, d), 3)
      import s.implicits._
      v3.zipWithIndex
        .map { case (v, j) => (j, v) }.toDF("j", "loading")
        .withColumn("loading", round(col("loading"), 6))
        .withColumn("growth", round(lit(m3), 6))
        .orderBy(col("j"))
    }),

    // Second principal direction by DEFLATION — the loop that turns one
    // power iteration into a full truncated decomposition: project the
    // trained PC1 out of every vector (a NARROW per-row map — one dot
    // against the broadcast literal v1, one fused subtract, nothing
    // shuffles) and run the SAME three-iteration engine on the residual
    // corpus. Emits PC2's loadings + growth (≈ λ₂ of AᵀA) and an
    // orthogonality audit: ⟨v1, v2⟩ over the round-9 quantized models is
    // a 64-term fold, identical on both engines, asserted ≈ 0. The
    // oracle unrolls all SIX iterations plus the deflation map.
    "sim_pca_deflate" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val (v1, _) = powerIterate(e, 3)
      // ∞-norm iterates are NOT unit-L2, so the projection must divide by
      // v·v: a ← a − ((a·v)/(v·v))·v. (The orthogonality audit below
      // caught the unnormalized form producing a non-orthogonal "PC2".)
      val vv1 = v1.foldLeft(0.0)((acc, a) => acc + a * a)
      val v1Arr = array(v1.map(lit): _*)
      val deflated = e.withColumn("s",
          aggregate(zip_with(col("embedding"), v1Arr,
            (x, y) => x.cast("double") * y), lit(0.0), (acc, t) => acc + t))
        .withColumn("c", col("s") / lit(vv1))
        .withColumn("embedding",
          zip_with(col("embedding"), v1Arr,
            (x, vj) => x.cast("double") - col("c") * vj))
        .select(col("vec_id"), col("embedding"))
        // 3 iterations re-scan this frame; the residual is a flat
        // (long, array<double>) — cheap to cache, unlike the MapType
        // envelopes (NOTES) — so the parquet scan + deflation map run once
        .persist()
      val (v2, m2) = powerIterate(deflated, 3)
      deflated.unpersist(false)
      // cosine audit (models are not unit vectors): |cos(v1,v2)| < 0.05
      val dot = v1.zip(v2).foldLeft(0.0) { case (acc, (a, b)) => acc + a * b }
      val vv2 = v2.foldLeft(0.0)((acc, a) => acc + a * a)
      val ortho = dot * dot < 0.0025 * (vv1 * vv2)
      import s.implicits._
      v2.zipWithIndex
        .map { case (v, j) => (j, v) }.toDF("j", "loading2")
        .withColumn("loading2", round(col("loading2"), 6))
        .withColumn("growth2", round(lit(m2), 6))
        .withColumn("orthogonal", lit(ortho))
        .orderBy(col("j"))
    }),

    "sim_silhouette" -> ((s, d) => {
      val cents = Tables.embeddings(s, d).filter(col("vec_id") < 8)
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toSeq))
        .toSeq.sortBy(_._1)
      Tables.embeddings(s, d)
        .withColumn("ds", slice(array_sort(array(cents.map { case (cid, c) =>
          struct(sqrt(sqDist(c)).as("dist"), lit(cid).as("cid")) }: _*)), 1, 2))
        .select(col("vec_id"),
          col("ds")(0).getField("cid").as("cell"),
          round(col("ds")(0).getField("dist"), 6).as("a_dist"),
          round(col("ds")(1).getField("dist"), 6).as("b_dist"),
          round((col("ds")(1).getField("dist") - col("ds")(0).getField("dist")) /
            greatest(col("ds")(0).getField("dist"), col("ds")(1).getField("dist")), 6)
            .as("silhouette"))
        .orderBy(col("vec_id"))
    }),

    // IVF ANN over the TRAINED coarse quantizer: the k-means centroids
    // (not raw seed vectors, as in sim_ivf_ann) partition the corpus into
    // cells; each query probes its 2 nearest cells and re-ranks by exact
    // cosine. The production IVF recipe end-to-end: train → assign →
    // probe. Scale shape: assignment and probe-cell selection are the
    // same NARROW literal-centroid passes as sim_kmeans (no join, no
    // shuffle); candidates come from a broadcast of the tiny probe set
    // against the cell-filtered corpus — at warehouse scale the cell id
    // is the partitioning key and a probe reads only its cells'
    // partitions.
    "sim_ivf_trained" -> ((s, d) => {
      val c1 = lloydCentroids(s, d)
      val e = Tables.embeddings(s, d)
        .withColumn("nrm", sqrt(dotD(col("embedding"), col("embedding"))))
      val corpus = e.withColumn("cell", nearest(c1).getField("cid"))
      val qs = e.filter(col("vec_id") < 5)
        .withColumn("pc", slice(array_sort(array(c1.map { case (cid, c) =>
          struct(sqDist(c).as("dist"), lit(cid).as("cid")) }: _*)), 1, 2))
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          col("nrm").as("q_nrm"), explode(expr("transform(pc, t -> t.cid)")).as("q_cell"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
      corpus.join(broadcast(qs),
          col("cell") === col("q_cell") && col("vec_id") =!= col("q_id"))
        .withColumn("cos", dotD(col("embedding"), col("q_emb")) / (col("nrm") * col("q_nrm")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
          round(col("cos"), 6).as("cos_sim"))
        .orderBy(col("q_id"), col("rank"))
    }),

    // ANN quality gate: recall@3 of the LSH path against brute-force ground
    // truth — the metric every ANN deployment reports, computed inside the
    // engine (composition of the two search operators; both sides reuse the
    // session-cached signature table). A recall regression from re-tuning
    // planes/bands fails the hash gate instead of silently degrading search.
    // Recall gate for the IVF path (the sibling of sim_ann_recall, which
    // gates LSH): recall@3 of the nprobe=2 IVF ANN against brute-force
    // ground truth, hash-gated — a quantizer or probe regression shows up
    // as a changed recall number, not a silent quality drift.
    "sim_ivf_recall" -> ((s, d) => {
      val brute = queries("sim_topk_brute")(s, d).filter(col("rank") <= 3)
        .select(col("q_id"), col("neighbor_id"))
      val ivf = queries("sim_ivf_ann")(s, d)
        .select(col("q_id"), col("neighbor_id"))
      val hits = ivf.join(brute, Seq("q_id", "neighbor_id"), "left_semi")
        .groupBy(col("q_id")).agg(count(lit(1)).as("n_hits"))
      brute.groupBy(col("q_id")).agg(count(lit(1)).as("n_true"))
        .join(hits, Seq("q_id"), "left")
        .select(col("q_id"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"), col("n_true"),
          round(coalesce(col("n_hits"), lit(0L)).cast("double") / col("n_true"), 6)
            .as("recall_at_3"))
        .orderBy(col("q_id"))
    }),

    "sim_ann_recall" -> ((s, d) => {
      val brute = queries("sim_topk_brute")(s, d).filter(col("rank") <= 3)
        .select(col("q_id"), col("neighbor_id"))
      val lsh = queries("sim_lsh_ann")(s, d)
        .select(col("q_id"), col("neighbor_id"))
      val hits = lsh.join(brute, Seq("q_id", "neighbor_id"), "left_semi")
        .groupBy(col("q_id")).agg(count(lit(1)).as("n_hits"))
      brute.groupBy(col("q_id")).agg(count(lit(1)).as("n_true"))
        .join(hits, Seq("q_id"), "left")
        .select(col("q_id"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"), col("n_true"),
          round(coalesce(col("n_hits"), lit(0L)).cast("double") / col("n_true"), 6)
            .as("recall_at_3"))
        .orderBy(col("q_id"))
    }),

    // PQ recall gate: recall@3 of the asymmetric-distance PQ ranking
    // (sim_pq_adc) vs the exact brute-force ground truth — the number
    // that tells you whether 8-byte codes are safe to serve, measured the
    // same way the LSH and IVF paths already are (every index variant
    // ships with its quality gate).
    "sim_pq_recall" -> ((s, d) => {
      val brute = queries("sim_topk_brute")(s, d).filter(col("rank") <= 3)
        .select(col("q_id"), col("neighbor_id"))
      val pq = queries("sim_pq_adc")(s, d).filter(col("rank") <= 3)
        .select(col("q_id"), col("neighbor_id"))
      val hits = pq.join(brute, Seq("q_id", "neighbor_id"), "left_semi")
        .groupBy(col("q_id")).agg(count(lit(1)).as("n_hits"))
      brute.groupBy(col("q_id")).agg(count(lit(1)).as("n_true"))
        .join(hits, Seq("q_id"), "left")
        .select(col("q_id"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"), col("n_true"),
          round(coalesce(col("n_hits"), lit(0L)).cast("double") / col("n_true"), 6)
            .as("recall_at_3"))
        .orderBy(col("q_id"))
    }),

    // Recall gate for the COMPOSED index: IVF+PQ stacks two
    // approximations (cell pruning AND code quantization), so its recall
    // is what actually ships — gate it directly against brute ground
    // truth like every other variant.
    "sim_ivf_pq_recall" -> ((s, d) => {
      val brute = queries("sim_topk_brute")(s, d).filter(col("rank") <= 3)
        .select(col("q_id"), col("neighbor_id"))
      val ivfpq = queries("sim_ivf_pq")(s, d)
        .select(col("q_id"), col("neighbor_id"))
      val hits = ivfpq.join(brute, Seq("q_id", "neighbor_id"), "left_semi")
        .groupBy(col("q_id")).agg(count(lit(1)).as("n_hits"))
      brute.groupBy(col("q_id")).agg(count(lit(1)).as("n_true"))
        .join(hits, Seq("q_id"), "left")
        .select(col("q_id"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"), col("n_true"),
          round(coalesce(col("n_hits"), lit(0L)).cast("double") / col("n_true"), 6)
            .as("recall_at_3"))
        .orderBy(col("q_id"))
    }),

    // LSH-bucketed ANN: candidates share the query's 8-bit bucket; exact
    // cosine re-rank within the bucket, top-3.
    "sim_lsh_ann" -> ((s, d) => {
      // persist: the signature table feeds both the corpus side and the
      // (filtered) query side of the bucket join
      val sigs = withSignature(s, d)
        .select(col("vec_id"), col("sig"), col("embedding"), col("nrm"))
        .persist()
      val qs = sigs.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("sig").as("q_sig"),
          col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
      sigs.join(broadcast(qs), col("sig") === col("q_sig") && col("vec_id") =!= col("q_id"))
        .withColumn("cos", dotD(col("embedding"), col("q_emb")) / (col("nrm") * col("q_nrm")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
          round(col("cos"), 6).as("cos_sim"))
        .orderBy(col("q_id"), col("rank"))
    }),

    // Embedding drift monitor (the MLOps gate a production pipeline runs
    // between ingest windows): per-label exact centroids of a reference
    // and a current window (vec_id parity stands in for the time split —
    // deterministic and balanced) and the L2 shift between them. A rising
    // drift_l2 is the canonical "retrain / investigate" signal. Exactness:
    // centroid components are DECIMAL sums / counts (order-independent);
    // the 64-term drift fold runs in fixed dimension order — every double
    // op is reproducible cross-engine. Scale shape: one (label, win, dim)
    // hash agg over exploded dims (two-phase, distributes per-dim work),
    // then label-keyed joins of centroid rows — the corpus never joins.
    "sim_centroid_drift" -> ((s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(28, 12)
      val e = Tables.embeddings(s, d).withColumn("win", col("vec_id") % 2 === 0)
      val cents = e.select(col("label"), col("win"),
          posexplode(col("embedding")).as(Seq("i", "x")))
        .groupBy(col("label"), col("win"), col("i"))
        .agg((sum(col("x").cast(dec)).cast("double") / count(lit(1))).as("c"))
        .groupBy(col("label"), col("win"))
        .agg(expr("transform(array_sort(collect_list(struct(i, c))), t -> t.c)")
          .as("centroid"))
      val ref = cents.filter(col("win")).select(col("label"), col("centroid").as("c_ref"))
      val cur = cents.filter(!col("win")).select(col("label"), col("centroid").as("c_cur"))
      val counts = e.groupBy(col("label")).agg(
        sum(when(col("win"), 1L).otherwise(0L)).as("n_ref"),
        sum(when(!col("win"), 1L).otherwise(0L)).as("n_cur"))
      ref.join(cur, "label").join(counts, "label")
        .select(col("label"), col("n_ref"), col("n_cur"),
          round(sqrt(aggregate(zip_with(col("c_ref"), col("c_cur"),
              (x, y) => (x - y) * (x - y)),
            lit(0.0), (a, v) => a + v)), 6).as("drift_l2"))
        .orderBy(col("label"))
    }),

    // ColBERT-style late interaction (MaxSim): each 64-dim vector is
    // treated as 8 token sub-vectors of 8 dims; score(q, d) =
    // Σ_i max_j ⟨q_i, d_j⟩ — the multi-vector retrieval scoring a
    // single-vector cosine cannot express (per-token soft alignment).
    // Determinism: every ⟨·,·⟩ is the fused left-to-right double fold,
    // max is exact, and the 8 maxes sum in fixed literal order — no
    // data-dependent float order anywhere. Scale shape: the query set
    // broadcasts and the corpus scans ONCE with a narrow 64-dot score
    // map (queries ≪ corpus, same plan family as sim_topk_brute); at
    // index scale the LSH/IVF buckets gate the candidate set first and
    // this scoring runs only on candidates.
    "sim_maxsim" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val qs = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val score = (0 until 8).map { i =>
        greatest((0 until 8).map { j =>
          dotD(slice(col("q_emb"), i * 8 + 1, 8), slice(col("embedding"), j * 8 + 1, 8))
        }: _*)
      }.reduce(_ + _)
      val w = Window.partitionBy(col("q_id")).orderBy(col("ms").desc, col("vec_id"))
      e.crossJoin(broadcast(qs))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("ms", score)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
          round(col("ms"), 6).as("maxsim"))
        .orderBy(col("q_id"), col("rank"))
    }),

    // MATRYOSHKA two-stage retrieval: coarse-rank on the FIRST 16 of 64
    // dims (truncatable-embedding serving), keep top-50 candidates, then
    // exact full-dim re-rank to top-3. The prefix slice is a narrow map;
    // at scale the prefix lives as its own parquet column so the coarse
    // scan reads 4× fewer bytes and the index (IVF/LSH) is built over
    // 16-dim vectors — the full 64-dim read happens only for the 50
    // survivors per query. Candidate-gate quality vs the full-dim truth
    // is gated by sim_matryoshka_recall below.
    "sim_matryoshka" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .withColumn("pre", slice(col("embedding"), 1, 16))
        .withColumn("pnrm", sqrt(dotD(col("pre"), col("pre"))))
        .withColumn("nrm", sqrt(dotD(col("embedding"), col("embedding"))))
      val qs = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("pre").as("q_pre"),
          col("pnrm").as("q_pnrm"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
      val wPre = Window.partitionBy(col("q_id")).orderBy(col("pcos").desc, col("vec_id"))
      val wFull = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
      e.crossJoin(broadcast(qs))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("pcos", dotD(col("pre"), col("q_pre")) / (col("pnrm") * col("q_pnrm")))
        .withColumn("pr", row_number().over(wPre))
        .filter(col("pr") <= 50)
        .withColumn("cos", dotD(col("embedding"), col("q_emb")) / (col("nrm") * col("q_nrm")))
        .withColumn("rank", row_number().over(wFull))
        .filter(col("rank") <= 3)
        .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
          round(col("cos"), 6).as("cos_sim"))
        .orderBy(col("q_id"), col("rank"))
    }),

    // Recall@3 of the 16-dim prefix ranking vs the full-dim truth — the
    // quality side of the 4× cost cut (the sim_ivf_recall gate pattern).
    "sim_matryoshka_recall" -> ((s, d) => {
      val brute = queries("sim_topk_brute")(s, d).filter(col("rank") <= 3)
        .select(col("q_id"), col("neighbor_id"))
      val pre = queries("sim_matryoshka")(s, d)
        .select(col("q_id"), col("neighbor_id"))
      val hits = pre.join(brute, Seq("q_id", "neighbor_id"), "left_semi")
        .groupBy(col("q_id")).agg(count(lit(1)).as("n_hits"))
      brute.groupBy(col("q_id")).agg(count(lit(1)).as("n_true"))
        .join(hits, Seq("q_id"), "left")
        .select(col("q_id"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"), col("n_true"),
          round(coalesce(col("n_hits"), lit(0L)).cast("double") / col("n_true"), 6)
            .as("recall_at_3"))
        .orderBy(col("q_id"))
    }),

    // BINARY (sign-bit) quantization ANN — the 1-bit compression point on
    // the quantization ladder (float32 → int8 `sim_quantized_topk` → PQ
    // `sim_pq_adc` → 16-dim prefix `sim_matryoshka` → 1 bit/dim here),
    // in its production two-stage shape: dims 0..62 pack their sign bits
    // into ONE long (63 bits — sign bit clear so the value compares
    // cleanly as signed int64 on both engines, the mm_phash convention),
    // the Hamming prescreen (bit_count(xor) — pure integer ops over
    // 8-byte codes, 64 bytes/vector → 8) keeps top-50 candidates, and
    // exact cosine re-ranks ONLY the survivors. The pack is one narrow
    // map (a fold over the array, no 64-term codegen); candidate-gate
    // quality vs full-precision truth is gated by sim_binary_recall.
    "sim_binary_ann" -> ((s, d) => {
      val packed = Tables.embeddings(s, d).withColumn("bits", expr(
        "aggregate(transform(sequence(0, 62), " +
          "j -> IF(element_at(embedding, j + 1) > 0F, shiftleft(1L, j), 0L)), " +
          "0L, (a, x) -> a + x)"))
        .withColumn("nrm", sqrt(dotD(col("embedding"), col("embedding"))))
        .select(col("vec_id"), col("bits"), col("embedding"), col("nrm"))
      val qs = packed.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("bits").as("q_bits"),
          col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
      val wH = Window.partitionBy(col("q_id")).orderBy(col("hamming"), col("vec_id"))
      val wC = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
      packed.crossJoin(broadcast(qs))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("hamming", bit_count(col("bits").bitwiseXOR(col("q_bits"))))
        .withColumn("hr", row_number().over(wH))
        .filter(col("hr") <= 50)
        .withColumn("cos", dotD(col("embedding"), col("q_emb")) / (col("nrm") * col("q_nrm")))
        .withColumn("rank", row_number().over(wC))
        .filter(col("rank") <= 3)
        .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
          round(col("cos"), 6).as("cos_sim"))
        .orderBy(col("q_id"), col("rank"))
    }),

    // Recall@3 of the 1-bit ranking vs full-precision truth — the
    // compression/quality trade as a measured number.
    "sim_binary_recall" -> ((s, d) => {
      val brute = queries("sim_topk_brute")(s, d).filter(col("rank") <= 3)
        .select(col("q_id"), col("neighbor_id"))
      val bin = queries("sim_binary_ann")(s, d)
        .select(col("q_id"), col("neighbor_id"))
      val hits = bin.join(brute, Seq("q_id", "neighbor_id"), "left_semi")
        .groupBy(col("q_id")).agg(count(lit(1)).as("n_hits"))
      brute.groupBy(col("q_id")).agg(count(lit(1)).as("n_true"))
        .join(hits, Seq("q_id"), "left")
        .select(col("q_id"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"), col("n_true"),
          round(coalesce(col("n_hits"), lit(0L)).cast("double") / col("n_true"), 6)
            .as("recall_at_3"))
        .orderBy(col("q_id"))
    }),

    // MARGIN-BASED mate mining (the ratio-margin criterion from
    // bitext / training-pair mining): for each of 16 query vectors the
    // best different-label mate scored by
    //   margin(x,y) = cos(x,y) / ((avg4(x) + avg4(y)) / 2)
    // where avg4(v) is the mean cosine of v to its 4 nearest
    // different-label partners. Absolute-cosine thresholds can't tell a
    // genuine match from a hub vector that is close to EVERYTHING; the
    // ratio margin normalizes each side by its own neighborhood density,
    // which is why mining pipelines use it instead of raw cosine.
    // Determinism: each denominator folds the top-4 cosines in DESC-sorted
    // order (sort_array + left fold — no data-dependent float order) and
    // divides by a literal; DuckDB mirrors with list_sort + list_reduce.
    // Scale shape: ONE corpus × broadcast(query-set) pair materialization
    // feeds the forward ranks, the backward ranks, AND both denominators;
    // at index scale the pair set comes from the IVF/LSH candidate gate
    // instead of the cross join and everything downstream is unchanged.
    "sim_margin_mining" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .withColumn("nrm", sqrt(dotD(col("embedding"), col("embedding"))))
      val qs = e.filter(col("vec_id") < 16)
        .select(col("vec_id").as("q_id"), col("label").as("q_label"),
          col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
      val pairs = e.crossJoin(broadcast(qs))
        .filter(col("label") =!= col("q_label"))
        .withColumn("cos",
          dotD(col("embedding"), col("q_emb")) / (col("nrm") * col("q_nrm")))
        .select(col("q_id"), col("vec_id"), col("cos"))
      val wF = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
      val wB = Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("q_id"))
      // one pair materialization, THREE consumers (forward denominator,
      // backward denominator, candidate list) — cache it or each branch
      // re-runs the corpus × query-set build
      val ranked = pairs
        .withColumn("rf", row_number().over(wF))
        .withColumn("rb", row_number().over(wB))
        .persist()
      def top4Sum(c: DataFrame, key: String, out: String) =
        c.groupBy(col(key)).agg(
          aggregate(sort_array(collect_list(col("cos")), asc = false),
            lit(0.0), (a, v) => a + v).as(out))
      val denomQ = top4Sum(ranked.filter(col("rf") <= 4), "q_id", "sq")
      val denomC = top4Sum(ranked.filter(col("rb") <= 4), "vec_id", "sc")
      val wM = Window.partitionBy(col("q_id")).orderBy(col("margin").desc, col("vec_id"))
      // candidates are q×8 rows — broadcast them INTO the corpus-sized
      // backward-denominator table, never shuffle the big side
      val cands = ranked.filter(col("rf") <= 8).join(broadcast(denomQ), "q_id")
      denomC.join(broadcast(cands), "vec_id")
        .withColumn("margin", col("cos") / ((col("sq") + col("sc")) / lit(8.0)))
        .withColumn("rm", row_number().over(wM))
        .filter(col("rm") === 1)
        .select(col("q_id"), col("vec_id").as("mate_id"),
          round(col("cos"), 6).as("cos_sim"), round(col("margin"), 6).as("margin"))
        .orderBy(col("q_id"))
    }),

    // MMR diversified re-rank (maximal marginal relevance): greedy
    // selection of 3 results from each query's top-8 cosine candidates,
    //   pick_i = argmax over remaining c of 0.7·rel(c) − 0.3·max_{s∈S} cos(c,s)
    // — the standard retrieval-side answer to "the top-k are 8 copies of
    // the same document". Greedy MMR is inherently sequential per query,
    // but k is a literal, so the loop UNROLLS into k-1 broadcast joins
    // against the per-query winner (5 rows each) — fully distributed, no
    // driver iteration, and the same unrolling is SQL-expressible for the
    // oracle. pick 1's score is its raw relevance (empty penalty set).
    // Scale shape: the candidate set is the expensive part (here brute
    // ranks, at index scale the ANN gate); the greedy steps touch only
    // q×8 rows regardless of corpus size.
    "sim_mmr_rerank" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .withColumn("nrm", sqrt(dotD(col("embedding"), col("embedding"))))
      val qs = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
      val wR = Window.partitionBy(col("q_id")).orderBy(col("rel").desc, col("vec_id"))
      val cands = e.crossJoin(broadcast(qs))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("rel",
          dotD(col("embedding"), col("q_emb")) / (col("nrm") * col("q_nrm")))
        .withColumn("rf", row_number().over(wR))
        .filter(col("rf") <= 8)
        .select(col("q_id"), col("vec_id"), col("rel"), col("rf"),
          col("embedding"), col("nrm"))
        .persist() // q×8 rows, consumed by every greedy step
      val s1 = cands.filter(col("rf") === 1)
        .select(col("q_id"), col("vec_id").as("s1_id"), col("rel").as("s1_rel"),
          col("embedding").as("s1_emb"), col("nrm").as("s1_nrm"))
      val rest1 = cands.filter(col("rf") > 1)
        .join(broadcast(s1), "q_id")
        .withColumn("pen1",
          dotD(col("embedding"), col("s1_emb")) / (col("nrm") * col("s1_nrm")))
        .withColumn("sc2", lit(0.7) * col("rel") - lit(0.3) * col("pen1"))
      val w2 = Window.partitionBy(col("q_id")).orderBy(col("sc2").desc, col("vec_id"))
      val t2 = rest1.withColumn("r2", row_number().over(w2)).persist()
      val s2 = t2.filter(col("r2") === 1)
        .select(col("q_id"), col("vec_id").as("s2_id"), col("sc2").as("s2_score"),
          col("embedding").as("s2_emb"), col("nrm").as("s2_nrm"))
      val w3 = Window.partitionBy(col("q_id")).orderBy(col("sc3").desc, col("vec_id"))
      val s3 = t2.filter(col("r2") > 1)
        .join(broadcast(s2), "q_id")
        .withColumn("pen2",
          dotD(col("embedding"), col("s2_emb")) / (col("nrm") * col("s2_nrm")))
        .withColumn("sc3",
          lit(0.7) * col("rel") - lit(0.3) * greatest(col("pen1"), col("pen2")))
        .withColumn("r3", row_number().over(w3))
        .filter(col("r3") === 1)
      s1.select(col("q_id"), lit(1).as("pick"), col("s1_id").as("pick_id"),
          round(col("s1_rel"), 6).as("mmr_score"))
        .unionAll(s2.select(col("q_id"), lit(2).as("pick"), col("s2_id").as("pick_id"),
          round(col("s2_score"), 6).as("mmr_score")))
        .unionAll(s3.select(col("q_id"), lit(3).as("pick"), col("vec_id").as("pick_id"),
          round(col("sc3"), 6).as("mmr_score")))
        .orderBy(col("q_id"), col("pick"))
    }))

  private val DotSql =
    "list_reduce(list_transform(list_zip(%s, %s), r -> CAST(r[1] AS DOUBLE) * CAST(r[2] AS DOUBLE)), (acc, x) -> acc + x)"

  /** One unrolled power-iteration block (DuckDB): va$n = the previous
    * iterate as a list, s$n = per-vector dot, u$n = per-position exact
    * DECIMAL sums of AᵀAv, m$n = the ∞-norm pivot, v$n = the round-9
    * quantized next iterate. `src` is the corpus CTE/table (embeddings
    * or the deflated residuals). Every block is MATERIALIZED: DuckDB
    * inlines plain CTEs, so a per-row scalar subquery like
    * `(SELECT va FROM va_n)` would re-run the ENTIRE upstream iteration
    * chain once per corpus row — exponential in the number of unrolled
    * iterations (the 7-block deflate oracle never finished without
    * the hint). */
  private def pcaIterSql(n: Int, prev: String, src: String): String =
    s"""va$n AS MATERIALIZED (SELECT list(v ORDER BY j) AS va FROM $prev),
         s$n AS MATERIALIZED (SELECT vec_id, embedding,
             ${DotSql.format("embedding", s"(SELECT va FROM va$n)")} AS s
           FROM $src),
         u$n AS MATERIALIZED (SELECT j,
             CAST(SUM(CAST(CAST(embedding[j+1] AS DOUBLE) * s AS DECIMAL(28,12))) AS DOUBLE) AS u
           FROM s$n CROSS JOIN (SELECT unnest(range(64)) AS j) jj$n GROUP BY j),
         m$n AS MATERIALIZED (SELECT u AS m FROM u$n ORDER BY abs(u) DESC, j LIMIT 1),
         v$n AS MATERIALIZED (SELECT j, round(u / (SELECT m FROM m$n), 9) AS v FROM u$n)"""
  // Squared L2 distance with the same left-to-right double fold as Spark's
  // zip_with+aggregate (0.0-seeded fold ≡ first-element-seeded: 0.0+x = x).
  private[queries] val DistSql =
    ("list_reduce(list_transform(list_zip(%s, %s), " +
      "r -> (CAST(r[1] AS DOUBLE) - CAST(r[2] AS DOUBLE)) * " +
      "(CAST(r[1] AS DOUBLE) - CAST(r[2] AS DOUBLE))), (acc, x) -> acc + x)")

  /** Brute-force exact top-10 oracle SQL — also the ground truth for the
    * ANN recall gate. */
  private lazy val BruteAnnSql =
    s"""SELECT q_id, rank, neighbor_id, cos_sim FROM (
           SELECT q.vec_id AS q_id, e.vec_id AS neighbor_id,
             round(${cosSql("e.embedding", "q.embedding")}, 6) AS cos_sim,
             ROW_NUMBER() OVER (PARTITION BY q.vec_id
               ORDER BY ${cosSql("e.embedding", "q.embedding")} DESC, e.vec_id) AS rank
           FROM embeddings e CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 5) q
           WHERE e.vec_id <> q.vec_id) t
         WHERE rank <= 10 ORDER BY q_id, rank"""

  /** 63-sign-bit Hamming ranking oracle SQL — shared by sim_binary_ann
    * and its recall gate. */
  private lazy val BinaryAnnSql =
    s"""WITH packed AS (
           SELECT vec_id, embedding,
             list_reduce(list_transform(range(0, 63),
               j -> CASE WHEN embedding[CAST(j AS INT) + 1] > 0 THEN (1::BIGINT << j) ELSE 0::BIGINT END),
               (a, b) -> a + b) AS bits
           FROM embeddings)
         SELECT q_id, rank, neighbor_id, cos_sim FROM (
           SELECT q_id, neighbor_id, round(${cosSql("emb", "qemb")}, 6) AS cos_sim,
             ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY ${cosSql("emb", "qemb")} DESC, neighbor_id) AS rank
           FROM (
             SELECT q.vec_id AS q_id, e.vec_id AS neighbor_id,
               e.embedding AS emb, q.embedding AS qemb,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                 ORDER BY bit_count(xor(e.bits, q.bits)), e.vec_id) AS hr
             FROM packed e CROSS JOIN (SELECT * FROM packed WHERE vec_id < 5) q
             WHERE e.vec_id <> q.vec_id) c
           WHERE hr <= 50) t
         WHERE rank <= 3 ORDER BY q_id, rank"""

  /** 16-dim-prefix coarse → exact re-rank (Matryoshka) oracle SQL —
    * shared by sim_matryoshka and its recall gate. */
  private lazy val MatryoshkaSql =
    s"""SELECT q_id, rank, neighbor_id, cos_sim FROM (
           SELECT q_id, neighbor_id,
             round(${cosSql("emb", "qemb")}, 6) AS cos_sim,
             ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY ${cosSql("emb", "qemb")} DESC, neighbor_id) AS rank
           FROM (
             SELECT q.vec_id AS q_id, e.vec_id AS neighbor_id,
               e.embedding AS emb, q.embedding AS qemb,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                 ORDER BY ${cosSql("list_slice(e.embedding, 1, 16)", "list_slice(q.embedding, 1, 16)")} DESC, e.vec_id) AS pr
             FROM embeddings e CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 5) q
             WHERE e.vec_id <> q.vec_id) c
           WHERE pr <= 50) t
         WHERE rank <= 3 ORDER BY q_id, rank"""

  /** IVF nprobe=2 ANN oracle SQL — shared by sim_ivf_ann and its recall
    * gate. */
  private lazy val IvfAnnSql =
    s"""WITH cents AS (SELECT vec_id AS c_id, embedding AS c_emb FROM embeddings WHERE vec_id < 8),
           assigned AS (
             SELECT e.vec_id, e.embedding, c.c_id,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY ${cosSql("e.embedding", "c.c_emb")} DESC, c.c_id) AS crank
             FROM embeddings e CROSS JOIN cents c),
           corpus AS (SELECT vec_id, embedding, c_id AS cell FROM assigned WHERE crank = 1),
           probes AS (SELECT vec_id AS q_id, embedding AS q_emb, c_id AS q_cell
                      FROM assigned WHERE vec_id < 5 AND crank <= 2)
         SELECT q_id, rank, neighbor_id, cos_sim FROM (
           SELECT p.q_id, c.vec_id AS neighbor_id,
             round(${cosSql("c.embedding", "p.q_emb")}, 6) AS cos_sim,
             ROW_NUMBER() OVER (PARTITION BY p.q_id
               ORDER BY ${cosSql("c.embedding", "p.q_emb")} DESC, c.vec_id) AS rank
           FROM corpus c JOIN probes p ON c.cell = p.q_cell AND c.vec_id <> p.q_id) t
         WHERE rank <= 3 ORDER BY q_id, rank"""

  /** The PQ encode→decode CTE block (jj/sub/cb/codes/deq) — [[pqDeq]]'s
    * DuckDB twin, shared by PqAdcSql and the composed IVF+PQ oracle. */
  private lazy val PqDeqCtes =
    s"""jj AS (SELECT unnest(range(8)) AS j),
         sub AS (
           SELECT e.vec_id, j, list_slice(e.embedding, j*8+1, j*8+8) AS sv
           FROM embeddings e CROSS JOIN jj),
         cb AS (
           SELECT e.vec_id AS c, j, list_slice(e.embedding, j*8+1, j*8+8) AS cv
           FROM embeddings e CROSS JOIN jj WHERE e.vec_id < 8),
         codes AS (
           SELECT s.vec_id, s.j, c.cv
           FROM sub s JOIN cb c USING (j)
           QUALIFY row_number() OVER (PARTITION BY s.vec_id, s.j
             ORDER BY ${DistSql.format("s.sv", "c.cv")}, c.c) = 1),
         deq AS (
           SELECT vec_id, flatten(list(cv ORDER BY j)) AS v
           FROM codes GROUP BY vec_id)"""

  /** PQ asymmetric-distance top-10 oracle SQL — shared by sim_pq_adc and
    * its recall gate. */
  private lazy val PqAdcSql =
    s"""WITH $PqDeqCtes,
         qs AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 5)
         SELECT q_id, rank, neighbor_id, cos_sim FROM (
           SELECT q.q_id, e.vec_id AS neighbor_id,
             round(${cosSql("e.v", "q.q_emb")}, 6) AS cos_sim,
             ROW_NUMBER() OVER (PARTITION BY q.q_id
               ORDER BY ${cosSql("e.v", "q.q_emb")} DESC, e.vec_id) AS rank
           FROM deq e CROSS JOIN qs q WHERE e.vec_id <> q.q_id) t
         WHERE rank <= 10 ORDER BY q_id, rank"""

  /** Composed IVF+PQ oracle SQL — shared by sim_ivf_pq and its recall
    * gate. */
  private lazy val IvfPqSql =
    s"""WITH $PqDeqCtes,
         cents AS (SELECT vec_id AS c_id, embedding AS c_emb FROM embeddings WHERE vec_id < 8),
         assigned AS (
           SELECT e.vec_id, e.embedding, c.c_id,
             ROW_NUMBER() OVER (PARTITION BY e.vec_id
               ORDER BY ${cosSql("e.embedding", "c.c_emb")} DESC, c.c_id) AS crank
           FROM embeddings e CROSS JOIN cents c),
         corpus AS (
           SELECT a.vec_id, dq.v, a.c_id AS cell
           FROM assigned a JOIN deq dq USING (vec_id) WHERE crank = 1),
         probes AS (SELECT vec_id AS q_id, embedding AS q_emb, c_id AS q_cell
                    FROM assigned WHERE vec_id < 5 AND crank <= 2)
         SELECT q_id, rank, neighbor_id, cos_sim FROM (
           SELECT p.q_id, c.vec_id AS neighbor_id,
             round(${cosSql("c.v", "p.q_emb")}, 6) AS cos_sim,
             ROW_NUMBER() OVER (PARTITION BY p.q_id
               ORDER BY ${cosSql("c.v", "p.q_emb")} DESC, c.vec_id) AS rank
           FROM corpus c JOIN probes p ON c.cell = p.q_cell AND c.vec_id <> p.q_id) t
         WHERE rank <= 3 ORDER BY q_id, rank"""

  /** LSH-bucketed ANN oracle SQL — the candidate whose recall the gate
    * measures. */
  private lazy val LshAnnSql =
    s"""WITH sigs AS ($SigSql)
         SELECT q_id, rank, neighbor_id, cos_sim FROM (
           SELECT q.vec_id AS q_id, e.vec_id AS neighbor_id,
             round(${cosSql("e.embedding", "q.embedding")}, 6) AS cos_sim,
             ROW_NUMBER() OVER (PARTITION BY q.vec_id
               ORDER BY ${cosSql("e.embedding", "q.embedding")} DESC, e.vec_id) AS rank
           FROM sigs e JOIN (SELECT * FROM sigs WHERE vec_id < 5) q
             ON e.sig = q.sig AND e.vec_id <> q.vec_id) t
         WHERE rank <= 3 ORDER BY q_id, rank"""

  /** Shared CTE chain training the one-update Lloyd centroids (c1) —
    * mirrors [[lloydCentroids]]; consumed by the sim_kmeans and
    * sim_ivf_trained oracles. */
  private lazy val KmeansTrainSql =
    s"""c0 AS (
           SELECT vec_id AS cid, embedding AS centroid
           FROM embeddings WHERE vec_id < 8),
         a1 AS (
           SELECT e.vec_id, c.cid, e.embedding
           FROM embeddings e CROSS JOIN c0 c
           QUALIFY row_number() OVER (PARTITION BY e.vec_id
             ORDER BY ${DistSql.format("e.embedding", "c.centroid")}, c.cid) = 1),
         ex AS (
           SELECT a.cid, i, CAST(a.embedding[i+1] AS DOUBLE) AS x
           FROM a1 a CROSS JOIN (SELECT unnest(range(64)) AS i) ii),
         c1d AS (
           SELECT cid, i,
             CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS c
           FROM ex GROUP BY cid, i),
         c1 AS (SELECT cid, list(c ORDER BY i) AS centroid FROM c1d GROUP BY cid)"""
  private[queries] def cosSql(a: String, b: String) =
    s"${DotSql.format(a, b)} / (sqrt(${DotSql.format(a, a)}) * sqrt(${DotSql.format(b, b)}))"
  // CAST the SUM to BIGINT: DuckDB's integer SUM yields HUGEINT (int128),
  // which pandas (the gate's comparator) widens to float64 — "211.0" vs
  // Spark's "211" would hash-mismatch on otherwise identical values.
  private val SigSql =
    s"""SELECT e.vec_id, e.label, e.embedding,
          CAST(SUM(CASE WHEN ${DotSql.format("e.embedding", "p.embedding")} > 0
                   THEN 1 << p.vec_id ELSE 0 END) AS BIGINT) AS sig
        FROM embeddings e CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 8) p
        GROUP BY e.vec_id, e.label, e.embedding"""

  val oracleSql: Map[String, String] = Map(
    "sim_topk_brute" -> BruteAnnSql,

    // unrolled farthest-point traversal: d_t = running min distance to the
    // selected set (LEAST chain ≡ Spark's fresh array_min over all centers
    // — min is associative over exact doubles), p_t = argmax with the
    // min-vec_id tiebreak
    "sim_kcenter" -> {
      val steps = (2 to 8).map { t =>
        val prev = s"d${t - 1}"
        s""", p$t AS (SELECT vec_id, embedding, d FROM $prev
               ORDER BY d DESC, vec_id LIMIT 1),
             d$t AS (SELECT x.vec_id, x.embedding,
                 LEAST(x.d, ${DistSql.format("x.embedding", "p.embedding")}) AS d
               FROM $prev x CROSS JOIN p$t p)"""
      }.mkString
      val sel = (2 to 8).map(t =>
        s"UNION ALL SELECT $t, vec_id, round(d, 6) FROM p$t").mkString("\n")
      s"""WITH c1 AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
            d1 AS (SELECT e.vec_id, e.embedding,
                ${DistSql.format("e.embedding", "c1.embedding")} AS d
              FROM embeddings e CROSS JOIN c1)
            $steps
         SELECT * FROM (
           SELECT 1 AS step, CAST(0 AS BIGINT) AS vec_id,
             CAST(0.0 AS DOUBLE) AS dist
           $sel) t ORDER BY step"""
    },

    "sim_binary_ann" -> BinaryAnnSql,

    "sim_binary_recall" ->
      s"""WITH brute AS ($BruteAnnSql),
         bin AS ($BinaryAnnSql),
         b3 AS (SELECT q_id, neighbor_id FROM brute WHERE rank <= 3),
         hits AS (
           SELECT l.q_id, COUNT(*) AS n_hits FROM bin l
           JOIN b3 ON l.q_id = b3.q_id AND l.neighbor_id = b3.neighbor_id
           GROUP BY l.q_id),
         truth AS (SELECT q_id, COUNT(*) AS n_true FROM b3 GROUP BY q_id)
         SELECT t.q_id, COALESCE(h.n_hits, 0) AS n_hits, t.n_true,
           round(CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / t.n_true, 6) AS recall_at_3
         FROM truth t LEFT JOIN hits h ON t.q_id = h.q_id ORDER BY t.q_id""",

    "sim_matryoshka" -> MatryoshkaSql,

    "sim_matryoshka_recall" ->
      s"""WITH brute AS ($BruteAnnSql),
         pre AS ($MatryoshkaSql),
         b3 AS (SELECT q_id, neighbor_id FROM brute WHERE rank <= 3),
         hits AS (
           SELECT l.q_id, COUNT(*) AS n_hits FROM pre l
           JOIN b3 ON l.q_id = b3.q_id AND l.neighbor_id = b3.neighbor_id
           GROUP BY l.q_id),
         truth AS (SELECT q_id, COUNT(*) AS n_true FROM b3 GROUP BY q_id)
         SELECT t.q_id, COALESCE(h.n_hits, 0) AS n_hits, t.n_true,
           round(CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / t.n_true, 6) AS recall_at_3
         FROM truth t LEFT JOIN hits h ON t.q_id = h.q_id ORDER BY t.q_id""",

    // Ratio-margin mate mining: denominators fold the DESC-sorted top-4
    // cosines (list_sort + list_reduce ≡ Spark's sort_array + aggregate;
    // the 0.0 seed is fold-neutral).
    "sim_margin_mining" ->
      s"""WITH pairs AS (
             SELECT q.vec_id AS q_id, e.vec_id AS vec_id,
               ${cosSql("e.embedding", "q.embedding")} AS cos
             FROM embeddings e CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 16) q
             WHERE e.label <> q.label),
           ranked AS (
             SELECT *,
               ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rf,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, q_id) AS rb
             FROM pairs),
           dq AS (SELECT q_id, list_reduce(list_sort(list(cos), 'DESC'), (a, b) -> a + b) AS sq
                  FROM ranked WHERE rf <= 4 GROUP BY q_id),
           dc AS (SELECT vec_id, list_reduce(list_sort(list(cos), 'DESC'), (a, b) -> a + b) AS sc
                  FROM ranked WHERE rb <= 4 GROUP BY vec_id),
           scored AS (
             SELECT r.q_id, r.vec_id, r.cos,
               r.cos / ((dq.sq + dc.sc) / 8.0) AS margin
             FROM ranked r JOIN dq USING (q_id) JOIN dc USING (vec_id)
             WHERE r.rf <= 8)
         SELECT q_id, vec_id AS mate_id, round(cos, 6) AS cos_sim,
           round(margin, 6) AS margin
         FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                 ORDER BY margin DESC, vec_id) AS rm FROM scored) t
         WHERE rm = 1 ORDER BY q_id""",

    // Unrolled greedy MMR (k=3, lambda=0.7) over each query's top-8
    // cosine candidates — the same fixed-k unrolling as the Spark plan.
    "sim_mmr_rerank" ->
      s"""WITH cands AS (
             SELECT * FROM (
               SELECT q.vec_id AS q_id, e.vec_id AS vec_id,
                 ${cosSql("e.embedding", "q.embedding")} AS rel,
                 e.embedding AS emb,
                 ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY ${cosSql("e.embedding", "q.embedding")} DESC, e.vec_id) AS rf
               FROM embeddings e CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 5) q
               WHERE e.vec_id <> q.vec_id) t
             WHERE rf <= 8),
           s1 AS (SELECT q_id, vec_id AS s1_id, rel AS s1_rel, emb AS s1_emb
                  FROM cands WHERE rf = 1),
           rest1 AS (
             SELECT c.q_id, c.vec_id, c.rel, c.emb,
               ${cosSql("c.emb", "s.s1_emb")} AS pen1,
               0.7 * c.rel - 0.3 * ${cosSql("c.emb", "s.s1_emb")} AS sc2
             FROM cands c JOIN s1 s USING (q_id) WHERE c.rf > 1),
           t2 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                    ORDER BY sc2 DESC, vec_id) AS r2 FROM rest1),
           s2 AS (SELECT q_id, vec_id AS s2_id, sc2 AS s2_score, emb AS s2_emb
                  FROM t2 WHERE r2 = 1),
           rest2 AS (
             SELECT t.q_id, t.vec_id,
               0.7 * t.rel - 0.3 * greatest(t.pen1, ${cosSql("t.emb", "s.s2_emb")}) AS sc3
             FROM t2 t JOIN s2 s USING (q_id) WHERE t.r2 > 1),
           s3 AS (SELECT q_id, vec_id, sc3,
                    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sc3 DESC, vec_id) AS r3
                  FROM rest2)
         SELECT q_id, pick, pick_id, mmr_score FROM (
           SELECT q_id, 1 AS pick, s1_id AS pick_id, round(s1_rel, 6) AS mmr_score FROM s1
           UNION ALL SELECT q_id, 2, s2_id, round(s2_score, 6) FROM s2
           UNION ALL SELECT q_id, 3, vec_id, round(sc3, 6) FROM s3 WHERE r3 = 1) u
         ORDER BY q_id, pick""",

    "sim_hard_negatives" ->
      s"""SELECT q_id, rank, negative_id, neg_label, cos_sim FROM (
           SELECT q.vec_id AS q_id, e.vec_id AS negative_id, e.label AS neg_label,
             round(${cosSql("e.embedding", "q.embedding")}, 6) AS cos_sim,
             ROW_NUMBER() OVER (PARTITION BY q.vec_id
               ORDER BY ${cosSql("e.embedding", "q.embedding")} DESC, e.vec_id) AS rank
           FROM embeddings e CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 5) q
           WHERE e.label <> q.label) t
         WHERE rank <= 3 ORDER BY q_id, rank""",

    "sim_knn_clusters" ->
      s"""WITH RECURSIVE knn AS (
           SELECT src, dst FROM (
             SELECT a.vec_id AS src, b.vec_id AS dst,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                 ORDER BY ${cosSql("a.embedding", "b.embedding")} DESC, b.vec_id)
                 AS rank
             FROM embeddings a JOIN embeddings b
               ON a.label = b.label AND a.vec_id <> b.vec_id) t
           WHERE rank <= 3),
         pairs AS (
           SELECT x.src AS a_id, x.dst AS b_id FROM knn x JOIN knn y
             ON x.src = y.dst AND x.dst = y.src
           WHERE x.src < x.dst),
         edges AS (SELECT a_id AS u, b_id AS v FROM pairs
                   UNION SELECT b_id AS u, a_id AS v FROM pairs),
         reach AS (
           SELECT u, v FROM edges
           UNION
           SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)
         SELECT u AS vec_id, LEAST(u, MIN(v)) AS cluster
         FROM reach GROUP BY u ORDER BY vec_id""",

    "sim_triangles" ->
      s"""WITH knn AS (
           SELECT src, dst FROM (
             SELECT a.vec_id AS src, b.vec_id AS dst,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                 ORDER BY ${cosSql("a.embedding", "b.embedding")} DESC, b.vec_id)
                 AS rank
             FROM embeddings a JOIN embeddings b
               ON a.label = b.label AND a.vec_id <> b.vec_id) t
           WHERE rank <= 3),
         pairs AS (
           SELECT x.src AS a, x.dst AS b FROM knn x JOIN knn y
             ON x.src = y.dst AND x.dst = y.src
           WHERE x.src < x.dst),
         tri AS (
           SELECT e1.a AS x, e1.b AS y, e2.b AS z
           FROM pairs e1
           JOIN pairs e2 ON e1.b = e2.a
           JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b),
         verts AS (
           SELECT x AS vec_id FROM tri
           UNION ALL SELECT y FROM tri
           UNION ALL SELECT z FROM tri)
         SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
         FROM verts GROUP BY vec_id ORDER BY vec_id""",

    "sim_bfs_hops" ->
      s"""WITH RECURSIVE knn AS (
           SELECT src, dst FROM (
             SELECT a.vec_id AS src, b.vec_id AS dst,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                 ORDER BY ${cosSql("a.embedding", "b.embedding")} DESC, b.vec_id)
                 AS rank
             FROM embeddings a JOIN embeddings b
               ON a.label = b.label AND a.vec_id <> b.vec_id) t
           WHERE rank <= 3),
         pairs AS (
           SELECT x.src AS a, x.dst AS b FROM knn x JOIN knn y
             ON x.src = y.dst AND x.dst = y.src
           WHERE x.src < x.dst),
         edges AS (SELECT a AS u, b AS w FROM pairs
                   UNION SELECT b AS u, a AS w FROM pairs),
         src AS (SELECT MIN(u) AS s FROM edges),
         bfs AS (
           SELECT s AS v, 0 AS h FROM src
           UNION
           SELECT e.w, bfs.h + 1 FROM bfs JOIN edges e ON e.u = bfs.v
           WHERE bfs.h < 6)
         SELECT v AS vec_id, CAST(MIN(h) AS BIGINT) AS hops
         FROM bfs GROUP BY v ORDER BY vec_id""",

    // the same 6 greedy hops unrolled (MATERIALIZED — the pcaIterSql trap);
    // identical cosine chains and (cos DESC, cand) tie-break per hop
    "sim_nsw_search" -> {
      def hopSql(n: Int): String =
        s"""h$n AS MATERIALIZED (
           SELECT q_id, cand AS cur FROM (
             SELECT c.q_id, c.cand,
               ROW_NUMBER() OVER (PARTITION BY c.q_id ORDER BY s.cos DESC, c.cand) AS rk
             FROM (
               SELECT s.q_id, e.dst AS cand FROM h${n - 1} s JOIN wedges e ON e.src = s.cur
               UNION SELECT q_id, cur FROM h${n - 1}) c
             JOIN scored s ON s.q_id = c.q_id AND s.vec_id = c.cand) t
           WHERE rk <= 3)"""
      s"""WITH wedges AS MATERIALIZED (
           SELECT src, dst FROM (
             SELECT a.vec_id AS src, b.vec_id AS dst,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                 ORDER BY ${cosSql("a.embedding", "b.embedding")} DESC, b.vec_id) AS rank
             FROM embeddings a JOIN embeddings b
               ON a.label = b.label AND a.vec_id <> b.vec_id) t
           WHERE rank <= 8),
         scored AS MATERIALIZED (
           SELECT q.vec_id AS q_id, c.vec_id,
             ${cosSql("c.embedding", "q.embedding")} AS cos
           FROM embeddings q JOIN embeddings c
             ON q.vec_id < 5 AND c.label = q.label AND c.vec_id <> q.vec_id),
         h0 AS MATERIALIZED (SELECT q_id, MIN(vec_id) AS cur FROM scored GROUP BY q_id),
         ${hopSql(1)}, ${hopSql(2)}, ${hopSql(3)},
         ${hopSql(4)}, ${hopSql(5)}, ${hopSql(6)},
         fnd AS MATERIALIZED (
           SELECT q_id, cur AS found_id, cos AS found_cos FROM (
             SELECT h6.q_id, h6.cur, s.cos,
               ROW_NUMBER() OVER (PARTITION BY h6.q_id ORDER BY s.cos DESC, h6.cur) AS rk
             FROM h6 JOIN scored s ON s.q_id = h6.q_id AND s.vec_id = h6.cur) t
           WHERE rk = 1),
         best AS MATERIALIZED (
           SELECT q_id, vec_id AS best_id, cos AS best_cos FROM (
             SELECT q_id, vec_id, cos,
               ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rk
             FROM scored) t
           WHERE rk = 1)
         SELECT fnd.q_id AS q_id, h0.cur AS entry_id, fnd.found_id,
           round(fnd.found_cos, 6) AS found_cos,
           fnd.found_id = best.best_id AS reached_cell_best,
           round(fnd.found_cos / best.best_cos, 6) AS quality_ratio
         FROM fnd JOIN h0 ON fnd.q_id = h0.q_id
         JOIN best ON best.q_id = fnd.q_id
         ORDER BY fnd.q_id"""
    },

    "sim_knn_graph" ->
      s"""SELECT src, rank, dst, cos_sim FROM (
           SELECT a.vec_id AS src, b.vec_id AS dst,
             round(${cosSql("a.embedding", "b.embedding")}, 6) AS cos_sim,
             ROW_NUMBER() OVER (PARTITION BY a.vec_id
               ORDER BY ${cosSql("a.embedding", "b.embedding")} DESC, b.vec_id)
               AS rank
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id <> b.vec_id) t
         WHERE rank <= 3 ORDER BY src, rank""",

    "sim_ivf_recall" ->
      s"""WITH brute AS ($BruteAnnSql),
         ivf AS ($IvfAnnSql),
         b3 AS (SELECT q_id, neighbor_id FROM brute WHERE rank <= 3),
         hits AS (
           SELECT l.q_id, COUNT(*) AS n_hits FROM ivf l
           JOIN b3 ON l.q_id = b3.q_id AND l.neighbor_id = b3.neighbor_id
           GROUP BY l.q_id),
         truth AS (SELECT q_id, COUNT(*) AS n_true FROM b3 GROUP BY q_id)
         SELECT t.q_id, COALESCE(h.n_hits, 0) AS n_hits, t.n_true,
           round(CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / t.n_true, 6) AS recall_at_3
         FROM truth t LEFT JOIN hits h ON t.q_id = h.q_id ORDER BY t.q_id""",

    "sim_ann_recall" ->
      s"""WITH brute AS ($BruteAnnSql),
         lsh AS ($LshAnnSql),
         b3 AS (SELECT q_id, neighbor_id FROM brute WHERE rank <= 3),
         hits AS (
           SELECT l.q_id, COUNT(*) AS n_hits FROM lsh l
           JOIN b3 ON l.q_id = b3.q_id AND l.neighbor_id = b3.neighbor_id
           GROUP BY l.q_id),
         truth AS (SELECT q_id, COUNT(*) AS n_true FROM b3 GROUP BY q_id)
         SELECT t.q_id, COALESCE(h.n_hits, 0) AS n_hits, t.n_true,
           round(CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / t.n_true, 6) AS recall_at_3
         FROM truth t LEFT JOIN hits h ON t.q_id = h.q_id ORDER BY t.q_id""",

    "sim_lsh_buckets" ->
      s"""SELECT sig, COUNT(*) AS n_vectors, MIN(vec_id) AS min_vec_id
         FROM ($SigSql) t GROUP BY sig ORDER BY sig""",

    "sim_ivf_ann" -> s"$IvfAnnSql",

    // same assigned/corpus skeleton as IvfAnnSql, then leave-one-out
    // majority vote (count DESC, label ASC) per source vector
    "sim_knn_classify" ->
      s"""WITH cents AS (SELECT vec_id AS c_id, embedding AS c_emb
             FROM embeddings WHERE vec_id < 8),
           assigned AS (
             SELECT e.vec_id, e.label, e.embedding, c.c_id,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY ${cosSql("e.embedding", "c.c_emb")} DESC, c.c_id) AS crank
             FROM embeddings e CROSS JOIN cents c),
           corpus AS (SELECT vec_id, label, embedding, c_id AS cell
                      FROM assigned WHERE crank = 1),
           neigh AS (
             SELECT a.vec_id AS a_id, a.label AS true_label, b.label AS n_label,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                 ORDER BY ${cosSql("a.embedding", "b.embedding")} DESC, b.vec_id)
                 AS rank
             FROM corpus a JOIN corpus b
               ON a.cell = b.cell AND a.vec_id <> b.vec_id),
           votes AS (
             SELECT a_id, true_label, n_label, COUNT(*) AS votes
             FROM neigh WHERE rank <= 5 GROUP BY 1, 2, 3),
           pred AS (
             SELECT a_id, true_label, n_label FROM votes
             QUALIFY ROW_NUMBER() OVER (PARTITION BY a_id
               ORDER BY votes DESC, n_label) = 1)
         SELECT true_label, COUNT(*) AS n_classified,
           CAST(SUM(CASE WHEN n_label = true_label THEN 1 ELSE 0 END)
             AS BIGINT) AS n_correct,
           round(CAST(SUM(CASE WHEN n_label = true_label THEN 1 ELSE 0 END)
             AS DOUBLE) / COUNT(*), 6) AS accuracy
         FROM pred GROUP BY true_label ORDER BY true_label""",

    // one assigned table, three probe filters; each sweep point re-ranks
    // inside its probed cells exactly as IvfAnnSql does
    "sim_nprobe_sweep" -> {
      def block(np: Int) =
        s"""SELECT $np AS nprobe,
             (SELECT COUNT(*) FROM corpus c JOIN probes$np p
                ON c.cell = p.q_cell AND c.vec_id <> p.q_id) AS n_candidates,
             (SELECT COUNT(*) FROM (
                SELECT p.q_id, c.vec_id,
                  ROW_NUMBER() OVER (PARTITION BY p.q_id
                    ORDER BY ${cosSql("c.embedding", "p.q_emb")} DESC, c.vec_id) AS rank
                FROM corpus c JOIN probes$np p
                  ON c.cell = p.q_cell AND c.vec_id <> p.q_id) t
              JOIN b3 ON t.q_id = b3.q_id AND t.vec_id = b3.neighbor_id
              WHERE t.rank <= 3) AS n_hits,
             (SELECT COUNT(*) FROM b3) AS n_true"""
      def probes(np: Int) =
        s"""probes$np AS (SELECT vec_id AS q_id, embedding AS q_emb, c_id AS q_cell
             FROM assigned WHERE vec_id < 5 AND crank <= $np)"""
      s"""WITH brute AS ($BruteAnnSql),
           b3 AS (SELECT q_id, neighbor_id FROM brute WHERE rank <= 3),
           cents AS (SELECT vec_id AS c_id, embedding AS c_emb
                     FROM embeddings WHERE vec_id < 8),
           assigned AS (
             SELECT e.vec_id, e.embedding, c.c_id,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY ${cosSql("e.embedding", "c.c_emb")} DESC, c.c_id) AS crank
             FROM embeddings e CROSS JOIN cents c),
           corpus AS (SELECT vec_id, embedding, c_id AS cell
                      FROM assigned WHERE crank = 1),
           ${probes(1)}, ${probes(2)}, ${probes(4)}
         SELECT nprobe, n_candidates, n_hits, n_true,
           round(CAST(n_hits AS DOUBLE) / n_true, 6) AS recall_at_3
         FROM (${block(1)} UNION ALL ${block(2)} UNION ALL ${block(4)}) u
         ORDER BY nprobe"""
    },

    "sim_label_centroids" ->
      s"""WITH ex AS (
           SELECT label, i, CAST(embedding[i+1] AS DOUBLE) AS x
           FROM embeddings CROSS JOIN (SELECT unnest(range(64)) AS i) ii),
         cent AS (
           SELECT label, i,
             CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS c
           FROM ex GROUP BY label, i),
         carr AS (SELECT label, list(c ORDER BY i) AS centroid FROM cent GROUP BY label),
         cosr AS (
           SELECT e.label, c.centroid,
             ${DotSql.format("e.embedding", "c.centroid")} /
               (sqrt(${DotSql.format("e.embedding", "e.embedding")}) *
                sqrt(${DotSql.format("c.centroid", "c.centroid")})) AS cos
           FROM embeddings e JOIN carr c USING (label))
         SELECT label, COUNT(*) AS n_vectors,
           round(sqrt(${DotSql.format("centroid", "centroid")}), 6) AS centroid_norm,
           round(CAST(SUM(CAST(cos AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6) AS avg_cos,
           round(MIN(cos), 6) AS min_cos
         FROM cosr GROUP BY label, centroid ORDER BY label""",

    "sim_outliers" ->
      s"""WITH ex AS (
           SELECT label, i, CAST(embedding[i+1] AS DOUBLE) AS x
           FROM embeddings CROSS JOIN (SELECT unnest(range(64)) AS i) ii),
         cent AS (
           SELECT label, i,
             CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS c
           FROM ex GROUP BY label, i),
         carr AS (SELECT label, list(c ORDER BY i) AS centroid FROM cent GROUP BY label),
         cosr AS (
           SELECT e.vec_id, e.label,
             ${DotSql.format("e.embedding", "c.centroid")} /
               (sqrt(${DotSql.format("e.embedding", "e.embedding")}) *
                sqrt(${DotSql.format("c.centroid", "c.centroid")})) AS cos
           FROM embeddings e JOIN carr c USING (label)),
         st AS (
           SELECT label,
             CAST(SUM(CAST(cos AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS mu,
             CAST(SUM(CAST(cos * cos AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS m2
           FROM cosr GROUP BY label),
         st2 AS (
           SELECT label, mu, sqrt(greatest(m2 - mu * mu, 0.0)) AS sigma FROM st)
         SELECT vec_id, label, round(cos, 6) AS cos_sim,
           round(mu - 2.0 * sigma, 6) AS threshold
         FROM cosr JOIN st2 USING (label)
         WHERE cos < mu - 2.0 * sigma
         ORDER BY vec_id""",

    // the same three power iterations unrolled: identical fold order for
    // the dot, identical per-position DECIMAL sums, identical ∞-norm
    // quantization (round 9) between steps
    "sim_pca_power" ->
      s"""WITH v0 AS (SELECT unnest(range(64)) AS j, 0.125 AS v),
         ${pcaIterSql(1, "v0", "embeddings")},
         ${pcaIterSql(2, "v1", "embeddings")},
         ${pcaIterSql(3, "v2", "embeddings")}
         SELECT CAST(j AS INT) AS j, round(v, 6) AS loading,
           (SELECT round(m, 6) FROM m3) AS growth
         FROM v3 ORDER BY j""",

    // PC1's three iterations, the narrow deflation map, then PC2's three
    // iterations over the residuals — all unrolled; the orthogonality
    // audit folds the two quantized models left-to-right like the engine
    "sim_pca_deflate" ->
      s"""WITH v0 AS (SELECT unnest(range(64)) AS j, 0.125 AS v),
         ${pcaIterSql(1, "v0", "embeddings")},
         ${pcaIterSql(2, "v1", "embeddings")},
         ${pcaIterSql(3, "v2", "embeddings")},
         va4 AS MATERIALIZED (SELECT list(v ORDER BY j) AS va FROM v3),
         vv1 AS MATERIALIZED (SELECT ${DotSql.format("(SELECT va FROM va4)", "(SELECT va FROM va4)")} AS vv),
         defl AS MATERIALIZED (
           SELECT vec_id,
             list_transform(list_zip(embedding, (SELECT va FROM va4)),
               r -> CAST(r[1] AS DOUBLE) - c * CAST(r[2] AS DOUBLE)) AS embedding
           FROM (SELECT vec_id, embedding,
                   ${DotSql.format("embedding", "(SELECT va FROM va4)")} / (SELECT vv FROM vv1) AS c
                 FROM embeddings)),
         ${pcaIterSql(5, "v0", "defl")},
         ${pcaIterSql(6, "v5", "defl")},
         ${pcaIterSql(7, "v6", "defl")},
         va8 AS MATERIALIZED (SELECT list(v ORDER BY j) AS va FROM v7),
         ortho AS MATERIALIZED (SELECT
           ${DotSql.format("(SELECT va FROM va4)", "(SELECT va FROM va8)")} *
           ${DotSql.format("(SELECT va FROM va4)", "(SELECT va FROM va8)")} <
           0.0025 * ((SELECT vv FROM vv1) *
             ${DotSql.format("(SELECT va FROM va8)", "(SELECT va FROM va8)")}) AS ok)
         SELECT CAST(j AS INT) AS j, round(v, 6) AS loading2,
           (SELECT round(m, 6) FROM m7) AS growth2,
           (SELECT ok FROM ortho) AS orthogonal
         FROM v7 ORDER BY j""",

    "sim_silhouette" ->
      s"""WITH cents AS (SELECT vec_id AS cid, embedding AS c
                         FROM embeddings WHERE vec_id < 8),
         dd AS (
           SELECT e.vec_id, c.cid,
             sqrt(${DistSql.format("e.embedding", "c.c")}) AS dist
           FROM embeddings e CROSS JOIN cents c),
         r AS (
           SELECT vec_id, cid, dist,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
           FROM dd)
         SELECT a.vec_id, a.cid AS cell,
           ROUND(a.dist, 6) AS a_dist, ROUND(b.dist, 6) AS b_dist,
           ROUND((b.dist - a.dist) / GREATEST(a.dist, b.dist), 6) AS silhouette
         FROM r a JOIN r b ON a.vec_id = b.vec_id AND a.rk = 1 AND b.rk = 2
         ORDER BY a.vec_id""",

    "sim_kmeans" ->
      s"""WITH $KmeansTrainSql,
         a2 AS (
           SELECT e.vec_id, c.cid,
             ${DistSql.format("e.embedding", "c.centroid")} AS dist
           FROM embeddings e CROSS JOIN c1 c
           QUALIFY row_number() OVER (PARTITION BY e.vec_id
             ORDER BY dist, c.cid) = 1)
         SELECT cid AS cluster_id, COUNT(*) AS n_vectors,
           round(CAST(SUM(CAST(dist AS DECIMAL(28,12))) AS DOUBLE), 6) AS inertia
         FROM a2 GROUP BY cid ORDER BY cid""",

    "sim_ivf_trained" ->
      s"""WITH $KmeansTrainSql,
         cells AS (
           SELECT e.vec_id, e.embedding, c.cid AS cell
           FROM embeddings e CROSS JOIN c1 c
           QUALIFY row_number() OVER (PARTITION BY e.vec_id
             ORDER BY ${DistSql.format("e.embedding", "c.centroid")}, c.cid) = 1),
         probes AS (
           SELECT e.vec_id AS q_id, e.embedding AS q_emb, c.cid AS q_cell
           FROM embeddings e CROSS JOIN c1 c
           WHERE e.vec_id < 5
           QUALIFY row_number() OVER (PARTITION BY e.vec_id
             ORDER BY ${DistSql.format("e.embedding", "c.centroid")}, c.cid) <= 2)
         SELECT q_id, rank, neighbor_id, cos_sim FROM (
           SELECT p.q_id, t.vec_id AS neighbor_id,
             round(${cosSql("t.embedding", "p.q_emb")}, 6) AS cos_sim,
             row_number() OVER (PARTITION BY p.q_id
               ORDER BY ${cosSql("t.embedding", "p.q_emb")} DESC, t.vec_id) AS rank
           FROM cells t JOIN probes p ON t.cell = p.q_cell AND t.vec_id <> p.q_id) r
         WHERE rank <= 3 ORDER BY q_id, rank""",

    "sim_quantized_topk" ->
      s"""WITH bounds AS (
           SELECT i, MIN(CAST(embedding[i+1] AS DOUBLE)) AS mn,
                  MAX(CAST(embedding[i+1] AS DOUBLE)) AS mx
           FROM embeddings CROSS JOIN (SELECT unnest(range(64)) AS i) ii
           GROUP BY i),
         barr AS (SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs FROM bounds),
         coded AS (
           SELECT vec_id,
             list_transform(range(64), j ->
               CASE WHEN mxs[j+1] = mns[j+1] THEN CAST(0 AS BIGINT)
                    ELSE CAST(floor((CAST(embedding[j+1] AS DOUBLE) - mns[j+1])
                                    / (mxs[j+1] - mns[j+1]) * 255.0 + 0.5) AS BIGINT) END) AS codes
           FROM embeddings CROSS JOIN barr),
         deq AS (
           SELECT vec_id,
             list_transform(range(64), j ->
               mns[j+1] + CAST(codes[j+1] AS DOUBLE) * (mxs[j+1] - mns[j+1]) / 255.0) AS v
           FROM coded CROSS JOIN barr)
         SELECT q_id, rank, neighbor_id, cos_sim FROM (
           SELECT q.vec_id AS q_id, e.vec_id AS neighbor_id,
             round(${cosSql("e.v", "q.v")}, 6) AS cos_sim,
             ROW_NUMBER() OVER (PARTITION BY q.vec_id
               ORDER BY ${cosSql("e.v", "q.v")} DESC, e.vec_id) AS rank
           FROM deq e CROSS JOIN (SELECT * FROM deq WHERE vec_id < 5) q
           WHERE e.vec_id <> q.vec_id) t
         WHERE rank <= 10 ORDER BY q_id, rank""",

    "sim_pq_adc" -> PqAdcSql,

    "sim_pq_recall" ->
      s"""WITH brute AS ($BruteAnnSql),
         pq AS ($PqAdcSql),
         p3 AS (SELECT q_id, neighbor_id FROM pq WHERE rank <= 3),
         b3 AS (SELECT q_id, neighbor_id FROM brute WHERE rank <= 3),
         hits AS (
           SELECT l.q_id, COUNT(*) AS n_hits FROM p3 l
           JOIN b3 ON l.q_id = b3.q_id AND l.neighbor_id = b3.neighbor_id
           GROUP BY l.q_id),
         truth AS (SELECT q_id, COUNT(*) AS n_true FROM b3 GROUP BY q_id)
         SELECT t.q_id, COALESCE(h.n_hits, 0) AS n_hits, t.n_true,
           round(CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / t.n_true, 6) AS recall_at_3
         FROM truth t LEFT JOIN hits h ON t.q_id = h.q_id ORDER BY t.q_id""",

    "sim_lsh_ann" -> LshAnnSql,

    "sim_ivf_pq" -> IvfPqSql,

    "sim_ivf_pq_recall" ->
      s"""WITH brute AS ($BruteAnnSql),
         ivfpq AS ($IvfPqSql),
         b3 AS (SELECT q_id, neighbor_id FROM brute WHERE rank <= 3),
         hits AS (
           SELECT l.q_id, COUNT(*) AS n_hits FROM ivfpq l
           JOIN b3 ON l.q_id = b3.q_id AND l.neighbor_id = b3.neighbor_id
           GROUP BY l.q_id),
         truth AS (SELECT q_id, COUNT(*) AS n_true FROM b3 GROUP BY q_id)
         SELECT t.q_id, COALESCE(h.n_hits, 0) AS n_hits, t.n_true,
           round(CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / t.n_true, 6) AS recall_at_3
         FROM truth t LEFT JOIN hits h ON t.q_id = h.q_id ORDER BY t.q_id""",

    "sim_centroid_drift" ->
      """WITH ex AS (
           SELECT label, vec_id % 2 = 0 AS win, i,
             CAST(embedding[CAST(i AS INT) + 1] AS DOUBLE) AS x
           FROM embeddings CROSS JOIN (SELECT unnest(range(64)) AS i) ii),
         cent AS (
           SELECT label, win, i,
             CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS c
           FROM ex GROUP BY label, win, i),
         cl AS (
           SELECT label, win,
             list_transform(list_sort(list({'i': i, 'c': c})), t -> t.c) AS centroid
           FROM cent GROUP BY label, win),
         counts AS (
           SELECT label,
             CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
             CAST(SUM(CASE WHEN vec_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
           FROM embeddings GROUP BY label)
         SELECT r.label, n_ref, n_cur,
           round(sqrt(list_reduce(list_transform(list_zip(r.centroid, u.centroid),
             p -> (p[1] - p[2]) * (p[1] - p[2])), (a, b) -> a + b)), 6) AS drift_l2
         FROM cl r JOIN cl u ON r.label = u.label AND r.win AND NOT u.win
         JOIN counts ON counts.label = r.label
         ORDER BY r.label""",

    "sim_maxsim" -> {
      val score = (0 until 8).map { i =>
        "greatest(" + (0 until 8).map { j =>
          DotSql.format(
            s"q.embedding[${i * 8 + 1}:${i * 8 + 8}]",
            s"e.embedding[${j * 8 + 1}:${j * 8 + 8}]")
        }.mkString(", ") + ")"
      }.mkString(" + ")
      s"""WITH sc AS (
           SELECT q.vec_id AS q_id, e.vec_id AS neighbor_id, $score AS ms
           FROM embeddings e CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 5) q
           WHERE e.vec_id <> q.vec_id)
         SELECT q_id, rank, neighbor_id, maxsim FROM (
           SELECT q_id, neighbor_id, round(ms, 6) AS maxsim,
             ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY ms DESC, neighbor_id) AS rank
           FROM sc) t
         WHERE rank <= 3 ORDER BY q_id, rank"""
    })
}
