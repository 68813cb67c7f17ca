package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives needed by the dedup pipeline (SURVEY.md
  * §2.2 north-star: near-dup clustering = connected components over the
  * candidate-pair graph).
  *
  * Scale shape: iterative min-label propagation — per round one edge⋈label
  * join plus one min-aggregate, both keyed on vertex id; edges never move
  * after the initial symmetrization. Rounds = component diameter, and dup
  * clusters are near-cliques (diameter 2-3), so the loop is constant-round
  * at any corpus size; the large-star/small-star variant bounds rounds at
  * O(log n) if adversarial chains ever appear.
  */
object Graph {

  /** Connected components of the undirected graph given as distinct pairs
    * `(a, b)` with `a < b` (column names configurable). Returns one row per
    * vertex that appears in any pair: `(vertex, component)` where
    * `component` is the minimum vertex id in the component — the canonical
    * "keeper" for dedup clustering.
    *
    * Hybrid execution: the pair graph of a dedup job is orders of magnitude
    * smaller than the corpus (it holds only near-duplicates), so below
    * `localThreshold` edges the component computation runs as driver-side
    * union-find on the collected pairs — one collect of a small table
    * instead of a multi-round join loop whose per-round scheduling cost
    * dwarfs the data. Above the threshold (or for non-integral ids) it
    * falls back to distributed min-label propagation, whose convergence is
    * detected without a join: propagation only ever lowers labels, so
    * `sum(label)` strictly decreases until the fixpoint. */
  def connectedComponents(
      pairs: DataFrame, aCol: String = "a_id", bCol: String = "b_id",
      localThreshold: Long = 1L << 20): DataFrame = {
    val p = pairs.select(col(aCol).as("a_id"), col(bCol).as("b_id")).persist()
    val integralIds = p.schema.fields.forall(f =>
      f.dataType == org.apache.spark.sql.types.LongType ||
        f.dataType == org.apache.spark.sql.types.IntegerType)
    if (integralIds && p.count() <= localThreshold) {
      val edges = p.collect().map(r =>
        (r.get(0).asInstanceOf[Number].longValue(), r.get(1).asInstanceOf[Number].longValue()))
      p.unpersist()
      return localComponents(pairs.sparkSession, edges)
    }
    // Cache the symmetrized edges already hash-partitioned on the join key:
    // the per-round edge⋈label join then reuses the cached partitioning
    // (InMemoryTableScan preserves outputPartitioning) instead of
    // re-shuffling the static edge table every round.
    val edges = p.union(
      p.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
      .repartition(col("b_id")).persist()
    var labels = edges.select(col("a_id").as("vertex")).distinct()
      .withColumn("label", col("vertex")).persist()
    var prevSum = Long.MaxValue
    var curSum = labels.agg(sum(col("label"))).head().getLong(0)
    while (curSum < prevSum) {
      val nbrMin = edges
        .join(labels.select(col("vertex").as("b_v"), col("label").as("b_label")),
          col("b_id") === col("b_v"))
        .groupBy(col("a_id")).agg(min(col("b_label")).as("nbr_min"))
      val next = labels
        .join(nbrMin, col("vertex") === col("a_id"), "left")
        .select(col("vertex"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"))
        .persist()
      prevSum = curSum
      curSum = next.agg(sum(col("label"))).head().getLong(0)
      labels.unpersist()
      labels = next
    }
    edges.unpersist()
    p.unpersist()
    labels.select(col("vertex"), col("label").as("component"))
  }

  /** Fixed-point weighted PageRank (1e12-scaled BIGINT ranks, floor
    * division — every operation exact, so the iterative result is
    * hash-exact on any engine): over edges (src, dst [, w]),
    * with wd(s) = Σ_t w(s,t), n = |distinct src|, base = 1e12 div n,
    * tele = (15·base) div 100:
    *   r₀(v) = base;  r_{i+1}(t) = tele + (85 · Σ_{s→t} ((r_i(s)·w) div wd(s))) div 100.
    * Callers pass the SYMMETRIZED edge list (like [[connectedComponents]]).
    *
    * Hybrid execution, same rationale as [[connectedComponents]]: the
    * graphs ranked here are MODEL-sized, not corpus-sized (near-dup
    * candidate pairs; vocabulary co-occurrence — Zipf-bounded), so below
    * `localThreshold` edges the loop folds on the driver over the
    * collected edge list — identical integer arithmetic, one edge-table
    * action instead of `iters` join+agg rounds whose per-round scheduling
    * dwarfs the data (guide §1.2: fix the distributed algorithm first;
    * r9-opt measured the 10-round loop at 3.2 s on a 25-edge graph).
    * Above the threshold: the distributed join+agg loop, lineage truncated
    * every 3rd round (localCheckpoint; a checkpoint dir on a cluster). */
  def pageRankFP(edges: DataFrame, srcCol: String, dstCol: String,
      wCol: Option[String], iters: Int,
      localThreshold: Long = 1L << 20): DataFrame = {
    val spark = edges.sparkSession
    val w = wCol.map(col).getOrElse(lit(1L)).cast("long")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"), w.as("w"))
      .persist()
    if (e.count() <= localThreshold) {
      val rows = e.collect().map(r => (r.get(0), r.get(1), r.getLong(2)))
      val srcType = e.schema("src").dataType
      e.unpersist()
      val wd = new scala.collection.mutable.HashMap[Any, Long]()
      rows.foreach { case (s, _, ew) => wd(s) = wd.getOrElse(s, 0L) + ew }
      val n = wd.size.toLong
      val base = 1000000000000L / math.max(n, 1L)
      val tele = (15L * base) / 100L
      var r: scala.collection.Map[Any, Long] = wd.keysIterator.map(_ -> base).toMap
      for (_ <- 1 to iters) {
        val sc = new scala.collection.mutable.HashMap[Any, Long]()
        rows.foreach { case (s, t, ew) =>
          // a src absent from r contributes nothing — exactly the
          // distributed loop's inner join; on a symmetrized graph every
          // vertex stays present, this guard only mirrors the edge case
          r.get(s).foreach { rs =>
            // Long `/` on positive operands ≡ Spark `div` (floor division)
            sc(t) = sc.getOrElse(t, 0L) + (rs * ew) / wd(s)
          }
        }
        r = sc.map { case (t, s0) => t -> (tele + (85L * s0) / 100L) }
      }
      import scala.jdk.CollectionConverters._
      return spark.createDataFrame(
        r.toSeq.map { case (v, rk) => org.apache.spark.sql.Row(v, rk) }.asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("v", srcType),
          org.apache.spark.sql.types.StructField("r",
            org.apache.spark.sql.types.LongType))))
    }
    // Distributed form: degree-annotated edges materialized ONCE behind an
    // eager localCheckpoint (persist would re-canonicalize the upstream
    // subtree against every CacheManager entry per round — the r4 bench
    // regression), then `iters` join+agg rounds.
    val wdeg = e.groupBy(col("src")).agg(sum(col("w")).as("wd"))
    val edgesD = e.join(wdeg, "src").localCheckpoint(true)
    val n = edgesD.select(col("src")).distinct().count()
    val base = 1000000000000L / math.max(n, 1L)
    val tele = (15L * base) / 100L
    e.unpersist()
    var r = edgesD.select(col("src").as("v")).distinct()
      .select(col("v"), lit(base).as("r"))
    for (i <- 1 to iters) {
      r = edgesD.join(r, edgesD("src") === r("v"))
        .select(col("dst"), expr("(r * w) div wd").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("sc"))
        .select(col("dst").as("v"), (lit(tele) + expr("(85 * sc) div 100")).as("r"))
      if (i % 3 == 0 || i == iters) r = r.localCheckpoint()
    }
    r
  }

  /** BFS hop distances from the graph's minimum vertex id over a
    * SYMMETRIZED edge list `(u, w)`: returns `(v, hops)` for every vertex
    * reached within `maxHops` (source included at 0). Same hybrid as
    * [[connectedComponents]]: a k-NN/mutual-dup graph is model-sized, so
    * below `localThreshold` edges the walk runs on the driver over the
    * collected adjacency (one edge-table action instead of one
    * join+distinct+anti-join+checkpoint round PER LEVEL — r9-opt measured
    * the 6-level distributed walk at 41 Spark jobs for a ≤1,500-edge
    * graph); above it, the per-level frontier loop with localCheckpoint
    * lineage truncation runs unchanged. */
  def bfsHops(edges: DataFrame, uCol: String, wCol: String, maxHops: Int,
      localThreshold: Long = 1L << 20): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.select(col(uCol).cast("long").as("u"), col(wCol).cast("long").as("w"))
      .persist()
    val edgeCount = e.count()
    // No edges ⇒ no source to walk from: return an empty (v, hops) frame
    // instead of crashing on min-of-empty (local path) / null-min NPE
    // (distributed path) — e.g. a filter upstream yielding zero mutual-kNN
    // pairs.
    if (edgeCount == 0L) {
      e.unpersist()
      return spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("v",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("hops",
            org.apache.spark.sql.types.LongType))))
    }
    if (edgeCount <= localThreshold) {
      val rows = e.collect().map(r => (r.getLong(0), r.getLong(1)))
      e.unpersist()
      val adj = rows.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
      val source = rows.iterator.map(_._1).min
      val hops = new scala.collection.mutable.HashMap[Long, Long]()
      hops(source) = 0L
      var frontier = Seq(source)
      var h = 1L
      while (h <= maxHops && frontier.nonEmpty) {
        frontier = frontier.flatMap(v => adj.getOrElse(v, Array.empty[Long]))
          .distinct.filterNot(v => hops.contains(v))
        frontier.foreach(v => hops(v) = h)
        h += 1
      }
      import scala.jdk.CollectionConverters._
      return spark.createDataFrame(
        hops.toSeq.map { case (v, d) => org.apache.spark.sql.Row(v, d) }.asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("v",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("hops",
            org.apache.spark.sql.types.LongType))))
    }
    val source = e.agg(min(col("u"))).head.getLong(0)
    // localCheckpoint per hop: eager, truncates lineage — without it the
    // anti-join chain re-derives every earlier hop once per level.
    var visited = spark.range(1).select(lit(source).as("v"), lit(0L).as("hops"))
      .localCheckpoint()
    var frontier = visited
    for (h <- 1 to maxHops) {
      val next = frontier.join(e, frontier("v") === e("u"))
        .select(col("w").as("v"), lit(h.toLong).as("hops"))
        .distinct()
        .join(visited.select(col("v")), Seq("v"), "left_anti")
        .localCheckpoint()
      visited = visited.unionByName(next).localCheckpoint()
      frontier = next
    }
    e.unpersist()
    visited
  }

  /** Union-find with path compression over collected edges; component label
    * = min vertex id (computed per root after all unions). */
  private def localComponents(
      spark: org.apache.spark.sql.SparkSession, edges: Array[(Long, Long)]): DataFrame = {
    val parent = new scala.collection.mutable.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra) = rb
    }
    val minOfRoot = new scala.collection.mutable.HashMap[Long, Long]()
    parent.keys.foreach { v =>
      val r = find(v)
      minOfRoot(r) = math.min(minOfRoot.getOrElse(r, v), v)
    }
    import spark.implicits._
    parent.keys.toSeq.map(v => (v, minOfRoot(find(v)))).toDF("vertex", "component")
  }
}
