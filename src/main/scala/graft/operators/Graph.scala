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
