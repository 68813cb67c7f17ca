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
    * Convergence is detected without a join: propagation only ever lowers
    * labels, so `sum(label)` strictly decreases until the fixpoint. */
  def connectedComponents(
      pairs: DataFrame, aCol: String = "a_id", bCol: String = "b_id"): DataFrame = {
    val p = pairs.select(col(aCol).as("a_id"), col(bCol).as("b_id")).persist()
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
}
