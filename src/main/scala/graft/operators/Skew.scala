package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives (SURVEY.md §2.2 / builder brief: "salting for
  * skew, AQE for runtime re-plan").
  *
  * AQE's skew-join handles sort-merge cases automatically; explicit salting
  * remains the tool for (a) skewed aggregations and (b) broadcast-infeasible
  * joins with a few hot keys. Both helpers are deterministic (salt =
  * pmod(hash(cols), buckets)) so results are reproducible and testable. */
object Skew {

  /** Two-phase skew-safe aggregation: group by (key, salt) first — spreading
    * one hot key over `salts` reducers — then re-aggregate by key.
    * `partialAggs` must be decomposable (sum/count/min/max): the second
    * phase re-applies the matching merge (here: sum of partial sums etc. is
    * the caller's contract via `finalAggs` over the partial columns). */
  def saltedAggregate(
      df: DataFrame,
      keyCols: Seq[String],
      salts: Int,
      partialAggs: Seq[Column],
      finalAggs: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(col("*")), lit(salts)))
    val partial = salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Salted equi-join for a build side small enough to replicate per salt
    * but too hot on a few keys for a plain shuffle join: the probe side gets
    * a random-but-deterministic salt, the build side is exploded across all
    * salts, and the join key becomes (key, salt). Semantics identical to the
    * plain inner equi-join. */
  def saltedJoin(
      probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      salts: Int): DataFrame = {
    val saltedProbe = probe.withColumn("__salt",
      pmod(hash(col(probeKey), monotonically_increasing_id()), lit(salts)))
    val explodedBuild = build.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedProbe.join(explodedBuild,
        saltedProbe(probeKey) === explodedBuild(buildKey) &&
          saltedProbe("__salt") === explodedBuild("__salt"))
      .drop("__salt")
  }
}
