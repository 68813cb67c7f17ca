package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking / running sums — the two-level bucketed
  * prefix-sum pattern (q58 interval sweep, text_pack_offsets) factored into
  * a reusable operator.
  *
  * A global `Window.orderBy(...)` serializes the whole table through one
  * task; at 100 TB that single partition is the bottleneck (and an OOM).
  * This helper produces the same global `row_number` (and any running sums
  * over the same total order) with NO row-level single-partition step:
  *
  *   1. rows are RANGE-bucketed on the long sort key — bucket id =
  *      `(sk - min) div width`, monotone in the key, so bucket order IS key
  *      order and per-bucket windows compose into the global order;
  *   2. within each bucket a `Window.partitionBy(bucket)` computes local
  *      row numbers / cumulative sums (distributed, one shuffle);
  *   3. per-bucket totals (count + each running-sum column) feed a second,
  *      BUCKET-count-sized prefix-sum window — the only ordered pass, O(B)
  *      rows regardless of table size — whose exclusive prefixes join back
  *      as broadcast offsets.
  *
  * Bucket width derives from the exact min/max (one cheap agg, broadcast),
  * so bucket count stays in [B, 2B] for any key distribution; a heavily
  * skewed key (many rows sharing one value) degrades that one bucket to a
  * single task — the caller should pre-aggregate to distinct keys first
  * (as q93 does) when the key domain is small.
  *
  * Determinism: ranks are a pure function of the total order
  * (sortKey, tieCols…); bucket boundaries never affect the output, only the
  * partitioning, so results are bit-identical to the single-window form. */
object DistributedRank {

  /** Adds `rankName` = global 1-based row number over rows ordered by
    * (`sortKey` ASC, `tieCols`… ASC), plus for each (valueCol, outName) in
    * `runningSums` a column `outName` = running sum of valueCol over that
    * order (inclusive of the current row). `sortKey` must cast to long
    * losslessly (scale decimals / negate for DESC at the call site); the
    * (sortKey, tieCols) tuple must totally order the rows for the ranks to
    * be deterministic. */
  def withGlobalRank(
      df: DataFrame,
      sortKey: Column,
      tieCols: Seq[Column],
      buckets: Int,
      rankName: String,
      runningSums: Seq[(Column, String)] = Nil): DataFrame = {
    require(buckets >= 1)
    val keyed = df.withColumn("__sk", sortKey.cast("long"))
    val rng = keyed.agg(min(col("__sk")).as("__mn"), max(col("__sk")).as("__mx"))
    // width ≥ 1 and (sk − mn) ≥ 0, so bucket ∈ [0, ~2B] and is monotone in sk
    val bucketed = keyed.crossJoin(broadcast(rng))
      .withColumn("__bucket",
        expr(s"(__sk - __mn) div ((__mx - __mn) div $buckets + 1)"))
      .drop("__mn", "__mx")

    val ord = col("__sk") +: tieCols
    val wIn = Window.partitionBy(col("__bucket")).orderBy(ord: _*)
    val wCum = wIn.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the ONLY ordered single-partition pass — O(buckets) rows
    val wB = Window.orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)

    val totAggs = count(lit(1)).as("__tot_n") +:
      runningSums.zipWithIndex.map { case ((c, _), k) => sum(c).as(s"__tot_$k") }
    val offsets = runningSums.indices
      .foldLeft(
        bucketed.groupBy(col("__bucket")).agg(totAggs.head, totAggs.tail: _*)
          .withColumn("__off_n", coalesce(sum(col("__tot_n")).over(wB), lit(0L)))) {
        (acc, k) =>
          acc.withColumn(s"__off_$k", coalesce(sum(col(s"__tot_$k")).over(wB), lit(0L)))
      }
      .select(col("__bucket") +: col("__off_n") +:
        runningSums.indices.map(k => col(s"__off_$k")): _*)

    val local = runningSums.zipWithIndex
      .foldLeft(bucketed.withColumn("__rn", row_number().over(wIn).cast("long"))) {
        case (acc, ((c, _), k)) => acc.withColumn(s"__cum_$k", sum(c).over(wCum))
      }
    val joined = local.join(broadcast(offsets), "__bucket")
      .withColumn(rankName, col("__off_n") + col("__rn"))
    runningSums.zipWithIndex
      .foldLeft(joined) { case (acc, ((_, name), k)) =>
        acc.withColumn(name, col(s"__off_$k") + col(s"__cum_$k"))
          .drop(s"__cum_$k", s"__off_$k")
      }
      .drop("__sk", "__bucket", "__rn", "__off_n")
  }
}
