package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, lit, shiftleft, shiftright}

/** Write-path data layout — the half of 100 TB performance that happens
  * BEFORE any query runs. A table clustered for its read pattern turns
  * full scans into directory-level partition pruning (the pruned dirs are
  * never listed, let alone read) plus row-group skipping (min/max stats on
  * a sorted column are tight, so predicates eliminate whole row groups).
  *
  * Reference behavior analog: the reference streams rows one-by-one to a
  * consumer and has no storage layout at all (reader.py's callback loop);
  * this is the piece a warehouse-scale engine must add for reads to
  * survive the data volume.
  */
object Layout {

  /** Write `df` as parquet partitioned by `partitionCol` (materialized as
    * directory column `partitionName`) and clustered within each partition
    * by `sortCols`.
    *
    * The `repartition` on the partition column is the scale-critical step:
    * without it every write task holds rows of every partition value and
    * emits one file into EVERY directory — tasks × partitions small files,
    * the classic layout failure at cluster scale. With it, each partition
    * directory is written by exactly the tasks that own its value — file
    * count stays O(partitions), independent of cluster width. A hot
    * partition value (one day holding half the data) is the one case to
    * salt: repartition on (partitionCol, salt) and accept a few files for
    * that directory. */
  def writeClustered(df: DataFrame, dir: String, partitionName: String,
      partitionCol: Column, sortCols: Seq[String]): Unit =
    df.withColumn(partitionName, partitionCol)
      .repartition(col(partitionName))
      .sortWithinPartitions((partitionName +: sortCols).map(col): _*)
      .write.mode("overwrite").partitionBy(partitionName).parquet(dir)

  /** Morton (Z-order) interleave of `cols` at `bits` bits each: bit b of
    * column i lands at position `b·n + (n−1−i)`, so a range predicate on
    * ANY of the clustered columns maps to contiguous-ish z-ranges — file
    * and row-group min/max stats stay tight on every dimension, not just a
    * leading sort column. This is how a single physical order serves
    * several query dimensions at once (the multi-column analog of
    * [[writeClustered]]'s in-file sort).
    *
    * Inputs must be non-negative and < 2^bits: quantize unbounded domains
    * first (rank, width-bucket over min/max, or epoch-day for timestamps).
    * Pure bit-shift Column expressions — whole-stage codegen'd, no UDF. */
  def zorderKey(cols: Seq[Column], bits: Int = 16): Column = {
    require(cols.nonEmpty && bits * cols.size <= 63,
      s"zorder: ${cols.size} cols × $bits bits must fit a signed long")
    val n = cols.size
    val terms = for {
      b <- 0 until bits
      (c, i) <- cols.zipWithIndex
    } yield shiftleft(
      shiftright(c.cast("long"), b).bitwiseAND(lit(1L)), b * n + (n - 1 - i))
    terms.reduce(_.bitwiseOR(_))
  }

  /** Write `df` as `nFiles` parquet files globally range-partitioned AND
    * internally sorted by the Z-order key of `zCols` — every file owns a
    * compact z-range, so min/max pruning works on all clustered dimensions.
    * File count is an explicit knob (range shuffle), independent of
    * cluster width. */
  def writeZOrdered(df: DataFrame, dir: String, zCols: Seq[Column],
      nFiles: Int, bits: Int = 16): Unit =
    df.withColumn("__z", zorderKey(zCols, bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
}
