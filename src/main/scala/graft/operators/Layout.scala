package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

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
}
