package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * `queries` aggregates every implemented operator's query; `oracleSql`
  * holds the DuckDB-equivalent SQL for each (omitted → rows-only check). */
object SparkEntry {

  /** Flagship: the full CDC wire slice (pgoutput frames → decode → envelope
    * → compaction → typed view) with upserts and deletes, on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    queries("cdc_upsert_delete")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.RelationalQueries.queries ++
      graft.queries.CdcQueries.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.DedupQueries.queries ++
      graft.queries.SimilarityQueries.queries ++
      graft.queries.MultimodalQueries.queries

  def oracleSql: Map[String, String] =
    graft.queries.RelationalQueries.oracleSql ++
      graft.queries.CdcQueries.oracleSql ++
      graft.queries.TextQueries.oracleSql ++
      graft.queries.DedupQueries.oracleSql ++
      graft.queries.SimilarityQueries.oracleSql ++
      graft.queries.MultimodalQueries.oracleSql
}
