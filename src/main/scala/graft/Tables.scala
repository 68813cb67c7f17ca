package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver-generated parquet tables (TESTDATA.md). One
  * function per table so every query hits the same scan path and Catalyst
  * can prune/push down per use site.
  *
  * Timestamp normalization (session TZ is UTC everywhere):
  *  - parquet `timestamp[ms]` columns may infer as TIMESTAMP_NTZ in Spark 4;
  *    cast to TimestampType so chrono functions (unix_micros, window) work —
  *    a no-op rewrite under UTC, and casts sit above the scan so pushdown of
  *    other predicates is unaffected;
  *  - events.ts is parquet TIMESTAMP(NANOS), unreadable by default — read
  *    via the nanosAsLong legacy conf and truncate ns → µs exactly like
  *    DuckDB does on the oracle side. */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private def ltz(c: Column): Column = c.cast(TimestampType)

  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders").withColumn("o_orderdate", ltz(col("o_orderdate")))
  def lineitem(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem").withColumn("l_shipdate", ltz(col("l_shipdate")))
  // The generator has shipped events.ts as parquet TIMESTAMP(NANOS) in
  // some drops and TIMESTAMP(MICROS) in others — dispatch on the
  // inferred type instead of assuming one layout:
  //  - NANOS + nanosAsLong conf → LongType; truncate ns → µs exactly
  //    like DuckDB does on the oracle side;
  //  - MICROS → NTZ (or LTZ); cast to TimestampType, a wall-clock
  //    no-op under the UTC session.
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(eventsRaw(s, d))

  /** Raw events read (ts NOT normalized — the schema source for
    * readStream paths). Establishes the nanosAsLong conf BEFORE the read
    * so a TIMESTAMP(NANOS) drop loads regardless of call order. */
  def eventsRaw(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, d, "events")
  }

  /** Normalize a raw events frame's `ts` (ns-long under nanosAsLong, or a
    * µs timestamp) to TimestampType — shared with the streaming read path,
    * which scans the same parquet through readStream. */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _        => df.withColumn("ts", ltz(col("ts")))
    }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
