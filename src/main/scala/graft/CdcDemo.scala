package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.cdc.CdcPipeline
import graft.sources.FrameLog
import graft.streaming.Streams

/** CLI demo app — the Spark analog of the reference's `python -m pypgcdc`
  * example (src/pypgcdc/__main__.py:30-52, SURVEY.md §3.1): construct a CDC
  * stream, tail it in micro-batches, materialize per-table state, report.
  *
  * Usage: runMain graft.CdcDemo [sfDir] [maxFramesPerTrigger]
  * With no live Postgres in this environment, the walsender is stood in by
  * a generated frame log (same bytes a `pgoutput` slot would emit). */
object CdcDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val maxPerTrigger = args.lift(1).map(_.toLong).getOrElse(5000L)

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = Files.createTempDirectory("cdc_demo")
    val logPath = dir.resolve("wal.bin").toString
    val stateDir = dir.resolve("state").toString
    val ckptDir = dir.resolve("ckpt").toString

    // 1. "walsender": render orders DML as pgoutput frames into the log.
    val frames = CdcPipeline.ordersToFrames(spark, sfDir,
      CdcPipeline.DmlPattern(updates = true, deletes = true))
      .collect().iterator.map { case (lsn, bytes) => FrameLog.Entry(lsn, bytes) }
    val nFrames = FrameLog.write(logPath, frames)
    println(s"[demo] wrote $nFrames pgoutput frames to $logPath")

    // 2. tail the log as a rate-limited micro-batch stream; upsert state.
    val env = Streams.envelopeStream(spark, logPath, Some(maxPerTrigger))
    val q = Streams.cdcUpsertSink(env, CdcPipeline.ordersRelation, stateDir, ckptDir)
    q.processAllAvailable()
    q.recentProgress.foreach { p =>
      println(s"[demo] batch=${p.batchId} rows=${p.numInputRows} " +
        f"rps=${p.processedRowsPerSecond}%.0f")
    }
    q.stop()

    // 3. report materialized state.
    val state = Streams.materializedState(spark, CdcPipeline.ordersRelation, stateDir)
    val n = state.count()
    val sample = state.orderBy(col("o_orderkey")).limit(3)
      .collect().map(_.mkString(", ")).mkString(" | ")
    println(s"[demo] materialized orders rows=$n sample: $sample")
    spark.stop()
  }
}
