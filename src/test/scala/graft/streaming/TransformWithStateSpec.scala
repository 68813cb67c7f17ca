package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** transformWithState (Spark 4's arbitrary-state API, RocksDB-backed):
  * the per-user running-feature processor must emit exactly the batch
  * cumulative-window values across micro-batch boundaries. */
class TransformWithStateSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.streaming.forceDeleteTempCheckpointLocation", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  test("running features across micro-batches equal the batch cumulative window") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .as[(Long, Long, java.sql.Timestamp, Double)]
      .collect().sortBy(r => (r._3.getTime, r._2))
    val (b1, b2) = ev.splitAt(ev.length / 2) // in-order delivery, two batches
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, java.sql.Timestamp, Double)]
    val src = ms.toDS().toDF("user_id", "event_id", "ts", "value")
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = Streams.runningFeatures(src).toDF("user_id", "event_id", "n", "cum")
        .writeStream.format("memory").queryName("rf_out")
        .outputMode("update").start()
      ms.addData(b1.toSeq); q.processAllAvailable()
      ms.addData(b2.toSeq); q.processAllAvailable()
      q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
    val got = spark.sql("SELECT user_id, event_id, n, cum FROM rf_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    val expected = graft.SparkEntry.queries("q53_running_features")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(expected.nonEmpty)
    assert(got === expected)
  }
}
