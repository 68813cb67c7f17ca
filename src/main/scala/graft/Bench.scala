package graft

import org.apache.spark.sql.SparkSession

/** Bench main (driver contract): times every SparkEntry query at the
  * SPARK_GRAFT_SF_DIR scale factor and prints ONE JSON line. A warmup pass
  * (schema reads + one small query) runs first so the first timed query
  * doesn't absorb JVM/codegen warmup. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel(sys.env.getOrElse("SPARK_GRAFT_LOGLEVEL", "WARN"))

    // warmup: touch every table (via the normalizing loaders — events needs
    // the nanosAsLong conf) + run one query end-to-end for JIT/codegen
    Seq(Tables.region _, Tables.nation _, Tables.customer _, Tables.supplier _,
      Tables.part _, Tables.orders _, Tables.lineitem _, Tables.events _,
      Tables.documents _, Tables.embeddings _).foreach(f => f(spark, sfDir).schema)
    SparkEntry.queries.get("q01_pricing_summary").foreach(f => f(spark, sfDir).count())

    // dev hook: SPARK_GRAFT_ONLY=q01_pricing_summary,dedup_clusters restricts
    // the run (isolated per-query floors); unset = full driver-shaped bench
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val total = results.map(_._2).sum
    // The driver captures only a bounded TAIL of stdout; a full-precision
    // line over ~80 queries outgrows it and loses its head (BENCH_r02's
    // "parsed": null). Print a millisecond-precision line that fits the
    // window, and persist the full-precision JSON beside the repo's other
    // round artifacts so round-over-round comparison never needs stdout
    // archaeology.
    def fmt(precision: Int): String = {
      val qs = results.map { case (k, v) =>
        "\"" + k + "\":" + BigDecimal(v).setScale(precision, BigDecimal.RoundingMode.HALF_UP) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${
        BigDecimal(total).setScale(precision, BigDecimal.RoundingMode.HALF_UP)
      },"unit":"sec","queries":$qs,"sf":"${new java.io.File(sfDir).getName}"}"""
    }
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/root/repo/BENCH_LOCAL.json"), fmt(9) + "\n")
    catch { case _: Throwable => () } // read-only checkout: stdout still has it
    println(fmt(3))
    spark.stop()
  }
}
