package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Clustered-write layout: directory pruning must show in the read plan,
  * file count must stay bounded per partition, in-file order must follow
  * the cluster key, and no row may be lost or duplicated. */
class LayoutSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  test("clustered write: one file per day dir, day reads prune, files sorted by user") {
    val dir = Files.createTempDirectory("layout").resolve("events").toString
    val ev = graft.Tables.events(spark, sfDir)
    Layout.writeClustered(ev, dir, "day", to_date(col("ts")), Seq("user_id"))
    val back = spark.read.parquet(dir)
    assert(back.count() === ev.count())
    // file count is O(partitions): exactly one parquet file per day dir
    val dirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("day="))
    assert(dirs.length > 1, s"expected several day partitions under $dir")
    dirs.foreach { pd =>
      val files = pd.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1, s"${pd.getName}: ${files.length} files")
    }
    // a day predicate prunes at the directory level (PartitionFilters, not
    // a data filter over a full scan)
    val someDay = back.select(col("day")).orderBy(col("day")).first().get(0)
    val p = back.filter(col("day") === lit(someDay)).queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(p.matches("(?s).*PartitionFilters: \\[[^\\]]*day[^\\]]*\\].*"), p)
    // rows inside a file follow the cluster key → tight row-group stats
    val f = dirs.head.listFiles().filter(_.getName.endsWith(".parquet")).head
    val ids = spark.read.parquet(f.toString).select("user_id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids === ids.sorted, "file not clustered by user_id")
  }

  test("IVF serving layout: vectors partitioned by coarse cell, a probe reads only its cells") {
    // the on-disk analog of sim_ivf_ann's probe: write the embedding table
    // partitioned by nearest-seed cell, then an nprobe=2 query must prune
    // to 2 cell directories (PartitionFilters) instead of scanning the
    // corpus — the layout that turns IVF from a compute trick into an
    // I/O-bound win at 100 TB (each probe reads |cell| bytes, not |corpus|)
    val dir = Files.createTempDirectory("ivflayout").resolve("emb").toString
    val e = graft.Tables.embeddings(spark, sfDir)
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      graft.functions.VectorFunctions.vector_dot(a, b)
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("c_id"))
    val assigned = e.crossJoin(broadcast(cents))
      .withColumn("ccos", dot(col("embedding"), col("c_emb")) /
        (sqrt(dot(col("embedding"), col("embedding"))) *
          sqrt(dot(col("c_emb"), col("c_emb")))))
      .withColumn("crank", row_number().over(w))
      .filter(col("crank") === 1)
      .select(col("vec_id"), col("embedding"), col("c_id"))
    Layout.writeClustered(assigned, dir, "cell", col("c_id"), Seq("vec_id"))
    val back = spark.read.parquet(dir)
    assert(back.count() === e.count())
    val probe = back.filter(col("cell").isin(3, 5))
    val p = probe.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.matches("(?s).*PartitionFilters: \\[[^\\]]*cell[^\\]]*\\].*"), p)
    // pruning is real: the probe's row count equals exactly the two dirs'
    assert(probe.count() ===
      spark.read.parquet(s"$dir/cell=3").count() +
        spark.read.parquet(s"$dir/cell=5").count())
  }

  test("zorder key interleaves bits (x=0b11,y=0b00 → 0b1010)") {
    import spark.implicits._
    val df = Seq((3L, 0L), (0L, 3L), (1L, 1L), (255L, 255L)).toDF("x", "y")
    val z = df.select(Layout.zorderKey(Seq(col("x"), col("y")), bits = 8).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // x takes odd bit positions, y even: (3,0)→1010b=10, (0,3)→0101b=5,
    // (1,1)→11b=3, (255,255)→all 16 low bits set
    assert(z === Seq(10L, 5L, 3L, 65535L))
  }

  test("z-ordered files prune on BOTH dimensions; linear sort only on the leading one") {
    val base = Files.createTempDirectory("layout")
    val li = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
    val zDir = base.resolve("z").toString
    val linDir = base.resolve("lin").toString
    // 8 files each: z-order on (partkey, suppkey) vs linear sort on partkey.
    // The dimensions are quantized to EQUAL bucket counts (8 each) before
    // interleaving — with raw domains (200 vs 10 values) partkey's high
    // bits would own every split point and suppkey would get no placement
    // power at all (measured: zero second-dimension pruning at 8 raw bits).
    // (keys are 0-based in the test data: partkey 0..199, suppkey 0..9)
    Layout.writeZOrdered(li, zDir,
      Seq(floor(col("l_partkey") / lit(25)).cast("long"),
        floor(col("l_suppkey") * lit(8) / lit(10)).cast("long")),
      8, bits = 3)
    li.repartitionByRange(8, col("l_partkey")).sortWithinPartitions(col("l_partkey"))
      .write.mode("overwrite").parquet(linDir)

    def candidateFiles(dir: String, c: String, lo: Long, hi: Long): Long =
      spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min(col(c)).as("mn"), max(col(c)).as("mx"))
        .filter(col("mn") <= hi && col("mx") >= lo)
        .count()

    // nothing lost by the layout
    assert(spark.read.parquet(zDir).count() === li.count())
    // a SUPPKEY range (the dimension the linear layout does NOT order by):
    // linear sort leaves suppkey scattered → every file is a candidate;
    // z-order gives suppkey bits placement power → some files drop out
    val zSupp = candidateFiles(zDir, "l_suppkey", 3, 4)
    val linSupp = candidateFiles(linDir, "l_suppkey", 3, 4)
    assert(linSupp === 8L, s"linear layout should have no suppkey locality, got $linSupp")
    assert(zSupp < linSupp, s"z-order must prune on the second dimension: $zSupp vs $linSupp")
    // and the z layout still prunes on partkey too (multi-dimension, not a swap)
    val zPart = candidateFiles(zDir, "l_partkey", 0, 24)
    assert(zPart < 8L, s"z-order lost partkey locality: $zPart")
  }
}
