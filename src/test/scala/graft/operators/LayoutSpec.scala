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
}
