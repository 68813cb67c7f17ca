package graft.cdc

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins `CdcQueries.fixtureDeps` — the query→shared-fixture map Bench's
  * warmup is keyed on — to REAL consumption: every cdc query is built with
  * cold query-side caches while CdcPipeline records which shared envelope
  * spills it touches, and the recording must equal the declared entry.
  * A query that starts (or stops) consuming a shared fixture without its
  * fixtureDeps entry moving fails here, so the warmup can never silently
  * warm the wrong builds or charge a build to measurement time. */
class CdcFixtureDepsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val d = "/root/testdata/sf0.001"

  private def cdcQueries: Seq[String] =
    graft.SparkEntry.queries.keys.filter(_.startsWith("cdc_")).toSeq.sorted

  test("fixtureDeps is total over the cdc query surface and every dep is a registered builder") {
    assert(graft.queries.CdcQueries.fixtureDeps.keySet === cdcQueries.toSet)
    val unknown = graft.queries.CdcQueries.fixtureDeps.values.flatten.toSet --
      CdcPipeline.sharedFixtureBuilders.keySet
    assert(unknown.isEmpty, s"deps name unregistered fixtures: $unknown")
  }

  test("every registered shared fixture is consumed by at least one query") {
    val consumed = graft.queries.CdcQueries.fixtureDeps.values.flatten.toSet
    val orphans = CdcPipeline.sharedFixtureBuilders.keySet -- consumed
    assert(orphans.isEmpty,
      s"builders no query consumes (dead warmup work): $orphans")
  }

  test("declared deps equal the accesses recorded while each query builds") {
    // cold QUERY caches per query (a memoized liveOrderNets/lineitemState
    // would hide its fixture access); the shared SPILLS stay cached —
    // sharedEvents records the access on a cache hit too, so recording is
    // exact without an envelope rebuild per query. Recording is
    // thread-local: concurrent suites building cdc queries can't pollute it.
    val observed = cdcQueries.map { name =>
      graft.queries.CdcQueries.clearQueryCaches()
      CdcPipeline.startRecordingFixtures()
      graft.SparkEntry.queries(name)(spark, d)
      name -> CdcPipeline.stopRecordingFixtures()
    }.toMap
    val declared = graft.queries.CdcQueries.fixtureDeps
    val diffs = cdcQueries.filter(n => observed(n) != declared(n))
    assert(diffs.isEmpty, diffs.map(n =>
      s"$n: declared=${declared(n).toSeq.sorted.mkString(",")} " +
        s"observed=${observed(n).toSeq.sorted.mkString(",")}").mkString("; "))
  }
}
