package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Connected components over hand-built pair graphs: transitivity (a~b,
  * b~c ⇒ one cluster), independent components, chains longer than one
  * propagation round, and min-id canonical labeling. */
class GraphSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Runs BOTH execution paths (driver-side union-find and distributed
    * label propagation) and asserts they agree before returning. */
  private def cc(pairs: (Long, Long)*): Map[Long, Long] = {
    import spark.implicits._
    val df = pairs.toDF("a_id", "b_id")
    val local = Graph.connectedComponents(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Graph.connectedComponents(df, localThreshold = -1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local === dist, "local union-find and distributed propagation disagree")
    local
  }

  test("transitive closure: a~b, b~c is one cluster labeled min id") {
    assert(cc((1L, 2L), (2L, 3L)) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("independent components keep independent labels") {
    assert(cc((1L, 2L), (5L, 9L)) === Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 9L -> 5L))
  }

  test("a chain longer than one propagation round still converges") {
    // 7-5-6-8-9 plus min-id vertex 1 attached at the far end: the label 1
    // must travel 4 hops
    val got = cc((5L, 7L), (5L, 6L), (6L, 8L), (8L, 9L), (1L, 9L))
    assert(got === Map(1L -> 1L, 5L -> 1L, 6L -> 1L, 7L -> 1L, 8L -> 1L, 9L -> 1L))
  }

  test("a triangle (cycle) converges to one label") {
    assert(cc((2L, 3L), (3L, 4L), (2L, 4L)) === Map(2L -> 2L, 3L -> 2L, 4L -> 2L))
  }
}
