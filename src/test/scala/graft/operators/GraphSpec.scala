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

  // --- hybrid-branch parity pins (r9 verdict item 5): the driver-fold and
  // distributed branches of pageRankFP/bfsHops must produce IDENTICAL
  // output on the same graph — the driver branch is the one the suite
  // exercises at test SFs, so without these the distributed branch (the
  // 100 TB path) would be dead code to the test suite.

  private def symmetrize(pairs: Seq[(Long, Long)]): Seq[(Long, Long)] =
    pairs ++ pairs.map(_.swap)

  test("pageRankFP: driver fold and distributed loop agree exactly") {
    import spark.implicits._
    val edges = symmetrize(Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L)))
      .toDF("src", "dst")
    val local = Graph.pageRankFP(edges, "src", "dst", None, iters = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Graph.pageRankFP(edges, "src", "dst", None, iters = 10,
        localThreshold = -1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local === dist,
      "driver fixed-point fold and distributed join+agg loop disagree")
  }

  test("pageRankFP: weighted form, both branches agree exactly") {
    import spark.implicits._
    val edges = symmetrize(Seq((1L, 2L), (2L, 3L), (1L, 3L)))
      .zipWithIndex.map { case ((a, b), i) => (a, b, (i % 3 + 1).toLong) }
      .toDF("src", "dst", "w")
    val local = Graph.pageRankFP(edges, "src", "dst", Some("w"), iters = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Graph.pageRankFP(edges, "src", "dst", Some("w"), iters = 6,
        localThreshold = -1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local === dist)
  }

  test("bfsHops: driver walk and distributed frontier loop agree exactly") {
    import spark.implicits._
    // chain with a branch and an unreachable node beyond maxHops
    val edges = symmetrize(Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 5L),
      (5L, 6L), (6L, 7L), (7L, 8L))).toDF("u", "w")
    val local = Graph.bfsHops(edges, "u", "w", maxHops = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Graph.bfsHops(edges, "u", "w", maxHops = 4, localThreshold = -1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local === dist,
      "driver BFS walk and distributed frontier loop disagree")
  }

  test("bfsHops: empty edge list yields an empty frame, not a crash") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("u", "w")
    assert(Graph.bfsHops(empty, "u", "w", maxHops = 3).collect().isEmpty)
  }
}
