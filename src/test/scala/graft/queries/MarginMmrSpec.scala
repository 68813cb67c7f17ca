package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the mining-side rankers: ratio-margin mate mining
  * and unrolled greedy MMR. The DuckDB oracles pin cross-engine equality;
  * these pin the MATH — margin against a from-scratch driver-side
  * recomputation, MMR against its greedy definition. */
class MarginMmrSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val d = "/root/testdata/sf0.001"

  private lazy val vecs: Map[Long, (Int, Array[Double])] =
    graft.Tables.embeddings(spark, d)
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getSeq[Float](2).map(_.toDouble).toArray))
      .toMap

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("sim_margin_mining: one different-label mate per query, margin matches a from-scratch recompute") {
    val out = graft.SparkEntry.queries("sim_margin_mining")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.length == 16, out.length)
    assert(out.map(_._1).distinct.length == 16, "one row per query")
    for ((q, mate, _, _) <- out)
      assert(vecs(q)._1 != vecs(mate)._1, s"mate $mate shares label with query $q")

    // from-scratch margin for one query: avg4 denominators over the full
    // different-label neighborhood on each side (queries = vec_id < 16)
    val (q, mate, cosOut, marginOut) = out.minBy(_._1)
    val (qLabel, qEmb) = vecs(q)
    def avg4(center: Array[Double], centerLabel: Int, side: Iterable[(Int, Array[Double])]) = {
      val top = side.collect { case (l, e) if l != centerLabel => cos(center, e) }
        .toSeq.sortBy(-_).take(4)
      top.sum / 4.0
    }
    val corpus = vecs.values
    val queries16 = vecs.filter(_._1 < 16).values
    val candidates = vecs.toSeq.collect {
      case (id, (l, e)) if l != qLabel => (id, e, cos(qEmb, e))
    }.sortBy { case (id, _, c) => (-c, id) }.take(8)
    val best = candidates.map { case (id, e, c) =>
      val m = c / ((avg4(qEmb, qLabel, corpus) + avg4(e, vecs(id)._1, queries16)) / 2.0)
      (id, c, m)
    }.maxBy { case (id, _, m) => (m, -id.toDouble) }
    assert(best._1 == mate, s"expected mate ${best._1}, got $mate")
    assert(math.abs(best._2 - cosOut) < 1e-6, s"cos ${best._2} vs $cosOut")
    assert(math.abs(best._3 - marginOut) < 1e-6, s"margin ${best._3} vs $marginOut")
  }

  test("sim_mmr_rerank: greedy definition holds — 3 distinct picks, pick1 = top relevance, scores ordered") {
    val out = graft.SparkEntry.queries("sim_mmr_rerank")(spark, d)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.length == 15, out.length) // 5 queries × 3 picks
    for (q <- 0L until 5L) {
      val picks = out.filter(_._1 == q).sortBy(_._2)
      assert(picks.map(_._3).distinct.length == 3, s"q=$q picks not distinct")
      // driver-side greedy MMR over the same top-8 candidate set
      val qEmb = vecs(q)._2
      val cands = vecs.toSeq.collect { case (id, (_, e)) if id != q => (id, e, cos(qEmb, e)) }
        .sortBy { case (id, _, c) => (-c, id) }.take(8)
      var selected = List.empty[(Long, Array[Double])]
      var remaining = cands
      val expect = (1 to 3).map { _ =>
        val scored = remaining.map { case (id, e, rel) =>
          val pen = if (selected.isEmpty) 0.0 else selected.map(s => cos(e, s._2)).max
          val sc = if (selected.isEmpty) rel else 0.7 * rel - 0.3 * pen
          (id, e, sc)
        }
        val best = scored.minBy { case (id, _, sc) => (-sc, id) }
        selected ::= (best._1, best._2)
        remaining = remaining.filterNot(_._1 == best._1)
        (best._1, best._3)
      }
      for (((eid, esc), (_, _, gotId, gotSc)) <- expect.zip(picks)) {
        assert(eid == gotId, s"q=$q expected pick $eid got $gotId")
        assert(math.abs(esc - gotSc) < 1e-6, s"q=$q score $esc vs $gotSc")
      }
      // greedy scores are non-increasing from pick 2 on (penalties only grow)
      assert(picks(1)._4 >= picks(2)._4 - 1e-9, picks.mkString(","))
    }
  }
}
