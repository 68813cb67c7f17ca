package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Catch-all query-surface sanity at sf0.001: every declared query builds
  * and executes; contract invariants between `queries` and `oracleSql`. */
class QueriesSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val d = "/root/testdata/sf0.001"

  test("every oracleSql key has a matching query") {
    val orphans = graft.SparkEntry.oracleSql.keySet -- graft.SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("no duplicate query keys in the source (Map literals silently last-win)") {
    // A runtime Map cannot reveal a duplicated literal key — the earlier
    // entry is just gone. Scan the family sources instead: each name may
    // appear at most twice (query + oracle) in its file, and never in two
    // different family files.
    val files = new java.io.File("src/main/scala/graft/queries").listFiles()
      .filter(_.getName.endsWith(".scala")).toSeq.sortBy(_.getName)
    val keyRe = """"([a-z][a-z0-9]*_[a-z0-9_]+)" *->""".r
    val perFile = files.map { f =>
      val src = new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8)
      f.getName -> keyRe.findAllMatchIn(src).map(_.group(1)).toSeq
    }
    for ((name, keys) <- perFile) {
      // CdcQueries.scala holds THREE maps keyed by query name (queries,
      // oracleSql, fixtureDeps) — a genuine duplicate inside any one of
      // them still trips the cap at 4
      val cap = if (name == "CdcQueries.scala") 3 else 2
      val dups = keys.groupBy(identity).filter(_._2.size > cap).keys.toSeq.sorted
      assert(dups.isEmpty, s"$name defines a key more than $cap times: $dups")
    }
    for (Seq((fa, ka), (fb, kb)) <- perFile.combinations(2)) {
      val inter = ka.toSet & kb.toSet
      assert(inter.isEmpty, s"$fa and $fb both define: ${inter.toSeq.sorted}")
    }
  }

  test("every query executes at sf0.001 and almost all return rows") {
    val counts = graft.SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> fn(spark, d).count()
    }
    val empty = counts.filter(_._2 == 0).map(_._1)
    // near-dup pair queries may legitimately be empty at tiny scale
    assert(empty.forall(n => n.contains("pairs") || n.contains("jaccard") || n.contains("embedding")),
      s"unexpectedly empty: $empty")
    assert(counts.count(_._2 > 0) >= counts.size - 4, counts.mkString(", "))
  }

  test("approx_count_distinct lands within 10% of exact (rows-only gate rationale)") {
    import org.apache.spark.sql.functions._
    val li = graft.Tables.lineitem(spark, d)
    val exact = li.agg(countDistinct(col("l_partkey"))).head().getLong(0)
    val approx = li.agg(approx_count_distinct(col("l_partkey"))).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.1, s"approx=$approx exact=$exact")
  }

  test("capped shingle index bounds every posting list at maxDf") {
    import org.apache.spark.sql.functions._
    // With a tiny cap the corpus's common shingles must drop out entirely;
    // the surviving index never has a posting list above the cap.
    val capped = DedupQueries.cappedShingleIndex(spark, d, maxDf = 3)
    val maxDf = capped.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .agg(max(col("df"))).head().getLong(0)
    assert(maxDf <= 3, s"posting list of size $maxDf survived a cap of 3")
    // and the cap actually binds on this corpus (sf0.001 has shingles df>3)
    val uncappedMax = DedupQueries.cappedShingleIndex(spark, d, maxDf = Int.MaxValue)
      .groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .agg(max(col("df"))).head().getLong(0)
    assert(uncappedMax > 3, "corpus has no high-df shingles; cap test vacuous")
  }

  test("normalizeEventTs handles both generator layouts (ns-long and µs timestamp)") {
    // ns-long (TIMESTAMP(NANOS) read under nanosAsLong): truncate ns → µs
    val a = graft.Tables.normalizeEventTs(
        spark.sql("SELECT CAST(1719855600123456789 AS BIGINT) AS ts"))
      .head().getTimestamp(0)
    assert(a.getTime == 1719855600123L && a.getNanos == 123456000, a.toString)
    // µs NTZ (newer generator drops): wall-clock-preserving cast under UTC
    val b = graft.Tables.normalizeEventTs(
        spark.sql("SELECT TIMESTAMP_NTZ'2024-07-01 17:00:00.123456' AS ts"))
      .head().getTimestamp(0)
    assert(b.getNanos == 123456000, b.toString)
    // and the live table loads with a usable event-time column either way
    assert(graft.Tables.events(spark, d).schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
  }

  test("flagship entry returns rows on sf0.001 (driver t1 smoke contract)") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("Kaplan-Meier invariants: product-limit recomposition, monotone " +
      "survival, at-risk accounting never loses subjects") {
    val rows = graft.SparkEntry.queries("q95_kaplan_meier")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    // survival_i == round(Π_{j<=i} (1 − d_j/n_j), 6): the output rows carry
    // every factor ≠ 1 (censored-only hours contribute exactly 1.0), so the
    // curve recomposes from the emitted life table alone
    var prod = 1.0
    rows.foreach { case (t, nRisk, d_, _, surv) =>
      assert(nRisk > 0 && d_ > 0)
      prod *= 1.0 - d_.toDouble / nRisk
      assert(math.abs(prod - surv) < 1e-6, s"t=$t recomposed=$prod emitted=$surv")
    }
    // monotone non-increasing survival; at-risk strictly decreasing by at
    // least the row's events+censored (censored-only hours may remove more)
    rows.sliding(2).foreach {
      case Array((_, n1, d1, c1, s1), (_, n2, _, _, s2)) =>
        assert(s2 <= s1)
        assert(n2 <= n1 - d1 - c1)
      case _ => ()
    }
  }

  test("BFS invariants: unique source at hops 0, every level-h vertex has a level-(h-1) edge") {
    val bfs = graft.SparkEntry.queries("sim_bfs_hops")(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val srcs = bfs.filter(_._2 == 0L).keys.toSeq
    assert(srcs.size === 1)
    assert(srcs.head === bfs.keys.min) // seeded at the minimum vertex
    // shortest-path property: a vertex discovered at hop h has at least
    // one graph neighbor discovered at hop h-1 (frontier expansion), and
    // no edge skips a level (|hops(u) - hops(v)| <= 1 for every edge)
    val knn = graft.SparkEntry.queries("sim_knn_graph")(spark, d)
      .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1)))
    val mutual = knn.toSet
    val edges = knn.filter { case (a, b) => mutual.contains((b, a)) }
    for ((u, v) <- edges if bfs.contains(u) && bfs.contains(v))
      assert(math.abs(bfs(u) - bfs(v)) <= 1, s"edge ($u,$v) skips a BFS level")
    for ((v, h) <- bfs if h > 0)
      assert(edges.exists { case (a, b) => b == v && bfs.get(a).contains(h - 1) },
        s"vertex $v at hop $h has no parent at hop ${h - 1}")
  }

  test("Kneser–Ney is a proper smoothed LM: per-prefix observed mass <= 1, every p in (0,1)") {
    import org.apache.spark.sql.functions._
    // re-derive the per-bigram KN probabilities with the query's exact
    // arithmetic, then check Σ_w1 p(w1|w0) over OBSERVED continuations
    // never exceeds 1 (the discount D·N1+(w0)/c(w0) exactly covers the
    // held-out interpolation mass) and every probability is positive.
    val docs = graft.Tables.documents(spark, d)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val bi = docs.withColumn("ws", split(col("text"), " "))
      .select(col("doc_id"), posexplode(col("ws")).as(Seq("pos", "w0")))
      .withColumn("w1", lead("w0", 1).over(w))
      .filter(col("w1").isNotNull).select(col("w0"), col("w1"))
    val cb = bi.groupBy(col("w0"), col("w1")).agg(count(lit(1)).as("cb"))
    val cp = bi.groupBy(col("w0")).agg(count(lit(1)).as("cp"))
    val n1pre = cb.groupBy(col("w0")).agg(count(lit(1)).as("n1pre"))
    val n1post = cb.groupBy(col("w1")).agg(count(lit(1)).as("n1post"))
    val nbt = cb.count().toDouble
    val p = cb.join(cp, "w0").join(n1pre, "w0").join(n1post, "w1")
      .withColumn("p",
        (col("cb").cast("double") - lit(0.75)) / col("cp").cast("double") +
          lit(0.75) * col("n1pre").cast("double") / col("cp").cast("double") *
            (col("n1post").cast("double") / lit(nbt)))
    val bad = p.filter(col("p") <= 0 || col("p") >= 1).count()
    assert(bad === 0, "every KN probability must be in (0,1)")
    val mass = p.groupBy(col("w0")).agg(sum(col("p")).as("m"))
      .agg(max(col("m"))).head().getDouble(0)
    assert(mass <= 1.0 + 1e-9, s"observed-continuation mass $mass exceeds 1")
  }

  test("PRF expansion: exactly 5 terms, none of them query terms, all from feedback docs") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = graft.Tables.documents(spark, d)
    val qterms = Seq("spark", "stream", "window")
    // the top-20 under the expanded query must dominate-or-equal the
    // base top-20 in matched-term counts (expansion only ADDS terms)
    val base = graft.SparkEntry.queries("text_bm25")(spark, d)
      .select(col("doc_id"), col("n_match").as("base_match"))
    val prf = graft.SparkEntry.queries("text_prf_expand")(spark, d)
    val joined = prf.join(base, Seq("doc_id"), "left")
      .filter(col("base_match").isNotNull && col("n_match") < col("base_match"))
    assert(joined.count() === 0,
      "a doc lost matched terms under a strictly larger term set")
    assert(prf.count() === 20)
  }
}
