package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** The relational capability surface (SURVEY.md §2.2): scans, joins of all
  * shapes, aggregations, window functions, sorts/limits, set ops, scalar
  * functions — each as a DataFrame query with a matching DuckDB oracle.
  *
  * Float determinism: double SUMs are order-dependent, and Spark's partial
  * aggregation order differs from DuckDB's. Every summed double is cast to
  * DECIMAL per row first (exact, order-independent), then the final result
  * back to double — both engines produce bit-identical values.
  */
object RelationalQueries {

  /** The batch CEP engine behind q66_pattern_match, on ANY frame with
    * (user_id, event_id, ts, event_type): every  signup (not-error)*
    * purchase  occurrence within 30 minutes, via a cumulative
    * negation-count and its value at the last anchor — two window passes
    * on one user-keyed sort. Factored out so the property spec can drive
    * it with generated sequences (and `Streams.cepMatches` parity uses
    * the same definition through the query). */
  def cepMatchesBatch(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev
      .withColumn("cum_err",
        sum(when(col("event_type") === "error", 1).otherwise(0)).over(w))
      .withColumn("signup_ts",
        last(when(col("event_type") === "signup", col("ts")), ignoreNulls = true).over(w))
      .withColumn("signup_err",
        last(when(col("event_type") === "signup", col("cum_err")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase" && col("signup_ts").isNotNull &&
        unix_micros(col("ts")) - unix_micros(col("signup_ts")) <= 1800000000L &&
        col("cum_err") === col("signup_err"))
      .select(col("user_id"), col("signup_ts"), col("ts").as("purchase_ts"),
        expr("(unix_micros(ts) - unix_micros(signup_ts)) div 1000000").as("gap_sec"))
      .orderBy(col("user_id"), col("purchase_ts"))
  }

  /** The binned interval-overlap engine behind q78_interval_bin_join:
    * input (user_id, s_us, e_us) closed µs intervals; output one row per
    * overlapping cross-user pair — emitted EXACTLY once, in the grid cell
    * containing the overlap's start — with both intervals' bounds. An
    * equi-join on the cell id replaces the nested loop an overlap
    * predicate would otherwise plan; OverlapJoinPropertySpec proves the
    * emit-once rule against the naive join on adversarial intervals
    * (multi-cell spans, shared endpoints, cell-boundary touches). */
  def binnedOverlapPairs(sess: DataFrame, binUs: Long): DataFrame = {
    val binned = sess.select(col("user_id"), col("s_us"), col("e_us"),
      explode(expr(s"sequence(s_us div ${binUs}L, e_us div ${binUs}L)")).as("bin"))
    val a = binned.select(col("bin"), col("user_id").as("user_a"),
      col("s_us").as("sa"), col("e_us").as("ea"))
    val b = binned.select(col("bin"), col("user_id").as("user_b"),
      col("s_us").as("sb"), col("e_us").as("eb"))
    a.join(b, Seq("bin"))
      .filter(col("user_a") < col("user_b") &&
        col("sa") <= col("eb") && col("sb") <= col("ea") &&
        expr(s"greatest(sa, sb) div ${binUs}L") === col("bin"))
      .drop("bin")
  }

  /** 8-bit md5 bucket (0..255) of a key — the deterministic, engine-
    * reproducible assignment primitive (DuckDB twin: the two-strpos hex
    * digit decode). Shared by the experimentation family (q82/q86 arms)
    * so the split provably composes across queries. */
  private def md5Bucket256(c: Column): Column =
    conv(substring(md5(c.cast(StringType).cast(BinaryType)), 1, 2), 16, 10)
      .cast("int")

  /** Deterministic 50/50 A/B arm off the md5 bucket. */
  private def armOf(c: Column): Column =
    when(md5Bucket256(c) < 128, "A").otherwise("B")

  /** Per-user FIRST OUTCOME under the 7-day administrative study window —
    * the shared derivation of the whole survival family (q95-q98 and the
    * CDC serving twin): first view anchors the clock, the first subsequent
    * event among `causes` decides (cause, t) — ties break on (ts,
    * event_id) — and anything past the cutoff censors at t = hours from
    * view to cutoff. Returns `(arm, cause, t)` rows, cause ∈ causes ∪
    * {"censored"}; users whose first view falls outside the window are
    * excluded. One cause = classic survival; several = competing risks. */
  private[graft] def survivalOutcomes(ev: DataFrame, causes: Seq[String]): DataFrame = {
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
    val firstOut = ev.filter(col("event_type").isin(causes: _*))
      .join(v, "user_id").filter(col("ts") > col("t_view"))
      .groupBy(col("user_id"))
      .agg(min(struct(unix_micros(col("ts")).as("us"),
        col("event_id").as("eid"), col("event_type").as("tpe"))).as("f"))
    val cut = ev.agg((min(unix_micros(col("ts"))) +
      lit(7L * 24 * 3600 * 1000000L)).as("cut_us"))
    v.select(col("user_id"), unix_micros(col("t_view")).as("tv_us"))
      .join(firstOut, Seq("user_id"), "left")
      .crossJoin(broadcast(cut))
      .filter(col("tv_us") < col("cut_us"))
      .withColumn("arm", armOf(col("user_id")))
      .withColumn("cause",
        when(col("f").isNotNull && col("f.us") <= col("cut_us"), col("f.tpe"))
          .otherwise(lit("censored")))
      .withColumn("d_us",
        when(col("cause") =!= "censored", col("f.us") - col("tv_us"))
          .otherwise(col("cut_us") - col("tv_us")))
      .select(col("arm"), col("cause"), expr("d_us div 3600000000").as("t"))
  }

  /** The single-cause (purchase) form of [[survivalOutcomes]], as
    * `(arm, status, t)` with status 1 = converted / 0 = censored —
    * q95/q96/q97's and the CDC serving twin's input. */
  private[graft] def survivalUsers(ev: DataFrame): DataFrame =
    survivalOutcomes(ev, Seq("purchase"))
      .withColumn("status",
        when(col("cause") =!= "censored", 1L).otherwise(0L))
      .select(col("arm"), col("status"), col("t"))

  /** Kaplan-Meier product-limit curve over per-subject `(status: Long,
    * t: Long)` rows (1 = event at t, 0 = censored at t) — q95's life-table
    * tail, shared with the streaming twin's state-snapshot read
    * (`Streams.survivalStates` parity in StreamingSpec). All windows are
    * ordered over the hour grid, which the administrative study window
    * bounds (domain-sized — see q95's scale note); the survival product
    * folds the frame-ordered factor list left-to-right. */
  private[graft] def kmCurve(users: DataFrame): DataFrame = {
    val nTot = users.agg(count(lit(1)).as("n"))
    val tbl = users.groupBy(col("t"))
      .agg(sum(col("status")).as("d"), sum(lit(1L) - col("status")).as("c"))
    val wPrev = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tbl.crossJoin(broadcast(nTot))
      .withColumn("n_risk",
        col("n") - coalesce(sum(col("d") + col("c")).over(wPrev), lit(0L)))
      .withColumn("factor",
        lit(1.0) - col("d").cast(DoubleType) / col("n_risk"))
      .withColumn("fl", collect_list(col("factor")).over(wRun))
      .filter(col("d") > 0)
      .select(col("t").as("t_hours"), col("n_risk"),
        col("d").as("n_events"), col("c").as("n_censored"),
        round(aggregate(col("fl"), lit(1.0),
          (acc, x) => acc * x), 6).as("survival"))
      .orderBy(col("t_hours"))
  }

  /** Holt-Winters additive triple exponential smoothing (season m=24) over
    * `(event_type, hr: Long, cents: Long)` rows — the shared tail of q99
    * and the CDC forecast-serving twin (same sharing shape as
    * [[survivalUsers]]/[[kmCurve]]). Hourly mean series per type fold
    * through the level/trend/seasonal recursions with DYADIC smoothing
    * constants (0.5/0.25/0.75 — exactly representable, so the Spark
    * aggregate() HOF and the DuckDB recursive CTE produce bit-identical
    * IEEE doubles). Emits per type the one-step-ahead fitted values and a
    * 24 h forecast. Scale shape: one (type × hour) two-phase agg is the
    * only corpus work; series are study-window-bounded (≤720 points),
    * fold state is model-sized (l, b, s[24]) — plan-asserted window-free. */
  private[graft] def holtWinters(ev: DataFrame): DataFrame =
    holtWintersFromGrid(ev.groupBy(col("event_type"), col("hr"))
      .agg(sum(col("cents")).as("sc"), count(lit(1)).as("n"))
      .select(col("event_type"), col("hr"),
        (col("sc").cast("double") /
          (col("n").cast("double") * lit(100.0))).as("y")))

  /** One fitted point of the Holt-Winters fold.
    *
    * `private[graft]`, NOT `private`: Scala object-private nested classes
    * compile to non-public bytecode, and the janino-generated serializer
    * for the UDF result (another package) then fails to resolve the
    * accessors — every fold task logged "Expr codegen error and falling
    * back to interpreter mode" and ran the HwState→UnsafeRow projection
    * interpreted. Qualified access compiles to public bytecode, restoring
    * whole-stage codegen on the forecast family (q99/q101/q102/
    * cdc_forecast_serving). Values are unchanged — only the serializer's
    * execution mode. */
  private[graft] case class HwFit(t: Long, y: Double, yhat: Double)
  /** Fold state: level, trend, seasonals (length m), fitted points. */
  private[graft] case class HwState(l: Double, b: Double, s: Seq[Double], fit: Seq[HwFit])

  /** The Holt-Winters recursion as a deterministic JVM fold (see the call
    * site in [[holtWintersFromGrid]] for why this is not an aggregate()
    * HOF). Every arithmetic step mirrors the previous SQL expression
    * operand-for-operand: IEEE double ops are deterministic, so the
    * results are bit-identical. */
  private val hwFold = udf((tsL: Seq[Long], ys: Seq[Double]) => {
    val m = 24
    val l0 = ys.take(m).foldLeft(0.0)(_ + _) / 24.0
    val m2 = ys.slice(m, 2 * m).foldLeft(0.0)(_ + _) / 24.0
    val b0 = (m2 - l0) / 24.0
    var l = l0
    var b = b0
    var s = ys.take(m).map(_ - l0).toArray
    val fit = Seq.newBuilder[HwFit]
    var i = m // 0-based index into ys; the HOF iterated i = m+1 .. size (1-based)
    while (i < ys.length) {
      val y = ys(i)
      val sHead = s(0)
      fit += HwFit(tsL(i), y, l + b + sHead) // yhat from PRE-update state
      val l1 = 0.5d * (y - sHead) + 0.5d * (l + b)
      val b1 = 0.25d * (l1 - l) + 0.75d * b
      val sNew = new Array[Double](m)
      System.arraycopy(s, 1, sNew, 0, m - 1)
      sNew(m - 1) = 0.25d * (y - l1) + 0.75d * sHead
      l = l1; b = b1; s = sNew
      i += 1
    }
    HwState(l, b, s.toSeq, fit.result())
  })

  /** The fold half of [[holtWinters]], over an already-maintained hourly
    * grid `(event_type, hr: Long, y: Double)` — the streaming twin reads
    * the incremental-agg sink's state straight into this (StreamingSpec
    * pins that parity). */
  private[graft] def holtWintersFromGrid(grid: DataFrame): DataFrame = {
    val m = 24
    val h0 = grid.agg(min(col("hr")).as("h0"))
    val hourly = grid.crossJoin(broadcast(h0))
      .select(col("event_type"), (col("hr") - col("h0")).as("t"), col("y"))
    val series = hourly.groupBy(col("event_type"))
      .agg(array_sort(collect_list(struct(col("t"), col("y")))).as("pts"))
      .filter(size(col("pts")) >= 3 * m)
      .select(col("event_type"),
        expr("transform(pts, p -> p.t)").as("ts_l"),
        expr("transform(pts, p -> p.y)").as("ys"))
    // The recursion runs as a JVM fold over the per-type series arrays
    // (hwFold): the previous aggregate() HOF built the fit list by
    // `concat(st.fit, array(...))` — Catalyst arrays are immutable, so
    // every step re-copied the whole accumulated list, O(n²) copies per
    // series (measured: the fold stage alone was ~1.3 s CPU at sf0.1,
    // >half of q99). The JVM fold appends to a mutable buffer — O(n·m) —
    // with the SAME double operations in the SAME order (dyadic constants,
    // left folds, identical operand order), so every emitted value is
    // bit-identical to the HOF's and to the DuckDB recursive CTE
    // (oracle-gated). Per-series work rides the same one (type×hour)
    // two-phase agg; the fold input/state stays study-window-bounded.
    val folded = series.withColumn("st", hwFold(col("ts_l"), col("ys")))
    val fits = folded
      .select(col("event_type"), explode(col("st.fit")).as("f"))
      .select(col("event_type"), lit("fit").as("kind"), col("f.t").as("t"),
        round(col("f.y"), 6).as("y"), round(col("f.yhat"), 6).as("yhat"))
    val fc = folded
      .select(col("event_type"), explode(expr(
        """transform(sequence(1, 24), h -> named_struct(
             't', element_at(ts_l, size(ts_l)) + cast(h as bigint),
             'yhat', st.l + cast(h as double) * st.b + element_at(st.s, h)))"""))
        .as("f"))
      .select(col("event_type"), lit("forecast").as("kind"),
        col("f.t").as("t"), lit(null).cast("double").as("y"),
        round(col("f.yhat"), 6).as("yhat"))
    fits.unionByName(fc).orderBy(col("event_type"), col("kind"), col("t"))
  }

  /** Conformal residual band per type over a [[holtWinters]] result:
    * exact ceil-rank p10/p90 order statistics of the fit residuals —
    * shared by q101 (bands on the live forecast) and q102 (hold-out
    * backtest), token-identical with [[ConformalBandCtesSql]]. Returns
    * `(event_type, r_lo, r_hi)` — types-sized, broadcast by callers. */
  private[graft] def conformalBand(hw: DataFrame): DataFrame =
    hw.filter(col("kind") === "fit")
      .select(col("event_type"), (col("y") - col("yhat")).as("r"))
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(col("r"))).as("rs"), count(lit(1)).as("n"))
      .select(col("event_type"),
        expr("element_at(rs, cast((n + 9) div 10 as int))").as("r_lo"),
        expr("element_at(rs, cast((9 * n + 9) div 10 as int))").as("r_hi"))

  /** Deterministic 1/16 universe-sample predicate (24-bit md5 prefix mod
    * 16) — shared by q70 (join-consistent order sampling) and q85 (row
    * sampling with CI). */
  private def sampleKeep16(c: Column): Column =
    (conv(substring(md5(c.cast(StringType).cast(BinaryType)), 1, 6), 16, 10)
      .cast("long") % 16) === 0

  /** Exact-moment (co)variance chain shared by the experimentation
    * family (q82/q86/q87): (n·Σxy − Σx·Σy) / (n·(n−1)) with the product
    * terms in DECIMAL(38,0) (HUGEINT on the oracle side) and ONE
    * correctly-rounded division — the token-identical form both engines
    * must compute. Variance = coMoment(n, Σx², Σx, Σx). */
  private def exactCoMoment(n: Column, sxy: Column, sx: Column, sy: Column): Column = {
    val dec = DecimalType(38, 0)
    (n.cast(dec) * sxy - sx.cast(dec) * sy.cast(dec)).cast(DoubleType) /
      (n.cast(DoubleType) * (n - lit(1)))
  }

  /** Order-independent exact sum of a double column. */
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(28, 6))).cast(DoubleType)
  private val DSUM = "CAST(SUM(CAST(%s AS DECIMAL(28,6))) AS DOUBLE)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-style pricing summary: wide hash agg with partial+final,
    // decimal-exact sums, avg as exact-sum / count.
    "q01_pricing_summary" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      li.filter(col("l_shipdate") <= lit("1997-09-01").cast(TimestampType))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Selective filter + narrow projection: predicate and column pruning
    // must reach the parquet scan (verified in PlanSpec).
    "q02_filter_project" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1995-01-01").cast(TimestampType) &&
          col("l_shipdate") < lit("1996-01-01").cast(TimestampType) &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // Dimension joins: region/nation are tiny → explicit broadcast, no
    // shuffle on the probe side.
    "q03_broadcast_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("sum_acctbal"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // Fact-fact equi-join: shuffles on the join key, then reaggregates —
    // the canonical large-join shape (sort-merge/shuffled-hash under AQE).
    "q04_join_agg" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val li = Tables.lineitem(s, d)
      o.join(li, o("o_orderkey") === li("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          countDistinct(col("o_orderkey")).as("n_orders"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(col("o_orderpriority"))
    }),

    // EXISTS → left-semi join (no row multiplication, build side pruned to
    // the join key).
    "q05_semi_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_totalprice") > 250000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy(col("c_custkey"))
    }),

    // NOT EXISTS → left-anti join (order side filtered so the result is
    // non-trivial — every customer has *some* order).
    "q06_anti_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_totalprice") > 350000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }),

    // Left outer join preserving customers with zero orders, then
    // per-customer aggregate.
    "q07_outer_join_agg" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          dsum(coalesce(col("o_totalprice"), lit(0.0))).as("total_spend"))
        .orderBy(col("c_custkey"))
    }),

    // Ranking window: top-3 orders per customer (dedup-by-key shape — the
    // CDC compaction primitive, SURVEY.md §2.2 Window functions).
    "q08_window_topn" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // Frame window: running per-customer spend (ROWS BETWEEN UNBOUNDED
    // PRECEDING AND CURRENT ROW), decimal-exact.
    "q09_window_running" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .withColumn("running_spend",
          sum(col("o_totalprice").cast(DecimalType(28, 6))).over(w).cast(DoubleType))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("running_spend"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // Analytic lag/lead: before/after reconstruction over an event stream
    // (the reference's before/after images as a window computation).
    "q10_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("prev_value", lag(col("value"), 1).over(w))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .select(col("user_id"), col("event_id"), col("value"), col("prev_value"), col("next_type"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // Global top-k: ORDER BY … LIMIT k plans TakeOrderedAndProject — no
    // global sort materialization.
    "q11_topk" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(dsum(col("o_totalprice")).as("spend"), count(lit(1)).as("n_orders"))
        .orderBy(col("spend").desc, col("o_custkey"))
        .limit(10)
    }),

    // ROLLUP hierarchy totals.
    "q12_rollup" -> ((s, d) => {
      Tables.orders(s, d)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))
    }),

    // CUBE over two dims.
    "q13_cube" -> ((s, d) => {
      Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    }),

    // Exact count-distinct alongside plain counts (expands to two-phase
    // distinct aggregation).
    "q14_count_distinct" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("distinct_parts"),
          countDistinct(col("l_suppkey")).as("distinct_supps"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    // Set operations: union / intersect / except between two derived key
    // sets, tagged into one result.
    "q15_setops" -> ((s, d) => {
      val big = Tables.orders(s, d).filter(col("o_totalprice") > 200000)
        .select(col("o_custkey").as("k")).distinct()
      val rich = Tables.customer(s, d).filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("k")).distinct()
      big.intersect(rich).withColumn("tag", lit("both"))
        .union(big.except(rich).withColumn("tag", lit("only_big_orders")))
        .union(rich.except(big).withColumn("tag", lit("only_rich")))
        .orderBy(col("tag"), col("k"))
    }),

    // Scalar string functions over part.
    "q16_string_funcs" -> ((s, d) => {
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          lower(col("p_name")).as("name_lower"),
          regexp_extract(col("p_brand"), "(\\d+)", 1).as("brand_num"),
          split(col("p_type"), " ").getItem(0).as("type_head"),
          concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
          length(col("p_name")).as("name_len"))
        .orderBy(col("p_partkey"))
    }),

    // Date/time functions over orders.
    "q17_datetime" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("month"))
    }),

    // The decoder's timestamp conversion as SQL: unix µs ↔ the Postgres
    // epoch 2000-01-01 (PgOutputDecoder.pgMicrosToUnixMicros).
    "q18_pg_epoch" -> ((s, d) => {
      Tables.events(s, d)
        .select(
          col("event_id"),
          (unix_micros(col("ts")) - lit(946684800000000L)).as("pg_epoch_us"),
          timestamp_micros(unix_micros(col("ts"))).as("ts_roundtrip"))
        .orderBy(col("event_id"))
    }),

    // JSON access on events.props (the reference's jsonb columns surface as
    // JSON text — SURVEY.md §1.2).
    "q19_json" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast(IntegerType))
        .groupBy((col("k") % 10).as("k_mod"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy(col("k_mod"))
    }),

    // Conditional dispatch (the reference's per-op routing, reader.py:188-197,
    // as a CASE expression).
    "q20_case_dispatch" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("bucket",
          when(col("event_type") === "click", "interaction")
            .when(col("event_type") === "view", "interaction")
            .when(col("event_type") === "error", "problem")
            .otherwise("other"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
        .orderBy(col("bucket"))
    }),

    // Tumbling event-time window as a batch query (streaming variant in
    // StreamingSpec uses the identical expression).
    "q21_tumbling_window" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
        .select(col("window.start").as("ws"), col("event_type"), col("n"), col("total"))
        .orderBy(col("ws"), col("event_type"))
    }),

    // As-of join, Spark-scale formulation: one sort-shuffle, last-value
    // window — no per-row range scan (SURVEY.md §2.2 Joins "as-of").
    "q22_asof_join" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("last_click_ts",
          last(when(col("event_type") === "click", col("ts")), ignoreNulls = true).over(w))
        .withColumn("last_click_value",
          last(when(col("event_type") === "click", col("value")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts"), col("last_click_ts"), col("last_click_value"))
        .orderBy(col("event_id"))
    }),

    // As-of join, NEAREST direction (the other two thirds of pandas
    // merge_asof semantics beside q22's backward form): each error event
    // pairs with its closest click in time, backward or forward, ties
    // preferring backward. Two frames over ONE user-keyed partitioning
    // (preceding-last + following-first ignore-nulls); distances are whole
    // microseconds, so direction choice is integer-exact. Scale shape:
    // identical to q22 — one shuffle on user_id, per-row O(1) state.
    "q61_asof_nearest" -> ((s, d) => {
      val ord = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wb = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wf = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      Tables.events(s, d)
        .withColumn("bk",
          last(when(col("event_type") === "click", col("ts")), ignoreNulls = true).over(wb))
        .withColumn("fw",
          first(when(col("event_type") === "click", col("ts")), ignoreNulls = true).over(wf))
        .filter(col("event_type") === "error")
        .withColumn("db", unix_micros(col("ts")) - unix_micros(col("bk")))
        .withColumn("df", unix_micros(col("fw")) - unix_micros(col("ts")))
        .withColumn("nearest_click_ts",
          when(col("db").isNull, col("fw"))
            .when(col("df").isNull, col("bk"))
            .when(col("db") <= col("df"), col("bk")).otherwise(col("fw")))
        .withColumn("direction",
          when(col("db").isNull && col("df").isNull, lit(null).cast("string"))
            .when(col("df").isNull, lit("b"))
            .when(col("db").isNull, lit("f"))
            .when(col("db") <= col("df"), lit("b")).otherwise(lit("f")))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("nearest_click_ts"), col("direction"))
        .orderBy(col("event_id"))
    }),

    // Ordered array aggregation (collect + sort inside groups). Serialized
    // to a pipe-joined string: the gate's comparator sorts rows in pandas,
    // and raw array cells are unhashable there — the aggregation under test
    // (collect_list + sort_array + transform) is unchanged.
    "q24_array_agg" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(expr("array_join(transform(sort_array(collect_list(struct(ts, event_id, event_type))), x -> x.event_type), '|')")
          .as("types_in_order"), count(lit(1)).as("n"))
        .orderBy(col("user_id"))
    }),

    // GROUPING SETS (disjoint single-dim groupings + grand total).
    "q25_grouping_sets" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("li_gs")
      s.sql(
        """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS qty
           FROM li_gs
           GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
           ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")
    }),

    // HLL approximate distinct. The sketch estimate is implementation-
    // specific (DuckDB cannot reproduce Spark's HLL++), so the machine-
    // checked contract is the error envelope: the query outputs the exact
    // distinct count plus a boolean asserting the sketch landed within
    // 3×rsd (rsd = 0.05 default ⇒ 15%); the oracle computes the exact
    // counts and expects the boolean TRUE. Both engines hash-match iff the
    // approximation held its bound — the q41 exact-regime trick, adapted to
    // a sketch that is never exact. (HLL++ is deterministic, so the check
    // is stable run-over-run.)
    "q26_approx_distinct" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("exact_parts"), col("n"),
          (abs(col("approx_parts") - col("exact_parts")) <=
            col("exact_parts") * lit(0.15)).as("within_bound"))
        .orderBy(col("l_returnflag"))
    }),

    // max_by/min_by — the single-pass argmax primitive (ts is unique in
    // the events table, so the argmax is well-defined).
    "q27_arg_extremes" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(
          max_by(col("event_id"), col("ts")).as("latest_event_id"),
          min_by(col("event_id"), col("ts")).as("earliest_event_id"),
          max(col("ts")).as("latest_ts"))
        .orderBy(col("event_type"))
    }),

    // Non-equi range join: events against a (small, broadcast) derived
    // calendar dimension on ts ∈ [month, next month) — the range-join shape
    // (SURVEY.md §2.2 Joins "range/as-of style").
    "q29_range_join" -> ((s, d) => {
      val weeks = Tables.events(s, d)
        .select(date_trunc("week", col("ts")).as("w_start"))
        .distinct()
        .withColumn("w_end", (col("w_start") + expr("INTERVAL 7 DAYS")).cast(TimestampType))
      val e = Tables.events(s, d)
      e.join(broadcast(weeks),
          e("ts") >= weeks("w_start") && e("ts") < weeks("w_end"))
        .groupBy(col("w_start"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
        .orderBy(col("w_start"))
    }),

    // Pivot: event types to columns (explicit value list → stable schema).
    "q30_pivot" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "view", "error", "purchase", "signup"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("user_id"))
    }),

    // Bag-semantics set ops: INTERSECT ALL keeps min multiplicities,
    // EXCEPT ALL subtracts them — the duplicate-aware complement of q15.
    "q32_setops_all" -> ((s, d) => {
      val a = Tables.lineitem(s, d).filter(col("l_quantity") < 10)
        .select(col("l_returnflag").as("f"), col("l_linenumber").as("ln"))
      val b = Tables.lineitem(s, d)
        .filter(col("l_quantity") >= 30 && col("l_quantity") < 35)
        .select(col("l_returnflag").as("f"), col("l_linenumber").as("ln"))
      a.intersectAll(b).withColumn("tag", lit("inter_all"))
        .union(a.exceptAll(b).withColumn("tag", lit("except_all")))
        .groupBy(col("tag"), col("f"), col("ln"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("tag"), col("f"), col("ln"))
    }),

    // Session windows in batch mode (same expression the streaming variant
    // uses): per-user gap-based sessions, checked against a gaps-and-islands
    // SQL oracle.
    // Cross-engine contract (q31/q52/q78): Spark's session_window merges
    // events whose gap is STRICTLY less than the gap duration (window end
    // is exclusive), so an exactly-30-min gap starts a NEW session. The
    // gaps-and-islands oracles therefore break on `gap >= 30 min`, not
    // `>` — the two conventions diverge only on a µs-exact 30-min gap.
    "q31_session_window" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"), col("user_id"), col("n"))
        .orderBy(col("user_id"), col("session_start"))
    }),

    // Statistical aggregates (rounded: Welford-style accumulation differs
    // in last ulps across engines) + exact interpolated percentile.
    "q28_stats" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          round(var_samp(col("l_discount")), 6).as("var_disc"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
          round(expr("percentile(l_extendedprice, 0.5)"), 6).as("median_price"),
          round(expr("percentile(l_extendedprice, 0.95)"), 6).as("p95_price"))
        .orderBy(col("l_returnflag"))
    }),

    // Scale path for q28's percentiles: approx_percentile (Greenwald-Khanna
    // quantile summaries — mergeable, bounded O(accuracy) state per group,
    // map-side partial aggregation) replaces the exact percentile whose
    // buffer grows with group size (per-group memory O(rows) — the thing
    // that cannot survive a 100× scale-up). The sketch value is
    // implementation-specific, so the machine-checked contract is the error
    // envelope (the q26 pattern): compute both forms, output booleans
    // asserting the sketch landed within 1% of exact; the oracle expects
    // TRUE. Production runs only the approx branch — the exact branch here
    // exists to make the bound machine-checked. (GK ε = 1/accuracy = 1e-4
    // rank error; 1% value error is a wide margin on a dense column.)
    "q28_stats_approx" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("ap50"),
          expr("approx_percentile(l_extendedprice, 0.95, 10000)").as("ap95"),
          expr("percentile(l_extendedprice, 0.5)").as("ep50"),
          expr("percentile(l_extendedprice, 0.95)").as("ep95"))
        .select(col("l_returnflag"), col("n"),
          (abs(col("ap50") - col("ep50")) <= abs(col("ep50")) * lit(0.01))
            .as("p50_within_1pct"),
          (abs(col("ap95") - col("ep95")) <= abs(col("ep95")) * lit(0.01))
            .as("p95_within_1pct"))
        .orderBy(col("l_returnflag"))
    }),

    // Correlated scalar subqueries (Catalyst decorrelates to an aggregate +
    // join): customers with above-nation-average balance. The comparison is
    // written as balance·count > sum over DECIMAL so both engines decide
    // borderline rows identically (a double AVG is summation-order
    // dependent and could flip a row that sits exactly on the average).
    "q33_correlated_subquery" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("cust_q33")
      s.sql(
        """SELECT c_custkey, c_name, c_acctbal FROM cust_q33 c
           WHERE CAST(c_acctbal AS DECIMAL(18,2)) *
                 (SELECT COUNT(*) FROM cust_q33 c2 WHERE c2.c_nationkey = c.c_nationkey)
               > (SELECT SUM(CAST(c3.c_acctbal AS DECIMAL(18,2))) FROM cust_q33 c3
                  WHERE c3.c_nationkey = c.c_nationkey)
           ORDER BY c_custkey""")
    }),

    // EXISTS / NOT EXISTS correlated predicates (Catalyst plans existence
    // joins): orders with at least one line shipped after the order date
    // and no returned line.
    "q34_exists_subquery" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("ord_q34")
      Tables.lineitem(s, d).createOrReplaceTempView("li_q34")
      s.sql(
        """SELECT o_orderkey, o_totalprice FROM ord_q34 o
           WHERE EXISTS (SELECT 1 FROM li_q34 l
                         WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
             AND NOT EXISTS (SELECT 1 FROM li_q34 l2
                             WHERE l2.l_orderkey = o.o_orderkey AND l2.l_returnflag = 'R')
           ORDER BY o_orderkey""")
    }),

    // UNPIVOT (melt) — the inverse of q30's pivot: wide per-flag measures to
    // long (flag, measure, value) rows.
    "q35_unpivot" -> ((s, d) => {
      val agg = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          expr("CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)").as("qty"),
          expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)").as("price"),
          expr("CAST(SUM(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE)").as("disc"))
      agg.unpivot(
          Array(col("l_returnflag")),
          Array(col("qty"), col("price"), col("disc")),
          "measure", "value")
        .orderBy(col("l_returnflag"), col("measure"))
    }),

    // Time-RANGE window frame (vs q09's ROWS frame): per-user rolling count
    // and value sum over the trailing hour, ordered by epoch seconds so the
    // frame bound is a plain numeric range both engines evaluate identically.
    "q36_range_frame" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_s"))
        .rangeBetween(-3600L, Window.currentRow)
      Tables.events(s, d)
        .withColumn("ts_s", unix_timestamp(col("ts")))
        .withColumn("n_last_hour", count(lit(1)).over(w))
        .withColumn("sum_last_hour",
          sum(col("value").cast(DecimalType(28, 6))).over(w).cast(DoubleType))
        .select(col("user_id"), col("event_id"), col("ts"),
          col("n_last_hour"), col("sum_last_hour"))
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    }),

    // Distribution ranking family: ntile / percent_rank / cume_dist
    // (complements q08's row_number/rank). Total order inside each
    // partition (ts, event_id) keeps every rank deterministic.
    "q37_distribution_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .filter(col("user_id") < 50)
        .withColumn("quartile", ntile(4).over(w))
        .withColumn("pct_rank", round(percent_rank().over(w), 6))
        .withColumn("cume", round(cume_dist().over(w), 6))
        .select(col("event_type"), col("event_id"), col("quartile"),
          col("pct_rank"), col("cume"))
        .orderBy(col("event_type"), col("event_id"))
    }),

    // Null-safe equi-join (<=> / IS NOT DISTINCT FROM): rows pair up when
    // both sides are NULL too — a different join key semantics Catalyst
    // plans with EqualNullSafe. Nullable key derived from event value.
    "q38_null_safe_join" -> ((s, d) => {
      val e = Tables.events(s, d)
        .withColumn("vkey",
          when(col("value") > 0, floor(col("value") / 100).cast("long")))
      val a = e.filter(col("event_type") === "error")
        .select(col("event_id").as("a_id"), col("vkey").as("a_key"))
      val b = e.filter(col("event_type") === "purchase" && col("user_id") < 20)
        .select(col("event_id").as("b_id"), col("vkey").as("b_key"))
      a.join(b, col("a_key") <=> col("b_key"))
        .groupBy(col("a_key"))
        .agg(count(lit(1)).as("n_pairs"), min(col("a_id")).as("min_a"),
          min(col("b_id")).as("min_b"))
        .orderBy(col("a_key").asc_nulls_first)
    }),

    // Skew-safe two-phase aggregation through the gate: the salted shape
    // (group by (key, salt), then re-merge by key) must equal the plain
    // aggregate — decimal partials make the equality exact.
    "q39_salted_agg" -> ((s, d) => {
      graft.operators.Skew.saltedAggregate(
        Tables.lineitem(s, d).select(col("l_returnflag"), col("l_quantity")),
        Seq("l_returnflag"), salts = 16,
        partialAggs = Seq(
          sum(col("l_quantity").cast(DecimalType(28, 6))).as("p_qty"),
          count(lit(1)).as("p_n")),
        finalAggs = Seq(
          sum(col("p_qty")).cast(DoubleType).as("sum_qty"),
          sum(col("p_n")).as("n")))
        .orderBy(col("l_returnflag"))
    }),

    // Salted equi-join through the gate: build side replicated across 8
    // salts, probe side salted deterministically — results must equal the
    // plain inner join (here re-aggregated per nation).
    "q40_salted_join" -> ((s, d) => {
      val cust = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      val nat = Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))
      graft.operators.Skew.saltedJoin(cust, nat, "c_nationkey", "n_nationkey", salts = 8)
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_customers"),
          expr("CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE)").as("sum_bal"))
        .orderBy(col("n_name"))
    }),

    // Heavy-hitters sketch (DataSketches frequent-items via approx_top_k).
    // Run in the exact regime — event_type cardinality ≪ the sketch's
    // tracked-item budget, so counts are exact and the DuckDB oracle is a
    // plain top-k; at corpus scale the same sketch degrades gracefully to
    // approximate with mergeable per-partition state (the property that
    // matters at 100 TB: no shuffle of raw values, just sketch merges).
    "q41_approx_top_k" -> ((s, d) => {
      Tables.events(s, d)
        .agg(expr("approx_top_k(event_type, 3)").as("tk"))
        .select(explode(col("tk")).as("e"))
        .select(col("e.item").as("item"), col("e.count").as("n"))
        .orderBy(col("n").desc, col("item"))
    }),

    // Fixed-width histogram: numeric bucketing + count/exact-sum per bucket
    // (the profiling primitive a corpus pipeline runs before filtering).
    // One partial+final hash agg on a 10-value key — fully map-side at scale.
    "q42_histogram" -> ((s, d) => {
      Tables.lineitem(s, d)
        .withColumn("bucket",
          least(floor((col("l_quantity") - 1) / 5).cast(IntegerType), lit(9)))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("price_sum"))
        .orderBy(col("bucket"))
    }),

    // Conditional aggregation: FILTER-style counts and boolean aggregates
    // (count_if / bool_and / bool_or) — all partial-aggregable, no extra
    // shuffle beyond the group-by.
    "q43_conditional_agg" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_total"),
          count(when(col("o_totalprice") > 200000, 1)).as("n_big"),
          bool_and(col("o_totalprice") > 0).as("all_positive"),
          bool_or(col("o_totalprice") > 450000).as("any_huge"))
        .orderBy(col("o_orderpriority"))
    }),

    // Gap-fill / last-observation-carried-forward: last non-null value per
    // user over an event-time window (IGNORE NULLS frame) — the windowed
    // twin of the CDC TOAST repair fold (same pk partitioning, no extra
    // shuffle beyond the window's).
    "q44_gap_fill" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("v_click", when(col("event_type") === "click", col("value")))
        .withColumn("last_click_value", last(col("v_click"), ignoreNulls = true).over(w))
        .filter(col("user_id") < 50)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("last_click_value"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // Five-table star join: two fact tables shuffled on their join key,
    // small dims broadcast — the canonical warehouse topology. nation and
    // region are bounded dimensions (25/5 rows at every scale factor) so
    // their hints are always right; customer grows with the fact tables
    // (15 M rows at sf100 — far beyond any broadcast threshold), so its
    // strategy is left to Catalyst statistics + AQE rather than pinned to a
    // hint that becomes a driver OOM at scale.
    "q45_star_join" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          countDistinct(col("o_orderkey")).as("n_orders"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // Grouped top-k through the custom typed Aggregator (bounded O(k)
    // per-group buffers with map-side partial merge — the shuffle-light
    // alternative to window-rank when k ≪ group size), gate-checked against
    // the window formulation's SQL.
    "q46_grouped_topk" -> ((s, d) => {
      import s.implicits._
      val topk = new graft.operators.TopKAggregator(3).toColumn
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("seg"), col("o_totalprice"), col("o_orderkey"))
        .as[(String, Double, Long)]
        .groupByKey(_._1)
        .mapValues(t => (t._2, t._3))
        .agg(topk)
        .flatMap { case (seg, top) =>
          top.zipWithIndex.map { case ((score, id), i) => (seg, (i + 1).toLong, id, score) }
        }
        .toDF("seg", "rn", "o_orderkey", "o_totalprice")
        .orderBy(col("seg"), col("rn"))
    }),

    // Sequential funnel (view → click → purchase): each user's first view,
    // first click strictly after it, first purchase strictly after that —
    // the product-analytics pattern over an event stream. Scale shape:
    // every aggregate AND every join keys on user_id, so one partitioning
    // carries the whole funnel (AQE reuses the exchange); adding funnel
    // stages adds user-keyed steps, never a new shuffle class, and the
    // event_type filters prune each stage's input at the scan.
    "q47_event_funnel" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"), col("ts"), col("event_type"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("ts") > col("t_view"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("ts") > col("t_click"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
      v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
        .select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"),
          (lit(1) + when(col("t_click").isNotNull, 1).otherwise(0) +
            when(col("t_purchase").isNotNull, 1).otherwise(0)).as("stage"))
        .orderBy(col("user_id"))
    }),

    // Cohort retention: users grouped by signup week; per later week, the
    // fraction of the cohort still active — the companion analytics
    // pattern to the funnel. Scale shape: cohort assignment and the
    // (user, cohort, week) distinct both key on user_id; the final
    // cohort×offset matrix is tiny (weeks², broadcast-joined to sizes).
    // Week arithmetic is Monday-truncated timestamps on both engines;
    // day-diff/7 is exact between week starts.
    "q48_cohort_retention" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val cohort = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(date_trunc("week", min(col("ts"))).as("cw"))
      val size = cohort.groupBy(col("cw"))
        .agg(countDistinct(col("user_id")).as("cohort_size"))
      val act = ev.join(cohort, "user_id")
        .withColumn("aw", date_trunc("week", col("ts")))
        .filter(col("aw") >= col("cw"))
        .select(col("user_id"), col("cw"),
          (datediff(col("aw"), col("cw")) / 7).cast("int").as("week_offset"))
        .distinct()
        .groupBy(col("cw"), col("week_offset")).agg(count(lit(1)).as("n_active"))
      act.join(size, "cw")
        .select(col("cw").as("cohort_week"), col("week_offset"),
          col("n_active"), col("cohort_size"),
          round(col("n_active") / col("cohort_size"), 6).as("retention"))
        .orderBy(col("cohort_week"), col("week_offset"))
    }),

    // Rolling 7-day distinct active users: the sliding-window DISTINCT that
    // window frames can't express (no COUNT(DISTINCT) over RANGE frames).
    // Shape: reduce events to distinct (day, user) FIRST — the fan-out then
    // costs ≤7 rows per (day, user), linear with a constant, joined against
    // the BROADCAST (tiny) day dimension; the final count-distinct shuffles
    // on (day, user). No quadratic term at any scale.
    "q49_rolling_distinct" -> ((s, d) => {
      val du = Tables.events(s, d)
        .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      val days = du.select(col("day").as("d")).distinct()
      du.join(broadcast(days),
          col("day").between(date_sub(col("d"), 6), col("d")))
        .groupBy(col("d"))
        .agg(countDistinct(col("user_id")).as("active_users_7d"))
        .orderBy(col("d"))
    }),

    // Scale path for the rolling distinct: per-day HLL sketches (Datasketches
    // hll_sketch_agg) merged over the trailing window — sketches are KB-sized
    // regardless of user cardinality and merge associatively, so the 7-day
    // union moves 7 sketches per day instead of re-shuffling (day, user)
    // pairs; at 100 TB this is the difference between a constant-size
    // day×sketch table and a users-sized shuffle. Gated by the error-envelope
    // pattern (q26): the query outputs the EXACT counts plus a boolean
    // asserting the sketch landed within 5% relative error per day; the
    // oracle expects every boolean TRUE.
    "q50_rolling_distinct_approx" -> ((s, d) => {
      val du = Tables.events(s, d)
        .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      val days = du.select(col("day").as("d")).distinct()
      val exact = du.join(broadcast(days),
          col("day").between(date_sub(col("d"), 6), col("d")))
        .groupBy(col("d"))
        .agg(countDistinct(col("user_id")).as("active_users_7d"))
      val sketches = Tables.events(s, d)
        .select(to_date(col("ts")).as("day"), col("user_id"))
        .groupBy(col("day")).agg(expr("hll_sketch_agg(user_id)").as("sk"))
      val approx = sketches.join(broadcast(days),
          col("day").between(date_sub(col("d"), 6), col("d")))
        .groupBy(col("d"))
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      exact.join(approx, "d")
        .select(col("d"), col("active_users_7d"),
          (abs(col("est") - col("active_users_7d")) <=
            col("active_users_7d") * 0.05).as("within_bound"))
        .orderBy(col("d"))
    }),

    // Per-user anomaly detection over the event stream: z-score of each
    // event's value against its user's own mean/stddev, flagging |z| > 3 —
    // the outlier sweep a pipeline runs before training on behavioral data.
    // Scale shape: one user-keyed hash agg builds the per-user profile
    // (users ≪ events → tiny), which BROADCASTS back onto a narrow scan —
    // the corpus never shuffles. Determinism: mean and variance come from
    // exact DECIMAL sums of value and value² (value carries 2 decimals, so
    // both cast exactly); the remaining arithmetic is plain IEEE double,
    // identical on both engines.
    "q51_event_anomaly" -> ((s, d) => {
      val dec = DecimalType(28, 6)
      val ev = Tables.events(s, d).select(col("user_id"), col("event_id"), col("value"))
      val stats = ev.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(dec)).cast(DoubleType).as("sv"),
          sum((col("value") * col("value")).cast(dec)).cast(DoubleType).as("svv"))
        .filter(col("n") >= 2)
        .withColumn("mean", col("sv") / col("n"))
        .withColumn("sd",
          sqrt((col("svv") - col("sv") * col("sv") / col("n")) / (col("n") - 1)))
        .filter(col("sd") > 0)
        .select(col("user_id"), col("mean"), col("sd"))
      ev.join(broadcast(stats), "user_id")
        .withColumn("z", (col("value") - col("mean")) / col("sd"))
        .filter(abs(col("z")) > 3.0)
        .select(col("user_id"), col("event_id"), col("value"),
          round(col("mean"), 6).as("user_mean"),
          round(col("sd"), 6).as("user_sd"),
          round(col("z"), 6).as("z"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // Per-session statistics over the gap-sessionized event stream: the
    // session TABLE (duration, events, value sum) q31's window grouping
    // implies — the unit of analysis for engagement/billing pipelines.
    // Scale shape: session_window is one user-keyed partitioning (same
    // exchange as the whole event family); the duration arithmetic is a
    // narrow projection on the aggregated (tiny) session rows.
    // session_window.end = last event + gap, so duration = end-start-gap.
    "q52_session_stats" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("value_sum"))
        .select(col("user_id"),
          col("session_window.start").as("session_start"),
          expr("""(unix_micros(session_window.end) -
                   unix_micros(session_window.start) - 1800000000L) div 1000000L""")
            .as("duration_s"),
          col("n_events"), col("value_sum"))
        .orderBy(col("user_id"), col("session_start"))
    }),

    // Per-event running user features: each event annotated with its
    // user's running event count and exact running value sum — the
    // point-in-time feature-engineering primitive (a model trained on
    // event N must only see state as of event N; computing features this
    // way is the leakage-free construction). Batch form = one user-keyed
    // cumulative window; the streaming twin (Streams.runningFeatures) is
    // a transformWithState processor maintaining (n, cents) per user.
    // Determinism: the cumulative sum accumulates DECIMAL (value has 2
    // decimals — exact), cast to double per row.
    "q53_running_features" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("user_event_n", count(lit(1)).over(w))
        .withColumn("user_value_cum",
          sum(col("value").cast(DecimalType(28, 6))).over(w).cast(DoubleType))
        .select(col("user_id"), col("event_id"),
          col("user_event_n"), col("user_value_cum"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // Linear-regression aggregate family (covariance, OLS slope/intercept,
    // R²): one-pass mergeable moment aggregates — the distributed-friendly
    // form (each is a ratio of co-moments that partial-aggregates map-side;
    // no per-group buffering, unlike exact percentiles). Round-6/2 makes the
    // cross-engine double comparison exact (NOTES "stats rounded" rule);
    // large-magnitude outputs (covariances, intercept) round at 2 where the
    // absolute double disagreement budget is still ~1e-7.
    "q54_regression" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          round(covar_samp(col("l_extendedprice"), col("l_quantity")), 2).as("cov_s"),
          round(covar_pop(col("l_extendedprice"), col("l_quantity")), 2).as("cov_p"),
          round(regr_slope(col("l_extendedprice"), col("l_quantity")), 6).as("slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 2).as("intercept"),
          round(regr_r2(col("l_extendedprice"), col("l_quantity")), 6).as("r2"),
          regr_count(col("l_extendedprice"), col("l_quantity")).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    // Mode (most frequent value) per group with a DETERMINISTIC tie-break:
    // built-in `mode()` leaves ties unspecified on both engines, so the
    // hash-exact form is count + rank with an explicit (count desc, value
    // asc) order. Scale shape: two-phase hash agg on (user, type) — a few
    // distinct types per user, so the ranking window's per-group state is
    // bounded by type cardinality, not event count.
    "q55_mode" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("n").desc, col("event_type"))
      Tables.events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("user_id"), col("event_type").as("mode_type"), col("n"))
        .orderBy(col("user_id"))
    }),

    // Order statistics over a sliding window: per-user rolling median of
    // the last 7 values (lower median — integer index into the sorted
    // frame, so the only doubles are passthrough values, no interpolation
    // arithmetic to diverge cross-engine). Scale shape: one user-keyed
    // window pass; per-row state is the 7-row frame, O(frame) not O(rows).
    "q57_rolling_median" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-6, Window.currentRow)
      Tables.events(s, d)
        .withColumn("frame", array_sort(collect_list(col("value")).over(w)))
        .select(col("user_id"), col("event_id"),
          element_at(col("frame"), ((size(col("frame")) + 1) / 2).cast("int"))
            .as("rolling_median"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // LATERAL correlated subquery with ORDER BY … LIMIT — per-nation top-2
    // customers by balance. Exercises Catalyst's lateral-join decorrelation
    // (DecorrelateInnerQuery rewrites the per-row LIMIT into a ranked
    // window under the hood), the remaining subquery shape the surface
    // didn't cover. Scale shape: decorrelation turns N per-row probes into
    // ONE partitioned rank — no driver loop, no nested execution; balances
    // pass through unchanged (no float arithmetic to diverge).
    "q56_lateral_topn" -> ((s, d) => {
      Tables.nation(s, d).createOrReplaceTempView("nat_lat")
      Tables.customer(s, d).createOrReplaceTempView("cust_lat")
      s.sql(
        """SELECT n.n_name, t.c_name, t.c_acctbal
           FROM nat_lat n,
           LATERAL (SELECT c_name, c_acctbal FROM cust_lat c
                    WHERE c.c_nationkey = n.n_nationkey
                    ORDER BY c_acctbal DESC, c_name LIMIT 2) t
           ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""")
    }),

    // Time-weighted average per user — each event's value holds until the
    // user's next event, so the mean weights by HOLDING TIME, not event
    // count (the metric/finance semantics a plain AVG silently gets
    // wrong). Determinism: value has 2 decimals → ×100 is an exact
    // integer; weights are whole microseconds; the whole integral is
    // INTEGER arithmetic with one final division (round 6) — no float
    // summation anywhere. Scale shape: one user-keyed window (lead) + one
    // user-keyed agg sharing the partitioning.
    "q60_time_weighted" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("dt_us",
          unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts")))
        .filter(col("dt_us").isNotNull) // last segment is open-ended
        .withColumn("cents", round(col("value") * 100).cast("long"))
        .groupBy(col("user_id"))
        .agg(
          round(sum(col("cents") * col("dt_us")).cast("double") /
            (sum(col("dt_us")) * 100.0), 6).as("time_weighted_avg"),
          sum(col("dt_us")).as("span_us"),
          count(lit(1)).as("n_segments"))
        .orderBy(col("user_id"))
    }),

    // Exponentially-weighted moving average (α=1/2) over each user's last
    // 8 values — the monitoring smoother. α=1/2 makes every weight an
    // exact binary fraction, so the whole numerator is INTEGER arithmetic
    // (cents × 2^(7−j)) and the only float op is one final division of two
    // exactly-representable doubles — correctly rounded on every engine,
    // no compounding float recursion (the usual EWMA form s=αx+(1−α)s is
    // order-sensitive float feedback, untestable cross-engine). Scale
    // shape: one user-keyed window pass, O(8) state per row.
    "q62_ewma" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val withCents = Tables.events(s, d)
        .withColumn("cents", round(col("value") * 100).cast("long"))
      val terms = (0 to 7).map { j =>
        (if (j == 0) col("cents") else lag(col("cents"), j).over(w),
          lit(1L << (7 - j)))
      }
      val num = terms.map { case (c, wt) => coalesce(c * wt, lit(0L)) }
        .reduce(_ + _)
      val den = terms.map { case (c, wt) => when(c.isNotNull, wt).otherwise(lit(0L)) }
        .reduce(_ + _)
      withCents
        .select(col("user_id"), col("event_id"),
          round(num.cast("double") / (den.cast("double") * 100.0), 6).as("ewma"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // Per-column table profile — the data-quality pass a pipeline runs on
    // every ingested table (null rates, cardinalities, value ranges drive
    // schema checks and drift alerts). One small aggregate per column,
    // unioned: each branch's parquet scan reads ONLY its column (columnar
    // pruning), so the profile costs one narrow pass per column and the
    // branches run concurrently — at 100 TB this is the shape that lets
    // uninteresting columns be skipped entirely. min/max render through
    // type-pinned casts (DECIMAL(28,6) for doubles, DATE for timestamps)
    // so the string forms are cross-engine-exact.
    "q63_table_profile" -> ((s, d) => {
      val o = Tables.orders(s, d)
      def prof(name: String, render: Column => Column): DataFrame =
        o.agg(
            count(col(name)).as("n_nonnull"),
            sum(when(col(name).isNull, 1L).otherwise(0L)).as("n_null"),
            countDistinct(col(name)).as("n_distinct"),
            render(min(col(name))).as("min_s"),
            render(max(col(name))).as("max_s"))
          .select(lit(name).as("col_name"), col("n_nonnull"), col("n_null"),
            col("n_distinct"), col("min_s"), col("max_s"))
      val str = (c: Column) => c.cast("string")
      val dec = (c: Column) => c.cast(DecimalType(28, 6)).cast("string")
      val dt = (c: Column) => c.cast(DateType).cast("string")
      Seq(prof("o_orderkey", str), prof("o_custkey", str),
          prof("o_orderstatus", str), prof("o_totalprice", dec),
          prof("o_orderdate", dt), prof("o_orderpriority", str))
        .reduce(_ unionByName _)
        .orderBy(col("col_name"))
    }),

    // Hopping (sliding) event-time window: 10-minute windows every 5
    // minutes — each event lands in exactly two overlapping windows. The
    // batch twin of `window(ts, size, slide)` in Structured Streaming;
    // Spark expands the window set map-side (no row explosion before the
    // hash agg's partial phase). Sums ride DECIMAL(28,6) so overlap
    // windows stay order-independent and cross-engine exact.
    "q64_hopping_window" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
        .select(col("window.start").as("ws"), col("event_type"), col("n"),
          col("total"))
        .orderBy(col("ws"), col("event_type"))
    }),

    // Resample each user's irregular event series onto a regular hourly
    // grid by LINEAR interpolation — the time-series regularization step
    // before windowed feature extraction (gap-fill q44 carries the LAST
    // value; this computes the in-between value). Shape: events and grid
    // points union into ONE user-partitioned stream; two window passes
    // (forward = previous event, backward = next event) find each grid
    // point's bracketing events without any range join or per-point scan.
    // Determinism: cents/µs integers; the interpolation numerator
    // v0·(t1−g) + v1·(g−t0) stays INTEGER, one final double division +
    // round 6 (identical IEEE ops both engines). Grid bounds snap to
    // hour multiples in integer arithmetic (no float ceil). A grid
    // point landing exactly on an event reproduces that event's value.
    "q65_interpolate" -> ((s, d) => {
      val G = 3600000000L // 1 hour in µs
      val ev = Tables.events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("t"),
          round(col("value") * 100).cast("long").as("cents"), col("event_id"))
        .groupBy(col("user_id"), col("t"))
        .agg(min_by(col("cents"), col("event_id")).as("cents"))
      val grid = ev.groupBy(col("user_id"))
        .agg(min(col("t")).as("tmin"), max(col("t")).as("tmax"))
        .select(col("user_id"),
          expr(s"((tmin + ${G - 1}L) div ${G}L) * ${G}L").as("gs"),
          expr(s"(tmax div ${G}L) * ${G}L").as("ge"))
        .filter(col("gs") <= col("ge"))
        .select(col("user_id"), explode(expr(s"sequence(gs, ge, ${G}L)")).as("t"))
      val u = ev.select(col("user_id"), col("t"), lit(0).as("k"), col("cents"))
        .unionByName(grid.select(col("user_id"), col("t"), lit(1).as("k"),
          lit(null).cast("long").as("cents")))
      val wf = Window.partitionBy(col("user_id")).orderBy(col("t"), col("k"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wb = Window.partitionBy(col("user_id")).orderBy(col("t").desc, col("k"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      u.withColumn("t0", last(when(col("k") === 0, col("t")), ignoreNulls = true).over(wf))
        .withColumn("v0", last(when(col("k") === 0, col("cents")), ignoreNulls = true).over(wf))
        .withColumn("t1", last(when(col("k") === 0, col("t")), ignoreNulls = true).over(wb))
        .withColumn("v1", last(when(col("k") === 0, col("cents")), ignoreNulls = true).over(wb))
        .filter(col("k") === 1)
        .withColumn("v_interp", round(
          when(col("t1") === col("t0"), col("v0").cast("double") / 100.0)
            .otherwise(
              (col("v0") * (col("t1") - col("t")) + col("v1") * (col("t") - col("t0")))
                .cast("double") /
                ((col("t1") - col("t0")).cast("double") * 100.0)), 6))
        .select(col("user_id"), timestamp_micros(col("t")).as("ts_grid"),
          col("v_interp"))
        .orderBy(col("user_id"), col("ts_grid"))
    }),

    // CEP sequence-pattern matching (MATCH_RECOGNIZE-lite / Flink-CEP
    // shape): every occurrence of  signup → purchase  with NO intervening
    // error, within 30 minutes — pattern `S N* P` where N excludes
    // 'error', plus a time bound. Differs from the funnel (q47): that
    // reports each user's FIRST stage times; this matches ALL
    // occurrences, with negation, per event.
    //
    // Plan: negation via a cumulative error count + its value AT the last
    // signup (last IGNORE NULLS) — zero difference means no error between
    // anchor and match. Everything is ONE user-keyed sort (all windows
    // share the partitioning, single exchange, plan-asserted); no self
    // joins, no per-pattern explosion — the CEP state machine becomes two
    // window passes. Determinism: pure integer arithmetic (µs timestamps,
    // counts) — no floats anywhere.
    "q66_pattern_match" -> ((s, d) =>
      cepMatchesBatch(Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type")))),

    // Seasonal-baseline anomaly sweep: the top-20 events whose value most
    // deviates from their (event_type, hour-of-day) seasonal mean — the
    // de-seasonalized residual that catches "big for 3am" events a global
    // z-score (q51's per-user profile) washes out. EXACT cross-engine
    // arithmetic: residual ranks on the INTEGER cents·n − sum_cents
    // numerator scaled by one final double division — no accumulated
    // float order anywhere. Scale shape: the baseline is a types×24-row
    // aggregate that BROADCASTS back over the scan; one corpus pass, one
    // tiny agg, a bounded top-20 heap (TakeOrdered).
    "q67_seasonal_anomaly" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("event_type"), hour(col("ts")).as("hr"),
          round(col("value") * 100).cast("long").as("cents"))
      val base = ev.groupBy(col("event_type"), col("hr"))
        .agg(sum(col("cents")).as("sum_cents"), count(lit(1)).as("n"))
      ev.join(broadcast(base), Seq("event_type", "hr"))
        .withColumn("baseline", col("sum_cents").cast("double") /
          (col("n").cast("double") * lit(100.0)))
        .withColumn("residual",
          (col("cents") * col("n") - col("sum_cents")).cast("double") /
            (col("n").cast("double") * lit(100.0)))
        .withColumn("abs_res", abs(col("residual")))
        .orderBy(col("abs_res").desc, col("event_id"))
        .limit(20)
        .select(col("event_id"), col("event_type"), col("hr"),
          round(col("cents").cast("double") / lit(100.0), 2).as("value"),
          round(col("baseline"), 6).as("baseline"),
          round(col("residual"), 6).as("residual"))
    }),

    // Holt-Winters triple exponential smoothing (additive, season m=24)
    // over the hourly event grid — the forecasting family: per event_type
    // the hourly mean series folds through the level/trend/seasonal
    // recursions, emitting one-step-ahead fitted values plus a 24 h
    // forecast horizon. Smoothing constants are DYADIC (α=0.5, β=0.25,
    // γ=0.25 — and their complements), so every literal is exactly
    // representable and the two engines' left-to-right IEEE folds are
    // bit-identical (the q95/kmCurve convention, extended to a stateful
    // recursion: state = level, trend, 24-slot season queue). Seasonality
    // is POSITIONAL over the observed hourly sequence (~94% dense grid
    // here; absent hours contract the sequence identically on both
    // engines — documented, not a fidelity loss the oracle can see).
    // Scale shape: the corpus-sized work is ONE narrow scan + one
    // (type × hour) agg; the per-type series is bounded by the study
    // window (≤720 points), and the fold state is model-sized
    // (l, b, s[24]) — the same domain-bounded-window argument as q95.
    "q99_holt_winters" -> ((s, d) =>
      holtWinters(Tables.events(s, d)
        .select(col("event_type"),
          expr("unix_micros(ts) div 3600000000").as("hr"),
          round(col("value") * 100).cast("long").as("cents")))),

    // Conformal-style forecast bands: the Holt-Winters 24 h horizon wrapped
    // in EMPIRICAL residual quantiles — per type, the one-step-ahead fit
    // residuals' exact p10/p90 order statistics (ceil-rank over the sorted
    // domain-sized residual list — no engine quantile function, whose
    // interpolation rules differ) shift the forecast into a [lo, hi] band.
    // The distribution-free prediction-interval recipe (split-conformal
    // flavor: calibration set = the in-sample one-step residuals). All
    // arithmetic on the rounded q99 outputs → identical doubles on both
    // engines. Scale shape: rides q99's fold; the band join broadcasts a
    // types-sized table.
    "q101_forecast_bands" -> ((s, d) => {
      val hw = queries("q99_holt_winters")(s, d)
      val band = conformalBand(hw)
      hw.filter(col("kind") === "forecast")
        .join(broadcast(band), "event_type")
        .select(col("event_type"), col("t"), col("yhat"),
          round(col("yhat") + col("r_lo"), 6).as("lo"),
          round(col("yhat") + col("r_hi"), 6).as("hi"))
        .orderBy(col("event_type"), col("t"))
    }),

    // Classical seasonal DECOMPOSITION (additive, period 24) — the STL-
    // style diagnostic next to q99's forecaster: trend = the ±12 h
    // window-WEIGHTED mean (Σcents/Σn over the window — exact integer
    // window sums, one double division, so no float-order dependence a
    // sliding-sum would have), detrended = y − trend, and the seasonal
    // index per (type, hour-of-day) folds the t-ordered detrended list
    // (the kmCurve determinism convention). Output: per (type, hod) the
    // seasonal index and its support. Scale shape: one (type × hour)
    // two-phase agg; both windows partition by type over the domain-sized
    // hour grid; the final agg is types×24.
    "q103_seasonal_decompose" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type"),
          expr("unix_micros(ts) div 3600000000").as("hr"),
          round(col("value") * 100).cast("long").as("cents"))
      val h0 = ev.agg(min(col("hr")).as("h0"))
      val hourly = ev.groupBy(col("event_type"), col("hr"))
        .agg(sum(col("cents")).as("sc"), count(lit(1)).as("n"))
        .crossJoin(broadcast(h0))
        .select(col("event_type"), (col("hr") - col("h0")).as("t"),
          col("sc"), col("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("t"))
        .rangeBetween(-12, 12)
      val wAll = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"))
      val dt = hourly
        .withColumn("wsc", sum(col("sc")).over(w))
        .withColumn("wn", sum(col("n")).over(w))
        // interior hours only (full ±12 span inside the observed range);
        // absent hours within the span just drop out of the weighted mean,
        // so the filter holds at any grid density
        .withColumn("tmin", min(col("t")).over(wAll))
        .withColumn("tmax", max(col("t")).over(wAll))
        .filter(col("t") >= col("tmin") + 12 && col("t") <= col("tmax") - 12)
        .select(col("event_type"), col("t"), (col("t") % 24).as("hod"),
          ((col("sc").cast("double") / (col("n").cast("double") * lit(100.0))) -
            (col("wsc").cast("double") / (col("wn").cast("double") * lit(100.0))))
            .as("detr"))
      dt.groupBy(col("event_type"), col("hod"))
        .agg(count(lit(1)).as("n_obs"),
          array_sort(collect_list(struct(col("t"), col("detr")))).as("ds"))
        .select(col("event_type"), col("hod"), col("n_obs"),
          round(expr(
            "aggregate(transform(ds, p -> p.detr), 0.0D, (a, x) -> a + x)") /
            col("n_obs").cast("double"), 6).as("seasonal"))
        .orderBy(col("event_type"), col("hod"))
    }),

    // Forecast BACKTEST: hold out the trailing 24 observed hours, fit
    // Holt-Winters on the prefix, forecast the held-out window, and score
    // per type — band coverage (how many actual hourly means landed inside
    // the conformal [lo, hi]) and MAE. The model-validation loop every
    // production forecaster runs before promoting a model; everything
    // derives from the same bit-exact folds (MAE sums fold t-ordered —
    // the kmCurve determinism convention). Scale shape: two (type × hour)
    // aggs + the q99 fold; evaluation joins are types×24-sized.
    "q102_forecast_backtest" -> ((s, d) => {
      val evAll = Tables.events(s, d)
        .select(col("event_type"),
          expr("unix_micros(ts) div 3600000000").as("hr"),
          round(col("value") * 100).cast("long").as("cents"))
      val cut = evAll.agg((max(col("hr")) - 23).as("hcut"))
      val train = evAll.crossJoin(broadcast(cut))
        .filter(col("hr") < col("hcut"))
        .select(col("event_type"), col("hr"), col("cents"))
      val hw = holtWinters(train)
      val band = conformalBand(hw)
      val fc = hw.filter(col("kind") === "forecast")
        .join(broadcast(band), "event_type")
        .select(col("event_type"), col("t"), col("yhat"),
          (col("yhat") + col("r_lo")).as("lo"),
          (col("yhat") + col("r_hi")).as("hi"))
      val h0 = train.agg(min(col("hr")).as("h0"))
      val actual = evAll.crossJoin(broadcast(cut))
        .filter(col("hr") >= col("hcut"))
        .groupBy(col("event_type"), col("hr"))
        .agg(sum(col("cents")).as("sc"), count(lit(1)).as("n"))
        .crossJoin(broadcast(h0))
        .select(col("event_type"), (col("hr") - col("h0")).as("t"),
          (col("sc").cast("double") /
            (col("n").cast("double") * lit(100.0))).as("y"))
      fc.join(actual, Seq("event_type", "t"))
        .select(col("event_type"), col("t"),
          (col("y") >= col("lo") && col("y") <= col("hi"))
            .cast("long").as("covered"),
          abs(col("y") - col("yhat")).as("ae"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_eval"), sum(col("covered")).as("n_covered"),
          array_sort(collect_list(struct(col("t"), col("ae")))).as("aes"))
        .select(col("event_type"), col("n_eval"), col("n_covered"),
          round(expr(
            "aggregate(transform(aes, p -> p.ae), 0.0D, (a, x) -> a + x)") /
            col("n_eval").cast("double"), 6).as("mae"))
        .orderBy(col("event_type"))
    }),

    // Z-order (Morton) layout key locality census — the gate query for
    // Layout.zorderKey (LayoutSpec separately proves the write-path file
    // pruning on both dimensions): orders interleave (custkey, epoch-day)
    // at 16 bits each, and the 16 leading-bit buckets report their 2-D
    // bounding boxes. Locality is visible as bounded per-bucket spans on
    // BOTH dimensions — the property that keeps file/row-group min-max
    // stats tight under multi-dimensional predicates at 100 TB. Pure
    // integer bit math: the oracle reproduces the interleave exactly.
    // Scale shape: one narrow scan + a 16-group agg; the 1-row day anchor
    // broadcasts.
    "q100_zorder_locality" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_custkey"),
          expr("unix_micros(o_orderdate) div 86400000000").as("day_abs"))
      val d0 = o.agg(min(col("day_abs")).as("d0"))
      val keyed = o.crossJoin(broadcast(d0))
        .select(col("o_custkey"), (col("day_abs") - col("d0")).as("day"))
        .withColumn("zkey", graft.operators.Layout.zorderKey(
          Seq(col("o_custkey"), col("day")), 16))
      val zmax = keyed.agg(max(col("zkey")).as("zmax"))
      keyed.crossJoin(broadcast(zmax))
        // 16 equal z-ranges over the OCCUPIED key space (integer division —
        // exact on both engines; a fixed bit shift would collapse when the
        // dims use fewer than the full 16 bits)
        .withColumn("bucket", expr("(zkey * 16) div (zmax + 1)"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("o_custkey")).as("min_cust"), max(col("o_custkey")).as("max_cust"),
          min(col("day")).as("min_day"), max(col("day")).as("max_day"),
          min(col("zkey")).as("min_z"), max(col("zkey")).as("max_z"))
        .orderBy(col("bucket"))
    }),

    // Market-basket association rules: part pairs co-purchased in the
    // same order, scored by support / confidence / lift — the classic
    // affinity-analysis operator (recommenders, shelf placement). All
    // three scores derive from integer basket counts with ONE double
    // division each (exact-int numerators/denominators < 2^53 → the
    // division is correctly rounded on every engine); ranking is on the
    // raw lift with a (a, b) tiebreak. Scale shape: the pair explosion is
    // bounded by basket size (k parts → k(k−1)/2 pairs per ORDER, never
    // corpus²) and runs basket-locally after the one orderkey shuffle;
    // per-part counts are vocabulary-sized and broadcast; the total is a
    // 1-row broadcast.
    "q68_market_basket" -> ((s, d) => {
      // ONE shuffle of the big table (groupBy orderkey → sorted distinct
      // basket arrays); pairs then explode BASKET-LOCALLY (k(k−1)/2 per
      // order, map-side) instead of the earlier self-join, which shuffled
      // the (o, p) table a second time and joined it against itself —
      // at 100 TB that saves a full-table exchange + sort-merge join.
      // sort_array makes ps ascending, so i<j ⇒ ps[i] < ps[j]: the pair
      // set (and every count) is identical to the a.p < b.p self-join.
      val baskets = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .groupBy(col("o")).agg(sort_array(collect_set(col("p"))).as("ps"))
        .persist() // THREE consumers: order count, part counts, pairs
      val n = baskets.agg(count(lit(1)).as("n_orders"))
      val pc = baskets.select(explode(col("ps")).as("p"))
        .groupBy(col("p")).agg(count(lit(1)).as("c1"))
      val pairs = baskets.select(explode(expr(
          "flatten(transform(ps, (x, i) -> " +
            "transform(slice(ps, i + 2, size(ps)), " +
            "y -> struct(x AS part_a, y AS part_b))))")).as("pr"))
        .select(col("pr.part_a"), col("pr.part_b"))
        .groupBy(col("part_a"), col("part_b")).agg(count(lit(1)).as("c_ab"))
        .filter(col("c_ab") >= 3)
      pairs
        .join(broadcast(pc.select(col("p").as("part_a"), col("c1").as("c_a"))), "part_a")
        .join(broadcast(pc.select(col("p").as("part_b"), col("c1").as("c_b"))), "part_b")
        .crossJoin(broadcast(n))
        .withColumn("support", col("c_ab").cast("double") / col("n_orders").cast("double"))
        .withColumn("confidence", col("c_ab").cast("double") / col("c_a").cast("double"))
        .withColumn("lift", (col("c_ab") * col("n_orders")).cast("double") /
          (col("c_a") * col("c_b")).cast("double"))
        .orderBy(col("lift").desc, col("part_a"), col("part_b"))
        .limit(20)
        .select(col("part_a"), col("part_b"), col("c_ab"), col("c_a"), col("c_b"),
          round(col("support"), 6).as("support"),
          round(col("confidence"), 6).as("confidence"),
          round(col("lift"), 6).as("lift"))
    }),

    // UNIVERSE (join-key-consistent) sampling — the approximate-query
    // trick that makes sampled JOINS work: sample BOTH sides by the same
    // hash of the JOIN KEY (not per-row coin flips), so the join of the
    // samples IS a p=1/16 sample of the join — independent per-side
    // sampling would keep only p² of the pairs and destroy the estimate.
    // The query runs the sampled join, scales by 16, and machine-checks
    // the estimate against the exact value (error-envelope gate, the q26
    // pattern; ~3% expected error at this scale, 15% bound).
    // Determinism: the md5-derived keep set is identical on both engines
    // (the Hash24 twin); sums are DECIMAL-exact before one double cast.
    // Scale: at 100 TB the sampled join reads 1/16 of each side AFTER
    // partition-pruned scans — the keep predicate pushes to both scans —
    // and the technique composes with any downstream agg.
    "q70_universe_sample" -> ((s, d) => {
      val dec = DecimalType(28, 6)
      val o = Tables.orders(s, d)
      val li = Tables.lineitem(s, d)
      val exact = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .agg(sum(col("l_extendedprice").cast(dec)).as("rev_exact_d"))
      val sampled = li.filter(sampleKeep16(col("l_orderkey")))
        .join(o.filter(sampleKeep16(col("o_orderkey"))), col("l_orderkey") === col("o_orderkey"))
        .agg(sum(col("l_extendedprice").cast(dec)).as("rev_s_d"),
          count(lit(1)).as("n_lineitems_sampled"),
          countDistinct(col("o_orderkey")).as("n_orders_sampled"))
      sampled.crossJoin(broadcast(exact))
        .select(
          col("n_orders_sampled"), col("n_lineitems_sampled"),
          round(col("rev_s_d").cast("double"), 2).as("rev_sample"),
          round((col("rev_s_d") * 16).cast("double"), 2).as("rev_scaled"),
          round(col("rev_exact_d").cast("double"), 2).as("rev_exact"),
          (abs((col("rev_s_d") * 16).cast("double") - col("rev_exact_d").cast("double")) <=
            col("rev_exact_d").cast("double") * 0.15).as("within_15pct"))
    }),

    // Marketing attribution (last-touch): each purchase credits the most
    // recent PRECEDING non-purchase touch of the same user (click / view /
    // signup; 'direct' when nothing precedes) — the revenue-accounting
    // query every event warehouse runs after the funnel. Scale shape: ONE
    // user-keyed window pass (the same partitioning the funnel/retention
    // family reuses) — no purchase×touch self-join; the IGNORE-NULLS
    // last() over a preceding-rows frame carries the latest touch forward
    // in-partition, and the final agg is channel-sized. Revenue sums as
    // per-row DECIMAL(18,6) so the total is exact and order-independent
    // on both engines; (ts, event_id) ordering pins same-instant ties.
    "q71_attribution" -> ((s, d) => {
      val dec = DecimalType(18, 6)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, d)
        .filter(col("event_type").isin("click", "view", "signup", "purchase"))
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"), col("value"))
        .withColumn("touch",
          last(when(col("event_type") =!= "purchase", col("event_type")),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .groupBy(coalesce(col("touch"), lit("direct")).as("channel"))
        .agg(count(lit(1)).as("n_purchases"),
          round(sum(col("value").cast(dec)).cast("double"), 6).as("revenue"))
        .orderBy(col("channel"))
    }),

    // Deequ-style data-quality expectation suite: the declarative audit a
    // pipeline runs before trusting an ingest — completeness, pk
    // uniqueness, value ranges, domain membership and referential
    // integrity, emitted as one (check, violations, pass) report table.
    // Scale shape: every scalar constraint FUSES into a single aggregate
    // pass over the fact table (adding checks adds expressions, never
    // scans); pk uniqueness rides the same pass as a distinct count on the
    // key struct; the FK check is the only join — a left-anti on the
    // orders key that AQE broadcasts when the dim side is small. The
    // report itself is constraint-sized.
    "q72_expectations" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val m = li.agg(
        count(lit(1)).as("n"),
        sum(when(col("l_shipdate").isNull, 1L).otherwise(0L)).as("v_null_ship"),
        countDistinct(struct(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"))).as("n_pk"),
        sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L)
          .otherwise(0L)).as("v_qty"),
        sum(when(!col("l_returnflag").isin("A", "N", "R"), 1L)
          .otherwise(0L)).as("v_flag"),
        sum(when(col("l_extendedprice") < 0, 1L).otherwise(0L)).as("v_price"))
      val fk = li.join(Tables.orders(s, d).select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("v_fk"))
      m.crossJoin(broadcast(fk))
        .select(expr(
          """stack(6,
               'pk_unique', n - n_pk,
               'complete_shipdate', v_null_ship,
               'range_quantity', v_qty,
               'set_returnflag', v_flag,
               'nonneg_extendedprice', v_price,
               'fk_orders', v_fk) AS (check_name, n_violations)"""))
        .withColumn("pass", col("n_violations") === 0)
        .orderBy(col("check_name"))
    }),

    // pg_trgm-style fuzzy SELF-JOIN (record linkage): all pairs of distinct
    // part names with character-trigram Jaccard ≥ 0.4, found by AllPairs/
    // PPJoin PREFIX FILTERING — the exactness-preserving sub-quadratic
    // set-similarity join. Each name keeps only its (sz − ⌈τ·sz⌉ + 1)
    // globally-RAREST trigrams (rarest-first order by df, the classic
    // prefix heuristic); any pair with Jaccard ≥ τ provably shares a
    // prefix trigram, so the candidate join touches prefix posting lists
    // only — stop-trigrams ("the"-grade df) fall out of every prefix and
    // their df² term vanishes, which is what makes this survive where the
    // naive shared-trigram join melts at scale. Verification is exact:
    // sorted trigram arrays ride to the candidate pairs, one
    // array_intersect per pair, one integer-ratio division (correctly
    // rounded identically on both engines). Prefix length uses INTEGER
    // arithmetic (τ = 2/5 ⇒ ⌈2·sz/5⌉ = (2·sz+4) DIV 5) — no float ceil.
    "q73_fuzzy_join" -> ((s, d) => {
      val names = Tables.part(s, d).select(col("p_name").as("nm")).distinct()
      val tg = names.select(col("nm").as("k"),
        explode(array_distinct(expr(
          "transform(sequence(1, length(nm) - 2), i -> substring(lower(nm), i, 3))"))).as("t"))
      val dfT = tg.groupBy(col("t")).agg(count(lit(1)).as("df"))
      val arr = tg.groupBy(col("k"))
        .agg(sort_array(collect_set(col("t"))).as("ts"))
      val w = Window.partitionBy(col("k")).orderBy(col("df"), col("t"))
      val pfx = tg.join(broadcast(dfT), "t")
        .withColumn("sz", count(lit(1)).over(Window.partitionBy(col("k"))))
        .withColumn("r", row_number().over(w))
        .filter(col("r") <= col("sz") - expr("(sz * 2 + 4) DIV 5") + 1)
        .select(col("k"), col("t"))
      val cand = pfx.as("a").join(pfx.as("b"),
          col("a.t") === col("b.t") && col("a.k") < col("b.k"))
        .select(col("a.k").as("ka"), col("b.k").as("kb")).distinct()
      cand
        .join(arr.select(col("k").as("ka"), col("ts").as("ta")), "ka")
        .join(arr.select(col("k").as("kb"), col("ts").as("tb")), "kb")
        .withColumn("inter", size(array_intersect(col("ta"), col("tb"))).cast("long"))
        .withColumn("sim",
          col("inter") / (size(col("ta")) + size(col("tb")) - col("inter")))
        .filter(col("sim") >= 0.4)
        .select(col("ka").as("name_a"), col("kb").as("name_b"),
          col("inter").as("n_shared"), round(col("sim"), 6).as("trgm_sim"))
        .orderBy(col("name_a"), col("name_b"))
    }),

    // Join-key SKEW PROFILE: the diagnosis a 100 TB operator runs BEFORE
    // picking a join strategy (salt? broadcast? AQE skew split?) — per-key
    // multiplicity distribution of lineitem's join key as one report row:
    // key/row counts, max and exact p50/p99 multiplicity, the heaviest key,
    // and the max/mean skew ratio. Scale shape: one key-keyed agg (the same
    // shuffle the join itself would pay), then the multiplicity HISTOGRAM
    // (m, n_keys) — a domain-sized frame (max rows per key, ~7 here) — so
    // the unpartitioned quantile window runs over a handful of rows, never
    // the corpus; the heavy key is a bounded TakeOrdered. All counts are
    // exact integers; the one division is correctly rounded identically on
    // both engines.
    "q74_skew_profile" -> ((s, d) => {
      val keyCounts = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("m"))
      val dist = keyCounts.groupBy(col("m")).agg(count(lit(1)).as("nk"))
      val cumW = Window.orderBy(col("m"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val totW = Window.partitionBy()
      val cuts = dist
        .withColumn("cum", sum(col("nk")).over(cumW))
        .withColumn("n", sum(col("nk")).over(totW))
        .agg(
          min(when(col("cum") * 2 >= col("n"), col("m"))).as("p50_mult"),
          min(when(col("cum") * 100 >= col("n") * 99, col("m"))).as("p99_mult"),
          max(col("m")).as("max_mult"),
          sum(col("nk")).as("n_keys"),
          sum(col("m") * col("nk")).as("n_rows"))
      val top = keyCounts.orderBy(col("m").desc, col("l_orderkey")).limit(1)
        .select(col("l_orderkey").as("top_key"), col("m").as("top_key_rows"))
      cuts.crossJoin(broadcast(top))
        .select(col("n_keys"), col("n_rows"), col("max_mult"),
          col("p50_mult"), col("p99_mult"), col("top_key"), col("top_key_rows"),
          round(col("max_mult") * col("n_keys") / col("n_rows"), 6).as("skew_ratio"))
    }),

    // MERGEABLE distinct counting (datasketches HLL): per-(type, week)
    // user sketches built in one pass (hll_sketch_agg), then the per-type
    // total distinct answered by MERGING the weekly sketches
    // (hll_union_agg) — the OLAP-cube pattern approx_count_distinct cannot
    // express: precompute fine-grained sketch STATE once, answer any
    // coarser rollup by union without touching raw data again (at 100 TB:
    // daily sketches persist as bytes columns; month/quarter queries merge
    // kilobytes). Verification: exact distincts are hash-pinned; the
    // merged estimate must land within 5% (3× the lgK=12 sketch's 99%
    // envelope; DataSketches HLL is hash-deterministic — no RNG).
    "q77_hll_mergeable" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_type"), col("ts"), col("user_id"))
      val weekly = ev
        .groupBy(col("event_type"), date_trunc("week", col("ts")).as("wk"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      val merged = weekly.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_weeks"),
          hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      val exact = ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_distinct"))
      merged.join(exact, "event_type")
        .select(col("event_type"), col("n_weeks"), col("exact_distinct"),
          (abs(col("est").cast("double") - col("exact_distinct")) <=
            col("exact_distinct") * 0.05).as("est_within_5pct"))
        .orderBy(col("event_type"))
    }),

    // Large×large interval OVERLAP join via BINNING — the scale path for
    // range/interval joins where NEITHER side fits a broadcast (q29's
    // broadcast form stops at fact-sized interval tables). An overlap
    // predicate has no equi-key, so the naive plan is a nested-loop /
    // cartesian — O(n²) and a non-starter at 100 TB. Instead every
    // session interval emits the 1-hour grid cells it covers and the join
    // becomes an EQUI-join on the cell id: a plain shuffled hash join
    // whose cost is Σ cells + Σ per-cell pairs (bounded by instantaneous
    // concurrency, not corpus size). The classic duplicate problem (a
    // pair of long intervals shares many cells) is solved WITHOUT a
    // distinct: a pair is kept only in the single cell containing the
    // overlap's start (greatest(starts) div cell) — exactly one cell
    // qualifies, so no dedup shuffle exists in the plan. Intervals =
    // per-user 30-min-gap sessions [first event, last event]; result =
    // the user co-presence matrix (who is online with whom, how long).
    // Determinism: all interval math in integer µs; the DuckDB oracle
    // runs the NAIVE overlap self-join over the same gaps-and-islands
    // sessions, so the hash match proves the binned plan lossless (no
    // pair dropped, none double-counted).
    "q78_interval_bin_join" -> ((s, d) => {
      val sess = Tables.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(min(unix_micros(col("ts"))).as("s_us"),
          max(unix_micros(col("ts"))).as("e_us"))
        .select(col("user_id"), col("s_us"), col("e_us"))
      // 1-hour cells; sessions are minutes-scale
      binnedOverlapPairs(sess, 3600000000L)
        .groupBy(col("user_a"), col("user_b"))
        .agg(count(lit(1)).as("n_overlaps"),
          sum(least(col("ea"), col("eb")) - greatest(col("sa"), col("sb")))
            .as("ov_us"))
        .select(col("user_a"), col("user_b"), col("n_overlaps"),
          expr("ov_us div 1000000L").as("overlap_s"))
        .orderBy(col("user_a"), col("user_b"))
    }),

    // Sample autocorrelation function of the hourly event-count series at
    // lags {1,2,3,6,12,24} — the time-series diagnostic behind
    // seasonality detection (a 24h peak ⇒ daily cycle) and forecasting
    // model selection. The series itself is DOMAIN-sized (one row per
    // observed hour — ~720 at any sf, since more data means denser hours,
    // not more of them), so the global-ordered window is cheap by
    // construction; the only corpus-sized work is the one hourly
    // count agg. Cross-engine exactness: with S = Σx and n = series
    // length, r_k = Σ(n·x_t−S)(n·x_{t+k}−S) / Σ(n·x_t−S)² — numerator
    // and denominator are EXACT integer sums (DECIMAL(38,0) here,
    // HUGEINT in DuckDB), cast to double (correctly rounded on both
    // engines) for one final division. Lag pairs are row-lags over the
    // observed-hour sequence (missing hours drop pairs on both engines
    // identically).
    "q79_acf" -> ((s, d) => {
      val dec = DecimalType(38, 0)
      val lags = Seq(1, 2, 3, 6, 12, 24)
      val hourly = Tables.events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("x"))
      val w = Window.orderBy(col("h"))
      val tot = hourly.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
      val centered = lags.foldLeft(hourly)((df, k) =>
          df.withColumn(s"x$k", lead(col("x"), k).over(w)))
        .crossJoin(broadcast(tot))
        .withColumn("cx", (col("n") * col("x") - col("sx")).cast(dec))
      val byLag = lags.map { k =>
        centered
          .withColumn("ck", (col("n") * col(s"x$k") - col("sx")).cast(dec))
          .agg(count(col("ck")).as("n_pairs"),
            sum(col("cx") * col("ck")).as("num"),
            sum(col("cx") * col("cx")).as("den"))
          .select(lit(k).as("lag"), col("n_pairs"),
            round(col("num").cast(DoubleType) / col("den").cast(DoubleType), 6)
              .as("acf"))
      }
      byLag.reduce(_.union(_)).orderBy(col("lag"))
    }),

    // Difference-in-differences — the causal-inference estimator layered
    // on q82's experimentation machinery: did = (Ā_post − Ā_pre) −
    // (B̄_post − B̄_pre) cancels both the arms' baseline difference and
    // the common time trend, which a naive post-only comparison cannot.
    // Observations are per-(user, period) spend totals; the four cells'
    // moments are exact int64/DECIMAL(38,0) sums, each mean/variance one
    // correctly-rounded division, SE = √(Σ var_c/n_c) in a fixed
    // left-assoc order — token-identical chains on both engines. Scale
    // shape: one corpus shuffle to (user, arm, period), then everything
    // derives from 12 numbers.
    "q86_diff_in_diff" -> ((s, d) => {
      val dec = DecimalType(38, 0)
      val cut = lit("2024-01-16").cast(TimestampType)
      val obs = Tables.events(s, d)
        .withColumn("cents", round(col("value") * 100).cast("long"))
        .withColumn("period", when(col("ts") < cut, "pre").otherwise("post"))
        .withColumn("arm", armOf(col("user_id")))
        .groupBy(col("user_id"), col("arm"), col("period"))
        .agg(sum(col("cents")).as("m"))
      val cells = obs.groupBy(col("arm"), col("period"))
        .agg(count(lit(1)).as("n"), sum(col("m")).as("sx"),
          sum(col("m").cast(dec) * col("m").cast(dec)).as("sxx"))
      def cell(a: String, p: String, c: String) =
        max(when(col("arm") === a && col("period") === p, col(c)))
      def mean(sx: String, n: String) = col(sx).cast(DoubleType) / col(n)
      def vr(n: String, sx: String, sxx: String) =
        exactCoMoment(col(n), col(sxx), col(sx), col(sx))
      cells.agg(
          cell("A", "pre", "n").as("n_ap"), cell("A", "pre", "sx").as("sx_ap"),
          cell("A", "pre", "sxx").as("sxx_ap"),
          cell("A", "post", "n").as("n_aq"), cell("A", "post", "sx").as("sx_aq"),
          cell("A", "post", "sxx").as("sxx_aq"),
          cell("B", "pre", "n").as("n_bp"), cell("B", "pre", "sx").as("sx_bp"),
          cell("B", "pre", "sxx").as("sxx_bp"),
          cell("B", "post", "n").as("n_bq"), cell("B", "post", "sx").as("sx_bq"),
          cell("B", "post", "sxx").as("sxx_bq"))
        .withColumn("m_ap", mean("sx_ap", "n_ap"))
        .withColumn("m_aq", mean("sx_aq", "n_aq"))
        .withColumn("m_bp", mean("sx_bp", "n_bp"))
        .withColumn("m_bq", mean("sx_bq", "n_bq"))
        .withColumn("v_ap", vr("n_ap", "sx_ap", "sxx_ap"))
        .withColumn("v_aq", vr("n_aq", "sx_aq", "sxx_aq"))
        .withColumn("v_bp", vr("n_bp", "sx_bp", "sxx_bp"))
        .withColumn("v_bq", vr("n_bq", "sx_bq", "sxx_bq"))
        .withColumn("did", (col("m_aq") - col("m_ap")) - (col("m_bq") - col("m_bp")))
        .withColumn("se", sqrt(
          col("v_ap") / col("n_ap") + col("v_aq") / col("n_aq") +
            col("v_bp") / col("n_bp") + col("v_bq") / col("n_bq")))
        .select(col("n_ap"), col("n_aq"), col("n_bp"), col("n_bq"),
          round(col("m_ap"), 6).as("mean_a_pre"),
          round(col("m_aq"), 6).as("mean_a_post"),
          round(col("m_bp"), 6).as("mean_b_pre"),
          round(col("m_bq"), 6).as("mean_b_post"),
          round(col("did"), 6).as("did"), round(col("se"), 6).as("se"),
          (abs(col("did")) > col("se") * 1.96).as("significant"))
    }),

    // Revenue-concentration report — the two standard inequality
    // metrics side by side: the Gini coefficient of per-customer revenue
    // (G = (2·Σi·x₍ᵢ₎ − (n+1)·Σx)/(n·Σx) over rank-ordered totals) and
    // the Herfindahl–Hirschman index of supplier market share
    // (HHI = Σshare²·10000 = Σc²/(Σc)²·10000). Whale-dependence and
    // supply-concentration risk are the first questions any revenue
    // warehouse gets asked. Exactness: both numerators are pure
    // DECIMAL(38,0)/HUGEINT integer sums over integer cents (the rank
    // weight rides the sum, Σc² likewise), one division each. Scale
    // shape: one corpus agg per side to entity-sized tables; the Gini
    // rank is the DISTRIBUTED two-level bucketed prefix sum
    // (operators.DistributedRank — the q58 machinery), so even a
    // 100×-grown customer table never funnels through one partition;
    // ranks are a pure function of the (cents, custkey) total order, so
    // the output is bit-identical to the single-window form.
    "q90_concentration" -> ((s, d) => {
      val dec = DecimalType(38, 0)
      val cr = Tables.orders(s, d)
        .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
        .groupBy(col("o_custkey")).agg(sum(col("cents")).as("cents"))
      val r = graft.operators.DistributedRank.withGlobalRank(
        cr, col("cents"), Seq(col("o_custkey")), 256, "i")
      val g = r.agg(count(lit(1)).as("n_customers"), sum(col("cents")).as("s"),
          sum(col("i").cast(dec) * col("cents").cast(dec)).as("ws"))
        .select(col("n_customers"),
          round((col("ws") * 2 - (col("n_customers") + 1).cast(dec) * col("s").cast(dec))
            .cast(DoubleType) /
            (col("n_customers").cast(DoubleType) * col("s")), 6).as("gini"))
      val sr = Tables.lineitem(s, d)
        .withColumn("c", round(col("l_extendedprice") * 100).cast("long"))
        .groupBy(col("l_suppkey")).agg(sum(col("c")).as("c"))
      val h = sr.agg(count(lit(1)).as("n_suppliers"), sum(col("c")).as("s2"),
          sum(col("c").cast(dec) * col("c").cast(dec)).as("ss"))
        .select(col("n_suppliers"),
          round(col("ss").cast(DoubleType) /
            (col("s2").cast(DoubleType) * col("s2")) * 10000, 6).as("hhi"))
      g.crossJoin(broadcast(h))
    }),

    // Lorenz operating point — q90's Gini gives the inequality INTEGRAL;
    // this gives the curve's actionable points: the smallest customer
    // count carrying 80% of revenue (the "80/20" k) and the revenue
    // share of the top decile. All threshold tests are integer
    // cross-multiplications (cum·5 ≥ total·4, i·10 ≤ n) so the selected
    // ranks are bit-determined; the two output shares are one division
    // each. Rank + running revenue both come from the distributed
    // bucketed prefix sum (operators.DistributedRank, q90's machinery)
    // over the (cents DESC, custkey) order — DESC is the negated key —
    // so no customer-sized single partition exists.
    "q91_pareto_revenue" -> ((s, d) => {
      val cr = Tables.orders(s, d)
        .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
        .groupBy(col("o_custkey")).agg(sum(col("cents")).as("cents"))
      val r = graft.operators.DistributedRank.withGlobalRank(
        cr, -col("cents"), Seq(col("o_custkey")), 256, "i",
        Seq((col("cents"), "cum")))
      val tot = cr.agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
      val j = r.crossJoin(broadcast(tot))
      // cum and s are total-revenue-sized (~3e18 cents at the design
      // point): cum*5 / s*4 overflow int64, and non-ANSI Spark would wrap
      // silently — cross-multiply in DECIMAL(38,0) (HUGEINT in the
      // oracle), the q88 convention
      val d38 = DecimalType(38, 0)
      val k80 = j.filter(col("cum").cast(d38) * 5 >= col("s").cast(d38) * 4)
        .agg(min(col("i")).as("k80"))
      val c10 = j.filter(col("i") * 10 <= col("n"))
        .agg(max(col("cum")).as("c10"))
      k80.crossJoin(c10).crossJoin(broadcast(tot))
        .select(col("n").as("n_customers"), col("k80"),
          round(col("k80").cast(DoubleType) / col("n"), 6).as("k80_share"),
          round(col("c10").cast(DoubleType) / col("s"), 6)
            .as("top10pct_revenue_share"))
    }),

    // Multi-touch ATTRIBUTION with a bounded lookback — q71 answers the
    // single-model form (last preceding touch, unbounded, one window
    // carry-forward); this is the model-comparison report marketers
    // actually reconcile: the SAME 24h-lookback touch set credited under
    // three models at once — first-touch (earliest), last-touch (latest),
    // and LINEAR (fractional credit split evenly across the window's
    // touches — inexpressible as a carry-forward window, hence the
    // touch-join shape); touchless purchases report under 'none'. Scale shape: ONE user-keyed
    // equi-join with the window as a residual predicate (touches per user
    // window are bounded — never a time-range cross join), then
    // conversion-keyed aggregates; first/last are min/max over a
    // (ts, event_id) struct — no per-model rescan. Determinism: every
    // credit is an exact INTEGER in micro-cents — linear shares use
    // floor(cents·k·10⁶ / n) (identical integer floor-division on both
    // engines; per-row double rounding would expose engine rounding-mode
    // differences) — summed as DECIMAL(38,0) with ONE final division.
    "q92_multitouch_attribution" -> ((s, d) => {
      val dec = DecimalType(28, 6)
      val ev = Tables.events(s, d)
      val touches = ev.filter(col("event_type").isin("view", "click"))
        .select(col("user_id"), col("ts").as("t_ts"),
          col("event_id").as("t_id"), col("event_type").as("t_type"))
      val convs = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("c_ts"), col("event_id").as("c_id"),
          round(col("value") * 100).cast("long").as("cents"))
      val paired = convs.join(touches, Seq("user_id"), "left")
        .withColumn("inwin", col("t_ts").isNotNull &&
          col("t_ts") < col("c_ts") &&
          col("t_ts") >= col("c_ts") - expr("INTERVAL 24 HOURS"))
      val perConv = paired.groupBy(col("c_id"), col("cents"))
        .agg(
          sum(when(col("inwin"), 1L).otherwise(0L)).as("n"),
          min(when(col("inwin"),
            struct(col("t_ts"), col("t_id"), col("t_type")))).as("f"),
          max(when(col("inwin"),
            struct(col("t_ts"), col("t_id"), col("t_type")))).as("l"))
      val perConvType = paired.filter(col("inwin"))
        .groupBy(col("c_id"), col("t_type")).agg(count(lit(1)).as("k"))
      // all credits in MICRO-CENTS (×10⁶): exact int64, max ~1e13 per row
      val ft = perConv.select(lit("first_touch").as("model"),
        coalesce(col("f.t_type"), lit("none")).as("touch_type"),
        (col("cents") * 1000000L).as("rev"))
      val lt = perConv.select(lit("last_touch").as("model"),
        coalesce(col("l.t_type"), lit("none")).as("touch_type"),
        (col("cents") * 1000000L).as("rev"))
      val lin = perConvType
        .join(perConv.select(col("c_id"), col("cents"), col("n")), "c_id")
        .select(lit("linear").as("model"), col("t_type").as("touch_type"),
          expr("(cents * k * 1000000L) div n").as("rev"))
      val linNone = perConv.filter(col("n") === 0)
        .select(lit("linear").as("model"), lit("none").as("touch_type"),
          (col("cents") * 1000000L).as("rev"))
      ft.unionByName(lt).unionByName(lin).unionByName(linNone)
        .groupBy(col("model"), col("touch_type"))
        .agg(count(lit(1)).as("n_rows"),
          round(sum(col("rev").cast(DecimalType(38, 0))).cast(DoubleType)
            / 100000000L, 6).as("revenue"))
        .orderBy(col("model"), col("touch_type"))
    }),

    // TIME-TO-CONVERT distribution — the latency companion to q47's
    // funnel counts and q92's credit assignment: per user, the µs gap
    // between the FIRST view and the first purchase after it, reported as
    // exact mean / median / p90 in seconds. Scale shape: two user-keyed
    // aggs + one user equi-join; the order statistics use the suite's
    // exact integer cut (2·cum ≥ n / 10·cum ≥ 9n) over per-value counts,
    // whose cumulative count comes from the distributed bucketed prefix
    // sum (operators.DistributedRank) — no converter-sized single
    // partition; at warehouse scale the deltas would additionally
    // pre-bucket into a histogram before the cut (q42's machinery), and
    // q94 carries the mergeable KLL sketch twin of the same cut. The sum
    // accumulates DECIMAL(38,0) (Σ user-latencies overflows int64 at the
    // design point); mean is exact-int → double, one division chain.
    "q93_time_to_convert" -> ((s, d) => {
      val dec = DecimalType(38, 0)
      val ev = Tables.events(s, d)
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
      val pch = ev.filter(col("event_type") === "purchase")
        .join(v, "user_id").filter(col("ts") > col("t_view"))
        .groupBy(col("user_id"))
        .agg(min(col("ts")).as("t_p"), max(col("t_view")).as("t_view"))
      val deltas = pch.select(
        (unix_micros(col("t_p")) - unix_micros(col("t_view"))).as("d_us"))
      val agg = deltas.agg(count(lit(1)).as("n"),
        sum(col("d_us").cast(dec)).as("ssum"))
      val cum = graft.operators.DistributedRank.withGlobalRank(
          deltas.groupBy(col("d_us")).agg(count(lit(1)).as("c")),
          col("d_us"), Nil, 256, "__i", Seq((col("c"), "cum")))
        .drop("__i")
        .crossJoin(broadcast(agg))
      val med = cum.filter(col("cum") * 2 >= col("n"))
        .agg(min(col("d_us")).as("med_us"))
      val p90 = cum.filter(col("cum") * 10 >= col("n") * 9)
        .agg(min(col("d_us")).as("p90_us"))
      agg.crossJoin(broadcast(med)).crossJoin(broadcast(p90))
        .select(col("n").as("n_converters"),
          round(col("ssum").cast(DoubleType) / col("n") / 1000000.0, 6).as("mean_s"),
          round(col("med_us").cast(DoubleType) / 1000000.0, 6).as("median_s"),
          round(col("p90_us").cast(DoubleType) / 1000000.0, 6).as("p90_s"))
    }),

    // q93's MERGEABLE-sketch scale twin (the q49/q50 exact/approx pairing
    // applied to order statistics): the same converter-latency deltas
    // summarized by ONE KLL pass — the sketch builds with map-side partial
    // merges, holds O(k log n) values per task regardless of converter
    // count, and would merge across day/shard partials at 100 TB where even
    // the bucketed exact cut's per-value count table grows with distinct
    // latencies. The sketch is RANDOMIZED, so its p50/p90 never enter the
    // hash; the q76 envelope gate re-ranks them against the delta table
    // (one broadcast join of a 1-row sketch summary back over the
    // converter-sized deltas) and asserts normalized-rank error ≤ 0.05.
    // Hash-carried: exact converter count and exact mean (DECIMAL(38,0)
    // sum, one division chain — q93's convention).
    "q94_time_to_convert_kll" -> ((s, d) => {
      val dec = DecimalType(38, 0)
      val ev = Tables.events(s, d)
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
      val pch = ev.filter(col("event_type") === "purchase")
        .join(v, "user_id").filter(col("ts") > col("t_view"))
        .groupBy(col("user_id"))
        .agg(min(col("ts")).as("t_p"), max(col("t_view")).as("t_view"))
      val deltas = pch.select(
        (unix_micros(col("t_p")) - unix_micros(col("t_view"))).as("d_us"))
      val sk = deltas.agg(
        kll_sketch_agg_double(col("d_us").cast(DoubleType), lit(400)).as("sk"),
        count(lit(1)).as("n"), sum(col("d_us").cast(dec)).as("ssum"))
        .select(col("n"), col("ssum"),
          kll_sketch_get_quantile_double(col("sk"), lit(0.5)).as("q50"),
          kll_sketch_get_quantile_double(col("sk"), lit(0.9)).as("q90"))
      deltas.crossJoin(broadcast(sk))
        .groupBy(col("n"), col("ssum"), col("q50"), col("q90"))
        .agg(
          (abs(sum(when(col("d_us") <= col("q50"), 1L).otherwise(0L))
            .cast("double") / col("n") - 0.5) <= 0.05).as("p50_rank_ok"),
          (abs(sum(when(col("d_us") <= col("q90"), 1L).otherwise(0L))
            .cast("double") / col("n") - 0.9) <= 0.05).as("p90_rank_ok"))
        .select(col("n").as("n_converters"),
          round(col("ssum").cast(DoubleType) / col("n") / 1000000.0, 6).as("mean_s"),
          col("p50_rank_ok"), col("p90_rank_ok"))
    }),

    // KAPLAN-MEIER survival curve for view→purchase conversion — the
    // censoring-aware companion to q93/q94's converter-only latency
    // distribution: a 7-day administrative study window (cut = min ts +
    // 7 d) right-censors users whose conversion falls outside it, and the
    // product-limit estimator S(t) = Π_{s≤t} (1 − d_s/n_s) reports the
    // honest conversion curve (q93's mean over converters only is biased
    // when the un-converted are dropped). Scale shape: one corpus scan →
    // per-user (t, status) rows (two user-keyed aggs + one left join),
    // then ALL survival arithmetic runs on the hour-bucketed life table,
    // whose row count is bounded by the STUDY WINDOW (≤ 169 hour rows
    // here) — not by users — so the unpartitioned windows over it are
    // domain-sized by construction, the same convention as q88's day
    // series. Determinism: d_s/n_s divisions and the 1−x subtractions
    // are single correctly-rounded IEEE ops, and the running product
    // folds left-to-right over the frame-ordered factor list on both
    // engines (Spark aggregate(collect_list over running frame) ≡ DuckDB
    // list_reduce(list() over running frame)) — identical FP chains, so
    // the rounded survival values hash-match exactly.
    "q95_kaplan_meier" -> ((s, d) =>
      kmCurve(survivalUsers(Tables.events(s, d)).select(col("status"), col("t")))),

    // SURVIVAL SUMMARY — the three headline numbers read off q95's curve:
    // RMST (restricted mean survival time, ∫₀^H S(t)dt with H = the 168 h
    // study horizon — "the honest average time-to-convert" that q93's
    // converter-only mean cannot give under censoring), the Nelson-Aalen
    // cumulative hazard Σ d/n, and the median survival hour (first t with
    // S ≤ 0.5, NULL when the curve never crosses). All inputs are the
    // life-table rows (event times only — S is constant between them, so
    // censored-only hours never enter the integral), widths are exact
    // integers, S values are the curve's round-6 doubles, and both sums
    // fold t-sorted left-to-right on both engines. Scale: everything past
    // the shared per-user derivation runs on ≤169 rows.
    "q97_survival_summary" -> ((s, d) => {
      val h = 168L
      val km = kmCurve(survivalUsers(Tables.events(s, d))
        .select(col("status"), col("t")))
      val wNext = Window.orderBy(col("t_hours")) // domain-sized (≤169 rows)
      val seg = km
        .withColumn("next_t", lead(col("t_hours"), 1, h).over(wNext))
        .withColumn("width",
          greatest(least(col("next_t"), lit(h)) - col("t_hours"), lit(0L)))
        .withColumn("contrib", col("survival") * col("width"))
        .withColumn("hz",
          col("n_events").cast(DoubleType) / col("n_risk"))
      seg.agg(
          least(min(col("t_hours")), lit(h)).cast(DoubleType).as("init"),
          aggregate(sort_array(collect_list(struct(col("t_hours"), col("contrib")))),
            lit(0.0), (a, x) => a + x.getField("contrib")).as("area"),
          aggregate(sort_array(collect_list(struct(col("t_hours"), col("hz")))),
            lit(0.0), (a, x) => a + x.getField("hz")).as("cum_hazard"),
          min(when(col("survival") <= 0.5, col("t_hours"))).as("median_h"))
        .select(round(col("init") + col("area"), 6).as("rmst_h"),
          round(col("cum_hazard"), 6).as("cum_hazard"), col("median_h"))
    }),

    // COMPETING RISKS — which outcome wins the race after first view:
    // PURCHASE (conversion) vs ERROR (failure), the multi-outcome
    // extension of q95 (a naive "1 − KM per cause" overstates both when
    // causes compete). Per user, the FIRST post-view event among the two
    // causes decides (cause, t) — ties break on (ts, event_id) — censored
    // at the 7-day cutoff otherwise. Cumulative incidence per cause:
    // CIF_k(t) = Σ_{t_i ≤ t} S(t_{i−1}) · d_{k,i}/n_i with S the
    // ANY-cause KM survival (Aalen-Johansen for two terminal states).
    // Determinism: S(t_{i−1}) folds the factor list over the
    // PRECEDING-row frame (empty frame ⇒ the exact 1.0 seed on both
    // engines), each CIF term is one correctly-rounded division times
    // that product, and the CIF running sums fold frame-ordered — all on
    // the study-window-bounded hour grid (q95's scale note).
    "q98_competing_risks" -> ((s, d) => {
      val users = survivalOutcomes(Tables.events(s, d), Seq("purchase", "error"))
        .select(col("cause"), col("t"))
      val nTot = users.agg(count(lit(1)).as("n"))
      val tbl = users.groupBy(col("t")).agg(
        sum(when(col("cause") === "purchase", 1L).otherwise(0L)).as("d1"),
        sum(when(col("cause") === "error", 1L).otherwise(0L)).as("d2"),
        sum(when(col("cause") === "censored", 1L).otherwise(0L)).as("c"))
      val wPrev = Window.orderBy(col("t")) // domain-sized hour grid
        .rowsBetween(Window.unboundedPreceding, -1)
      val wRun = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tbl.crossJoin(broadcast(nTot))
        .withColumn("n_risk",
          col("n") - coalesce(sum(col("d1") + col("d2") + col("c")).over(wPrev),
            lit(0L)))
        .withColumn("factor",
          lit(1.0) - (col("d1") + col("d2")).cast(DoubleType) / col("n_risk"))
        .withColumn("s_prev",
          aggregate(collect_list(col("factor")).over(wPrev),
            lit(1.0), (a, x) => a * x))
        .withColumn("term1",
          col("s_prev") * (col("d1").cast(DoubleType) / col("n_risk")))
        .withColumn("term2",
          col("s_prev") * (col("d2").cast(DoubleType) / col("n_risk")))
        .withColumn("cif1",
          aggregate(collect_list(col("term1")).over(wRun),
            lit(0.0), (a, x) => a + x))
        .withColumn("cif2",
          aggregate(collect_list(col("term2")).over(wRun),
            lit(0.0), (a, x) => a + x))
        .filter(col("d1") + col("d2") > 0)
        .select(col("t").as("t_hours"), col("n_risk"),
          col("d1").as("d_purchase"), col("d2").as("d_error"),
          round(col("cif1"), 6).as("cif_purchase"),
          round(col("cif2"), 6).as("cif_error"))
        .orderBy(col("t_hours"))
    }),

    // LOG-RANK TEST — "does arm B convert slower than arm A?" under
    // censoring: the survival-curve companion to q82's Welch t-test (which
    // compares means and ignores the un-converted). Arms = q82's md5-bucket
    // split; per q95's 7-day administrative window, each arm gets a life
    // table on the shared hour grid, and at every event time the observed
    // arm-A events are compared against the hypergeometric expectation
    // E1 = n1·d/n with variance d(n−d)n1n2 / (n²(n−1)); χ² = (O1−ΣE1)²/ΣV.
    // Scale shape: identical to q95 — corpus → per-user rows → a
    // study-window-bounded life table; every window and the final sorted
    // fold run on ≤169 hour rows. Determinism: E1/V numerators and
    // denominators ride DECIMAL(38,0) exactly (int64 wraps at design
    // scale) with ONE double division per term, and both term sums fold
    // left-to-right over the t-sorted list on both engines (q69's
    // chi-square convention).
    "q96_logrank" -> ((s, d) => {
      val dec = DecimalType(38, 0)
      val users = survivalUsers(Tables.events(s, d))
      val na = users.filter(col("arm") === "A").agg(count(lit(1)).as("n_a"))
      val nb = users.filter(col("arm") === "B").agg(count(lit(1)).as("n_b"))
      val tbl = users.groupBy(col("t")).agg(
        sum(when(col("arm") === "A", col("status")).otherwise(0L)).as("d1"),
        sum(when(col("arm") === "A", lit(1L) - col("status")).otherwise(0L)).as("c1"),
        sum(when(col("arm") === "B", col("status")).otherwise(0L)).as("d2"),
        sum(when(col("arm") === "B", lit(1L) - col("status")).otherwise(0L)).as("c2"))
      // at-risk windows: ordered over the ≤169-row hour grid (q95's
      // domain-sized life-table convention)
      val wPrev = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val terms = tbl.crossJoin(broadcast(na)).crossJoin(broadcast(nb))
        .withColumn("n1",
          col("n_a") - coalesce(sum(col("d1") + col("c1")).over(wPrev), lit(0L)))
        .withColumn("n2",
          col("n_b") - coalesce(sum(col("d2") + col("c2")).over(wPrev), lit(0L)))
        .withColumn("d", col("d1") + col("d2"))
        .withColumn("nn", col("n1") + col("n2"))
        .filter(col("d") > 0)
        .withColumn("e1",
          (col("n1").cast(dec) * col("d").cast(dec)).cast(DoubleType) /
            col("nn").cast(DoubleType))
        .withColumn("vterm", when(col("nn") > 1,
          (col("d").cast(dec) * (col("nn") - col("d")).cast(dec) *
            col("n1").cast(dec) * col("n2").cast(dec)).cast(DoubleType) /
            (col("nn").cast(dec) * col("nn").cast(dec) *
              (col("nn") - lit(1L)).cast(dec)).cast(DoubleType))
          .otherwise(lit(0.0)))
      // n_a/n_b ride the always-populated 1-row arm aggregates (the DuckDB
      // twin's na/nb CTE shape) and the term sums NULL out when the life
      // table has no event rows — both engines then emit the same
      // (n_a, n_b, NULL, NULL, NULL, NULL) row instead of diverging
      terms.agg(
          count(lit(1)).as("nt"),
          sum(col("d1")).as("o1"),
          aggregate(sort_array(collect_list(struct(col("t"), col("e1")))),
            lit(0.0), (a, x) => a + x.getField("e1")).as("e1s_raw"),
          aggregate(sort_array(collect_list(struct(col("t"), col("vterm")))),
            lit(0.0), (a, x) => a + x.getField("vterm")).as("vs_raw"))
        .crossJoin(broadcast(na)).crossJoin(broadcast(nb))
        .withColumn("e1s", when(col("nt") > 0, col("e1s_raw")))
        .withColumn("vs", when(col("nt") > 0, col("vs_raw")))
        .withColumn("chi2",
          (col("o1").cast(DoubleType) - col("e1s")) *
            (col("o1").cast(DoubleType) - col("e1s")) / col("vs"))
        .select(col("n_a"), col("n_b"), col("o1"),
          round(col("e1s"), 6).as("e1"), round(col("chi2"), 6).as("chi2"),
          (col("chi2") > 3.841).as("significant"))
    }),

    // CUSUM change-point detection — "did the daily level shift, and
    // when?" as one statistic: the split k maximizing |n·S_k − k·S_n|
    // (the integer-scaled form of max |S_k − (k/n)·S_n|, the classic
    // cumulative-sum drift test). Everything is exact int64 until the
    // two reported means — the argmax, the statistic, and the tie-break
    // (earliest day) are pure integer comparisons, so the detected day
    // is bit-determined. Scale shape: one corpus agg to daily totals,
    // then all window work runs on the DOMAIN-sized day series.
    "q88_cusum" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .withColumn("cents", round(col("value") * 100).cast("long"))
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(sum(col("cents")).as("x"))
      val w = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val c = daily
        .withColumn("i", row_number().over(Window.orderBy(col("day"))))
        .withColumn("s_i", sum(col("x")).over(w))
        .crossJoin(broadcast(daily.agg(count(lit(1)).as("n"), sum(col("x")).as("s_n"))))
        // products of day-count x cumulative-cents overflow int64 at the
        // design scale (n*S_i ~ 1e19 for 3e16 total cents) - compute the
        // statistic in DECIMAL(38,0) like every other moment product in
        // the suite (the oracle's window sums are HUGEINT already)
        .withColumn("stat", abs(col("n").cast(DecimalType(38, 0)) * col("s_i") -
          col("i").cast(DecimalType(38, 0)) * col("s_n")))
      // max_stat can reach ~(n-1)*S_n ~ 1e19 at the design scale — a long
      // cast would null (Spark) / error (DuckDB) at exactly the scale the
      // DECIMAL(38,0) statistic was widened for. Emit it as double: a
      // scale-0 decimal is an exact integer and exact-int -> double is
      // correctly rounded on both engines (the suite's moment convention)
      c.orderBy(col("stat").desc, col("day")).limit(1)
        .select(col("day").as("change_day"), col("n").as("n_days"),
          col("i").as("k"), col("stat").cast(DoubleType).as("max_stat"),
          round(col("s_i").cast(DoubleType) / col("i"), 6).as("mean_before"),
          round((col("s_n") - col("s_i")).cast(DoubleType) / (col("n") - col("i")), 6)
            .as("mean_after"))
    }),

    // Benford first-digit audit — the forensic data-quality screen for
    // fabricated or truncated numeric columns: leading-digit shares of
    // revenue vs the Benford expectation. The digit comes from the
    // integer cents' STRING head (no log10 anywhere — libm differs
    // across engines; the nine expected shares are embedded as IDENTICAL
    // double literals on both sides, the text_ndcg convention), and the
    // output is per-digit rows so no cross-row float summation exists.
    // One corpus agg to 9 rows.
    "q89_benford" -> ((s, d) => {
      val expected = Seq( // log10(1 + 1/d), precomputed once, shared text
        0.3010299956639812, 0.17609125905568124, 0.12493873660829993,
        0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
        0.05799194697768673, 0.05115252244738129, 0.04575749056067514)
      val exp = expected.zipWithIndex.tail
        .foldLeft(when(col("digit") === "1", expected.head)) {
          case (acc, (e, i)) => acc.when(col("digit") === (i + 1).toString, e)
        }
      val li = Tables.lineitem(s, d)
        .withColumn("cents", round(col("l_extendedprice") * 100).cast("long"))
        .withColumn("digit", substring(col("cents").cast(StringType), 1, 1))
      val cnt = li.groupBy(col("digit")).agg(count(lit(1)).as("n"))
      cnt
        .crossJoin(broadcast(cnt.agg(sum(col("n")).as("total"))))
        .withColumn("share", round(col("n").cast(DoubleType) / col("total"), 6))
        .withColumn("expected", round(exp, 6))
        .withColumn("abs_dev",
          round(abs(col("n").cast(DoubleType) / col("total") - exp), 6))
        .select(col("digit"), col("n"), col("share"), col("expected"), col("abs_dev"))
        .orderBy(col("digit"))
    }),

    // CUPED variance reduction — the technique that makes A/B tests
    // converge faster: regress each user's post-period ("experiment")
    // spend on their pre-period ("covariate") spend, θ = cov(p,q)/var(p),
    // and report how much of the outcome variance the adjustment removes
    // (var_cuped = var_q − cov²/var_p). High pre/post correlation ⇒ big
    // reduction ⇒ smaller sample needed for the same power. All six
    // co-moments are exact int64/DECIMAL(38,0) sums off ONE user-level
    // pass; θ and the variances are fixed-order division chains, token-
    // identical in the oracle. Composes with q82/q86: same split, same
    // period cut, same moment machinery.
    "q87_cuped" -> ((s, d) => {
      val dec = DecimalType(38, 0)
      val cut = lit("2024-01-16").cast(TimestampType)
      val u = Tables.events(s, d)
        .withColumn("cents", round(col("value") * 100).cast("long"))
        .groupBy(col("user_id"))
        .agg(sum(when(col("ts") < cut, col("cents")).otherwise(0L)).as("p"),
          sum(when(col("ts") >= cut, col("cents")).otherwise(0L)).as("q"))
      def vr(spp: String, sp1: String, sp2: String) =
        exactCoMoment(col("n"), col(spp), col(sp1), col(sp2))
      u.agg(count(lit(1)).as("n"), sum(col("p")).as("sp"), sum(col("q")).as("sq"),
          sum(col("p").cast(dec) * col("p").cast(dec)).as("spp"),
          sum(col("q").cast(dec) * col("q").cast(dec)).as("sqq"),
          sum(col("p").cast(dec) * col("q").cast(dec)).as("spq"))
        .withColumn("var_p", vr("spp", "sp", "sp"))
        .withColumn("var_q", vr("sqq", "sq", "sq"))
        .withColumn("cov_pq", vr("spq", "sp", "sq"))
        .withColumn("theta", col("cov_pq") / col("var_p"))
        .withColumn("var_adj",
          col("var_q") - col("cov_pq") * col("cov_pq") / col("var_p"))
        .select(col("n"), round(col("theta"), 6).as("theta"),
          round(col("var_q"), 6).as("var_post"),
          round(col("var_adj"), 6).as("var_cuped"),
          round(lit(1.0) - col("var_adj") / col("var_q"), 6).as("var_reduction"))
    }),

    // AQP with an honest error bar: a deterministic 1/16 simple random
    // sample (md5 of the row key — reproducible on any cluster and in
    // the oracle) estimates mean lineitem revenue, and the CI comes from
    // the SAMPLE'S OWN moments (SE = s/√n) — the estimator ships its own
    // uncertainty, which is what separates approximate query processing
    // from guessing. Gate: the sample CI must cover the exact mean
    // (computed alongside), plus exact/estimate/half-width pinned. All
    // moments are exact int64/DECIMAL(38,0) cents sums; the CI chain is
    // token-identical IEEE on both engines. Scale shape: the sample agg
    // reads 1/16 of the rows behind a hash predicate (at a real lake the
    // sample would be a materialized bucket — the predicate documents
    // the semantics); everything else is six numbers.
    "q85_sample_ci" -> ((s, d) => {
      val dec = DecimalType(38, 0)
      val li = Tables.lineitem(s, d)
        .withColumn("cents", round(col("l_extendedprice") * 100).cast("long"))
      val keep = sampleKeep16(concat_ws("-",
        col("l_orderkey"), col("l_linenumber")))
      val pop = li.agg(count(lit(1)).as("n_total"), sum(col("cents")).as("sx_t"))
      val smp = li.filter(keep)
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sx"),
          sum(col("cents").cast(dec) * col("cents").cast(dec)).as("sxx"))
      smp.crossJoin(broadcast(pop))
        .withColumn("exact_mean", col("sx_t").cast(DoubleType) / col("n_total"))
        .withColumn("est_mean", col("sx").cast(DoubleType) / col("n"))
        .withColumn("s2",
          (col("n").cast(dec) * col("sxx") - col("sx").cast(dec) * col("sx").cast(dec))
            .cast(DoubleType) / (col("n").cast(DoubleType) * (col("n") - 1)))
        .withColumn("half", lit(1.96) * sqrt(col("s2") / col("n")))
        .select(col("n_total"), col("n"),
          round(col("exact_mean"), 6).as("exact_mean_cents"),
          round(col("est_mean"), 6).as("est_mean_cents"),
          round(col("half"), 6).as("half_width_cents"),
          (abs(col("est_mean") - col("exact_mean")) <= col("half")).as("ci_covers_exact"))
    }),

    // OHLC candlestick bars — the time-series downsampling primitive
    // (tick stream → hourly open/high/low/close/volume bars that feed
    // charting and technical features). Open/close are order statistics,
    // not extremes: first/last value in the bar by the total (ts,
    // event_id) order, computed as two rank columns over ONE hour
    // partitioning (no self-join, no collect). Scale shape: windows and
    // the agg all key on the bar — embarrassingly parallel across bars;
    // high/low/count are plain min/max, volume is the decimal-exact sum.
    "q83_ohlc_bars" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(date_trunc("hour", col("ts")).as("h"),
          col("ts"), col("event_id"), col("value"))
      val wAsc = Window.partitionBy(col("h")).orderBy(col("ts"), col("event_id"))
      val wDesc = Window.partitionBy(col("h")).orderBy(col("ts").desc, col("event_id").desc)
      ev.withColumn("rna", row_number().over(wAsc))
        .withColumn("rnd", row_number().over(wDesc))
        .groupBy(col("h"))
        .agg(count(lit(1)).as("n_trades"),
          max(when(col("rna") === 1, col("value"))).as("open"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          max(when(col("rnd") === 1, col("value"))).as("close"),
          dsum(col("value")).as("volume"))
        .orderBy(col("h"))
    }),

    // Median-absolute-deviation robust outlier sweep — the heavy-tail-safe
    // alternative to q51's z-scores (one whale purchase inflates a mean
    // and σ; it cannot move a median). Both medians use the DISTRIBUTED
    // lower-median cut — per-(group, value) counts, cumulative sum over
    // the value-ordered distribution, first value where 2·cum ≥ n — so
    // per-group memory is O(distinct values), never a collect_list of the
    // group (the q57 frame trick is for bounded windows, not whole
    // groups). Everything is integer cents: med, MAD, and the
    // |x−med| > 3·MAD outlier test involve no float arithmetic at all;
    // the only division is the final outlier share, round 6.
    "q84_mad_outliers" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type"), round(col("value") * 100).cast("long").as("cents"))
      def lowerMedian(df: DataFrame, valueCol: String, out: String): DataFrame = {
        val wcum = Window.partitionBy(col("event_type")).orderBy(col(valueCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wall = Window.partitionBy(col("event_type"))
        df.groupBy(col("event_type"), col(valueCol)).agg(count(lit(1)).as("nk"))
          .withColumn("cum", sum(col("nk")).over(wcum))
          .withColumn("n", sum(col("nk")).over(wall))
          .filter(col("cum") * 2 >= col("n"))
          .groupBy(col("event_type")).agg(min(col(valueCol)).as(out))
      }
      val med = lowerMedian(ev, "cents", "med")
      val dev = ev.join(broadcast(med), "event_type")
        .withColumn("adev", abs(col("cents") - col("med")))
      val mad = lowerMedian(dev, "adev", "mad")
      dev.join(broadcast(mad), "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), first(col("med")).as("med_cents"),
          first(col("mad")).as("mad_cents"),
          sum(when(col("adev") > col("mad") * 3, 1L).otherwise(0L)).as("n_outliers"))
        .withColumn("outlier_share",
          round(col("n_outliers").cast(DoubleType) / col("n"), 6))
        .orderBy(col("event_type"))
    }),

    // Welch's two-sample t-test over a deterministic 50/50 A/B split —
    // the experimentation primitive (is arm A's per-user spend different
    // from arm B's?). Assignment is the md5-bucket convention
    // (text_sample_split), so the split reproduces on any cluster and in
    // the oracle. Exactness: per-user metric in integer cents; per-arm
    // moments as exact int64/DECIMAL(38,0) sums (Σx, Σx²) so mean and
    // variance are each ONE correctly-rounded division of exact
    // integers — s² = (n·Σx² − (Σx)²)/(n·(n−1)); t and the
    // Welch–Satterthwaite dof are short fixed-order chains of IEEE ops,
    // written token-identically in the oracle. Scale shape: one corpus
    // shuffle (user agg), then two 1-row arm frames cross-joined — every
    // statistic derives from six numbers.
    "q82_ab_ttest" -> ((s, d) => {
      val dec = DecimalType(38, 0)
      val users = Tables.events(s, d)
        .withColumn("cents", round(col("value") * 100).cast("long"))
        .groupBy(col("user_id"))
        .agg(sum(col("cents")).as("m"))
        .withColumn("arm", armOf(col("user_id")))
      val arms = users.groupBy(col("arm"))
        .agg(count(lit(1)).as("n"), sum(col("m")).as("sx"),
          sum(col("m").cast(dec) * col("m").cast(dec)).as("sxx"))
      val a = arms.filter(col("arm") === "A")
        .select(col("n").as("na"), col("sx").as("sxa"), col("sxx").as("sxxa"))
      val b = arms.filter(col("arm") === "B")
        .select(col("n").as("nb"), col("sx").as("sxb"), col("sxx").as("sxxb"))
      a.crossJoin(b)
        .withColumn("mean_a", col("sxa").cast(DoubleType) / col("na"))
        .withColumn("mean_b", col("sxb").cast(DoubleType) / col("nb"))
        .withColumn("va", exactCoMoment(col("na"), col("sxxa"), col("sxa"), col("sxa")))
        .withColumn("vb", exactCoMoment(col("nb"), col("sxxb"), col("sxb"), col("sxb")))
        .withColumn("aa", col("va") / col("na"))
        .withColumn("bb", col("vb") / col("nb"))
        .withColumn("t_stat", (col("mean_a") - col("mean_b")) / sqrt(col("aa") + col("bb")))
        .withColumn("dof", (col("aa") + col("bb")) * (col("aa") + col("bb")) /
          (col("aa") * col("aa") / (col("na") - 1) + col("bb") * col("bb") / (col("nb") - 1)))
        .select(col("na"), col("nb"),
          round(col("mean_a"), 6).as("mean_a"), round(col("mean_b"), 6).as("mean_b"),
          round(col("t_stat"), 6).as("t_stat"), round(col("dof"), 6).as("dof"),
          (abs(col("t_stat")) > 1.96).as("significant"))
    }),

    // Entity resolution with the engine's native Jaro-Winkler expression
    // (graft.functions.JaroWinklerSim — codegen'd, rapidfuzz semantics,
    // bit-identical to DuckDB's jaro_winkler_similarity on ASCII): the
    // classic record-linkage pipeline — exact-collapse to DISTINCT
    // entities first (the corpus-sized step, one shuffle), then
    // MULTI-KEY BLOCKING on the entity table (one equi-join per block
    // key, unioned + distinct — never an OR-join, which would disable
    // the equi-key and plan a nested loop), then the JW verify pass over
    // candidates only. Every candidate's score is hash-checked (448
    // cross-engine-exact JW values — a conformance suite for the
    // expression), and blocking is LOSSLESS here: zero pairs ≥ 0.88
    // exist outside the blocks (probed exhaustively at build time).
    "q81_jaro_entity" -> ((s, d) => {
      val n = Tables.part(s, d).select(col("p_name").as("nm")).distinct()
      // coalesce to '' so a one-token name matches DuckDB's split_part
      // (which returns '' past the end, where getItem yields NULL and
      // would silently drop the row from the k2 block)
      val k = n.select(col("nm"),
        split(col("nm"), " ").getItem(0).as("k1"),
        coalesce(split(col("nm"), " ").getItem(1), lit("")).as("k2"))
      val a = k.select(col("nm").as("na"), col("k1").as("ka1"), col("k2").as("ka2"))
      val b = k.select(col("nm").as("nb"), col("k1").as("kb1"), col("k2").as("kb2"))
      val c1 = a.join(b, col("na") < col("nb") && col("ka1") === col("kb1"))
      val c2 = a.join(b, col("na") < col("nb") && col("ka2") === col("kb2"))
      c1.select(col("na"), col("nb")).union(c2.select(col("na"), col("nb")))
        .distinct()
        .withColumn("jw", round(
          graft.functions.StringMetricFunctions.jaro_winkler(col("na"), col("nb")), 6))
        .withColumn("is_match", col("jw") >= 0.88)
        .orderBy(col("na"), col("nb"))
    }),

    // Decile lift/gains table — the model-evaluation report behind "does
    // ranking by this score concentrate the positives?" (campaign
    // targeting, lead scoring, data-selection curricula). Users are
    // ranked by total engagement value (the "model score"), cut into
    // ntile(10) deciles, and each decile reports its purchase-conversion
    // capture plus the cumulative capture rate and lift vs the base
    // rate. Scale shape: one user-level agg (corpus shuffle), then ALL
    // ranking work happens on the user-sized table — and the ranking
    // itself is the DISTRIBUTED bucketed prefix sum
    // (operators.DistributedRank): global row number i over
    // (score DESC, user_id), then ntile's closed form decile(i, n)
    // (first n%10 tiles get ⌈n/10⌉ rows, the rest ⌊n/10⌋ — exactly
    // Spark's and DuckDB's NTILE semantics), so no user-sized single
    // partition exists even when users outgrow one task. The score key
    // is DECIMAL(28,6) — ×10⁶ makes it an exact long for the range
    // bucketing; negation gives DESC. Determinism: score ties break on
    // user_id in the rank order; all rates are one division of exact
    // int64/DECIMAL values, round 6.
    "q80_decile_lift" -> ((s, d) => {
      val users = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(sum(col("value").cast(DecimalType(28, 6))).as("score"),
          max(when(col("event_type") === "purchase", 1).otherwise(0)).as("pos"))
      val nTot = users.agg(count(lit(1)).as("nn"))
      val ranked = graft.operators.DistributedRank.withGlobalRank(
          users, -(col("score") * 1000000).cast("long"), Seq(col("user_id")),
          256, "i")
        .crossJoin(broadcast(nTot))
        // ntile(10) closed form: q=⌊n/10⌋, r=n mod 10; rows 1..r·(q+1)
        // fall in the first r (size q+1) tiles, the rest in size-q tiles.
        // n<10 ⇒ every i takes the first branch, so the q=0 division in
        // the second branch is never evaluated (CaseWhen short-circuits).
        .withColumn("decile",
          when(col("i") <= (col("nn") % 10) * (expr("nn div 10") + 1),
            expr("(i + nn div 10) div (nn div 10 + 1)"))
          .otherwise(expr(
            "nn % 10 + (i - (nn % 10) * (nn div 10 + 1) + nn div 10 - 1) div (nn div 10)"))
          .cast("int"))
      val dec = ranked.groupBy(col("decile"))
        .agg(count(lit(1)).as("n_users"), sum(col("pos")).as("n_pos"))
      val w = Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = dec.agg(sum(col("n_users")).as("tu"), sum(col("n_pos")).as("tp"))
      dec.crossJoin(broadcast(tot))
        .withColumn("cum_pos", sum(col("n_pos")).over(w))
        .withColumn("cum_users", sum(col("n_users")).over(w))
        .select(col("decile"), col("n_users"), col("n_pos"),
          round(col("cum_pos").cast(DoubleType) / col("tp"), 6)
            .as("cum_capture"),
          round((col("cum_pos").cast(DoubleType) / col("cum_users")) /
            (col("tp").cast(DoubleType) / col("tu")), 6).as("cum_lift"))
        .orderBy(col("decile"))
    }),

    // KLL quantile sketch (Karnin-Lang-Liberty, via Spark 4's datasketches
    // integration): the MERGEABLE bounded-memory quantile path — per-group
    // sketches build in one pass with map-side partial merges
    // (kll_sketch_agg_double), hold O(k log n) values regardless of group
    // size, and would merge across days/partitions with kll_sketch_merge —
    // what replaces exact percentile's O(group) buffering at 100 TB (the
    // q28 scale-path story, now with a second, merge-oriented sketch
    // family). The sketch is RANDOMIZED (compaction coin flips), so its
    // outputs never enter the hash; instead the gate re-ranks the sketch's
    // p50/p95 against the data — one broadcast join of 3 rows back over
    // the corpus — and asserts the normalized-rank error ≤ 0.05 (3× the
    // k=400 sketch's 99%-confidence envelope: deterministic-in-practice).
    // Hash-carried content: group sizes and the exact interpolated
    // median (the q28 cross-engine percentile convention).
    "q76_kll_quantiles" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_returnflag"), col("l_quantity"))
      val sk = li.groupBy(col("l_returnflag"))
        .agg(kll_sketch_agg_double(col("l_quantity"), lit(400)).as("sk"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("n"),
          kll_sketch_get_quantile_double(col("sk"), lit(0.5)).as("q50"),
          kll_sketch_get_quantile_double(col("sk"), lit(0.95)).as("q95"))
      li.join(broadcast(sk), "l_returnflag")
        .groupBy(col("l_returnflag"))
        .agg(first(col("n")).as("n"),
          round(expr("percentile(l_quantity, 0.5)"), 6).as("exact_p50"),
          (abs(sum(when(col("l_quantity") <= col("q50"), 1L).otherwise(0L))
            .cast("double") / first(col("n")) - 0.5) <= 0.05).as("p50_rank_ok"),
          (abs(sum(when(col("l_quantity") <= col("q95"), 1L).otherwise(0L))
            .cast("double") / first(col("n")) - 0.95) <= 0.05).as("p95_rank_ok"))
        .orderBy(col("l_returnflag"))
    }),

    // First-order Markov transition matrix of user behavior: P(next event
    // type | current event type) from per-user event sequences — the
    // behavioral model behind next-action prediction, anomaly scoring
    // ("this session's transitions are improbable"), and simulation. One
    // user-keyed window pass (ts, event_id deterministic order) emits
    // consecutive pairs; the (from, to) counts are DOMAIN-sized (|types|²),
    // and row totals derive from the count table itself — the corpus is
    // scanned once and shuffled once (the window's user partitioning).
    // Determinism: probability is one correctly-rounded division of exact
    // int64 counts, then round 6.
    "q75_markov_transitions" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val pairs = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type").as("a"))
        .withColumn("b", lead(col("a"), 1).over(w))
        .filter(col("b").isNotNull)
      val cnt = pairs.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
      val tot = cnt.groupBy(col("a")).agg(sum(col("c_ab")).as("c_a"))
      cnt.join(broadcast(tot), "a")
        .select(col("a").as("from_type"), col("b").as("to_type"),
          col("c_ab"), col("c_a"),
          round(col("c_ab").cast("double") / col("c_a"), 6).as("p"))
        .orderBy(col("from_type"), col("to_type"))
    }),

    // Chi-square independence test of event_type × hour-of-day — the
    // data-profiling / drift question "is activity mix time-dependent?"
    // as one statistic. χ² = Σ_cells (obs·n − rt·ct)² / (n·rt·ct): each
    // cell term keeps an EXACT int64 numerator/denominator (squared diff
    // ≤ 1.4e16, den ≤ 1.8e12 at sf0.1 — both < 2^53) so the only float
    // op per cell is one correctly-rounded division; terms fold in
    // (event_type, hr) sorted order on both engines. Scale shape: one
    // corpus agg to the contingency table (types×24 rows), margins and
    // the total derive from IT (no second scan), the fold runs on ≤ a
    // few hundred cells.
    "q69_chi_square" -> ((s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val obs = Tables.events(s, d)
        .groupBy(col("event_type"), hour(col("ts")).as("hr"))
        .agg(count(lit(1)).as("o"))
        .persist() // the contingency table (types×24) — 4 consumers
      val rt = obs.groupBy(col("event_type")).agg(sum(col("o")).as("rt"))
      val ct = obs.groupBy(col("hr")).agg(sum(col("o")).as("ct"))
      val n = obs.agg(sum(col("o")).as("n"))
      // DECIMAL(38,0) keeps num/den exact at ANY data size (int64 wraps
      // silently in Spark but throws in DuckDB — a cross-engine cliff);
      // scale-0 decimal → double is correctly rounded on both engines.
      val cells = obs.join(broadcast(rt), "event_type").join(broadcast(ct), "hr")
        .crossJoin(broadcast(n))
        .withColumn("diff",
          (col("o").cast(dec) * col("n").cast(dec) -
            col("rt").cast(dec) * col("ct").cast(dec)).cast("double"))
        .withColumn("term", col("diff") * col("diff") /
          (col("n").cast(dec) * col("rt").cast(dec) * col("ct").cast(dec)).cast("double"))
      cells.agg(
          round(aggregate(
            sort_array(collect_list(struct(col("event_type"), col("hr"), col("term")))),
            lit(0.0), (a, x) => a + x.getField("term")), 6).as("chi2"),
          ((countDistinct(col("event_type")) - 1) *
            (countDistinct(col("hr")) - 1)).as("dof"),
          sum(col("o")).as("n_events"))
        .select(col("chi2"), col("dof"), col("n_events"))
    }),

    // Sketch set algebra: estimate the DISTINCT-USER INTERSECTION of two
    // event types by HLL inclusion-exclusion (|A∩B| ≈ |A|+|B|−|A∪B|) —
    // the mergeable-sketch form of an audience-overlap question that at
    // 100 TB never needs the raw user sets co-shuffled. Gate = the q26
    // error-envelope pattern: exact values ride along (one user-keyed agg)
    // and the output asserts the estimate landed within 25% of the exact
    // union (three ±2.5%-rsd sketches compound on a ~150-user domain);
    // Spark's HLL is deterministic, so the boolean is stable.
    "q59_sketch_intersection" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("event_type").isin("click", "view"))
      val exact = ev.groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "click", 1).otherwise(0)).as("a"),
          max(when(col("event_type") === "view", 1).otherwise(0)).as("b"))
        .agg(sum(col("a")).as("n_click"), sum(col("b")).as("n_view"),
          sum(col("a") * col("b")).as("n_both"), count(lit(1)).as("n_union"))
      val approx = ev.agg(
        approx_count_distinct(
          when(col("event_type") === "click", col("user_id")), 0.025).as("ca"),
        approx_count_distinct(
          when(col("event_type") === "view", col("user_id")), 0.025).as("cb"),
        approx_count_distinct(col("user_id"), 0.025).as("cu"))
      exact.crossJoin(approx)
        .select(col("n_click"), col("n_view"), col("n_both"), col("n_union"),
          (abs(col("ca") + col("cb") - col("cu") - col("n_both")) <=
            col("n_union") * 0.25).as("inter_within_bound"))
    }),

    // Peak concurrency by interval sweep — how many 10-minute event
    // intervals overlap at once, per hour. The classic global running sum
    // is a SINGLE total order (unscalable as one partition); this is the
    // distributed form: ±1 deltas sweep WITHIN hour buckets, and bucket
    // offsets come from a second, tiny prefix-sum window over per-bucket
    // totals (rows = number of hours, thousands at warehouse scale — the
    // only single-partition step, and it is O(buckets), not O(events)).
    // Tie order (t, d) puts interval ends before starts at the same
    // instant (end-exclusive intervals); per-hour MAX is invariant to
    // intra-tie permutation since equal deltas commute.
    "q58_peak_concurrency" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val dl = ev.select(col("ts").as("t"), lit(1).as("dlt"))
        .unionByName(ev.select(
          (col("ts") + expr("INTERVAL 10 MINUTES")).as("t"), lit(-1).as("dlt")))
        .withColumn("bucket", date_trunc("hour", col("t")))
      val wIn = Window.partitionBy(col("bucket")).orderBy(col("t"), col("dlt"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wB = Window.orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = dl.groupBy(col("bucket")).agg(sum(col("dlt")).as("tot"))
        .withColumn("off", coalesce(sum(col("tot")).over(wB), lit(0L)))
        .select(col("bucket"), col("off"))
      dl.withColumn("run_in", sum(col("dlt")).over(wIn))
        .join(broadcast(offsets), "bucket")
        .groupBy(col("bucket").as("hour"))
        .agg(max(col("off") + col("run_in")).as("peak"))
        .orderBy(col("hour"))
    }),

    // CDC compaction as pure SQL: latest event per key via max_by ordering
    // tuple — the materialization primitive (SURVEY.md §2.2 Aggregations).
    "q23_latest_by_key" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"), col("ts"))
        .orderBy(col("user_id"))
    }))

  /** DuckDB CTE chain for the shared survival life table (q95/q97 and the
    * CDC serving twin — the SQL half of [[survivalUsers]]+[[kmCurve]]):
    * per-user first view / first qualifying purchase under the 7-day
    * administrative window, hour-bucketed (d, c, n_risk, survival-factor)
    * rows. `cutWhere` filters the events anchoring the cutoff (empty =
    * whole table; the wire twin restricts to the types it carries). */
  private[queries] def kmLifeTableCtes(cutWhere: String): String =
    s"""v AS (
           SELECT user_id, MIN(ts) AS t_view FROM events
           WHERE event_type = 'view' GROUP BY 1),
         pch AS (
           SELECT e.user_id, MIN(e.ts) AS t_p
           FROM events e JOIN v ON e.user_id = v.user_id
           WHERE e.event_type = 'purchase' AND e.ts > v.t_view
           GROUP BY 1),
         cut AS (SELECT MIN(epoch_us(ts)) + 604800000000 AS cut_us FROM events
                 $cutWhere),
         users AS (
           SELECT CASE WHEN p.t_p IS NOT NULL AND epoch_us(p.t_p) <= cut_us
                       THEN 1 ELSE 0 END AS status,
             CAST((CASE WHEN p.t_p IS NOT NULL AND epoch_us(p.t_p) <= cut_us
                   THEN epoch_us(p.t_p) - epoch_us(v.t_view)
                   ELSE cut_us - epoch_us(v.t_view) END) // 3600000000
               AS BIGINT) AS t
           FROM v LEFT JOIN pch p ON v.user_id = p.user_id, cut
           WHERE epoch_us(v.t_view) < cut_us),
         n_tot AS (SELECT COUNT(*) AS n FROM users),
         tbl AS (
           SELECT t, CAST(SUM(status) AS BIGINT) AS d,
             CAST(SUM(1 - status) AS BIGINT) AS c
           FROM users GROUP BY t),
         r AS (
           SELECT t, d, c,
             CAST(n - COALESCE(SUM(d + c) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS n_risk
           FROM tbl, n_tot),
         f AS (
           SELECT t, d, c, n_risk,
             1.0 - CAST(d AS DOUBLE) / n_risk AS factor
           FROM r),
         s AS (
           SELECT *, list(factor) OVER (ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fl
           FROM f)"""

  /** The product-limit curve SELECT over [[kmLifeTableCtes]]'s `s` CTE —
    * q95's tail, shared verbatim by the CDC serving twin. */
  private[queries] val KmCurveTailSql: String =
    """SELECT t AS t_hours, n_risk, d AS n_events, c AS n_censored,
           round(list_reduce(fl, (a, b) -> a * b), 6) AS survival
         FROM s WHERE d > 0 ORDER BY t_hours"""

  /** The Holt-Winters fold as DuckDB SQL, downstream of an `ev` CTE
    * providing `(event_type, hr BIGINT, cents BIGINT)` — q99's tail,
    * shared verbatim by the CDC forecast-serving twin (requires WITH
    * RECURSIVE on the enclosing query). Token-for-token mirror of
    * [[holtWinters]]: dyadic constants, left folds, identical operand
    * order. */
  private[queries] val HoltWintersTailSql: String =
    """h0 AS (SELECT MIN(hr) AS h0 FROM ev),
         hourly AS (
           SELECT event_type, hr - (SELECT h0 FROM h0) AS t,
             CAST(SUM(cents) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * 100.0) AS y
           FROM ev GROUP BY event_type, hr),
         series AS (
           SELECT event_type, list(t ORDER BY t) AS ts_l, list(y ORDER BY t) AS ys
           FROM hourly GROUP BY event_type HAVING COUNT(*) >= 72),
         init1 AS (
           SELECT event_type, ts_l, ys,
             list_reduce(ys[1:24], (a, b) -> a + b) / 24.0 AS l0,
             list_reduce(ys[25:48], (a, b) -> a + b) / 24.0 AS m2
           FROM series),
         init AS (
           SELECT event_type, ts_l, ys, l0, (m2 - l0) / 24.0 AS b0,
             list_transform(ys[1:24], x -> x - l0) AS s0
           FROM init1),
         rec AS (
           SELECT event_type, ts_l, ys, 24 AS i, l0 AS l, b0 AS b, s0 AS s,
             CAST([] AS STRUCT(t BIGINT, y DOUBLE, yhat DOUBLE)[]) AS fit
           FROM init
           UNION ALL
           SELECT event_type, ts_l, ys, i + 1,
             0.5 * (ys[i + 1] - s[1]) + 0.5 * (l + b),
             0.25 * ((0.5 * (ys[i + 1] - s[1]) + 0.5 * (l + b)) - l) + 0.75 * b,
             s[2:24] || [0.25 * (ys[i + 1] - (0.5 * (ys[i + 1] - s[1]) + 0.5 * (l + b))) + 0.75 * s[1]],
             fit || [struct_pack(t := ts_l[i + 1], y := ys[i + 1],
                                 yhat := l + b + s[1])]
           FROM rec WHERE i < len(ys)),
         fin AS (SELECT * FROM rec WHERE i = len(ys)),
         fits AS (
           SELECT event_type, 'fit' AS kind, f.t AS t,
             round(f.y, 6) AS y, round(f.yhat, 6) AS yhat
           FROM (SELECT event_type, unnest(fit) AS f FROM fin)),
         fc AS (
           SELECT event_type, 'forecast' AS kind, f.t AS t,
             CAST(NULL AS DOUBLE) AS y, round(f.yhat, 6) AS yhat
           FROM (SELECT event_type, unnest(list_transform(generate_series(1, 24),
               h -> struct_pack(t := ts_l[len(ts_l)] + h,
                 yhat := l + CAST(h AS DOUBLE) * b + s[h]))) AS f
             FROM fin))
         SELECT * FROM fits UNION ALL SELECT * FROM fc
         ORDER BY event_type, kind, t"""

  /** [[HoltWintersTailSql]] minus its final SELECT — for oracles that
    * compose further CTEs over the fits/fc results (q101/q102). Derived
    * by cutting at the final SELECT's first token so a reflow of either
    * literal fails LOUDLY here instead of producing a silent no-op. */
  private[queries] val HoltWintersCtesSql: String = {
    val cut = HoltWintersTailSql.lastIndexOf("SELECT * FROM fits")
    require(cut > 0, "HoltWintersTailSql lost its final SELECT — fix the fragment split")
    HoltWintersTailSql.substring(0, cut)
  }

  /** Conformal residual band over [[HoltWintersTailSql]]'s `hw` rows as
    * SQL CTEs (`res` + `band`): exact ceil-rank p10/p90 order statistics
    * of the fit residuals — shared verbatim by q101 and q102 so the
    * quantile-index convention lives in ONE place per engine. */
  private[queries] val ConformalBandCtesSql: String =
    """res AS (
           SELECT event_type, y - yhat AS r FROM hw WHERE kind = 'fit'),
         band AS (
           SELECT event_type,
             rs[CAST((n + 9) // 10 AS INT)] AS r_lo,
             rs[CAST((9 * n + 9) // 10 AS INT)] AS r_hi
           FROM (SELECT event_type, list(r ORDER BY r) AS rs, COUNT(*) AS n
                 FROM res GROUP BY event_type) q)"""

  val oracleSql: Map[String, String] = Map(
    "q62_ewma" ->
      """WITH ev AS (
           SELECT user_id, event_id, ts,
             CAST(round(value * 100) AS BIGINT) AS cents
           FROM events),
         l AS (
           SELECT user_id, event_id, cents,
             LAG(cents, 1) OVER w AS c1, LAG(cents, 2) OVER w AS c2,
             LAG(cents, 3) OVER w AS c3, LAG(cents, 4) OVER w AS c4,
             LAG(cents, 5) OVER w AS c5, LAG(cents, 6) OVER w AS c6,
             LAG(cents, 7) OVER w AS c7
           FROM ev
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         SELECT user_id, event_id,
           ROUND(CAST(cents * 128 + COALESCE(c1 * 64, 0) + COALESCE(c2 * 32, 0)
               + COALESCE(c3 * 16, 0) + COALESCE(c4 * 8, 0) + COALESCE(c5 * 4, 0)
               + COALESCE(c6 * 2, 0) + COALESCE(c7, 0) AS DOUBLE) /
             (CAST(128 + CASE WHEN c1 IS NULL THEN 0 ELSE 64 END
               + CASE WHEN c2 IS NULL THEN 0 ELSE 32 END
               + CASE WHEN c3 IS NULL THEN 0 ELSE 16 END
               + CASE WHEN c4 IS NULL THEN 0 ELSE 8 END
               + CASE WHEN c5 IS NULL THEN 0 ELSE 4 END
               + CASE WHEN c6 IS NULL THEN 0 ELSE 2 END
               + CASE WHEN c7 IS NULL THEN 0 ELSE 1 END AS DOUBLE) * 100.0),
             6) AS ewma
         FROM l ORDER BY user_id, event_id""",

    "q60_time_weighted" ->
      """WITH seg AS (
           SELECT user_id,
             CAST(round(value * 100) AS BIGINT) AS cents,
             epoch_us(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
               - epoch_us(ts) AS dt_us
           FROM events)
         SELECT user_id,
           ROUND(CAST(SUM(cents * dt_us) AS DOUBLE) /
                 (CAST(SUM(dt_us) AS DOUBLE) * 100.0), 6) AS time_weighted_avg,
           CAST(SUM(dt_us) AS BIGINT) AS span_us,
           COUNT(*) AS n_segments
         FROM seg WHERE dt_us IS NOT NULL
         GROUP BY user_id ORDER BY user_id""",

    "q59_sketch_intersection" ->
      """SELECT CAST(SUM(a) AS BIGINT) AS n_click,
           CAST(SUM(b) AS BIGINT) AS n_view,
           CAST(SUM(a * b) AS BIGINT) AS n_both,
           COUNT(*) AS n_union,
           TRUE AS inter_within_bound
         FROM (
           SELECT user_id,
             MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS a,
             MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS b
           FROM events WHERE event_type IN ('click', 'view')
           GROUP BY user_id)""",

    "q58_peak_concurrency" ->
      """WITH dl AS (
           SELECT ts AS t, 1 AS dlt FROM events
           UNION ALL
           SELECT ts + INTERVAL 10 MINUTE, -1 FROM events),
         r AS (
           SELECT t, SUM(dlt) OVER (ORDER BY t, dlt
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
           FROM dl)
         SELECT CAST(date_trunc('hour', t) AS TIMESTAMP) AS hour,
           CAST(MAX(run) AS BIGINT) AS peak
         FROM r GROUP BY 1 ORDER BY 1""",

    "q57_rolling_median" ->
      """SELECT user_id, event_id,
           fr[CAST((len(fr) + 1) // 2 AS INT)] AS rolling_median
         FROM (
           SELECT user_id, event_id,
             list_sort(list(value) OVER (PARTITION BY user_id
               ORDER BY ts, event_id
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS fr
           FROM events)
         ORDER BY user_id, event_id""",

    "q56_lateral_topn" ->
      """SELECT n.n_name, t.c_name, t.c_acctbal
         FROM nation n,
         LATERAL (SELECT c_name, c_acctbal FROM customer c
                  WHERE c.c_nationkey = n.n_nationkey
                  ORDER BY c_acctbal DESC, c_name LIMIT 2) t
         ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""",

    "q55_mode" ->
      """SELECT user_id, event_type AS mode_type, n FROM (
           SELECT user_id, event_type, COUNT(*) AS n,
             ROW_NUMBER() OVER (PARTITION BY user_id
               ORDER BY COUNT(*) DESC, event_type) AS rk
           FROM events GROUP BY user_id, event_type)
         WHERE rk = 1 ORDER BY user_id""",

    "q54_regression" ->
      """SELECT l_returnflag,
           ROUND(covar_samp(l_extendedprice, l_quantity), 2) AS cov_s,
           ROUND(covar_pop(l_extendedprice, l_quantity), 2) AS cov_p,
           ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           regr_count(l_extendedprice, l_quantity) AS n
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q53_running_features" ->
      """SELECT user_id, event_id,
           COUNT(*) OVER w AS user_event_n,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE) AS user_value_cum
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY user_id, event_id""",

    "q52_session_stats" ->
      s"""WITH o AS (
           SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         g AS (
           SELECT user_id, ts, value,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM o)
         SELECT user_id, CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT) // 1000000 AS duration_s,
           COUNT(*) AS n_events, ${DSUM.format("value")} AS value_sum
         FROM g GROUP BY user_id, sid
         ORDER BY user_id, session_start""",

    "q51_event_anomaly" ->
      """WITH st AS (
           SELECT user_id, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sv,
             CAST(SUM(CAST(value * value AS DECIMAL(28,6))) AS DOUBLE) AS svv
           FROM events GROUP BY user_id HAVING COUNT(*) >= 2),
         pr AS (
           SELECT user_id, sv / n AS mean,
             sqrt((svv - sv * sv / n) / (n - 1)) AS sd
           FROM st)
         SELECT e.user_id, e.event_id, e.value,
           round(p.mean, 6) AS user_mean, round(p.sd, 6) AS user_sd,
           round((e.value - p.mean) / p.sd, 6) AS z
         FROM events e JOIN pr p ON e.user_id = p.user_id
         WHERE p.sd > 0 AND abs((e.value - p.mean) / p.sd) > 3.0
         ORDER BY e.user_id, e.event_id""",

    "q42_histogram" ->
      s"""SELECT LEAST(CAST(floor((l_quantity - 1) / 5) AS INT), 9) AS bucket,
         COUNT(*) AS n, ${DSUM.format("l_extendedprice")} AS price_sum
         FROM lineitem GROUP BY 1 ORDER BY bucket""",

    "q43_conditional_agg" ->
      """SELECT o_orderpriority, COUNT(*) AS n_total,
         COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
         bool_and(o_totalprice > 0) AS all_positive,
         bool_or(o_totalprice > 450000) AS any_huge
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q44_gap_fill" ->
      """SELECT user_id, event_id, event_type,
           last_value(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_value
         FROM events WHERE user_id < 50
         ORDER BY user_id, event_id""",

    "q46_grouped_topk" ->
      """SELECT seg, rn, o_orderkey, o_totalprice FROM (
           SELECT c_mktsegment AS seg, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
               ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders JOIN customer ON o_custkey = c_custkey) t
         WHERE rn <= 3 ORDER BY seg, rn""",

    "q45_star_join" ->
      s"""SELECT r_name, n_name,
         ${DSUM.format("l_extendedprice * (1 - l_discount)")} AS revenue,
         COUNT(DISTINCT o_orderkey) AS n_orders
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name ORDER BY r_name, n_name""",

    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         ${DSUM.format("l_quantity")} AS sum_qty,
         ${DSUM.format("l_extendedprice")} AS sum_base_price,
         ${DSUM.format("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
         ${DSUM.format("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
         ${DSUM.format("l_quantity")} / COUNT(*) AS avg_qty,
         COUNT(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1997-09-01'
         GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
           AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
         ORDER BY l_orderkey, l_linenumber""",

    "q03_broadcast_join" ->
      s"""SELECT r_name, n_name, COUNT(*) AS n_customers,
         ${DSUM.format("c_acctbal")} AS sum_acctbal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name ORDER BY r_name, n_name""",

    "q04_join_agg" ->
      s"""SELECT o_orderpriority, COUNT(DISTINCT o_orderkey) AS n_orders,
         ${DSUM.format("l_extendedprice * (1 - l_discount)")} AS revenue
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q05_semi_join" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 250000)
         ORDER BY c_custkey""",

    "q06_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 350000)
         ORDER BY c_custkey""",

    "q07_outer_join_agg" ->
      s"""SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
         ${DSUM.format("COALESCE(o_totalprice, 0.0)")} AS total_spend
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey ORDER BY c_custkey""",

    "q08_window_topn" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) t
         WHERE rn <= 3 ORDER BY o_custkey, rn""",

    "q09_window_running" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
         FROM orders ORDER BY o_custkey, o_orderkey""",

    "q10_lag_lead" ->
      """SELECT user_id, event_id, value,
           LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
         FROM events ORDER BY user_id, event_id""",

    "q11_topk" ->
      s"""SELECT o_custkey, ${DSUM.format("o_totalprice")} AS spend, COUNT(*) AS n_orders
         FROM orders GROUP BY o_custkey
         ORDER BY spend DESC, o_custkey LIMIT 10""",

    "q12_rollup" ->
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
         ${DSUM.format("o_totalprice")} AS total
         FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
         ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""",

    "q13_cube" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n, ${DSUM.format("l_quantity")} AS qty
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",

    "q14_count_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS distinct_parts,
           COUNT(DISTINCT l_suppkey) AS distinct_supps, COUNT(*) AS n
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q15_setops" ->
      """WITH big AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > 200000),
            rich AS (SELECT DISTINCT c_custkey AS k FROM customer WHERE c_acctbal > 5000)
         SELECT k, 'both' AS tag FROM (SELECT k FROM big INTERSECT SELECT k FROM rich)
         UNION ALL SELECT k, 'only_big_orders' FROM (SELECT k FROM big EXCEPT SELECT k FROM rich)
         UNION ALL SELECT k, 'only_rich' FROM (SELECT k FROM rich EXCEPT SELECT k FROM big)
         ORDER BY tag, k""",

    "q16_string_funcs" ->
      """SELECT p_partkey, LOWER(p_name) AS name_lower,
           regexp_extract(p_brand, '(\d+)', 1) AS brand_num,
           split_part(p_type, ' ', 1) AS type_head,
           concat_ws('/', p_brand, p_type) AS brand_type,
           LENGTH(p_name) AS name_len
         FROM part ORDER BY p_partkey""",

    "q17_datetime" ->
      s"""SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month, COUNT(*) AS n,
         ${DSUM.format("o_totalprice")} AS total
         FROM orders GROUP BY 1 ORDER BY month""",

    "q18_pg_epoch" ->
      """SELECT event_id, epoch_us(ts) - 946684800000000 AS pg_epoch_us,
           make_timestamp(epoch_us(ts)) AS ts_roundtrip
         FROM events ORDER BY event_id""",

    "q19_json" ->
      s"""SELECT CAST(props->>'$$.k' AS INTEGER) % 10 AS k_mod, COUNT(*) AS n,
         ${DSUM.format("value")} AS sum_value
         FROM events GROUP BY 1 ORDER BY k_mod""",

    "q20_case_dispatch" ->
      s"""SELECT CASE WHEN event_type = 'click' THEN 'interaction'
                     WHEN event_type = 'view' THEN 'interaction'
                     WHEN event_type = 'error' THEN 'problem'
                     ELSE 'other' END AS bucket,
           COUNT(*) AS n, ${DSUM.format("value")} AS total_value
         FROM events GROUP BY 1 ORDER BY bucket""",

    "q21_tumbling_window" ->
      s"""SELECT date_trunc('hour', ts) AS ws, event_type, COUNT(*) AS n,
         ${DSUM.format("value")} AS total
         FROM events GROUP BY 1, 2 ORDER BY ws, event_type""",

    // same union + two-window bracketing as the Spark side; integer
    // numerator, one double division
    "q65_interpolate" ->
      """WITH ev0 AS (
           SELECT user_id, epoch_us(ts) AS t,
             CAST(round(value * 100) AS BIGINT) AS cents, event_id
           FROM events),
         ev AS (
           SELECT user_id, t, arg_min(cents, event_id) AS cents
           FROM ev0 GROUP BY user_id, t),
         gr AS (
           SELECT user_id,
             ((tmin + 3599999999) // 3600000000) * 3600000000 AS gs,
             (tmax // 3600000000) * 3600000000 AS ge
           FROM (SELECT user_id, MIN(t) AS tmin, MAX(t) AS tmax
                 FROM ev GROUP BY user_id) b),
         grid AS (
           SELECT user_id, unnest(range(gs, ge + 3600000000, 3600000000)) AS t
           FROM gr WHERE gs <= ge),
         u AS (
           SELECT user_id, t, 0 AS k, cents FROM ev
           UNION ALL
           SELECT user_id, t, 1 AS k, NULL AS cents FROM grid),
         w AS (
           SELECT user_id, t, k,
             last_value(CASE WHEN k = 0 THEN t END IGNORE NULLS) OVER fwd AS t0,
             last_value(CASE WHEN k = 0 THEN cents END IGNORE NULLS) OVER fwd AS v0,
             last_value(CASE WHEN k = 0 THEN t END IGNORE NULLS) OVER bwd AS t1,
             last_value(CASE WHEN k = 0 THEN cents END IGNORE NULLS) OVER bwd AS v1
           FROM u
           WINDOW
             fwd AS (PARTITION BY user_id ORDER BY t, k
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             bwd AS (PARTITION BY user_id ORDER BY t DESC, k
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT user_id, make_timestamp(t) AS ts_grid,
           round(CASE WHEN t1 = t0 THEN CAST(v0 AS DOUBLE) / 100.0
                 ELSE CAST(v0 * (t1 - t) + v1 * (t - t0) AS DOUBLE)
                      / (CAST(t1 - t0 AS DOUBLE) * 100.0) END, 6) AS v_interp
         FROM w WHERE k = 1 ORDER BY user_id, ts_grid""",

    // integer residual numerator, one final double division — same
    // operand order as the Spark side
    "q67_seasonal_anomaly" ->
      s"""WITH ev AS (
           SELECT event_id, event_type, CAST(hour(ts) AS INTEGER) AS hr,
             CAST(round(value * 100) AS BIGINT) AS cents
           FROM events),
         base AS (
           SELECT event_type, hr, CAST(SUM(cents) AS BIGINT) AS sum_cents,
             COUNT(*) AS n
           FROM ev GROUP BY event_type, hr)
         SELECT event_id, event_type, hr,
           round(CAST(cents AS DOUBLE) / 100.0, 2) AS value,
           round(CAST(sum_cents AS DOUBLE) / (CAST(n AS DOUBLE) * 100.0), 6) AS baseline,
           round(CAST(cents * n - sum_cents AS DOUBLE) / (CAST(n AS DOUBLE) * 100.0), 6) AS residual
         FROM ev JOIN base USING (event_type, hr)
         ORDER BY abs(CAST(cents * n - sum_cents AS DOUBLE) / (CAST(n AS DOUBLE) * 100.0)) DESC, event_id
         LIMIT 20""",

    // dyadic smoothing constants + left-fold recursions mirror the Spark
    // fold token-for-token; the recursive CTE steps once per series
    // element (~680 × 5 types), carrying the (l, b, s[24]) state and the
    // accumulated fitted list. The tail below q99's ev CTE is the shared
    // HoltWintersTailSql — cdc_forecast_serving anchors the same fold to
    // the wire-delivered event log.
    "q99_holt_winters" ->
      s"""WITH RECURSIVE ev AS (
           SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
             CAST(round(value * 100) AS BIGINT) AS cents
           FROM events),
         $HoltWintersTailSql""",

    // q99's CTEs + exact ceil-rank order statistics over the fit residuals
    "q101_forecast_bands" ->
      s"""WITH RECURSIVE ev AS (
           SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
             CAST(round(value * 100) AS BIGINT) AS cents
           FROM events),
         $HoltWintersCtesSql,
         hw AS (SELECT * FROM fits UNION ALL SELECT * FROM fc),
         $ConformalBandCtesSql
         SELECT h.event_type, h.t, h.yhat,
           round(h.yhat + b.r_lo, 6) AS lo, round(h.yhat + b.r_hi, 6) AS hi
         FROM hw h JOIN band b USING (event_type) WHERE h.kind = 'forecast'
         ORDER BY event_type, t""",

    // exact-integer window sums (RANGE ±12 on the hour index), one double
    // division per mean, t-ordered seasonal fold
    "q103_seasonal_decompose" ->
      s"""WITH ev AS (
           SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
             CAST(round(value * 100) AS BIGINT) AS cents
           FROM events),
         h0 AS (SELECT MIN(hr) AS h0 FROM ev),
         hourly AS (
           SELECT event_type, hr - (SELECT h0 FROM h0) AS t,
             CAST(SUM(cents) AS BIGINT) AS sc, COUNT(*) AS n
           FROM ev GROUP BY event_type, hr),
         win AS (
           SELECT event_type, t, sc, n,
             CAST(SUM(sc) OVER w AS BIGINT) AS wsc,
             CAST(SUM(n) OVER w AS BIGINT) AS wn,
             MIN(t) OVER (PARTITION BY event_type) AS tmin,
             MAX(t) OVER (PARTITION BY event_type) AS tmax
           FROM hourly
           WINDOW w AS (PARTITION BY event_type ORDER BY t
             RANGE BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
         dt AS (
           SELECT event_type, t, t % 24 AS hod,
             (CAST(sc AS DOUBLE) / (CAST(n AS DOUBLE) * 100.0)) -
             (CAST(wsc AS DOUBLE) / (CAST(wn AS DOUBLE) * 100.0)) AS detr
           FROM win WHERE t >= tmin + 12 AND t <= tmax - 12)
         SELECT event_type, hod, COUNT(*) AS n_obs,
           round(list_reduce(list(detr ORDER BY t), (a, b) -> a + b)
             / CAST(COUNT(*) AS DOUBLE), 6) AS seasonal
         FROM dt GROUP BY event_type, hod ORDER BY event_type, hod""",

    // same truncated-prefix fold + band + t-ordered MAE fold
    "q102_forecast_backtest" ->
      s"""WITH RECURSIVE ev0 AS (
           SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
             CAST(round(value * 100) AS BIGINT) AS cents
           FROM events),
         cut AS (SELECT MAX(hr) - 23 AS hcut FROM ev0),
         ev AS (SELECT * FROM ev0 WHERE hr < (SELECT hcut FROM cut)),
         $HoltWintersCtesSql,
         hw AS (SELECT * FROM fits UNION ALL SELECT * FROM fc),
         $ConformalBandCtesSql,
         fcb AS (
           SELECT h.event_type, h.t, h.yhat,
             h.yhat + b.r_lo AS lo, h.yhat + b.r_hi AS hi
           FROM hw h JOIN band b USING (event_type) WHERE h.kind = 'forecast'),
         h0x AS (SELECT MIN(hr) AS h0 FROM ev),
         actual AS (
           SELECT event_type, hr - (SELECT h0 FROM h0x) AS t,
             CAST(SUM(cents) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * 100.0) AS y
           FROM ev0 WHERE hr >= (SELECT hcut FROM cut)
           GROUP BY event_type, hr),
         j AS (
           SELECT f.event_type, f.t,
             CASE WHEN a.y >= f.lo AND a.y <= f.hi
               THEN 1::BIGINT ELSE 0::BIGINT END AS covered,
             abs(a.y - f.yhat) AS ae
           FROM fcb f JOIN actual a USING (event_type, t))
         SELECT event_type, COUNT(*) AS n_eval,
           CAST(SUM(covered) AS BIGINT) AS n_covered,
           round(list_reduce(list(ae ORDER BY t), (a, b) -> a + b)
             / CAST(COUNT(*) AS DOUBLE), 6) AS mae
         FROM j GROUP BY event_type ORDER BY event_type""",

    // exact bit-interleave mirror (bit b of custkey → 2b+1, of day → 2b)
    "q100_zorder_locality" ->
      s"""WITH o AS (
           SELECT o_custkey, epoch_us(o_orderdate) // 86400000000 AS day_abs
           FROM orders),
         d0 AS (SELECT MIN(day_abs) AS d0 FROM o),
         days AS (
           SELECT o_custkey, day_abs - (SELECT d0 FROM d0) AS day FROM o),
         keyed AS (
           SELECT o_custkey, day,
             list_reduce(list_transform(range(0, 16), b ->
               (((o_custkey >> b) & 1) << (2 * b + 1)) |
               (((day >> b) & 1) << (2 * b))),
               (a, b) -> a | b) AS zkey
           FROM days)
         SELECT (zkey * 16) // ((SELECT MAX(zkey) FROM keyed) + 1) AS bucket,
           COUNT(*) AS n,
           MIN(o_custkey) AS min_cust, MAX(o_custkey) AS max_cust,
           MIN(day) AS min_day, MAX(day) AS max_day,
           MIN(zkey) AS min_z, MAX(zkey) AS max_z
         FROM keyed GROUP BY bucket ORDER BY bucket""",

    // same md5-derived keep set (the Hash24 twin), DECIMAL-exact sums,
    // identical scale/compare ops → stable boolean
    "q70_universe_sample" ->
      s"""WITH keepo AS (
             SELECT * FROM orders
             WHERE (CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 6)) AS BIGINT) % 16) = 0),
           keepl AS (
             SELECT * FROM lineitem
             WHERE (CAST(concat('0x', substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 6)) AS BIGINT) % 16) = 0),
           ex AS (
             SELECT SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS rev_exact_d
             FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
           sm AS (
             SELECT SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS rev_s_d,
               COUNT(*) AS n_lineitems_sampled,
               COUNT(DISTINCT o_orderkey) AS n_orders_sampled
             FROM keepl JOIN keepo ON l_orderkey = o_orderkey)
         SELECT n_orders_sampled, n_lineitems_sampled,
           round(CAST(rev_s_d AS DOUBLE), 2) AS rev_sample,
           round(CAST(rev_s_d * 16 AS DOUBLE), 2) AS rev_scaled,
           round(CAST(rev_exact_d AS DOUBLE), 2) AS rev_exact,
           abs(CAST(rev_s_d * 16 AS DOUBLE) - CAST(rev_exact_d AS DOUBLE))
             <= CAST(rev_exact_d AS DOUBLE) * 0.15 AS within_15pct
         FROM sm CROSS JOIN ex""",

    "q71_attribution" ->
      """WITH t AS (
           SELECT user_id, ts, event_id, event_type, value,
             last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
           FROM events
           WHERE event_type IN ('click', 'view', 'signup', 'purchase'))
         SELECT COALESCE(touch, 'direct') AS channel,
           COUNT(*) AS n_purchases,
           round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS revenue
         FROM t WHERE event_type = 'purchase'
         GROUP BY 1 ORDER BY 1""",

    "q72_expectations" ->
      """WITH m AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_null_ship,
             CAST(COUNT(DISTINCT (l_orderkey, l_linenumber, l_partkey, l_suppkey)) AS BIGINT) AS n_pk,
             CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS v_qty,
             CAST(SUM(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R') THEN 1 ELSE 0 END) AS BIGINT) AS v_flag,
             CAST(SUM(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_price
           FROM lineitem),
         fk AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS v_fk FROM lineitem l
           WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
         SELECT check_name, n_violations, n_violations = 0 AS pass FROM (
           SELECT 'pk_unique' AS check_name, n - n_pk AS n_violations FROM m
           UNION ALL SELECT 'complete_shipdate', v_null_ship FROM m
           UNION ALL SELECT 'range_quantity', v_qty FROM m
           UNION ALL SELECT 'set_returnflag', v_flag FROM m
           UNION ALL SELECT 'nonneg_extendedprice', v_price FROM m
           UNION ALL SELECT 'fk_orders', v_fk FROM fk) r
         ORDER BY check_name""",

    // the oracle generates candidates from ALL shared trigrams (naive,
    // correct superset); the final tau filter decides membership on both
    // engines, so the Spark side's prefix filter is proven lossless by the
    // hash compare itself
    "q73_fuzzy_join" ->
      """WITH names AS (SELECT DISTINCT p_name AS nm FROM part),
         tg AS (
           SELECT DISTINCT nm AS k, substr(lower(nm), CAST(i AS INT), 3) AS t
           FROM names CROSS JOIN generate_series(1, 64) AS g(i)
           WHERE i <= length(nm) - 2),
         sz AS (SELECT k, COUNT(*) AS sz FROM tg GROUP BY k),
         pairs AS (
           SELECT a.k AS ka, b.k AS kb, COUNT(*) AS inter
           FROM tg a JOIN tg b ON a.t = b.t AND a.k < b.k GROUP BY 1, 2)
         SELECT ka AS name_a, kb AS name_b, CAST(inter AS BIGINT) AS n_shared,
           round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) AS trgm_sim
         FROM pairs JOIN sz sa ON ka = sa.k JOIN sz sb ON kb = sb.k
         WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.4
         ORDER BY name_a, name_b""",

    "q74_skew_profile" ->
      """WITH kc AS (SELECT l_orderkey, COUNT(*) AS m FROM lineitem GROUP BY 1),
         dist AS (SELECT m, COUNT(*) AS nk FROM kc GROUP BY m),
         c AS (SELECT m, nk,
             SUM(nk) OVER (ORDER BY m ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(nk) OVER () AS n
           FROM dist),
         cuts AS (SELECT
             MIN(CASE WHEN cum * 2 >= n THEN m END) AS p50_mult,
             MIN(CASE WHEN cum * 100 >= n * 99 THEN m END) AS p99_mult,
             MAX(m) AS max_mult,
             CAST(SUM(nk) AS BIGINT) AS n_keys,
             CAST(SUM(m * nk) AS BIGINT) AS n_rows
           FROM c),
         top AS (SELECT l_orderkey AS top_key, m AS top_key_rows FROM kc
                 ORDER BY m DESC, l_orderkey LIMIT 1)
         SELECT n_keys, n_rows, CAST(max_mult AS BIGINT) AS max_mult,
           CAST(p50_mult AS BIGINT) AS p50_mult,
           CAST(p99_mult AS BIGINT) AS p99_mult,
           top_key, CAST(top_key_rows AS BIGINT) AS top_key_rows,
           round(CAST(max_mult * n_keys AS BIGINT) / n_rows, 6) AS skew_ratio
         FROM cuts CROSS JOIN top""",

    // exact distincts pinned; the sketch-union estimate rides only in the
    // gated boolean (DuckDB cannot build DataSketches HLL bytes)
    "q77_hll_mergeable" ->
      """SELECT event_type,
           COUNT(DISTINCT date_trunc('week', ts)) AS n_weeks,
           COUNT(DISTINCT user_id) AS exact_distinct,
           TRUE AS est_within_5pct
         FROM events GROUP BY event_type ORDER BY event_type""",

    // the NAIVE overlap self-join over the same gaps-and-islands sessions;
    // the hash match proves the binned Spark plan lossless
    "q78_interval_bin_join" ->
      """WITH o AS (
           SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         g AS (
           SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM o),
         sess AS (
           SELECT user_id, epoch_us(MIN(ts)) AS s_us, epoch_us(MAX(ts)) AS e_us
           FROM g GROUP BY user_id, sid)
         SELECT a.user_id AS user_a, b.user_id AS user_b,
           COUNT(*) AS n_overlaps,
           CAST(SUM(LEAST(a.e_us, b.e_us) - GREATEST(a.s_us, b.s_us)) // 1000000 AS BIGINT) AS overlap_s
         FROM sess a JOIN sess b
           ON a.user_id < b.user_id AND a.s_us <= b.e_us AND b.s_us <= a.e_us
         GROUP BY 1, 2 ORDER BY user_a, user_b""",

    // exact integer numerator/denominator (HUGEINT), one double division
    "q79_acf" ->
      """WITH hourly AS (
           SELECT date_trunc('hour', ts) AS h, COUNT(*) AS x
           FROM events GROUP BY 1),
         tot AS (SELECT COUNT(*) AS n, SUM(x) AS sx FROM hourly),
         c AS (
           SELECT n * x - sx AS cx,
             n * lead(x, 1) OVER w - sx AS c1,
             n * lead(x, 2) OVER w - sx AS c2,
             n * lead(x, 3) OVER w - sx AS c3,
             n * lead(x, 6) OVER w - sx AS c6,
             n * lead(x, 12) OVER w - sx AS c12,
             n * lead(x, 24) OVER w - sx AS c24
           FROM hourly, tot WINDOW w AS (ORDER BY h)),
         d AS (SELECT SUM(CAST(cx AS HUGEINT) * cx) AS den FROM c)
         SELECT * FROM (
           SELECT 1 AS lag, COUNT(c1) AS n_pairs,
             round(CAST(SUM(CAST(cx AS HUGEINT) * c1) AS DOUBLE) / CAST(den AS DOUBLE), 6) AS acf FROM c, d GROUP BY den
           UNION ALL SELECT 2, COUNT(c2),
             round(CAST(SUM(CAST(cx AS HUGEINT) * c2) AS DOUBLE) / CAST(den AS DOUBLE), 6) FROM c, d GROUP BY den
           UNION ALL SELECT 3, COUNT(c3),
             round(CAST(SUM(CAST(cx AS HUGEINT) * c3) AS DOUBLE) / CAST(den AS DOUBLE), 6) FROM c, d GROUP BY den
           UNION ALL SELECT 6, COUNT(c6),
             round(CAST(SUM(CAST(cx AS HUGEINT) * c6) AS DOUBLE) / CAST(den AS DOUBLE), 6) FROM c, d GROUP BY den
           UNION ALL SELECT 12, COUNT(c12),
             round(CAST(SUM(CAST(cx AS HUGEINT) * c12) AS DOUBLE) / CAST(den AS DOUBLE), 6) FROM c, d GROUP BY den
           UNION ALL SELECT 24, COUNT(c24),
             round(CAST(SUM(CAST(cx AS HUGEINT) * c24) AS DOUBLE) / CAST(den AS DOUBLE), 6) FROM c, d GROUP BY den
         ) ORDER BY lag""",

    // integer cross-multiplied thresholds pick the ranks; one division
    // per share
    "q91_pareto_revenue" ->
      """WITH cr AS (
           SELECT o_custkey AS ck,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
           FROM orders GROUP BY 1),
         r AS (
           SELECT cents, ROW_NUMBER() OVER (ORDER BY cents DESC, ck) AS i,
             CAST(SUM(cents) OVER (ORDER BY cents DESC, ck
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
           FROM cr),
         tot AS (SELECT COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS s FROM cr),
         k80 AS (SELECT CAST(MIN(i) AS BIGINT) AS k80 FROM r, tot
                 WHERE CAST(cum AS HUGEINT) * 5 >= CAST(s AS HUGEINT) * 4),
         c10 AS (SELECT CAST(MAX(cum) AS BIGINT) AS c10 FROM r, tot
                 WHERE i * 10 <= n)
         SELECT n AS n_customers, k80,
           round(CAST(k80 AS DOUBLE) / n, 6) AS k80_share,
           round(CAST(c10 AS DOUBLE) / s, 6) AS top10pct_revenue_share
         FROM k80, c10, tot""",

    // pure integer numerators (rank-weighted sum, sum of squares), one
    // division per metric
    "q90_concentration" ->
      """WITH cr AS (
           SELECT o_custkey AS ck,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
           FROM orders GROUP BY 1),
         r AS (SELECT cents, ROW_NUMBER() OVER (ORDER BY cents, ck) AS i FROM cr),
         m AS (SELECT COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS s,
                 SUM(CAST(i AS HUGEINT) * cents) AS ws FROM r),
         g AS (
           SELECT n AS n_customers,
             round(CAST(ws * 2 - CAST((n + 1) AS HUGEINT) * s AS DOUBLE)
               / (CAST(n AS DOUBLE) * s), 6) AS gini
           FROM m),
         sr AS (
           SELECT l_suppkey,
             CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS c
           FROM lineitem GROUP BY 1),
         m2 AS (SELECT COUNT(*) AS n2, CAST(SUM(c) AS BIGINT) AS s2,
                  SUM(CAST(c AS HUGEINT) * c) AS ss FROM sr),
         h AS (
           SELECT n2 AS n_suppliers,
             round(CAST(ss AS DOUBLE) / (CAST(s2 AS DOUBLE) * s2) * 10000, 6) AS hhi
           FROM m2)
         SELECT n_customers, gini, n_suppliers, hhi FROM g, h""",

    // exact integer credits for first/last; linear shares are the same
    // fixed-order double expression rounded per row, decimal-summed
    "q92_multitouch_attribution" ->
      """WITH t AS (
           SELECT user_id, ts AS t_ts, event_id AS t_id, event_type AS t_type
           FROM events WHERE event_type IN ('view', 'click')),
         c AS (
           SELECT user_id, ts AS c_ts, event_id AS c_id,
             CAST(round(value * 100) AS BIGINT) AS cents
           FROM events WHERE event_type = 'purchase'),
         p AS (
           SELECT c.c_id, c.cents, c.c_ts, t.t_ts, t.t_id, t.t_type,
             (t.t_ts IS NOT NULL AND t.t_ts < c.c_ts
              AND t.t_ts >= c.c_ts - INTERVAL 24 HOUR) AS inwin
           FROM c LEFT JOIN t ON c.user_id = t.user_id),
         pc AS (
           SELECT c_id, cents,
             SUM(CASE WHEN inwin THEN 1 ELSE 0 END) AS n,
             (ARRAY_AGG(t_type ORDER BY t_ts, t_id) FILTER (WHERE inwin))[1] AS f_type,
             (ARRAY_AGG(t_type ORDER BY t_ts DESC, t_id DESC) FILTER (WHERE inwin))[1] AS l_type
           FROM p GROUP BY 1, 2),
         pct AS (SELECT c_id, t_type, COUNT(*) AS k FROM p WHERE inwin GROUP BY 1, 2),
         contrib AS (
           SELECT 'first_touch' AS model, COALESCE(f_type, 'none') AS touch_type,
             cents * 1000000 AS rev FROM pc
           UNION ALL
           SELECT 'last_touch', COALESCE(l_type, 'none'), cents * 1000000 FROM pc
           UNION ALL
           SELECT 'linear', pt.t_type,
             (pc2.cents * pt.k * 1000000) // pc2.n
           FROM pct pt JOIN pc pc2 USING (c_id)
           UNION ALL
           SELECT 'linear', 'none', cents * 1000000 FROM pc WHERE n = 0)
         SELECT model, touch_type, COUNT(*) AS n_rows,
           round(CAST(SUM(CAST(rev AS HUGEINT)) AS DOUBLE) / 100000000, 6) AS revenue
         FROM contrib GROUP BY 1, 2 ORDER BY 1, 2""",

    // exact integer µs deltas; order statistics via the 2·cum ≥ n cut
    "q93_time_to_convert" ->
      """WITH v AS (
           SELECT user_id, MIN(ts) AS t_view FROM events
           WHERE event_type = 'view' GROUP BY 1),
         pch AS (
           SELECT e.user_id, MIN(e.ts) AS t_p, MAX(v.t_view) AS t_view
           FROM events e JOIN v ON e.user_id = v.user_id
           WHERE e.event_type = 'purchase' AND e.ts > v.t_view
           GROUP BY 1),
         d AS (SELECT epoch_us(t_p) - epoch_us(t_view) AS d_us FROM pch),
         agg AS (SELECT COUNT(*) AS n, SUM(CAST(d_us AS HUGEINT)) AS ssum FROM d),
         w AS (
           SELECT d_us, SUM(c) OVER (ORDER BY d_us) AS cum
           FROM (SELECT d_us, COUNT(*) AS c FROM d GROUP BY 1) t),
         med AS (SELECT MIN(d_us) AS med_us FROM w, agg WHERE cum * 2 >= n),
         p90 AS (SELECT MIN(d_us) AS p90_us FROM w, agg WHERE cum * 10 >= n * 9)
         SELECT n AS n_converters,
           round(CAST(ssum AS DOUBLE) / n / 1000000.0, 6) AS mean_s,
           round(CAST(med_us AS DOUBLE) / 1000000.0, 6) AS median_s,
           round(CAST(p90_us AS DOUBLE) / 1000000.0, 6) AS p90_s
         FROM agg, med, p90""",

    // envelope gate (q76's convention): the randomized KLL quantiles stay
    // out of the hash; exact converter count + exact mean are pinned, the
    // rank-error booleans must be TRUE
    "q94_time_to_convert_kll" ->
      """WITH v AS (
           SELECT user_id, MIN(ts) AS t_view FROM events
           WHERE event_type = 'view' GROUP BY 1),
         pch AS (
           SELECT e.user_id, MIN(e.ts) AS t_p, MAX(v.t_view) AS t_view
           FROM events e JOIN v ON e.user_id = v.user_id
           WHERE e.event_type = 'purchase' AND e.ts > v.t_view
           GROUP BY 1),
         d AS (SELECT epoch_us(t_p) - epoch_us(t_view) AS d_us FROM pch),
         agg AS (SELECT COUNT(*) AS n, SUM(CAST(d_us AS HUGEINT)) AS ssum FROM d)
         SELECT n AS n_converters,
           round(CAST(ssum AS DOUBLE) / n / 1000000.0, 6) AS mean_s,
           TRUE AS p50_rank_ok, TRUE AS p90_rank_ok
         FROM agg""",

    // product-limit estimator over the hour-bucketed life table; the
    // running product folds the frame-ordered factor list left-to-right
    // (list_reduce's first-element seed ≡ Spark's 1.0 seed: 1.0·f1 = f1
    // exactly), matching the Spark FP chain bit-for-bit
    "q95_kaplan_meier" ->
      s"""WITH ${kmLifeTableCtes("")}
         $KmCurveTailSql""",

    // q95's life-table CTEs + the step-function integral: segment widths
    // from lead(t) clamped at the 168 h horizon, both sums fold t-sorted
    "q97_survival_summary" ->
      s"""WITH ${kmLifeTableCtes("")},
         km AS (
           SELECT t AS t_hours, n_risk, d AS n_events,
             round(list_reduce(fl, (a, b) -> a * b), 6) AS survival
           FROM s WHERE d > 0),
         seg AS (
           SELECT t_hours, survival,
             greatest(least(lead(t_hours, 1, 168) OVER (ORDER BY t_hours), 168)
               - t_hours, 0) AS width,
             CAST(n_events AS DOUBLE) / n_risk AS hz
           FROM km)
         SELECT
           round(CAST(least(MIN(t_hours), 168) AS DOUBLE) +
             list_reduce(list(survival * width ORDER BY t_hours),
               (a, b) -> a + b), 6) AS rmst_h,
           round(list_reduce(list(hz ORDER BY t_hours), (a, b) -> a + b), 6)
             AS cum_hazard,
           MIN(CASE WHEN survival <= 0.5 THEN t_hours END) AS median_h
         FROM seg""",

    // Aalen-Johansen cumulative incidence: any-cause KM factors, the
    // PRECEDING-frame product (empty frame ⇒ the exact 1.0 seed via
    // COALESCE, matching Spark's aggregate seed), per-cause hazard terms,
    // running-frame sums — all folds frame-ordered
    "q98_competing_risks" ->
      """WITH v AS (
           SELECT user_id, MIN(ts) AS t_view FROM events
           WHERE event_type = 'view' GROUP BY 1),
         fo AS (
           SELECT user_id, us, tpe FROM (
             SELECT e.user_id, epoch_us(e.ts) AS us, e.event_type AS tpe,
               ROW_NUMBER() OVER (PARTITION BY e.user_id
                 ORDER BY epoch_us(e.ts), e.event_id) AS rn
             FROM events e JOIN v ON e.user_id = v.user_id
             WHERE e.event_type IN ('purchase', 'error') AND e.ts > v.t_view) t
           WHERE rn = 1),
         cut AS (SELECT MIN(epoch_us(ts)) + 604800000000 AS cut_us FROM events),
         users AS (
           SELECT CASE WHEN f.us IS NOT NULL AND f.us <= cut_us THEN f.tpe
                       ELSE 'censored' END AS cause,
             CAST((CASE WHEN f.us IS NOT NULL AND f.us <= cut_us
                   THEN f.us - epoch_us(v.t_view)
                   ELSE cut_us - epoch_us(v.t_view) END) // 3600000000
               AS BIGINT) AS t
           FROM v LEFT JOIN fo f ON v.user_id = f.user_id, cut
           WHERE epoch_us(v.t_view) < cut_us),
         n_tot AS (SELECT COUNT(*) AS n FROM users),
         tbl AS (
           SELECT t,
             CAST(SUM(CASE WHEN cause = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS d1,
             CAST(SUM(CASE WHEN cause = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS d2,
             CAST(SUM(CASE WHEN cause = 'censored' THEN 1 ELSE 0 END) AS BIGINT) AS c
           FROM users GROUP BY t),
         r AS (
           SELECT t, d1, d2, c,
             CAST(n - COALESCE(SUM(d1 + d2 + c) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS n_risk
           FROM tbl, n_tot),
         f2 AS (
           SELECT *, 1.0 - CAST(d1 + d2 AS DOUBLE) / n_risk AS factor FROM r),
         sp AS (
           SELECT *, COALESCE(list_reduce(list(factor) OVER (ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             (a, b) -> a * b), 1.0) AS s_prev
           FROM f2),
         tm AS (
           SELECT *, s_prev * (CAST(d1 AS DOUBLE) / n_risk) AS term1,
             s_prev * (CAST(d2 AS DOUBLE) / n_risk) AS term2
           FROM sp),
         cf AS (
           SELECT *,
             list_reduce(list(term1) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), (a, b) -> a + b) AS cif1,
             list_reduce(list(term2) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), (a, b) -> a + b) AS cif2
           FROM tm)
         SELECT t AS t_hours, n_risk, d1 AS d_purchase, d2 AS d_error,
           round(cif1, 6) AS cif_purchase, round(cif2, 6) AS cif_error
         FROM cf WHERE d1 + d2 > 0 ORDER BY t_hours""",

    // two-arm life table on the shared hour grid; E1/V ride HUGEINT-exact
    // numerators with one double division per term (Spark's DECIMAL(38,0)
    // twin), both sums fold t-sorted left-to-right (q69's convention)
    "q96_logrank" ->
      """WITH v AS (
           SELECT user_id, MIN(ts) AS t_view FROM events
           WHERE event_type = 'view' GROUP BY 1),
         pch AS (
           SELECT e.user_id, MIN(e.ts) AS t_p
           FROM events e JOIN v ON e.user_id = v.user_id
           WHERE e.event_type = 'purchase' AND e.ts > v.t_view
           GROUP BY 1),
         cut AS (SELECT MIN(epoch_us(ts)) + 604800000000 AS cut_us FROM events),
         users AS (
           SELECT CASE WHEN
               (strpos('0123456789abcdef', substr(md5(CAST(v.user_id AS VARCHAR)), 1, 1)) - 1) * 16 +
               (strpos('0123456789abcdef', substr(md5(CAST(v.user_id AS VARCHAR)), 2, 1)) - 1) < 128
             THEN 'A' ELSE 'B' END AS arm,
             CASE WHEN p.t_p IS NOT NULL AND epoch_us(p.t_p) <= cut_us
                  THEN 1 ELSE 0 END AS status,
             CAST((CASE WHEN p.t_p IS NOT NULL AND epoch_us(p.t_p) <= cut_us
                   THEN epoch_us(p.t_p) - epoch_us(v.t_view)
                   ELSE cut_us - epoch_us(v.t_view) END) // 3600000000
               AS BIGINT) AS t
           FROM v LEFT JOIN pch p ON v.user_id = p.user_id, cut
           WHERE epoch_us(v.t_view) < cut_us),
         na AS (SELECT COUNT(*) AS n_a FROM users WHERE arm = 'A'),
         nb AS (SELECT COUNT(*) AS n_b FROM users WHERE arm = 'B'),
         tbl AS (
           SELECT t,
             CAST(SUM(CASE WHEN arm = 'A' THEN status ELSE 0 END) AS BIGINT) AS d1,
             CAST(SUM(CASE WHEN arm = 'A' THEN 1 - status ELSE 0 END) AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN arm = 'B' THEN status ELSE 0 END) AS BIGINT) AS d2,
             CAST(SUM(CASE WHEN arm = 'B' THEN 1 - status ELSE 0 END) AS BIGINT) AS c2
           FROM users GROUP BY t),
         r AS (
           SELECT t, d1, d2,
             CAST(n_a - COALESCE(SUM(d1 + c1) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n1,
             CAST(n_b - COALESCE(SUM(d2 + c2) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n2
           FROM tbl, na, nb),
         f AS (
           SELECT t, d1, n1, n2, d1 + d2 AS d, n1 + n2 AS nn
           FROM r WHERE d1 + d2 > 0),
         terms AS (
           SELECT t, d1,
             CAST(CAST(n1 AS HUGEINT) * d AS DOUBLE) / CAST(nn AS DOUBLE) AS e1,
             CASE WHEN nn > 1 THEN
               CAST(CAST(d AS HUGEINT) * (nn - d) * n1 * n2 AS DOUBLE) /
                 CAST(CAST(nn AS HUGEINT) * nn * (nn - 1) AS DOUBLE)
             ELSE 0.0 END AS vterm
           FROM f),
         agg AS (
           SELECT CAST(SUM(d1) AS BIGINT) AS o1,
             list_reduce(list(e1 ORDER BY t), (a, b) -> a + b) AS e1s,
             list_reduce(list(vterm ORDER BY t), (a, b) -> a + b) AS vs
           FROM terms)
         SELECT n_a, n_b, o1, round(e1s, 6) AS e1,
           round((CAST(o1 AS DOUBLE) - e1s) * (CAST(o1 AS DOUBLE) - e1s) / vs, 6) AS chi2,
           ((CAST(o1 AS DOUBLE) - e1s) * (CAST(o1 AS DOUBLE) - e1s) / vs) > 3.841 AS significant
         FROM agg, na, nb""",

    // integer-scaled CUSUM argmax, earliest-day tie-break
    "q88_cusum" ->
      """WITH daily AS (
           SELECT date_trunc('day', ts) AS day,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
           FROM events GROUP BY 1),
         c AS (
           SELECT day,
             ROW_NUMBER() OVER (ORDER BY day) AS i,
             SUM(x) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_i,
             COUNT(*) OVER () AS n,
             SUM(x) OVER () AS s_n
           FROM daily),
         t AS (
           SELECT day, CAST(i AS BIGINT) AS i, CAST(n AS BIGINT) AS n,
             CAST(s_i AS BIGINT) AS s_i, CAST(s_n AS BIGINT) AS s_n,
             abs(CAST(n AS HUGEINT) * s_i - CAST(i AS HUGEINT) * s_n) AS stat
           FROM c)
         SELECT CAST(day AS TIMESTAMP) AS change_day, n AS n_days, i AS k,
           CAST(stat AS DOUBLE) AS max_stat,
           round(CAST(s_i AS DOUBLE) / i, 6) AS mean_before,
           round(CAST(s_n - s_i AS DOUBLE) / (n - i), 6) AS mean_after
         FROM t ORDER BY stat DESC, day LIMIT 1""",

    // identical expected-share double literals on both engines (the
    // text_ndcg convention — no libm log10 inside either query)
    "q89_benford" ->
      """WITH li AS (
           SELECT substr(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS digit
           FROM lineitem),
         cnt AS (SELECT digit, COUNT(*) AS n FROM li GROUP BY digit),
         tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM cnt),
         e AS (
           SELECT digit, n, total,
             CASE digit WHEN '1' THEN 0.3010299956639812
               WHEN '2' THEN 0.17609125905568124
               WHEN '3' THEN 0.12493873660829993
               WHEN '4' THEN 0.09691001300805642
               WHEN '5' THEN 0.07918124604762482
               WHEN '6' THEN 0.06694678963061322
               WHEN '7' THEN 0.05799194697768673
               WHEN '8' THEN 0.05115252244738129
               WHEN '9' THEN 0.04575749056067514 END AS exp
           FROM cnt, tot)
         SELECT digit, n,
           round(CAST(n AS DOUBLE) / total, 6) AS share,
           round(exp, 6) AS expected,
           round(abs(CAST(n AS DOUBLE) / total - exp), 6) AS abs_dev
         FROM e ORDER BY digit""",

    // six exact co-moments, fixed-order theta/variance chains
    "q87_cuped" ->
      """WITH u AS (
           SELECT user_id,
             SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
                 THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS p,
             SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                 THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS q
           FROM events GROUP BY user_id),
         mo AS (
           SELECT COUNT(*) AS n, CAST(SUM(p) AS BIGINT) AS sp, CAST(SUM(q) AS BIGINT) AS sq,
             SUM(CAST(p AS HUGEINT) * p) AS spp, SUM(CAST(q AS HUGEINT) * q) AS sqq,
             SUM(CAST(p AS HUGEINT) * q) AS spq
           FROM u),
         st AS (
           SELECT n,
             CAST(CAST(n AS HUGEINT) * spp - CAST(sp AS HUGEINT) * sp AS DOUBLE)
               / (CAST(n AS DOUBLE) * (n - 1)) AS var_p,
             CAST(CAST(n AS HUGEINT) * sqq - CAST(sq AS HUGEINT) * sq AS DOUBLE)
               / (CAST(n AS DOUBLE) * (n - 1)) AS var_q,
             CAST(CAST(n AS HUGEINT) * spq - CAST(sp AS HUGEINT) * sq AS DOUBLE)
               / (CAST(n AS DOUBLE) * (n - 1)) AS cov_pq
           FROM mo),
         f AS (
           SELECT n, cov_pq / var_p AS theta, var_q,
             var_q - cov_pq * cov_pq / var_p AS var_adj
           FROM st)
         SELECT n, round(theta, 6) AS theta, round(var_q, 6) AS var_post,
           round(var_adj, 6) AS var_cuped,
           round(1.0 - var_adj / var_q, 6) AS var_reduction
         FROM f""",

    // the four cells' exact moments, token-identical mean/var/did/se chains
    "q86_diff_in_diff" ->
      """WITH obs AS (
           SELECT user_id,
             CASE WHEN
               (strpos('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) * 16 +
               (strpos('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR)), 2, 1)) - 1) < 128
               THEN 'A' ELSE 'B' END AS arm,
             CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 'pre' ELSE 'post' END AS period,
             SUM(CAST(round(value * 100) AS BIGINT)) AS m
           FROM events GROUP BY 1, 2, 3),
         cells AS (
           SELECT arm, period, COUNT(*) AS n, CAST(SUM(m) AS BIGINT) AS sx,
             SUM(CAST(m AS HUGEINT) * m) AS sxx
           FROM obs GROUP BY arm, period),
         one AS (
           SELECT
             MAX(CASE WHEN arm = 'A' AND period = 'pre' THEN n END) AS n_ap,
             MAX(CASE WHEN arm = 'A' AND period = 'pre' THEN sx END) AS sx_ap,
             MAX(CASE WHEN arm = 'A' AND period = 'pre' THEN sxx END) AS sxx_ap,
             MAX(CASE WHEN arm = 'A' AND period = 'post' THEN n END) AS n_aq,
             MAX(CASE WHEN arm = 'A' AND period = 'post' THEN sx END) AS sx_aq,
             MAX(CASE WHEN arm = 'A' AND period = 'post' THEN sxx END) AS sxx_aq,
             MAX(CASE WHEN arm = 'B' AND period = 'pre' THEN n END) AS n_bp,
             MAX(CASE WHEN arm = 'B' AND period = 'pre' THEN sx END) AS sx_bp,
             MAX(CASE WHEN arm = 'B' AND period = 'pre' THEN sxx END) AS sxx_bp,
             MAX(CASE WHEN arm = 'B' AND period = 'post' THEN n END) AS n_bq,
             MAX(CASE WHEN arm = 'B' AND period = 'post' THEN sx END) AS sx_bq,
             MAX(CASE WHEN arm = 'B' AND period = 'post' THEN sxx END) AS sxx_bq
           FROM cells),
         st AS (
           SELECT n_ap, n_aq, n_bp, n_bq,
             CAST(sx_ap AS DOUBLE) / n_ap AS m_ap,
             CAST(sx_aq AS DOUBLE) / n_aq AS m_aq,
             CAST(sx_bp AS DOUBLE) / n_bp AS m_bp,
             CAST(sx_bq AS DOUBLE) / n_bq AS m_bq,
             CAST(CAST(n_ap AS HUGEINT) * sxx_ap - CAST(sx_ap AS HUGEINT) * sx_ap AS DOUBLE)
               / (CAST(n_ap AS DOUBLE) * (n_ap - 1)) AS v_ap,
             CAST(CAST(n_aq AS HUGEINT) * sxx_aq - CAST(sx_aq AS HUGEINT) * sx_aq AS DOUBLE)
               / (CAST(n_aq AS DOUBLE) * (n_aq - 1)) AS v_aq,
             CAST(CAST(n_bp AS HUGEINT) * sxx_bp - CAST(sx_bp AS HUGEINT) * sx_bp AS DOUBLE)
               / (CAST(n_bp AS DOUBLE) * (n_bp - 1)) AS v_bp,
             CAST(CAST(n_bq AS HUGEINT) * sxx_bq - CAST(sx_bq AS HUGEINT) * sx_bq AS DOUBLE)
               / (CAST(n_bq AS DOUBLE) * (n_bq - 1)) AS v_bq
           FROM one),
         f AS (
           SELECT n_ap, n_aq, n_bp, n_bq, m_ap, m_aq, m_bp, m_bq,
             (m_aq - m_ap) - (m_bq - m_bp) AS did,
             sqrt(v_ap / n_ap + v_aq / n_aq + v_bp / n_bp + v_bq / n_bq) AS se
           FROM st)
         SELECT n_ap, n_aq, n_bp, n_bq,
           round(m_ap, 6) AS mean_a_pre, round(m_aq, 6) AS mean_a_post,
           round(m_bp, 6) AS mean_b_pre, round(m_bq, 6) AS mean_b_post,
           round(did, 6) AS did, round(se, 6) AS se,
           abs(did) > se * 1.96 AS significant
         FROM f""",

    // same sample predicate, same six exact integers, same IEEE chain
    "q85_sample_ci" ->
      """WITH li AS (
           SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
             (CAST(concat('0x', substr(md5(concat(CAST(l_orderkey AS VARCHAR), '-',
                CAST(l_linenumber AS VARCHAR))), 1, 6)) AS BIGINT) % 16) = 0 AS keep
           FROM lineitem),
         pop AS (SELECT COUNT(*) AS n_total, CAST(SUM(cents) AS BIGINT) AS sx_t FROM li),
         smp AS (SELECT COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS sx,
                   SUM(CAST(cents AS HUGEINT) * cents) AS sxx
                 FROM li WHERE keep),
         c AS (
           SELECT n_total, n,
             CAST(sx_t AS DOUBLE) / n_total AS exact_mean,
             CAST(sx AS DOUBLE) / n AS est_mean,
             CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
               / (CAST(n AS DOUBLE) * (n - 1)) AS s2
           FROM smp, pop),
         f AS (SELECT *, 1.96 * sqrt(s2 / n) AS half FROM c)
         SELECT n_total, n,
           round(exact_mean, 6) AS exact_mean_cents,
           round(est_mean, 6) AS est_mean_cents,
           round(half, 6) AS half_width_cents,
           abs(est_mean - exact_mean) <= half AS ci_covers_exact
         FROM f""",

    // first/last by (ts, event_id) rank, decimal-exact volume
    "q83_ohlc_bars" ->
      s"""WITH r AS (
           SELECT date_trunc('hour', ts) AS h, value,
             ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts)
               ORDER BY ts, event_id) AS rna,
             ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts)
               ORDER BY ts DESC, event_id DESC) AS rnd
           FROM events)
         SELECT CAST(h AS TIMESTAMP) AS h, COUNT(*) AS n_trades,
           MAX(CASE WHEN rna = 1 THEN value END) AS open,
           MAX(value) AS high, MIN(value) AS low,
           MAX(CASE WHEN rnd = 1 THEN value END) AS close,
           ${DSUM.format("value")} AS volume
         FROM r GROUP BY h ORDER BY h""",

    // integer cents throughout; the same 2·cum ≥ n lower-median cut on
    // both the value and the absolute-deviation distributions
    "q84_mad_outliers" ->
      """WITH ev AS (
           SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
           FROM events),
         d1 AS (SELECT event_type, cents, COUNT(*) AS nk FROM ev GROUP BY 1, 2),
         c1 AS (
           SELECT event_type, cents,
             SUM(nk) OVER (PARTITION BY event_type ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(nk) OVER (PARTITION BY event_type) AS n
           FROM d1),
         med AS (SELECT event_type, CAST(MIN(cents) AS BIGINT) AS med
                 FROM c1 WHERE cum * 2 >= n GROUP BY event_type),
         dev AS (
           SELECT ev.event_type, cents, med, abs(cents - med) AS adev
           FROM ev JOIN med ON ev.event_type = med.event_type),
         d2 AS (SELECT event_type, adev, COUNT(*) AS nk FROM dev GROUP BY 1, 2),
         c2 AS (
           SELECT event_type, adev,
             SUM(nk) OVER (PARTITION BY event_type ORDER BY adev
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(nk) OVER (PARTITION BY event_type) AS n
           FROM d2),
         mad AS (SELECT event_type, CAST(MIN(adev) AS BIGINT) AS mad
                 FROM c2 WHERE cum * 2 >= n GROUP BY event_type)
         SELECT dev.event_type, COUNT(*) AS n, MIN(med) AS med_cents,
           CAST(MIN(mad) AS BIGINT) AS mad_cents,
           CAST(SUM(CASE WHEN adev > mad * 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           round(CAST(SUM(CASE WHEN adev > mad * 3 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS outlier_share
         FROM dev JOIN mad ON dev.event_type = mad.event_type
         GROUP BY dev.event_type ORDER BY dev.event_type""",

    // token-identical formula chain over six exact integers
    "q82_ab_ttest" ->
      """WITH u AS (
           SELECT user_id, SUM(CAST(round(value * 100) AS BIGINT)) AS m
           FROM events GROUP BY user_id),
         ub AS (
           SELECT m, CASE WHEN
             (strpos('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) * 16 +
             (strpos('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR)), 2, 1)) - 1) < 128
             THEN 'A' ELSE 'B' END AS arm
           FROM u),
         arms AS (
           SELECT arm, COUNT(*) AS n, CAST(SUM(m) AS BIGINT) AS sx,
             SUM(CAST(m AS HUGEINT) * m) AS sxx
           FROM ub GROUP BY arm),
         a AS (SELECT n AS na, sx AS sxa, sxx AS sxxa FROM arms WHERE arm = 'A'),
         b AS (SELECT n AS nb, sx AS sxb, sxx AS sxxb FROM arms WHERE arm = 'B'),
         c AS (
           SELECT na, nb,
             CAST(sxa AS DOUBLE) / na AS mean_a,
             CAST(sxb AS DOUBLE) / nb AS mean_b,
             CAST(CAST(na AS HUGEINT) * sxxa - CAST(sxa AS HUGEINT) * sxa AS DOUBLE)
               / (CAST(na AS DOUBLE) * (na - 1)) AS va,
             CAST(CAST(nb AS HUGEINT) * sxxb - CAST(sxb AS HUGEINT) * sxb AS DOUBLE)
               / (CAST(nb AS DOUBLE) * (nb - 1)) AS vb
           FROM a, b),
         e AS (
           SELECT na, nb, mean_a, mean_b, va / na AS aa, vb / nb AS bb FROM c),
         f AS (
           SELECT na, nb, mean_a, mean_b,
             (mean_a - mean_b) / sqrt(aa + bb) AS t_stat,
             (aa + bb) * (aa + bb) /
               (aa * aa / (na - 1) + bb * bb / (nb - 1)) AS dof
           FROM e)
         SELECT na, nb, round(mean_a, 6) AS mean_a, round(mean_b, 6) AS mean_b,
           round(t_stat, 6) AS t_stat, round(dof, 6) AS dof,
           abs(t_stat) > 1.96 AS significant
         FROM f""",

    // DuckDB's vendored rapidfuzz jaro_winkler vs the engine's native
    // expression — 448 hash-compared values = a conformance suite
    "q81_jaro_entity" ->
      """WITH n AS (SELECT DISTINCT p_name AS nm FROM part),
         k AS (SELECT nm, split_part(nm, ' ', 1) AS k1,
                      split_part(nm, ' ', 2) AS k2 FROM n),
         cand AS (
           SELECT a.nm AS na, b.nm AS nb
           FROM k a JOIN k b ON a.nm < b.nm AND a.k1 = b.k1
           UNION
           SELECT a.nm, b.nm
           FROM k a JOIN k b ON a.nm < b.nm AND a.k2 = b.k2)
         SELECT na, nb,
           round(jaro_winkler_similarity(na, nb), 6) AS jw,
           round(jaro_winkler_similarity(na, nb), 6) >= 0.88 AS is_match
         FROM cand ORDER BY na, nb""",

    // exact decimal scores, standard ntile, one division per rate
    "q80_decile_lift" ->
      """WITH users AS (
           SELECT user_id, SUM(CAST(value AS DECIMAL(28,6))) AS score,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS pos
           FROM events GROUP BY user_id),
         ranked AS (
           SELECT *, ntile(10) OVER (ORDER BY score DESC, user_id) AS decile
           FROM users),
         dec AS (
           SELECT decile, COUNT(*) AS n_users, CAST(SUM(pos) AS BIGINT) AS n_pos
           FROM ranked GROUP BY decile),
         tot AS (SELECT CAST(SUM(n_users) AS BIGINT) AS tu,
                        CAST(SUM(n_pos) AS BIGINT) AS tp FROM dec),
         c AS (
           SELECT decile, n_users, n_pos,
             CAST(SUM(n_pos) OVER w AS BIGINT) AS cum_pos,
             CAST(SUM(n_users) OVER w AS BIGINT) AS cum_users
           FROM dec
           WINDOW w AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT CAST(decile AS INT) AS decile, n_users, n_pos,
           round(CAST(cum_pos AS DOUBLE) / tp, 6) AS cum_capture,
           round((CAST(cum_pos AS DOUBLE) / cum_users) / (CAST(tp AS DOUBLE) / tu), 6) AS cum_lift
         FROM c, tot ORDER BY decile""",

    // envelope gate: the randomized sketch's outputs stay out of the hash;
    // exact group sizes + interpolated median are pinned, the rank-error
    // booleans must be TRUE
    "q76_kll_quantiles" ->
      """SELECT l_returnflag, COUNT(*) AS n,
           round(quantile_cont(l_quantity, 0.5), 6) AS exact_p50,
           TRUE AS p50_rank_ok, TRUE AS p95_rank_ok
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    // one correctly-rounded division of exact int64 counts per cell
    "q75_markov_transitions" ->
      """WITH seq AS (
           SELECT user_id, event_type AS a,
             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS b
           FROM events),
         cnt AS (SELECT a, b, COUNT(*) AS c_ab FROM seq
                 WHERE b IS NOT NULL GROUP BY a, b),
         tot AS (SELECT a, CAST(SUM(c_ab) AS BIGINT) AS c_a FROM cnt GROUP BY a)
         SELECT cnt.a AS from_type, cnt.b AS to_type, c_ab, c_a,
           round(CAST(c_ab AS DOUBLE) / c_a, 6) AS p
         FROM cnt JOIN tot ON cnt.a = tot.a
         ORDER BY from_type, to_type""",

    // exact int64 cell ratios, one division per cell, sorted fold —
    // identical operand order as the Spark side
    "q69_chi_square" ->
      s"""WITH obs AS (
             SELECT event_type, CAST(hour(ts) AS INTEGER) AS hr, COUNT(*) AS o
             FROM events GROUP BY event_type, hr),
           rt AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS rt FROM obs GROUP BY event_type),
           ct AS (SELECT hr, CAST(SUM(o) AS BIGINT) AS ct FROM obs GROUP BY hr),
           n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs),
           cells AS (
             SELECT obs.event_type, obs.hr, obs.o,
               CAST(CAST(obs.o AS DECIMAL(38,0)) * CAST(n.n AS DECIMAL(38,0))
                     - CAST(rt.rt AS DECIMAL(38,0)) * CAST(ct.ct AS DECIMAL(38,0)) AS DOUBLE)
                 * CAST(CAST(obs.o AS DECIMAL(38,0)) * CAST(n.n AS DECIMAL(38,0))
                     - CAST(rt.rt AS DECIMAL(38,0)) * CAST(ct.ct AS DECIMAL(38,0)) AS DOUBLE)
                 / CAST(CAST(n.n AS DECIMAL(38,0)) * CAST(rt.rt AS DECIMAL(38,0))
                        * CAST(ct.ct AS DECIMAL(38,0)) AS DOUBLE) AS term
             FROM obs JOIN rt USING (event_type) JOIN ct USING (hr) CROSS JOIN n),
           dof AS (
             SELECT (COUNT(DISTINCT event_type) - 1) * (COUNT(DISTINCT hr) - 1) AS dof
             FROM cells)
         SELECT
           round(list_reduce(list(term ORDER BY event_type, hr), (a, b) -> a + b), 6) AS chi2,
           (SELECT dof FROM dof) AS dof,
           CAST(SUM(o) AS BIGINT) AS n_events
         FROM cells""",

    // integer counts, one double division per score — identical operand
    // order as the Spark side; rank on raw lift, (a, b) tiebreak
    "q68_market_basket" ->
      s"""WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
           n AS (SELECT COUNT(DISTINCT o) AS n_orders FROM op),
           pc AS (SELECT p, COUNT(*) AS c1 FROM op GROUP BY p),
           pairs AS (
             SELECT a.p AS part_a, b.p AS part_b, COUNT(*) AS c_ab
             FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
             GROUP BY a.p, b.p HAVING COUNT(*) >= 3)
         SELECT part_a, part_b, c_ab, c_a, c_b,
           round(CAST(c_ab AS DOUBLE) / CAST(n_orders AS DOUBLE), 6) AS support,
           round(CAST(c_ab AS DOUBLE) / CAST(c_a AS DOUBLE), 6) AS confidence,
           round(CAST(c_ab * n_orders AS DOUBLE) / CAST(c_a * c_b AS DOUBLE), 6) AS lift
         FROM (
           SELECT pr.part_a, pr.part_b, pr.c_ab, pa.c1 AS c_a, pb.c1 AS c_b, n.n_orders
           FROM pairs pr JOIN pc pa ON pr.part_a = pa.p
                JOIN pc pb ON pr.part_b = pb.p CROSS JOIN n) x
         ORDER BY CAST(c_ab * n_orders AS DOUBLE) / CAST(c_a * c_b AS DOUBLE) DESC,
           part_a, part_b
         LIMIT 20""",

    // CEP pattern S N* P: negation via cumulative error count minus its
    // value at the last signup; pure integer arithmetic throughout
    "q66_pattern_match" ->
      s"""WITH st AS (
           SELECT user_id, event_id, ts, event_type,
             SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) OVER w AS cum_err,
             last_value(CASE WHEN event_type = 'signup' THEN ts END IGNORE NULLS)
               OVER w AS signup_ts
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         st2 AS (
           SELECT *,
             last_value(CASE WHEN event_type = 'signup' THEN cum_err END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS signup_err
           FROM st)
         SELECT user_id, signup_ts, ts AS purchase_ts,
           (epoch_us(ts) - epoch_us(signup_ts)) // 1000000 AS gap_sec
         FROM st2
         WHERE event_type = 'purchase' AND signup_ts IS NOT NULL
           AND epoch_us(ts) - epoch_us(signup_ts) <= 1800000000
           AND cum_err = signup_err
         ORDER BY user_id, purchase_ts""",

    // each event belongs to the two 5-min-aligned window starts covering
    // it; time_bucket origins are midnight-aligned like Spark's
    // epoch-aligned window(), and 5 min divides a day evenly
    "q64_hopping_window" ->
      s"""SELECT ws, event_type, COUNT(*) AS n, ${DSUM.format("value")} AS total
         FROM (
           SELECT time_bucket(INTERVAL '5 minutes', ts)
                    - INTERVAL '5 minutes' * k AS ws,
             event_type, value
           FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) kk) t
         GROUP BY ws, event_type ORDER BY ws, event_type""",

    "q63_table_profile" ->
      """SELECT * FROM (
           SELECT 'o_orderkey' AS col_name, COUNT(o_orderkey) AS n_nonnull,
             COUNT(*) - COUNT(o_orderkey) AS n_null,
             COUNT(DISTINCT o_orderkey) AS n_distinct,
             CAST(MIN(o_orderkey) AS VARCHAR) AS min_s,
             CAST(MAX(o_orderkey) AS VARCHAR) AS max_s FROM orders
           UNION ALL
           SELECT 'o_custkey', COUNT(o_custkey), COUNT(*) - COUNT(o_custkey),
             COUNT(DISTINCT o_custkey),
             CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
           FROM orders
           UNION ALL
           SELECT 'o_orderstatus', COUNT(o_orderstatus),
             COUNT(*) - COUNT(o_orderstatus), COUNT(DISTINCT o_orderstatus),
             MIN(o_orderstatus), MAX(o_orderstatus) FROM orders
           UNION ALL
           SELECT 'o_totalprice', COUNT(o_totalprice),
             COUNT(*) - COUNT(o_totalprice), COUNT(DISTINCT o_totalprice),
             CAST(CAST(MIN(o_totalprice) AS DECIMAL(28,6)) AS VARCHAR),
             CAST(CAST(MAX(o_totalprice) AS DECIMAL(28,6)) AS VARCHAR)
           FROM orders
           UNION ALL
           SELECT 'o_orderdate', COUNT(o_orderdate),
             COUNT(*) - COUNT(o_orderdate), COUNT(DISTINCT o_orderdate),
             CAST(CAST(MIN(o_orderdate) AS DATE) AS VARCHAR),
             CAST(CAST(MAX(o_orderdate) AS DATE) AS VARCHAR) FROM orders
           UNION ALL
           SELECT 'o_orderpriority', COUNT(o_orderpriority),
             COUNT(*) - COUNT(o_orderpriority), COUNT(DISTINCT o_orderpriority),
             MIN(o_orderpriority), MAX(o_orderpriority) FROM orders) t
         ORDER BY col_name""",

    "q47_event_funnel" ->
      """WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events
                    WHERE event_type = 'view' GROUP BY user_id),
         c AS (SELECT e.user_id, MIN(e.ts) AS t_click
               FROM events e JOIN v ON e.user_id = v.user_id
               WHERE e.event_type = 'click' AND e.ts > v.t_view
               GROUP BY e.user_id),
         p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase
               FROM events e JOIN c ON e.user_id = c.user_id
               WHERE e.event_type = 'purchase' AND e.ts > c.t_click
               GROUP BY e.user_id)
         SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
           1 + CASE WHEN c.t_click IS NOT NULL THEN 1 ELSE 0 END
             + CASE WHEN p.t_purchase IS NOT NULL THEN 1 ELSE 0 END AS stage
         FROM v LEFT JOIN c ON v.user_id = c.user_id
                LEFT JOIN p ON v.user_id = p.user_id
         ORDER BY v.user_id""",

    "q48_cohort_retention" ->
      """WITH cohort AS (
           SELECT user_id, date_trunc('week', MIN(ts)) AS cw FROM events
           WHERE event_type = 'signup' GROUP BY user_id),
         sz AS (SELECT cw, COUNT(DISTINCT user_id) AS cohort_size FROM cohort GROUP BY cw),
         act AS (
           SELECT DISTINCT e.user_id, c.cw,
             CAST(date_diff('day', CAST(c.cw AS DATE),
                    CAST(date_trunc('week', e.ts) AS DATE)) / 7 AS INT) AS week_offset
           FROM events e JOIN cohort c ON e.user_id = c.user_id
           WHERE date_trunc('week', e.ts) >= c.cw),
         a2 AS (SELECT cw, week_offset, COUNT(*) AS n_active FROM act GROUP BY cw, week_offset)
         SELECT a2.cw AS cohort_week, week_offset, n_active, cohort_size,
           round(CAST(n_active AS DOUBLE) / cohort_size, 6) AS retention
         FROM a2 JOIN sz ON a2.cw = sz.cw
         ORDER BY cohort_week, week_offset""",

    "q50_rolling_distinct_approx" ->
      """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
         days AS (SELECT DISTINCT day AS d FROM du)
         SELECT d, COUNT(DISTINCT user_id) AS active_users_7d, TRUE AS within_bound
         FROM du JOIN days ON du.day BETWEEN d - 6 AND d
         GROUP BY d ORDER BY d""",

    "q49_rolling_distinct" ->
      """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
         days AS (SELECT DISTINCT day AS d FROM du)
         SELECT d, COUNT(DISTINCT user_id) AS active_users_7d
         FROM du JOIN days ON du.day BETWEEN d - 6 AND d
         GROUP BY d ORDER BY d""",

    "q22_asof_join" ->
      """SELECT event_id, user_id, ts, last_click_ts, last_click_value FROM (
           SELECT event_id, user_id, ts, event_type,
             MAX(CASE WHEN event_type = 'click' THEN ts END) OVER w AS last_click_ts,
             LAST_VALUE(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS) OVER w AS last_click_value
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) t
         WHERE event_type = 'error' ORDER BY event_id""",

    "q61_asof_nearest" ->
      """SELECT event_id, user_id, ts, nearest_click_ts, direction FROM (
           SELECT event_id, user_id, ts, event_type,
             CASE WHEN db IS NULL THEN fw WHEN df IS NULL THEN bk
                  WHEN db <= df THEN bk ELSE fw END AS nearest_click_ts,
             CASE WHEN db IS NULL AND df IS NULL THEN NULL
                  WHEN df IS NULL THEN 'b' WHEN db IS NULL THEN 'f'
                  WHEN db <= df THEN 'b' ELSE 'f' END AS direction
           FROM (
             SELECT *, epoch_us(ts) - epoch_us(bk) AS db,
               epoch_us(fw) - epoch_us(ts) AS df
             FROM (
               SELECT event_id, user_id, ts, event_type,
                 LAST_VALUE(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
                   OVER wb AS bk,
                 FIRST_VALUE(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
                   OVER wf AS fw
               FROM events
               WINDOW wb AS (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                      wf AS (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) a) b) c
         WHERE event_type = 'error' ORDER BY event_id""",

    "q23_latest_by_key" ->
      """SELECT user_id, event_id, event_type, value, ts FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
           FROM events) t
         WHERE rn = 1 ORDER BY user_id""",

    "q24_array_agg" ->
      """SELECT user_id, string_agg(event_type, '|' ORDER BY ts, event_id) AS types_in_order, COUNT(*) AS n
         FROM events GROUP BY user_id ORDER BY user_id""",

    "q25_grouping_sets" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n, ${DSUM.format("l_quantity")} AS qty
         FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",

    "q41_approx_top_k" ->
      """SELECT event_type AS item, COUNT(*) AS n
         FROM events GROUP BY event_type
         ORDER BY n DESC, item LIMIT 3""",

    "q39_salted_agg" ->
      """SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q40_salted_join" ->
      """SELECT n_name, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS sum_bal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name""",

    "q36_range_frame" ->
      """SELECT user_id, event_id, ts, n_last_hour, sum_last_hour FROM (
           SELECT user_id, event_id, ts,
             COUNT(*) OVER w AS n_last_hour,
             CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE) AS sum_last_hour
           FROM (SELECT user_id, event_id, ts, value,
                   epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS ts_s FROM events) e
           WINDOW w AS (PARTITION BY user_id ORDER BY ts_s
                        RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)) t
         ORDER BY user_id, ts, event_id""",

    "q37_distribution_rank" ->
      """SELECT event_type, event_id,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume
         FROM events WHERE user_id < 50
         WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
         ORDER BY event_type, event_id""",

    "q38_null_safe_join" ->
      """WITH e AS (
           SELECT event_id, event_type, user_id,
             CASE WHEN value > 0 THEN CAST(FLOOR(value / 100) AS BIGINT) END AS vkey
           FROM events),
         a AS (SELECT event_id AS a_id, vkey AS a_key FROM e WHERE event_type = 'error'),
         b AS (SELECT event_id AS b_id, vkey AS b_key FROM e
               WHERE event_type = 'purchase' AND user_id < 20)
         SELECT a_key, COUNT(*) AS n_pairs, MIN(a_id) AS min_a, MIN(b_id) AS min_b
         FROM a JOIN b ON a_key IS NOT DISTINCT FROM b_key
         GROUP BY a_key ORDER BY a_key ASC NULLS FIRST""",

    "q33_correlated_subquery" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer c
         WHERE CAST(c_acctbal AS DECIMAL(18,2)) *
               (SELECT COUNT(*) FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
             > (SELECT SUM(CAST(c3.c_acctbal AS DECIMAL(18,2))) FROM customer c3
                WHERE c3.c_nationkey = c.c_nationkey)
         ORDER BY c_custkey""",

    "q34_exists_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders o
         WHERE EXISTS (SELECT 1 FROM lineitem l
                       WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
           AND NOT EXISTS (SELECT 1 FROM lineitem l2
                           WHERE l2.l_orderkey = o.o_orderkey AND l2.l_returnflag = 'R')
         ORDER BY o_orderkey""",

    "q35_unpivot" ->
      """SELECT l_returnflag, measure, value FROM (
           SELECT l_returnflag,
             CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS price,
             CAST(SUM(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) AS disc
           FROM lineitem GROUP BY l_returnflag)
         UNPIVOT (value FOR measure IN (qty, price, disc))
         ORDER BY l_returnflag, measure""",

    // error-envelope oracle: exact counts + the expectation that Spark's
    // sketch stayed within bound (within_bound must come back TRUE)
    "q26_approx_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts,
           COUNT(*) AS n, TRUE AS within_bound
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q27_arg_extremes" ->
      """SELECT event_type, arg_max(event_id, ts) AS latest_event_id,
           arg_min(event_id, ts) AS earliest_event_id, MAX(ts) AS latest_ts
         FROM events GROUP BY event_type ORDER BY event_type""",

    "q29_range_join" ->
      s"""WITH weeks AS (SELECT DISTINCT date_trunc('week', ts) AS w_start FROM events)
         SELECT CAST(w_start AS TIMESTAMP) AS w_start, COUNT(*) AS n, ${DSUM.format("value")} AS total
         FROM events e JOIN weeks w
           ON e.ts >= w.w_start AND e.ts < w.w_start + INTERVAL 7 DAY
         GROUP BY 1 ORDER BY w_start""",

    "q30_pivot" ->
      """SELECT user_id,
           COUNT(*) FILTER (event_type = 'click') AS click,
           COUNT(*) FILTER (event_type = 'view') AS view,
           COUNT(*) FILTER (event_type = 'error') AS error,
           COUNT(*) FILTER (event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (event_type = 'signup') AS signup
         FROM events GROUP BY user_id ORDER BY user_id""",

    "q32_setops_all" ->
      """WITH a AS (SELECT l_returnflag AS f, l_linenumber AS ln FROM lineitem WHERE l_quantity < 10),
            b AS (SELECT l_returnflag AS f, l_linenumber AS ln FROM lineitem WHERE l_quantity >= 30 AND l_quantity < 35)
         SELECT tag, f, ln, COUNT(*) AS n FROM (
           SELECT 'inter_all' AS tag, * FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
           UNION ALL
           SELECT 'except_all' AS tag, * FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)) t
         GROUP BY tag, f, ln ORDER BY tag, f, ln""",

    "q31_session_window" ->
      """WITH o AS (
           SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         g AS (
           SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM o)
         SELECT CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           CAST(MAX(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS session_end,
           user_id, COUNT(*) AS n
         FROM g GROUP BY user_id, sid ORDER BY user_id, session_start""",

    // error-envelope oracle (see the query comment): the booleans must come
    // back TRUE, proving the sketch held its bound
    "q28_stats_approx" ->
      """SELECT l_returnflag, COUNT(*) AS n,
           TRUE AS p50_within_1pct, TRUE AS p95_within_1pct
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q28_stats" ->
      """SELECT l_returnflag,
           round(stddev_samp(l_quantity), 6) AS sd_qty,
           round(var_samp(l_discount), 6) AS var_disc,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           round(quantile_cont(l_extendedprice, 0.5), 6) AS median_price,
           round(quantile_cont(l_extendedprice, 0.95), 6) AS p95_price
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
}
