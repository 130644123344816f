package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Analytic extensions of the relational surface: the full window-function
  * family (ranking, navigation, value-picking, distribution), grouping
  * sets, ordered statistics (exact percentiles), bivariate statistics,
  * full-outer joins, scalar subqueries, date parts, string functions, and
  * sessionization — rounding out SURVEY.md §2.4-2.8 with the built-in
  * operators the reference never needed but a complete engine must expose.
  *
  * Scale notes: every window partitions by a high-cardinality key
  * (customer/user), never an empty partition; scalar anchors (global avg,
  * corpus size) are 1-row aggregates broadcast-cross-joined; the full
  * outer join runs on pre-aggregated per-key rows, not raw fact tables.
  */
object Analytic {

  /** Full outer join of two pre-aggregated sides (per-nation customer and
    * supplier counts) — null-completing both directions. */
  val qFullJoin: Q = Q(
    "q_full_join",
    """SELECT coalesce(c.nk, s.nk) AS nationkey, c.customers, s.suppliers
      |FROM (SELECT c_nationkey AS nk, count(*) AS customers FROM customer GROUP BY nk) c
      |FULL JOIN (SELECT s_nationkey AS nk, count(*) AS suppliers FROM supplier GROUP BY nk) s
      |ON c.nk = s.nk""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d).groupBy(col("c_nationkey").as("c_nk"))
      .agg(count(lit(1)).as("customers"))
    val sup = Tables.supplier(s, d).groupBy(col("s_nationkey").as("s_nk"))
      .agg(count(lit(1)).as("suppliers"))
    c.join(sup, col("c_nk") === col("s_nk"), "full_outer")
      .select(coalesce(col("c_nk"), col("s_nk")).as("nationkey"),
        col("customers"), col("suppliers"))
  }

  /** GROUPING SETS: disjoint per-flag and per-status aggregates in one
    * pass (the general form behind rollup/cube). */
  val qGroupingSets: Q = Q(
    "q_grouping_sets",
    """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
      |  round(sum(l_extendedprice),2) AS sum_price
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"), round(sum("l_extendedprice"), 2).as("sum_price"))
  }

  /** Ranking/navigation/distribution window functions in one pass:
    * dense_rank, ntile, lead, percent_rank over per-customer price order. */
  val qWindowRank: Q = Q(
    "q_window_rank",
    """SELECT o_orderkey, o_custkey,
      |  dense_rank() OVER w AS price_rank,
      |  ntile(4) OVER w AS quartile,
      |  lead(o_orderkey) OVER w AS next_orderkey,
      |  round(percent_rank() OVER w, 4) AS pct
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d).select(
      col("o_orderkey"), col("o_custkey"),
      dense_rank().over(w).as("price_rank"),
      ntile(4).over(w).as("quartile"),
      lead("o_orderkey", 1).over(w).as("next_orderkey"),
      round(percent_rank().over(w), 4).as("pct"))
  }

  /** Value-picking window functions over the full partition frame:
    * first_value / last_value / nth_value of each customer's order
    * history in date order. */
  val qFirstLast: Q = Q(
    "q_first_last",
    """SELECT o_custkey, o_orderkey,
      |  first_value(o_orderkey) OVER w AS first_order,
      |  last_value(o_orderkey) OVER w AS last_order,
      |  nth_value(o_orderkey, 2) OVER w AS second_order
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, d).select(
      col("o_custkey"), col("o_orderkey"),
      first("o_orderkey").over(w).as("first_order"),
      last("o_orderkey").over(w).as("last_order"),
      nth_value(col("o_orderkey"), 2).over(w).as("second_order"))
  }

  /** Exact ordered statistics (interpolated percentiles — Spark
    * `percentile` ≡ DuckDB `quantile_cont`). */
  val qPercentiles: Q = Q(
    "q_percentiles",
    """SELECT l_returnflag,
      |  round(median(CAST(l_quantity AS DOUBLE)),4) AS med_qty,
      |  round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.9),4) AS p90_price,
      |  round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.1),4) AS p10_price
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      // one percentile buffer per column, not per requested quantile (the
      // exact agg buffers every value per group — at 100 TB the scale path
      // is approx_percentile; kept exact here for the oracle)
      .agg(
        round(expr("percentile(CAST(l_quantity AS DOUBLE), 0.5)"), 4).as("med_qty"),
        expr("percentile(CAST(l_extendedprice AS DOUBLE), array(0.9, 0.1))").as("pp"))
      .select(col("l_returnflag"), col("med_qty"),
        round(element_at(col("pp"), 1), 4).as("p90_price"),
        round(element_at(col("pp"), 2), 4).as("p10_price"))
  }

  /** Approximate ordered statistics — the 100 TB path next to
    * [[qPercentiles]]: `approx_percentile` keeps a fixed-size mergeable
    * quantile sketch per group (map-side combined like any hash
    * aggregate), where the exact form buffers EVERY value of the group in
    * one task. The sketch values are engine-specific, but the RANK-ERROR
    * bound is oracle-checkable: with accuracy 10000 the returned element's
    * rank is within n/10000 of the target, so it must lie between the
    * exact interpolated quantiles at q ± 0.01 (a 100× slack on the
    * guarantee). Spark emits the exact median plus ok50/ok90/ok99 flags;
    * the oracle emits the same exact median with literal 1s — a sketch
    * outside its bound hash-mismatches. AnalyticSpec pins the tighter
    * bound. */
  val qApproxPercentiles: Q = Q(
    "q_approx_percentiles",
    """SELECT event_type,
      |  round(quantile_cont(value, 0.5), 4) AS p50_exact,
      |  1 AS ok50, 1 AS ok90, 1 AS ok99
      |FROM events GROUP BY event_type""".stripMargin) { (s, d) =>
    // one exact-percentile buffer carrying every bound: [p49, p50, p51,
    // p89, p91, p98, p100] — both sketch and bounds come out of ONE
    // aggregate pass, flags are a post-agg projection
    def ok(apIdx: Int, loIdx: Int, hiIdx: Int) =
      when(element_at(col("ap"), apIdx).between(
        element_at(col("ex"), loIdx), element_at(col("ex"), hiIdx)), 1)
        .otherwise(0)
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(
        percentile_approx(col("value"),
          array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("ap"),
        expr("percentile(value, array(0.49, 0.5, 0.51, 0.89, 0.91, 0.98, 1.0))").as("ex"))
      .select(col("event_type"),
        round(element_at(col("ex"), 2), 4).as("p50_exact"),
        ok(1, 1, 3).as("ok50"), ok(2, 4, 5).as("ok90"), ok(3, 6, 7).as("ok99"))
  }

  /** Bench-only sketch path of [[qApproxPercentiles]]: ONLY the
    * `approx_percentile` aggregate — the plan a 100 TB run actually
    * executes (fixed-size mergeable sketch per group, ObjectHashAggregate,
    * map-side combined). The registry gate deliberately carries the exact
    * percentile alongside the sketch to oracle-check the rank-error bound,
    * which puts the gate's bench timing in the exact-percentile cost
    * class; this builder gives the sketch its own timing so the "approx"
    * row reports the cost the approximation exists to buy. Not a gate:
    * sketch values are engine-specific (no DuckDB oracle applies). */
  private[graft] def approxPercentilesSketch(
      s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(percentile_approx(col("value"),
        array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("ap"))
      .select(col("event_type"),
        element_at(col("ap"), 1).as("p50_approx"),
        element_at(col("ap"), 2).as("p90_approx"),
        element_at(col("ap"), 3).as("p99_approx"))

  /** Unpivot (melt) — the inverse of the pivot gate: a wide per-flag
    * aggregate narrowed to (key, metric, value) rows. Spark's native
    * `unpivot` is a zero-shuffle projection (each input row expands to
    * one output row per value column, no exchange); the oracle spells the
    * same reshape as a stacked UNION ALL. */
  val qUnpivot: Q = Q(
    "q_unpivot",
    """WITH w AS (
      |  SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty,
      |    round(sum(l_extendedprice), 2) AS sum_price,
      |    round(avg(l_discount), 4) AS avg_disc
      |  FROM lineitem GROUP BY 1)
      |SELECT l_returnflag, metric, value FROM (
      |  SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM w
      |  UNION ALL
      |  SELECT l_returnflag, 'sum_price', sum_price FROM w
      |  UNION ALL
      |  SELECT l_returnflag, 'avg_disc', avg_disc FROM w)""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_price"),
        round(avg("l_discount"), 4).as("avg_disc"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("avg_disc")),
        "metric", "value")
  }

  /** Table profiler — the data-quality audit every pipeline runs before
    * trusting a table: per-column null count, exact distinct count, and
    * min/max, stacked to one audit row per column. Min/max are cast
    * per-type to string forms both engines print identically (doubles via
    * DECIMAL(18,2) — raw double→string formatting diverges across
    * engines).
    *
    * Two aggregation passes, deliberately: a STRING-typed min/max buffer
    * is variable-width, which disqualifies HashAggregate — one such
    * aggregate would drag all 24 (including the 6-way-expanded exact
    * distincts) into interpreted SortAggregate, measured 3.7 s vs 1.6 s
    * at sf0.1. So pass 1 keeps every fixed-width aggregate (nulls,
    * distincts, numeric/date min-max) in codegen'd hash aggregation, and
    * pass 2 folds min/max of the two string columns alone over a scan
    * column-pruned to just those columns (at 100 TB: a small fraction of
    * the table's bytes). The 1-row results cross-join back together —
    * no shuffle moves row data at any point. At 100 TB the same plan
    * holds with `approx_count_distinct` swapped in; exact distincts kept
    * here for the oracle. */
  val qProfile: Q = Q(
    "q_profile", {
      def one(c: String, minMax: String => String) =
        s"""SELECT '$c' AS col, count(*) - count($c) AS n_nulls,
           |  count(DISTINCT $c) AS n_distinct,
           |  ${minMax(s"min($c)")} AS min_val, ${minMax(s"max($c)")} AS max_val
           |FROM orders""".stripMargin
      val str = (e: String) => s"CAST($e AS VARCHAR)"
      val dec = (e: String) => s"CAST(CAST($e AS DECIMAL(18,2)) AS VARCHAR)"
      Seq(
        one("o_orderkey", str), one("o_custkey", str),
        one("o_orderstatus", str), one("o_totalprice", dec),
        one("o_orderdate", str), one("o_orderpriority", str))
        .mkString("\nUNION ALL\n")
    }) { (s, d) =>
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    val strCols = Set("o_orderstatus", "o_orderpriority")
    def minMax(c: String, e: org.apache.spark.sql.Column) =
      if (c == "o_totalprice") e.cast("decimal(18,2)").cast("string")
      else e.cast("string")
    val t = Tables.orders(s, d)
    // pass 1: every fixed-width-buffer aggregate, codegen'd hash agg
    val hashAggs = cols.flatMap { c =>
      Seq((count(lit(1)) - count(col(c))).as(s"n_$c"),
        countDistinct(col(c)).as(s"d_$c")) ++
        (if (strCols(c)) Nil
         else Seq(minMax(c, min(col(c))).as(s"mn_$c"),
           minMax(c, max(col(c))).as(s"mx_$c")))
    }
    // pass 2: string min/max fold alone (sort-agg path), pruned scan
    val strAggs = strCols.toSeq.sorted.flatMap { c =>
      Seq(min(col(c)).cast("string").as(s"mn_$c"),
        max(col(c)).cast("string").as(s"mx_$c"))
    }
    t.agg(hashAggs.head, hashAggs.tail: _*)
      .crossJoin(t.agg(strAggs.head, strAggs.tail: _*))
      .selectExpr(
        s"stack(${cols.size}, " +
          cols.map(c => s"'$c', n_$c, d_$c, mn_$c, mx_$c").mkString(", ") +
          ") AS (col, n_nulls, n_distinct, min_val, max_val)")
  }

  /** Semi-structured column parsing — the events table's `props` field is
    * a JSON string, the shape every real event log arrives in. Extraction
    * (`get_json_object`, codegen'd) happens in the narrow pre-aggregation
    * projection, so the JSON parse cost is one pass and the shuffle
    * carries only the extracted key — never raw JSON. At 100 TB the same
    * query reads a columnarized variant (or Spark 4's VARIANT type); the
    * logical shape is identical. */
  val qJsonExtract: Q = Q(
    "q_json_extract",
    """SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS kmod,
      |  count(*) AS cnt, round(sum(value), 2) AS sum_value
      |FROM events GROUP BY 1""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy((get_json_object(col("props"), "$.k").cast("long") % 10).as("kmod"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
  }

  /** Bivariate statistics: correlation, population covariance/variance. */
  val qCorrStats: Q = Q(
    "q_corr_stats",
    """SELECT l_returnflag,
      |  round(corr(l_quantity, l_extendedprice),4) AS qp_corr,
      |  round(covar_pop(l_quantity, l_extendedprice),2) AS qp_covar,
      |  round(var_pop(l_quantity),4) AS qty_var
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        round(corr("l_quantity", "l_extendedprice"), 4).as("qp_corr"),
        round(covar_pop("l_quantity", "l_extendedprice"), 2).as("qp_covar"),
        round(var_pop("l_quantity"), 4).as("qty_var"))
  }

  /** Scalar subquery anchor: rows above the global average, the anchor
    * computed once and broadcast (never a per-row correlated probe). */
  val qScalarSubquery: Q = Q(
    "q_scalar_subquery",
    """SELECT o_orderpriority, count(*) AS above_avg_orders
      |FROM orders WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
      |GROUP BY o_orderpriority""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
    val anchor = o.agg(avg("o_totalprice").as("global_avg"))
    o.crossJoin(broadcast(anchor))
      .filter(col("o_totalprice") > col("global_avg"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("above_avg_orders"))
  }

  /** Date-part extraction and aggregation by calendar month. */
  val qDateParts: Q = Q(
    "q_date_parts",
    """SELECT year(ts) AS y, month(ts) AS m, count(*) AS cnt,
      |  min(day(ts)) AS first_dom, max(day(ts)) AS last_dom
      |FROM events GROUP BY y, m""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(year(col("ts")).as("y"), month(col("ts")).as("m"))
      .agg(count(lit(1)).as("cnt"),
        min(dayofmonth(col("ts"))).as("first_dom"),
        max(dayofmonth(col("ts"))).as("last_dom"))
  }

  /** String-function family: case mapping, length, substring, padding,
    * containment — aggregated per segment so the surface stays small. */
  val qStringFuncs: Q = Q(
    "q_string_funcs",
    """SELECT lower(c_mktsegment) AS segment, count(*) AS cnt,
      |  min(length(c_name)) AS min_name_len,
      |  max(substring(c_name, 10, 4)) AS max_name_suffix,
      |  min(lpad(CAST(c_custkey AS VARCHAR), 8, '0')) AS min_padded_key,
      |  count(CASE WHEN contains(c_name, '11') THEN 1 END) AS names_with_11
      |FROM customer GROUP BY segment""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .groupBy(lower(col("c_mktsegment")).as("segment"))
      .agg(
        count(lit(1)).as("cnt"),
        min(length(col("c_name"))).as("min_name_len"),
        max(substring(col("c_name"), 10, 4)).as("max_name_suffix"),
        min(lpad(col("c_custkey").cast("string"), 8, "0")).as("min_padded_key"),
        count(when(col("c_name").contains("11"), 1)).as("names_with_11"))
  }

  /** Sessionization: a gap over 30 minutes starts a new session; the
    * session id is the running sum of session-start flags — two windows
    * and two aggregates, all partitioned by user. */
  val qSessionize: Q = Q(
    "q_sessionize",
    """WITH g AS (SELECT user_id, ts, event_id,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |      OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
      |    THEN 1 ELSE 0 END AS new_s
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (SELECT user_id,
      |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM g),
      |c AS (SELECT user_id, session_id, count(*) AS n FROM s GROUP BY user_id, session_id)
      |SELECT user_id, count(*) AS sessions, max(n) AS max_session_events
      |FROM c GROUP BY user_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("gap_ms", unix_millis(col("ts")) - lag(unix_millis(col("ts")), 1).over(w))
      .withColumn("new_s", when(col("gap_ms").isNull || col("gap_ms") > 1800000L, 1L).otherwise(0L))
      .withColumn("session_id", sum("new_s").over(wRun))
      .groupBy("user_id", "session_id").agg(count(lit(1)).as("n"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("sessions"), max("n").as("max_session_events"))
  }

  /** Native session windows — Spark's `session_window()` operator (the
    * same operator that powers STREAMING session aggregation, merging
    * dynamic-gap windows inside the aggregate) emitting the session
    * intervals themselves, where [[qSessionize]] pins the window-cumsum
    * formulation's per-user counts. The oracle mirrors the engine's merge
    * rule exactly: a new session starts at gap ≥ 30 min in MICROSECONDS
    * (session_window merges on strictly-less-than-gap; an epoch_ms oracle
    * would mis-bucket sub-millisecond boundary gaps), and session_end is
    * last-event + gap by definition. One shuffle on user_id. */
  val qSessionWindow: Q = Q(
    "q_session_window",
    """WITH g AS (SELECT user_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |      OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
      |    THEN 1 ELSE 0 END AS new_s
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |s AS (SELECT user_id, ts, value,
      |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM g)
      |SELECT user_id, min(ts) AS session_start,
      |  max(ts) + INTERVAL 30 MINUTE AS session_end,
      |  count(*) AS n_events, round(sum(value), 2) AS session_value
      |FROM s GROUP BY user_id, session_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("session_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("session_value"))
  }

  /** Forward as-of join: for each purchase, the user's NEXT click at-or-
    * after it — the mirror of [[Relational.qAsOfJoin]], via an
    * ignore-nulls first() over the following frame. Same scale shape: one
    * shuffle on user_id, no correlated probes. */
  val qAsOfForward: Q = Q(
    "q_asof_forward",
    """SELECT event_id, user_id, ts,
      |  (SELECT min(e2.ts) FROM events e2 WHERE e2.user_id = e.user_id
      |     AND e2.event_type = 'click'
      |     AND (e2.ts > e.ts OR (e2.ts = e.ts AND e2.event_id >= e.event_id)))
      |    AS next_click_ts
      |FROM events e WHERE event_type = 'purchase'""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    Tables.events(s, d)
      .withColumn("click_ts", when(col("event_type") === "click", col("ts")))
      .withColumn("next_click_ts", first("click_ts", ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "next_click_ts")
  }

  /** The reference's stats fold as a typed Aggregator (SURVEY §2.10 G2),
    * applied per event_type over the event values — same numbers as the
    * built-in agg path ([[Relational.qStats]] proves those against the
    * oracle); this gates the custom partial/merge implementation. */
  val qTypedStats: Q = Q(
    "q_typed_stats",
    // The oracle mirrors the aggregator's EXACT arithmetic: integer moment
    // sums (exact in BIGINT for these inputs), then the same IEEE-double
    // expression sqrt(n*sumSq - sum*sum)/n the finish() runs. DuckDB's own
    // stddev_pop uses a compensated stream that differs in the 4th rounded
    // decimal for some groups (CORRECTNESS_r02: hash_match=false) — two
    // correct algorithms, different last-ulp; bit-parity needs one formula.
    // CAST(s AS BIGINT): DuckDB's sum(BIGINT) widens to HUGEINT, which the
    // driver's pandas bridge surfaces as double — same digits, different
    // type hash vs Spark's BIGINT (CORRECTNESS_r03: values matched by hand).
    """SELECT event_type, n AS cnt, CAST(s AS BIGINT) AS sum_value,
      |  round(CAST(s AS DOUBLE) / n, 4) AS mean_value,
      |  round(sqrt(CAST(n AS DOUBLE) * CAST(sq AS DOUBLE)
      |             - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) / n, 4) AS stddev_value
      |FROM (
      |  SELECT event_type, count(value) AS n, sum(value) AS s,
      |         sum(value * value) AS sq
      |  FROM (SELECT event_type, CAST(floor(value) AS BIGINT) AS value FROM events)
      |  GROUP BY event_type)""".stripMargin) { (s, d) =>
    import s.implicits._
    val agg = graft.functions.StatsAggregator.ofLong.toColumn
    Tables.events(s, d)
      // floor before the long cast: Spark's double→long cast truncates
      // while DuckDB's rounds — floor makes both engines agree.
      .select(col("event_type"), floor(col("value")).cast("long").as("value"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.name("stats"))
      .select(
        col("key").as("event_type"),
        col("stats.cnt").as("cnt"),
        col("stats.sum").as("sum_value"),
        round(col("stats.mean"), 4).as("mean_value"),
        round(col("stats.stddevPop"), 4).as("stddev_value"))
  }

  /** RANGE-frame window: per user, the rolling 10-minute event count and
    * value sum — a TIME-bounded frame (peers by event-time seconds), not
    * a row-bounded one, which is the frame kind every rolling-metric
    * query needs and the only frame family the other window gates don't
    * exercise. Partitioned by user (high cardinality), epoch-second
    * ordering shared with the oracle. */
  val qRollingWindow: Q = Q(
    "q_rolling_window",
    """SELECT event_id, user_id, secs,
      |  count(*) OVER w AS rolling_cnt,
      |  round(sum(value) OVER w, 2) AS rolling_sum
      |FROM (SELECT event_id, user_id, value,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS secs FROM events)
      |WINDOW w AS (PARTITION BY user_id ORDER BY secs
      |  RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("secs").rangeBetween(-600, 0)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("value"),
        unix_timestamp(col("ts")).as("secs"))
      .select(col("event_id"), col("user_id"), col("secs"),
        count(lit(1)).over(w).as("rolling_cnt"),
        round(sum("value").over(w), 2).as("rolling_sum"))
  }

  /** Funnel analysis — ordered-stage conversion (view → click →
    * purchase): per user the EARLIEST timestamp of each stage, then one
    * row of strictly-ordered conversion counts. The per-user collapse is
    * a single map-side-combined conditional-min aggregate (one shuffle on
    * user_id, payload three timestamps per user); the final count is a
    * 1-row reduction — no self-joins, no per-stage passes, so the plan
    * costs the same as one groupBy at any corpus size. */
  val qFunnel: Q = Q(
    "q_funnel",
    """WITH u AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
      |    min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
      |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
      |  FROM events GROUP BY user_id)
      |SELECT count(t_view) AS viewed,
      |  count(CASE WHEN t_click > t_view THEN 1 END) AS clicked_after_view,
      |  count(CASE WHEN t_buy > t_click AND t_click > t_view THEN 1 END)
      |    AS converted
      |FROM u""".stripMargin) { (s, d) =>
    def firstOf(t: String) = min(when(col("event_type") === t, col("ts")))
    Tables.events(s, d)
      .groupBy("user_id")
      .agg(firstOf("view").as("t_view"), firstOf("click").as("t_click"),
        firstOf("purchase").as("t_buy"))
      .agg(count(col("t_view")).as("viewed"),
        count(when(col("t_click") > col("t_view"), 1)).as("clicked_after_view"),
        count(when(col("t_buy") > col("t_click") && col("t_click") > col("t_view"), 1))
          .as("converted"))
  }

  /** Retention cohorts — users grouped by first-seen day, activity counted
    * per (cohort, day-offset): the training-corpus freshness/engagement
    * matrix. Two shuffles total: the per-user first-day aggregate and the
    * distinct (user, day) activity set join on user_id (a partitioned
    * big-big equi-join at scale — the cohort side is exactly one row per
    * user, NOT broadcast here so the plan shape is the 100 TB one). */
  val qRetention: Q = Q(
    "q_retention",
    """WITH first_day AS (
      |  SELECT user_id, min(CAST(ts AS DATE)) AS cohort
      |  FROM events GROUP BY user_id),
      |activity AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
      |SELECT cohort, CAST(datediff('day', cohort, day) AS BIGINT)
      |    AS offset_days, count(*) AS active_users
      |FROM activity JOIN first_day USING (user_id)
      |GROUP BY 1, 2""".stripMargin) { (s, d) =>
    val events = Tables.events(s, d)
    val firstDay = events.groupBy("user_id")
      .agg(min(to_date(col("ts"))).as("cohort"))
    val activity = events.select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    activity.join(firstDay, "user_id")
      .groupBy(col("cohort"),
        datediff(col("day"), col("cohort")).cast("long").as("offset_days"))
      .agg(count(lit(1)).as("active_users"))
  }

  /** SCD type-2 dimension build — each user's event-type timeline
    * collapsed into versioned validity intervals (gaps-and-islands):
    * consecutive same-type runs become one row with `valid_from`,
    * `valid_to` (next run's start; NULL = current) and a per-user version
    * number. This is how a 100 TB event log becomes a point-in-time
    * joinable dimension (the as-of join's natural build side). All three
    * windows partition by user_id (high cardinality) with a (ts,
    * event_id) total order; the run collapse is a hash aggregate on
    * (user, version) — one shuffle, reused by all window stages. */
  val qScd2: Q = Q(
    "q_scd2",
    """WITH marked AS (
      |  SELECT user_id, event_type, ts, event_id,
      |    CASE WHEN event_type = lag(event_type)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      THEN 0 ELSE 1 END AS chg
      |  FROM events),
      |runs AS (
      |  SELECT user_id, event_type, ts,
      |    sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS version
      |  FROM marked),
      |dim AS (
      |  SELECT user_id, event_type AS state, version,
      |    min(ts) AS valid_from, count(*) AS n_events
      |  FROM runs GROUP BY 1, 2, 3)
      |SELECT user_id, state, CAST(version AS BIGINT) AS version, valid_from,
      |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
      |    AS valid_to,
      |  n_events
      |FROM dim""".stripMargin) { (s, d) =>
    val order = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val marked = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("chg",
        when(col("event_type") === lag(col("event_type"), 1).over(order), 0)
          .otherwise(1))
    // the running sum's frame must match the oracle: rows-unbounded-preceding
    // over the same (ts, event_id) order
    val runs = marked.withColumn("version",
      sum(col("chg")).over(order.rowsBetween(Window.unboundedPreceding, 0)))
    val byVersion = Window.partitionBy("user_id").orderBy("version")
    runs.groupBy(col("user_id"), col("event_type").as("state"), col("version"))
      .agg(min(col("ts")).as("valid_from"), count(lit(1)).as("n_events"))
      .select(col("user_id"), col("state"), col("version"), col("valid_from"),
        lead(col("valid_from"), 1).over(byVersion).as("valid_to"),
        col("n_events"))
  }

  /** Point-in-time join — every event decorated with its user's [[qScd2]]
    * dimension state AT event time: the lookup that makes an SCD2 build
    * useful, and the correctness test of the whole temporal-dimension
    * story. Matching is half-open interval containment
    * (`valid_from <= ts < valid_to`, open-ended current version) rather
    * than a bare as-of, so shared-timestamp version boundaries resolve
    * deterministically (a zero-width interval matches nothing; the later
    * version takes the boundary instant). Plan shape: the dim build's
    * user-partitioned windows feed an equi-join on user_id with the
    * interval predicate as a residual — one co-partitioned shuffle pair,
    * no nested loop; per-user version counts are small by construction,
    * so the residual scan per key is bounded. */
  val qPitJoin: Q = Q(
    "q_pit_join",
    """WITH marked AS (
      |  SELECT user_id, event_type, ts, event_id,
      |    CASE WHEN event_type = lag(event_type)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      THEN 0 ELSE 1 END AS chg
      |  FROM events),
      |runs AS (
      |  SELECT user_id, event_type, ts,
      |    sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS version
      |  FROM marked),
      |dim AS (
      |  SELECT user_id, event_type AS state, version, min(ts) AS valid_from
      |  FROM runs GROUP BY 1, 2, 3),
      |scd AS (
      |  SELECT user_id, state, version, valid_from,
      |    lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
      |      AS valid_to
      |  FROM dim)
      |SELECT e.event_id, e.user_id, s.state, CAST(s.version AS BIGINT) AS version
      |FROM events e JOIN scd s ON e.user_id = s.user_id
      |  AND s.valid_from <= e.ts
      |  AND (s.valid_to IS NULL OR e.ts < s.valid_to)""".stripMargin) { (s, d) =>
    val dim = qScd2.build(s, d).select(
      col("user_id").as("d_user"), col("state"), col("version"),
      col("valid_from"), col("valid_to"))
    Tables.events(s, d).select(col("event_id"), col("user_id"), col("ts"))
      .join(dim, col("user_id") === col("d_user") &&
        col("valid_from") <= col("ts") &&
        (col("valid_to").isNull || col("ts") < col("valid_to")))
      .select(col("event_id"), col("user_id"), col("state"), col("version"))
  }

  /** Partial daily rollup of one events slice — the unit the incremental
    * merge combines: (event_type, day) → count + exact-DECIMAL value sum.
    * One map-side-combined hash aggregate; output cardinality = distinct
    * grouping keys, never row count. */
  def dailyRollup(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,6)")).as("sum_value"))

  /** Merge a delta slice's partial rollup into a base summary: full-outer
    * join on the grouping key, null-completing both sides. Sums run in
    * DECIMAL, not DOUBLE: decimal addition is exact and associative, so
    * partial aggregates merge bit-identically no matter how the data was
    * split between snapshots — the property that makes a summary table
    * maintainable at all (double sums drift by reassociation ulps on
    * every merge). Output sum type is pinned at DECIMAL(38,6) so repeated
    * merges (streaming maintenance) keep a stable schema. */
  def mergeRollup(base: org.apache.spark.sql.DataFrame,
      delta: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val b = base.withColumnsRenamed(Map("cnt" -> "b_cnt", "sum_value" -> "b_sum"))
    val dl = delta.withColumnsRenamed(Map("cnt" -> "d_cnt", "sum_value" -> "d_sum"))
    b.join(dl, Seq("event_type", "day"), "full_outer")
      .select(col("event_type"), col("day"),
        (coalesce(col("b_cnt"), lit(0L)) + coalesce(col("d_cnt"), lit(0L))).as("cnt"),
        (coalesce(col("b_sum"), lit(0).cast("decimal(28,6)")) +
          coalesce(col("d_sum"), lit(0).cast("decimal(28,6)")))
          .cast("decimal(38,6)").as("sum_value"))
  }

  /** Incremental rollup maintenance — a materialized daily summary kept
    * current by MERGING a delta batch's partial aggregate into the
    * historical one ([[mergeRollup]]), never by re-scanning history. At
    * 100 TB of events the nightly delta is all that fits a maintenance
    * window; this is the Spark shape of `MERGE INTO` on a summary table.
    * The gate's oracle is the DIRECT full aggregation: the merge must be
    * indistinguishable from recomputing over everything. Delta batch:
    * `event_id % 10 = 0`, the same deterministic stand-in `q_incr_dedup`
    * uses. The streaming twin is `streaming/StreamRollup`, which drives
    * the same merge per micro-batch. The merge arithmetic stays DECIMAL
    * (exact, associative); only the gate's OUTPUT column is
    * `round(CAST(x AS DOUBLE), 6)` on both engines — DECIMAL(38,*) is
    * HUGEINT-backed in DuckDB and hash-mismatches in the driver bridge
    * despite equal values (round-6 finding). */
  val qIncrRollup: Q = Q(
    "q_incr_rollup",
    """SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt,
      |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
      |    AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin) { (s, d) =>
    val events = Tables.events(s, d)
    mergeRollup(
      dailyRollup(events.filter(col("event_id") % 10 =!= 0)),
      dailyRollup(events.filter(col("event_id") % 10 === 0)))
      .select(col("event_type"), col("day"), col("cnt"),
        round(col("sum_value").cast("double"), 6).as("sum_value"))
  }

  /** Nearest-in-time join: for each purchase, the same user's click
    * nearest in ABSOLUTE time — both directions, ties to the earlier
    * side. Completes the temporal-align family (backward as-of
    * `q_asof_join`, forward `q_asof_forward`): sensor-fusion and
    * attribution pipelines align on nearest, not latest. One ignore-nulls
    * window pass each way over the SAME (user_id, ts, event_id) sort —
    * one shuffle, one sort, zero joins, zero correlated probes. "Before"
    * and "after" are defined by the (ts, event_id) TOTAL order (a click
    * at the identical timestamp with a lower id counts as before, at
    * distance 0), so tie placement is deterministic cross-engine.
    * Distances are integer microseconds — exact. Purchases with no click
    * anywhere in the user's history drop out. */
  val qNearestEvent: Q = Q(
    "q_nearest_event",
    """WITH ev AS (SELECT event_id, user_id, ts, event_type,
      |    CASE WHEN event_type = 'click' THEN epoch_us(ts) END AS c_us,
      |    CASE WHEN event_type = 'click' THEN event_id END AS c_id
      |  FROM events WHERE event_type IN ('purchase', 'click')),
      |d AS (SELECT *, epoch_us(ts) AS us,
      |    last_value(c_us IGNORE NULLS) OVER wp AS prev_us,
      |    last_value(c_id IGNORE NULLS) OVER wp AS prev_id,
      |    first_value(c_us IGNORE NULLS) OVER wn AS next_us,
      |    first_value(c_id IGNORE NULLS) OVER wn AS next_id
      |  FROM ev
      |  WINDOW wp AS (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |    wn AS (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
      |SELECT event_id, user_id, ts,
      |  CASE WHEN prev_us IS NOT NULL
      |      AND (next_us IS NULL OR us - prev_us <= next_us - us)
      |    THEN prev_id ELSE next_id END AS click_event_id,
      |  CASE WHEN prev_us IS NOT NULL
      |      AND (next_us IS NULL OR us - prev_us <= next_us - us)
      |    THEN us - prev_us ELSE next_us - us END AS dist_us,
      |  CASE WHEN prev_us IS NOT NULL
      |      AND (next_us IS NULL OR us - prev_us <= next_us - us)
      |    THEN 'before' ELSE 'after' END AS direction
      |FROM d WHERE event_type = 'purchase'
      |  AND (prev_us IS NOT NULL OR next_us IS NOT NULL)""".stripMargin) { (s, d) =>
    nearestEvent(Tables.events(s, d), "purchase", "click")
  }

  /** Nearest `bType` event per `aType` event of the same user — see
    * [[qNearestEvent]]. */
  def nearestEvent(events: DataFrame, aType: String, bType: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wp = w.rowsBetween(Window.unboundedPreceding, -1)
    val wn = w.rowsBetween(1, Window.unboundedFollowing)
    val pickPrev = col("prev_us").isNotNull &&
      (col("next_us").isNull || col("us") - col("prev_us") <= col("next_us") - col("us"))
    events.filter(col("event_type").isin(aType, bType))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        when(col("event_type") === bType, unix_micros(col("ts"))).as("c_us"),
        when(col("event_type") === bType, col("event_id")).as("c_id"))
      .withColumn("prev_us", last("c_us", ignoreNulls = true).over(wp))
      .withColumn("prev_id", last("c_id", ignoreNulls = true).over(wp))
      .withColumn("next_us", first("c_us", ignoreNulls = true).over(wn))
      .withColumn("next_id", first("c_id", ignoreNulls = true).over(wn))
      .filter(col("event_type") === aType)
      .filter(col("prev_us").isNotNull || col("next_us").isNotNull)
      .withColumn("us", unix_micros(col("ts")))
      .select(col("event_id"), col("user_id"), col("ts"),
        when(pickPrev, col("prev_id")).otherwise(col("next_id")).as("click_event_id"),
        when(pickPrev, col("us") - col("prev_us"))
          .otherwise(col("next_us") - col("us")).as("dist_us"),
        when(pickPrev, lit("before")).otherwise(lit("after")).as("direction"))
  }

  val all: Seq[Q] = Seq(
    qFullJoin, qGroupingSets, qWindowRank, qFirstLast, qPercentiles,
    qCorrStats, qScalarSubquery, qDateParts, qStringFuncs, qSessionize,
    qAsOfForward, qTypedStats, qRollingWindow, qIncrRollup,
    qFunnel, qRetention, qScd2, qPitJoin, qApproxPercentiles, qUnpivot,
    qSessionWindow, qProfile, qJsonExtract, qNearestEvent)
}
