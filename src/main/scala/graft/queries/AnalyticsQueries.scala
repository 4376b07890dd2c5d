package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{AsofJoin, Curation, Relational}
import graft.sources.Tables

/** Relational-analytics breadth (joins, windows, grouping sets, set ops,
  * semi/anti, scalar library, as-of join) over the star schema — operators
  * the reference lacks but a complete engine must cover. Dimension tables
  * are broadcast (region/nation/customer are tiny relative to facts at any
  * scale factor); fact-fact joins shuffle on their keys with AQE deciding
  * the rest.
  */
object AnalyticsQueries {

  private val Ts = "yyyy-MM-dd HH:mm:ss"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // One-pass exact covariance-matrix statistics over 4 lineitem
    // measures (integerized: dollars/percent so Σ|a·b| stays far under
    // 2^63 at any sf) — 10 pair rows from a single scan, no float sums.
    "q180_cov_matrix" -> ((s, d) =>
      Relational.covarianceStats(Tables.lineitem(s, d), Seq(
        "qty" -> col("l_quantity"),
        "price_usd" -> floor(col("l_extendedprice")),
        "disc_pct" -> floor(col("l_discount") * 100),
        "tax_pct" -> floor(col("l_tax") * 100)))),

    // Point-in-time feature spine (the feature-store training-matrix
    // contract): for every order, only STRICTLY-PRIOR history may leak in
    // — previous order price via lag, trailing-90-day prior order count
    // via an exclusive range window (same-day rows excluded by the
    // day-granularity bound), static dims broadcast. One keyed exchange
    // serves both windows; label rides along for the export.
    "q191_feature_spine" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"),
        expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
          .as("day"),
        floor(col("o_totalprice") * 100).cast("long").as("price_cents"))
      val wLag = Window.partitionBy(col("o_custkey"))
        .orderBy(col("day"), col("o_orderkey"))
      val wRange = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
        .rangeBetween(-90, -1)
      val c = Tables.customer(s, d).select(col("c_custkey"),
        floor(col("c_acctbal") * 100).cast("long").as("bal_cents"),
        col("c_mktsegment"))
      o.withColumn("prev_price_cents", lag(col("price_cents"), 1).over(wLag))
        .withColumn("n_prior_90d", count(lit(1)).over(wRange))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("day"),
          col("prev_price_cents"), col("n_prior_90d"),
          col("bal_cents"), col("c_mktsegment"),
          col("price_cents").as("label_cents"))
    }),

    // Quantile (percentile-rank) normalization per group — the
    // distribution-free feature transform: each customer's balance maps
    // to its within-nation percentile in exact ppm, (rank−1)·10⁶ div
    // (n−1), RANK so exact ties share a value. One keyed window pass.
    "q188_quantile_norm" -> ((s, d) => {
      val c = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"),
          floor(col("c_acctbal") * 100).cast("long").as("bal_cents"))
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("bal_cents"))
      c.withColumn("rnk", rank().over(w))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy(col("c_nationkey"))))
        .select(col("c_custkey"), col("c_nationkey").cast("long").as("nation"),
          col("bal_cents"),
          when(col("n") === 1, 0L)
            .otherwise(expr("(rnk - 1) * 1000000 div (n - 1)"))
            .as("pr_ppm"))
    }),

    // Benford first-significant-digit audit over order amounts — the
    // fabricated-data / unit-mix smell test. First digit via the integer
    // string head (no float log10, engine-exact); observed shares in ppm
    // against the Benford constants ⌊10⁶·log10(1+1/d)⌋ as literals.
    "q186_benford" -> ((s, d) => {
      val benford = Map(1 -> 301029L, 2 -> 176091L, 3 -> 124938L,
        4 -> 96910L, 5 -> 79181L, 6 -> 66946L, 7 -> 57991L,
        8 -> 51152L, 9 -> 45757L)
      val v = Tables.lineitem(s, d)
        .select(floor(col("l_extendedprice")).cast("long").as("v"))
        .filter(col("v") > 0)
      val counts = v
        .withColumn("digit", substring(col("v").cast("string"), 1, 1)
          .cast("long"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      val total = v.agg(count(lit(1)).as("_total"))
      val bppm = benford.foldLeft(lit(null).cast("long")) {
        case (acc, (dg, ppm)) =>
          when(col("digit") === dg.toLong, lit(ppm)).otherwise(acc)
      }
      counts.crossJoin(broadcast(total))
        .select(col("digit"), col("n"),
          expr("n * 1000000 div _total").as("obs_ppm"),
          bppm.as("benford_ppm"),
          abs(expr("n * 1000000 div _total") - bppm).as("dev_ppm"))
    }),

    // Star join: facts shuffle once on l_orderkey; all dims broadcast.
    "q14_star_join" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      val c = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
      val n = Tables.nation(s, d).select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      val r = Tables.region(s, d).select(col("r_regionkey"), col("r_name"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          sum(col("l_extendedprice").cast("decimal(12,2)") *
            (lit(1).cast("decimal(8,4)") - col("l_discount").cast("decimal(8,4)")))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // Top-k per group with rank pushdown (WindowGroupLimit).
    "q15_topk_per_group" -> ((s, d) =>
      Relational.topKPerGroup(
        Tables.orders(s, d).select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
        Seq(col("o_custkey")),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          col("rn").cast("long").as("rn"))),

    // ROLLUP grouping sets; 'ALL' marks the subtotal levels.
    "q16_rollup_agg" -> ((s, d) =>
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"),
          count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
          col("sum_qty"), col("n"))),

    // Set operations: customers with open vs finished orders.
    "q17_set_ops" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val open = o.filter(col("o_orderstatus") === "O")
        .select(col("o_custkey")).distinct()
      val fin = o.filter(col("o_orderstatus") === "F")
        .select(col("o_custkey")).distinct()
      Relational.setCompare(open, fin)
    }),

    // BAG (multiset) set operations — the ALL variants q17's DISTINCT
    // forms silently differ from: INTERSECT ALL keeps min(multiplicity)
    // per key, EXCEPT ALL keeps the positive multiplicity excess. A
    // classic engine-correctness trap (bag vs set semantics); Spark plans
    // both as one count-aggregate + replicate per side — keyed shuffles,
    // no distinct-then-join approximation.
    "q163_bag_ops" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val open = o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
      val fin = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      open.intersectAll(fin).groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n")).withColumn("tag", lit("common_min"))
        .unionByName(open.exceptAll(fin).groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n")).withColumn("tag", lit("open_excess")))
    }),

    // TPC-H Q7 shape (volume shipping between two nations): the 6-table
    // join where every dimension chain (supplier->nation, customer->
    // nation) broadcasts and ONLY lineitem JOIN orders shuffles — the
    // canonical star-to-snowflake plan at 100 TB. Exact decimal revenue
    // (q50 idiom), grouped by nation pair x ship year.
    "q164_nation_volume" -> ((s, d) => {
      val n1 = Tables.nation(s, d).select(col("n_nationkey").as("s_nationkey"),
        col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, d).select(col("n_nationkey").as("c_nationkey"),
        col("n_name").as("cust_nation"))
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"),
          col("l_extendedprice"), col("l_discount"))
        .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), Seq("s_nationkey"))
        .join(broadcast(n2), Seq("c_nationkey"))
        .filter((col("supp_nation") === "NATION_1"
            && col("cust_nation") === "NATION_2")
          || (col("supp_nation") === "NATION_2"
            && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1).cast("decimal(8,4)") - col("l_discount").cast("decimal(8,4)")))
          .cast("double").as("revenue"),
          count(lit(1)).as("n"))
    }),

    // Semi/anti join: customers with vs without urgent orders.
    "q18_semi_anti" -> ((s, d) => {
      val c = Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
      val urgent = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      val has = c.join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
        .withColumn("tag", lit("has_urgent"))
      val not = c.join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .withColumn("tag", lit("no_urgent"))
      has.unionByName(not)
    }),

    // Scalar function library sampler (strings, math, date parts) — every
    // expression chosen to be bit-deterministic across engines.
    "q19_scalar_sampler" -> ((s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        upper(col("o_orderpriority")).as("pri_upper"),
        lower(col("o_orderpriority")).as("pri_lower"),
        substring(col("o_orderpriority"), 3, 20).as("pri_name"),
        length(col("o_orderpriority")).cast("long").as("pri_len"),
        concat_ws("|", col("o_orderstatus"), col("o_orderpriority")).as("status_pri"),
        regexp_replace(col("o_orderpriority"), "[aA-zZ]+", "X").as("pri_masked"),
        (col("o_orderkey") % 97).as("key_mod"),
        abs(col("o_orderkey") - 1000).as("key_absdiff"),
        floor(col("o_totalprice")).cast("long").as("price_floor"),
        ceil(col("o_totalprice")).cast("long").as("price_ceil"),
        sqrt(col("o_totalprice")).as("price_sqrt"),
        year(col("o_orderdate")).cast("long").as("y"),
        quarter(col("o_orderdate")).cast("long").as("q"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        (dayofweek(col("o_orderdate")) - 1).cast("long").as("dow_sun0"))),

    // Window-function sampler: lag/lead/rank/dense_rank/running sum over each
    // customer's order timeline.
    "q20_window_funcs" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"))
      val wSeq = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val wRun = wSeq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wByDate = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"))
      o.select(
        col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), Ts).as("order_ts"),
        col("o_totalprice"),
        lag(col("o_totalprice"), 1).over(wSeq).as("prev_price"),
        lead(col("o_totalprice"), 1).over(wSeq).as("next_price"),
        row_number().over(wSeq).cast("long").as("order_seq"),
        rank().over(wByDate).cast("long").as("date_rank"),
        dense_rank().over(wByDate).cast("long").as("date_dense_rank"),
        sum(col("o_totalprice").cast("decimal(12,2)")).over(wRun)
          .cast("double").as("running_total"))
    }),

    // Exact interpolated percentiles (median/p90) per group.
    "q41_percentiles" -> ((s, d) =>
      Tables.orders(s, d).groupBy(col("o_orderstatus")).agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("med"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))),

    // Co-occurrence mining (market-basket): part pairs ordered together in
    // >= 2 DISTINCT orders. Relational.coOccurrence collects each order's
    // distinct part SET (one shuffle), expands pairs row-locally from the
    // sorted array, and counts — the set step makes count(*) equal
    // count(DISTINCT order), and the Σk² pair fan-out never crosses an
    // exchange (the self-join form it replaced shuffled lineitem twice).
    "q87_cooccurrence" -> ((s, d) =>
      graft.operators.Relational.coOccurrence(
        Tables.lineitem(s, d)
          .select(col("l_orderkey").as("ok"), col("l_partkey")),
        "ok", "l_partkey")
        .select(col("item_a").as("p1"), col("item_b").as("p2"),
          col("n_groups").as("n_orders"))
        .filter(col("n_orders") >= 2)),

    // Robust outlier detection (median/MAD rule, k=3) on order totals per
    // status — exact integer cents throughout, so the threshold comparison
    // is a BIGINT inequality that cannot drift between engines.
    "q89_mad_outliers" -> ((s, d) =>
      Curation.madOutliers(
        Tables.orders(s, d),
        col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long"), 3)
        .select(col("grp").as("o_orderstatus"), col("n_rows"),
          col("n_outliers"), col("med2"), col("mad4"))),

    // Sketch aggregates (HLL distinct, t-digest percentile): approximate by
    // design, so no hash oracle — driver rows-only; bounds asserted in
    // AnalyticsSpec.
    "q44_sketches" -> ((s, d) =>
      Tables.lineitem(s, d).agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        // accuracy 100: 10000 costs ~19 s and 1000 ~3 s on 600 K rows for a
        // <0.1% estimate gain (quantile-summary merge cost grows superlinearly)
        round(percentile_approx(col("l_quantity"), lit(0.5), lit(100)), 2)
          .as("approx_med_qty"))),

    // Conditional/selective aggregates: max_by/min_by (unique key so ties
    // cannot differ across engines), count_if.
    "q59_conditional_agg" -> ((s, d) =>
      Tables.orders(s, d).groupBy(col("o_orderstatus")).agg(
        max_by(col("o_orderpriority"), col("o_orderkey")).as("latest_pri"),
        min_by(col("o_orderpriority"), col("o_orderkey")).as("first_pri"),
        count_if(col("o_orderpriority") === "1-URGENT").as("n_urgent"),
        count_if(col("o_totalprice") > 250000).as("n_big"))),

    // Skew-salted join proven result-identical through the oracle gate:
    // the salted physical plan must hash-match DuckDB's PLAIN join.
    "q57_salted_join" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_quantity"))
      val o = Tables.orders(s, d)
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      Relational.saltedJoin(li, o, Seq("l_orderkey"), 8)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(12,2)")).cast("double")
            .as("sum_qty"))
    }),

    // Distribution window functions: percent_rank/cume_dist (exact rational
    // formulas, engine-identical) and ntile.
    "q55_distribution_windows" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d).select(
        col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        ntile(4).over(w).cast("long").as("quartile"))
    }),

    // TPC-H Q3 shape: top-10 revenue orders for one market segment with
    // date predicates (pushed to both fact scans).
    "q50_shipping_priority" -> ((s, d) => {
      val c = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") > lit("1996-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1).cast("decimal(8,4)") - col("l_discount").cast("decimal(8,4)")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), Ts).as("o_orderdate"), col("revenue"))
    }),

    // TPC-H Q5 shape: revenue by nation where customer and supplier share
    // the nation, one region, one year.
    "q51_local_supplier_volume" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"),
          col("l_discount"))
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      val c = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
      val su = Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
      val n = Tables.nation(s, d).select(col("n_nationkey"), col("n_name"),
        col("n_regionkey"))
      val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
        .select(col("r_regionkey"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1).cast("decimal(8,4)") - col("l_discount").cast("decimal(8,4)")))
          .cast("double").as("revenue"))
    }),

    // Correlated scalar subquery (Catalyst decorrelates to a join):
    // orders above 2x their customer's average price. All arithmetic
    // decimal-exact so the comparison is engine-deterministic.
    "q45_correlated_subquery" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT o_orderkey, o_custkey, o_totalprice
          |FROM orders_v o
          |WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
          |      (SELECT COUNT(*) FROM orders_v i WHERE i.o_custkey = o.o_custkey)
          |    > (SELECT 2 * SUM(CAST(o_totalprice AS DECIMAL(18,2)))
          |       FROM orders_v i WHERE i.o_custkey = o.o_custkey)""".stripMargin)
    }),

    // Null semantics: NULLIF / COALESCE / null-safe equality vs plain
    // equality (three-valued logic made visible).
    "q46_null_semantics" -> ((s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        nullif(col("o_orderstatus"), lit("P")).as("status_no_p"),
        coalesce(nullif(col("o_orderstatus"), lit("P")), lit("UNKNOWN"))
          .as("status_filled"),
        (nullif(col("o_orderstatus"), lit("P")) <=> lit(null))
          .as("is_p_nullsafe"),
        (nullif(col("o_orderstatus"), lit("P")) === lit("O")).as("eq_o_3vl"))),

    // Ordered string aggregation per group.
    "q47_string_agg" -> ((s, d) =>
      Tables.orders(s, d).groupBy(col("o_custkey"))
        .agg(concat_ws(",",
          transform(array_sort(collect_list(col("o_orderkey"))), _.cast("string")))
          .as("order_keys"),
          count(lit(1)).as("n_orders"))),

    // Pivot: order counts per linestatus x returnflag.
    "q42_pivot" -> ((s, d) =>
      Tables.lineitem(s, d).groupBy(col("l_linestatus"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(count(lit(1)))
        .select(col("l_linestatus"), col("A").as("n_a"), col("N").as("n_n"),
          col("R").as("n_r"))),

    // CUBE grouping sets with grouping_id disambiguation.
    "q43_cube" -> ((s, d) =>
      Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), grouping_id().cast("long").as("gid"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
          col("n"), col("gid"))),

    // Arbitrary GROUPING SETS — the general form rollup (q16) and cube
    // (q43) are special cases of: a cherry-picked set list that neither
    // produces ((flag, status), (shipmode), ()). One Expand (3x row
    // replication, one per set) feeding ONE hash aggregate — at scale
    // this beats three separate scans+aggregates because the input is
    // read once and the partials combine map-side per set. grouping_id
    // bit order matches DuckDB's grouping(a, b, c) (q43-established).
    "q162_grouping_sets" -> ((s, d) =>
      Tables.lineitem(s, d)
        .withColumn("l_shipmonth", month(col("l_shipdate")).cast("long"))
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_shipmonth")), Seq.empty[org.apache.spark.sql.Column]),
          col("l_returnflag"), col("l_linestatus"), col("l_shipmonth"))
        .agg(sum(col("l_quantity").cast("decimal(12,2)")).cast("double")
            .as("sum_qty"),
          count(lit(1)).as("n"), grouping_id().cast("long").as("gid"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
          coalesce(col("l_shipmonth"), lit(-1L)).as("l_shipmonth"),
          col("sum_qty"), col("n"), col("gid"))),

    // Forward as-of: each order picks up the customer's next event at or
    // after the order date (null when the customer has no events).
    "q56_asof_forward" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_orderkey"),
        col("o_custkey").as("user_id"), col("o_orderdate"))
      val r = Tables.events(s, d)
        .groupBy(col("user_id"), col("ts"))
        .agg(min(col("event_id")).as("next_event"))
      AsofJoin.forward(o, r, Seq("user_id"), "o_orderdate", "ts",
          Seq("next_event", "ts"))
        .select(col("o_orderkey"), col("user_id"),
          date_format(col("o_orderdate"), Ts).as("o_orderdate"),
          col("next_event"),
          date_format(col("ts"), Ts).as("next_ts"))
    }),

    // As-of join: each event picks up the user's most recent prior order.
    "q21_asof_join" -> ((s, d) => {
      val e = Tables.events(s, d).select(col("event_id"), col("user_id"), col("ts"))
      val r = Tables.orders(s, d)
        .groupBy(col("o_custkey").as("user_id"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("last_orderkey"))
      AsofJoin.backward(e, r, Seq("user_id"), "ts", "o_orderdate",
          Seq("last_orderkey", "o_orderdate"))
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), Ts).as("ts"),
          col("last_orderkey"),
          date_format(col("o_orderdate"), Ts).as("last_orderdate"))
    }),

    // q21's as-of join through the NATIVE physical operator (custom
    // LogicalPlan -> AsofJoinStrategy -> merge-walk AsofJoinExec): same
    // DuckDB ASOF oracle, so the hash match proves the custom exec equals
    // both the composition form and the declarative semantics.
    "q126_asof_native" -> ((s, d) => {
      val e = Tables.events(s, d).select(col("event_id"), col("user_id"), col("ts"))
      // NTZ -> LTZ (session tz is UTC, values unchanged): the native exec
      // requires identical time types on both sides and fails loudly on
      // the mismatch rather than comparing micros across semantics
      val r = Tables.orders(s, d)
        .groupBy(col("o_custkey").as("user_id"),
          col("o_orderdate").cast("timestamp").as("o_orderdate"))
        .agg(max(col("o_orderkey")).as("last_orderkey"))
      graft.plans.NativeAsof.backward(e, r, Seq("user_id"),
          "ts", "o_orderdate", Seq("last_orderkey", "o_orderdate"))
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), Ts).as("ts"),
          col("last_orderkey"),
          date_format(col("o_orderdate"), Ts).as("last_orderdate"))
    }),

    // Last-touch attribution with a 7-day lookback: every purchase event
    // attributed to the user's most recent click at most 7 days older —
    // the native as-of join plus a tolerance filter (the latest click
    // being out-of-window implies every older one is too, so the
    // post-filter IS merge_asof's tolerance semantics).
    "q127_attribution" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      // dedup click ties on (user, ts): deterministic max event id wins.
      // The grouping alias mints fresh attribute ids, so the two sides of
      // the self-derived as-of don't share attributes.
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id").as("user_id"), col("ts").as("click_ts"))
        .agg(max(col("event_id")).as("click_id"))
      val joined = graft.plans.NativeAsof.backward(purchases, clicks,
        Seq("user_id"), "ts", "click_ts", Seq("click_id", "click_ts"))
      val inWindow = col("click_ts").isNotNull &&
        col("click_ts") >= col("ts") - expr("INTERVAL 7 DAYS")
      joined.select(col("event_id"), col("user_id"),
        date_format(col("ts"), Ts).as("ts"),
        when(inWindow, col("click_id")).as("click_id"),
        when(inWindow, date_format(col("click_ts"), Ts)).as("click_ts"))
    }),

    // Exact weighted median of line price (weight = quantity) per return
    // flag: BIGINT cumsum crossing over per-value weight sums — the sort
    // touches distinct values, never raw rows.
    "q128_weighted_median" -> ((s, d) =>
      Relational.weightedMedian(
        Tables.lineitem(s, d), Seq(col("l_returnflag")),
        floor(col("l_extendedprice") * 100).cast("long"),
        col("l_quantity").cast("long"))),

    // Per-customer spend-over-time OLS fit, slope as a BIGINT rational
    // (num/den) — exact regression statistics with no float sum anywhere,
    // so the result is bit-identical at any parallelism. x = epoch day,
    // y = cents.
    "q118_group_ols" -> ((s, d) =>
      Relational.olsExact(
        Tables.orders(s, d).select(col("o_custkey"),
          expr("CAST(CAST(o_orderdate AS TIMESTAMP_LTZ) AS LONG) div 86400")
            .as("day"),
          floor(col("o_totalprice") * 100).cast("long").as("cents")),
        Seq(col("o_custkey")), col("day"), col("cents"))),

    // Trailing-7-row exact median of order value per customer, kept in
    // BIGINT as median×2 (odd frame → 2·mid, even → mid₁+mid₂) so the
    // half-cent case cannot force a float. One sort per customer; the
    // collect_list frame holds ≤ 7 values — O(1) state per row.
    "q119_rolling_median" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey")).rowsBetween(-6, 0)
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
        .withColumn("win", array_sort(collect_list(col("cents")).over(w)))
        .select(col("o_orderkey"), col("o_custkey"),
          size(col("win")).cast("long").as("n_win"),
          (element_at(col("win"), expr("CAST((size(win) + 1) div 2 AS INT)")) +
            element_at(col("win"), expr("CAST(size(win) div 2 + 1 AS INT)")))
            .as("med2x"))
    }),

    // Unpivot (melt): the wide per-status aggregate flipped to long
    // (status, metric, value) form — Spark's native Unpivot operator, a
    // row-local Expand with no shuffle beyond the aggregate's own.
    "q120_unpivot" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          sum(floor(col("o_totalprice") * 100).cast("long")).as("sum_cents"),
          max(floor(col("o_totalprice") * 100).cast("long")).as("max_cents"))
        .unpivot(Array(col("o_orderstatus")),
          Array(col("n_orders"), col("sum_cents"), col("max_cents")),
          "metric", "value")),

    // Equi-width histogram of order value in cents, 20 integer-edged bins:
    // a 2-value (min,max) broadcast then one O(bins)-output aggregate.
    "q121_histogram" -> ((s, d) =>
      Relational.equiWidthHistogram(
        Tables.orders(s, d),
        floor(col("o_totalprice") * 100).cast("long"), 20)),

    // Equi-DEPTH histogram per event type: quartile bin edges as exact
    // type-1 integer quantiles, equal population per bin — the skew
    // detector q121's equal-width bins can't provide (a hot key is a
    // bin with lo == hi).
    "q212_equi_depth" -> ((s, d) =>
      Relational.equiDepthHistogram(
        Tables.events(s, d), col("event_type"),
        floor(col("value") * 100).cast("long"), nBins = 4)
        .select(col("group").as("event_type"), col("bin"), col("n_rows"),
          col("lo"), col("hi"))))

  val oracles: Map[String, String] = Map(
    "q191_feature_spine" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey,
        |         epoch_us(o_orderdate) // 86400000000 AS day,
        |         CAST(floor(o_totalprice * 100) AS BIGINT) AS price_cents
        |  FROM orders
        |), f AS (
        |  SELECT o_orderkey, o_custkey, day, price_cents,
        |         lag(price_cents, 1) OVER (PARTITION BY o_custkey
        |           ORDER BY day, o_orderkey) AS prev_price_cents,
        |         CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY day
        |           RANGE BETWEEN 90 PRECEDING AND 1 PRECEDING) AS BIGINT)
        |           AS n_prior_90d
        |  FROM o
        |)
        |SELECT f.o_orderkey, f.o_custkey, f.day, f.prev_price_cents,
        |       f.n_prior_90d,
        |       CAST(floor(c.c_acctbal * 100) AS BIGINT) AS bal_cents,
        |       c.c_mktsegment, f.price_cents AS label_cents
        |FROM f JOIN customer c ON f.o_custkey = c.c_custkey""".stripMargin,

    "q188_quantile_norm" ->
      """WITH c AS (
        |  SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nation,
        |         CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_cents
        |  FROM customer
        |), r AS (
        |  SELECT c_custkey, nation, bal_cents,
        |         rank() OVER (PARTITION BY nation ORDER BY bal_cents) AS rnk,
        |         count(*) OVER (PARTITION BY nation) AS n
        |  FROM c
        |)
        |SELECT c_custkey, nation, bal_cents,
        |       CAST(CASE WHEN n = 1 THEN 0
        |            ELSE (rnk - 1) * 1000000 // (n - 1) END AS BIGINT) AS pr_ppm
        |FROM r""".stripMargin,

    "q186_benford" -> {
      val cases = Seq(1 -> 301029L, 2 -> 176091L, 3 -> 124938L,
        4 -> 96910L, 5 -> 79181L, 6 -> 66946L, 7 -> 57991L,
        8 -> 51152L, 9 -> 45757L)
        .map { case (dg, ppm) => s"WHEN digit = $dg THEN $ppm" }
        .mkString(" ")
      s"""WITH v AS (
         |  SELECT CAST(floor(l_extendedprice) AS BIGINT) AS v
         |  FROM lineitem WHERE floor(l_extendedprice) > 0
         |), c AS (
         |  SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS BIGINT) AS digit,
         |         count(*) AS n
         |  FROM v GROUP BY 1
         |), t AS (SELECT count(*) AS total FROM v)
         |SELECT digit, n,
         |       CAST(n * 1000000 // total AS BIGINT) AS obs_ppm,
         |       CAST(CASE $cases END AS BIGINT) AS benford_ppm,
         |       CAST(abs(n * 1000000 // total -
         |                CASE $cases END) AS BIGINT) AS dev_ppm
         |FROM c, t""".stripMargin
    },

    "q180_cov_matrix" -> {
      val vars = Seq("qty", "price_usd", "disc_pct", "tax_pct")
      val sums = vars.map(v => s"CAST(sum($v) AS BIGINT) AS s_$v")
      val prods = for {
        i <- vars.indices; j <- i until vars.size
      } yield s"CAST(sum(${vars(i)} * ${vars(j)}) AS BIGINT) AS p_${vars(i)}_${vars(j)}"
      val rows = (for {
        i <- vars.indices; j <- i until vars.size
      } yield s"SELECT '${vars(i)}' AS var_a, '${vars(j)}' AS var_b, n, " +
        s"s_${vars(i)} AS sum_a, s_${vars(j)} AS sum_b, " +
        s"p_${vars(i)}_${vars(j)} AS sum_ab FROM s").mkString("\nUNION ALL ")
      s"""WITH x AS (
         |  SELECT CAST(l_quantity AS BIGINT) AS qty,
         |         CAST(floor(l_extendedprice) AS BIGINT) AS price_usd,
         |         CAST(floor(l_discount * 100) AS BIGINT) AS disc_pct,
         |         CAST(floor(l_tax * 100) AS BIGINT) AS tax_pct
         |  FROM lineitem
         |), s AS (
         |  SELECT count(*) AS n, ${(sums ++ prods).mkString(",\n    ")}
         |  FROM x
         |)
         |$rows""".stripMargin
    },

    "q14_star_join" ->
      """SELECT r_name, n_name,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |           (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4))))
        |         AS DOUBLE) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,

    "q15_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |           ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) t
        |WHERE rn <= 3""".stripMargin,

    "q16_rollup_agg" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
        |       coalesce(l_linestatus, 'ALL') AS l_linestatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |       count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "q17_set_ops" ->
      """WITH open AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'),
        |fin AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |SELECT o_custkey, 'both' AS tag FROM (SELECT * FROM open INTERSECT SELECT * FROM fin)
        |UNION ALL
        |SELECT o_custkey, 'left_only' AS tag FROM (SELECT * FROM open EXCEPT SELECT * FROM fin)
        |UNION ALL
        |SELECT o_custkey, 'right_only' AS tag FROM (SELECT * FROM fin EXCEPT SELECT * FROM open)""".stripMargin,

    "q18_semi_anti" ->
      """SELECT c_custkey, c_mktsegment, 'has_urgent' AS tag FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |UNION ALL
        |SELECT c_custkey, c_mktsegment, 'no_urgent' AS tag FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')""".stripMargin,

    "q19_scalar_sampler" ->
      """SELECT o_orderkey,
        |       upper(o_orderpriority) AS pri_upper,
        |       lower(o_orderpriority) AS pri_lower,
        |       substr(o_orderpriority, 3, 20) AS pri_name,
        |       length(o_orderpriority) AS pri_len,
        |       concat_ws('|', o_orderstatus, o_orderpriority) AS status_pri,
        |       regexp_replace(o_orderpriority, '[aA-zZ]+', 'X', 'g') AS pri_masked,
        |       o_orderkey % 97 AS key_mod,
        |       abs(o_orderkey - 1000) AS key_absdiff,
        |       CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
        |       CAST(ceil(o_totalprice) AS BIGINT) AS price_ceil,
        |       sqrt(o_totalprice) AS price_sqrt,
        |       CAST(year(o_orderdate) AS BIGINT) AS y,
        |       CAST(quarter(o_orderdate) AS BIGINT) AS q,
        |       CAST(month(o_orderdate) AS BIGINT) AS m,
        |       CAST(day(o_orderdate) AS BIGINT) AS dom,
        |       CAST(strftime(o_orderdate, '%w') AS BIGINT) AS dow_sun0
        |FROM orders""".stripMargin,

    "q20_window_funcs" ->
      """SELECT o_custkey, o_orderkey,
        |       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS order_ts,
        |       o_totalprice,
        |       lag(o_totalprice, 1) OVER w AS prev_price,
        |       lead(o_totalprice, 1) OVER w AS next_price,
        |       row_number() OVER w AS order_seq,
        |       rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS date_rank,
        |       dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate)
        |         AS date_dense_rank,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER
        |         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |         AS running_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,

    "q41_percentiles" ->
      """SELECT o_orderstatus,
        |       round(quantile_cont(o_totalprice, 0.5), 4) AS med,
        |       round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
        |       min(o_totalprice) AS min_price,
        |       max(o_totalprice) AS max_price
        |FROM orders GROUP BY o_orderstatus""".stripMargin,

    "q87_cooccurrence" ->
      """SELECT a.l_partkey AS p1, b.l_partkey AS p2,
        |       count(DISTINCT a.l_orderkey) AS n_orders
        |FROM lineitem a JOIN lineitem b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |GROUP BY 1, 2
        |HAVING count(DISTINCT a.l_orderkey) >= 2""".stripMargin,

    "q89_mad_outliers" ->
      """WITH base AS (
        |  SELECT o_orderstatus AS grp,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS c
        |  FROM orders
        |), m AS (
        |  SELECT grp, CAST(2 * quantile_cont(c, 0.5) AS BIGINT) AS med2
        |  FROM base GROUP BY grp
        |), dev AS (
        |  SELECT base.grp, c, med2, abs(2*c - med2) AS d2
        |  FROM base JOIN m USING (grp)
        |), md AS (
        |  SELECT grp, CAST(2 * quantile_cont(d2, 0.5) AS BIGINT) AS mad4
        |  FROM dev GROUP BY grp
        |)
        |SELECT grp AS o_orderstatus,
        |       CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(count(*) FILTER (2*d2 > 3*mad4) AS BIGINT) AS n_outliers,
        |       med2, mad4
        |FROM dev JOIN md USING (grp)
        |GROUP BY 1, med2, mad4""".stripMargin,

    "q59_conditional_agg" ->
      """SELECT o_orderstatus,
        |       arg_max(o_orderpriority, o_orderkey) AS latest_pri,
        |       arg_min(o_orderpriority, o_orderkey) AS first_pri,
        |       count(*) FILTER (o_orderpriority = '1-URGENT') AS n_urgent,
        |       count(*) FILTER (o_totalprice > 250000) AS n_big
        |FROM orders GROUP BY o_orderstatus""".stripMargin,

    "q57_salted_join" ->
      """SELECT o_orderpriority, count(*) AS n,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,

    "q55_distribution_windows" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        |       round(percent_rank() OVER w, 6) AS pct_rank,
        |       round(cume_dist() OVER w, 6) AS cume,
        |       CAST(ntile(4) OVER w AS BIGINT) AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus
        |             ORDER BY o_totalprice, o_orderkey)""".stripMargin,

    "q50_shipping_priority" ->
      """SELECT o_orderkey,
        |       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |           (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4))))
        |         AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING'
        |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey ASC
        |LIMIT 10""".stripMargin,

    "q163_bag_ops" ->
      """WITH open AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'),
        |fin AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
        |ia AS (SELECT o_custkey FROM open INTERSECT ALL SELECT o_custkey FROM fin),
        |ea AS (SELECT o_custkey FROM open EXCEPT ALL SELECT o_custkey FROM fin)
        |SELECT o_custkey, count(*) AS n, 'common_min' AS tag FROM ia GROUP BY 1
        |UNION ALL
        |SELECT o_custkey, count(*) AS n, 'open_excess' AS tag FROM ea GROUP BY 1""".stripMargin,

    "q164_nation_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |       CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |           (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4))))
        |         AS DOUBLE) AS revenue,
        |       count(*) AS n
        |FROM lineitem, orders, supplier, customer, nation n1, nation n2
        |WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
        |  AND o_custkey = c_custkey
        |  AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY 1, 2, 3""".stripMargin,

    "q51_local_supplier_volume" ->
      """SELECT n_name,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |           (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4))))
        |         AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
        |GROUP BY n_name""".stripMargin,

    "q45_correlated_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
        |      (SELECT COUNT(*) FROM orders i WHERE i.o_custkey = o.o_custkey)
        |    > (SELECT 2 * SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |       FROM orders i WHERE i.o_custkey = o.o_custkey)""".stripMargin,

    "q46_null_semantics" ->
      """SELECT o_orderkey,
        |       nullif(o_orderstatus, 'P') AS status_no_p,
        |       coalesce(nullif(o_orderstatus, 'P'), 'UNKNOWN') AS status_filled,
        |       nullif(o_orderstatus, 'P') IS NOT DISTINCT FROM NULL
        |         AS is_p_nullsafe,
        |       nullif(o_orderstatus, 'P') = 'O' AS eq_o_3vl
        |FROM orders""".stripMargin,

    "q47_string_agg" ->
      """SELECT o_custkey,
        |       string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey)
        |         AS order_keys,
        |       count(*) AS n_orders
        |FROM orders GROUP BY o_custkey""".stripMargin,

    "q42_pivot" ->
      """SELECT l_linestatus,
        |       count(*) FILTER (l_returnflag = 'A') AS n_a,
        |       count(*) FILTER (l_returnflag = 'N') AS n_n,
        |       count(*) FILTER (l_returnflag = 'R') AS n_r
        |FROM lineitem GROUP BY l_linestatus""".stripMargin,

    "q43_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
        |       coalesce(l_linestatus, 'ALL') AS l_linestatus,
        |       count(*) AS n,
        |       CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    "q162_grouping_sets" ->
      """WITH li AS (
        |  SELECT *, CAST(month(l_shipdate) AS BIGINT) AS l_shipmonth
        |  FROM lineitem
        |)
        |SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
        |       coalesce(l_linestatus, 'ALL') AS l_linestatus,
        |       coalesce(l_shipmonth, -1) AS l_shipmonth,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |       count(*) AS n,
        |       CAST(grouping(l_returnflag, l_linestatus, l_shipmonth) AS BIGINT) AS gid
        |FROM li
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_shipmonth), ())""".stripMargin,

    "q56_asof_forward" ->
      """WITH r AS (
        |  SELECT user_id AS r_user, ts, min(event_id) AS next_event
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT o.o_orderkey, o.o_custkey AS user_id,
        |       strftime(o.o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
        |       r.next_event,
        |       strftime(r.ts, '%Y-%m-%d %H:%M:%S') AS next_ts
        |FROM orders o
        |ASOF LEFT JOIN r ON o.o_custkey = r.r_user AND o.o_orderdate <= r.ts""".stripMargin,

    "q21_asof_join" ->
      """WITH r AS (
        |  SELECT o_custkey AS r_user, o_orderdate,
        |         max(o_orderkey) AS last_orderkey
        |  FROM orders GROUP BY 1, 2
        |)
        |SELECT e.event_id, e.user_id,
        |       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts,
        |       r.last_orderkey,
        |       strftime(r.o_orderdate, '%Y-%m-%d %H:%M:%S') AS last_orderdate
        |FROM events e
        |ASOF LEFT JOIN r ON e.user_id = r.r_user AND e.ts >= r.o_orderdate""".stripMargin,

    "q127_attribution" ->
      """WITH p AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
        |), c AS (
        |  SELECT user_id AS c_user, ts AS click_ts, max(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2
        |)
        |SELECT p.event_id, p.user_id,
        |       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ts,
        |       CASE WHEN c.click_ts >= p.ts - INTERVAL 7 DAY
        |            THEN c.click_id END AS click_id,
        |       CASE WHEN c.click_ts >= p.ts - INTERVAL 7 DAY
        |            THEN strftime(c.click_ts, '%Y-%m-%d %H:%M:%S')
        |       END AS click_ts
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.c_user AND p.ts >= c.click_ts""".stripMargin,

    "q128_weighted_median" ->
      """WITH byv AS (
        |  SELECT l_returnflag,
        |         CAST(floor(l_extendedprice * 100) AS BIGINT) AS v,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
        |  FROM lineitem GROUP BY 1, 2
        |), c AS (
        |  SELECT l_returnflag, v,
        |         sum(w) OVER (PARTITION BY l_returnflag ORDER BY v
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |         sum(w) OVER (PARTITION BY l_returnflag) AS tot
        |  FROM byv
        |)
        |SELECT l_returnflag, CAST(min(v) AS BIGINT) AS wmedian,
        |       CAST(max(tot) AS BIGINT) AS total_weight
        |FROM c WHERE cum * 2 >= tot GROUP BY 1""".stripMargin,

    "q126_asof_native" ->
      """WITH r AS (
        |  SELECT o_custkey AS r_user, o_orderdate,
        |         max(o_orderkey) AS last_orderkey
        |  FROM orders GROUP BY 1, 2
        |)
        |SELECT e.event_id, e.user_id,
        |       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts,
        |       r.last_orderkey,
        |       strftime(r.o_orderdate, '%Y-%m-%d %H:%M:%S') AS last_orderdate
        |FROM events e
        |ASOF LEFT JOIN r ON e.user_id = r.r_user AND e.ts >= r.o_orderdate""".stripMargin,

    "q118_group_ols" ->
      """WITH t AS (
        |  SELECT o_custkey,
        |         CAST(epoch(o_orderdate) AS BIGINT) // 86400 AS x,
        |         CAST(floor(o_totalprice * 100) AS BIGINT) AS y
        |  FROM orders
        |), s AS (
        |  SELECT o_custkey, count(*) AS n,
        |         CAST(sum(x) AS BIGINT) AS sum_x,
        |         CAST(sum(y) AS BIGINT) AS sum_y,
        |         CAST(sum(x * y) AS BIGINT) AS sum_xy,
        |         CAST(sum(x * x) AS BIGINT) AS sum_xx
        |  FROM t GROUP BY 1
        |)
        |SELECT o_custkey, n, sum_x, sum_y,
        |       n * sum_xy - sum_x * sum_y AS slope_num,
        |       n * sum_xx - sum_x * sum_x AS slope_den
        |FROM s""".stripMargin,

    "q119_rolling_median" ->
      """SELECT o_orderkey, o_custkey,
        |       CAST(len(win) AS BIGINT) AS n_win,
        |       CAST(win[(len(win) + 1) // 2] + win[len(win) // 2 + 1]
        |         AS BIGINT) AS med2x
        |FROM (
        |  SELECT o_orderkey, o_custkey,
        |         list_sort(list(CAST(floor(o_totalprice * 100) AS BIGINT))
        |           OVER (PARTITION BY o_custkey
        |                 ORDER BY o_orderdate, o_orderkey
        |                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS win
        |  FROM orders)""".stripMargin,

    "q120_unpivot" ->
      """WITH agg AS (
        |  SELECT o_orderstatus, count(*) AS n_orders,
        |         CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
        |           AS BIGINT) AS sum_cents,
        |         CAST(max(CAST(floor(o_totalprice * 100) AS BIGINT))
        |           AS BIGINT) AS max_cents
        |  FROM orders GROUP BY 1
        |)
        |SELECT o_orderstatus, 'n_orders' AS metric, n_orders AS value FROM agg
        |UNION ALL
        |SELECT o_orderstatus, 'sum_cents', sum_cents FROM agg
        |UNION ALL
        |SELECT o_orderstatus, 'max_cents', max_cents FROM agg""".stripMargin,

    "q121_histogram" ->
      """WITH v AS (
        |  SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS v FROM orders
        |), mm AS (
        |  SELECT min(v) AS mn, max(v) AS mx FROM v
        |)
        |SELECT ((v - mn) * 20) // (mx - mn + 1) AS bin,
        |       count(*) AS n_rows,
        |       CAST(min(v) AS BIGINT) AS lo, CAST(max(v) AS BIGINT) AS hi
        |FROM v, mm GROUP BY 1""".stripMargin,

    // Mirrors equiDepthHistogram: the same type-1 cum/tot quantile rule
    // as Relational.exactQuantiles (q41 recipe), edges at i/4, bin =
    // count of edges strictly below the value.
    "q212_equi_depth" ->
      """WITH v AS (
        |  SELECT event_type AS g, CAST(floor(value * 100) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL
        |), byv AS (
        |  SELECT g, v, count(*) AS w FROM v GROUP BY 1, 2
        |), c AS (
        |  SELECT g, v, w,
        |         sum(w) OVER (PARTITION BY g ORDER BY v
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |         sum(w) OVER (PARTITION BY g) AS tot
        |  FROM byv
        |), e AS (
        |  SELECT g,
        |         min(CASE WHEN cum * 4 >= tot * 1 THEN v END) AS e1,
        |         min(CASE WHEN cum * 4 >= tot * 2 THEN v END) AS e2,
        |         min(CASE WHEN cum * 4 >= tot * 3 THEN v END) AS e3
        |  FROM c GROUP BY 1
        |), b AS (
        |  SELECT v.g, v.v,
        |         CAST(CASE WHEN v.v > e.e1 THEN 1 ELSE 0 END
        |            + CASE WHEN v.v > e.e2 THEN 1 ELSE 0 END
        |            + CASE WHEN v.v > e.e3 THEN 1 ELSE 0 END AS BIGINT) AS bin
        |  FROM v JOIN e ON v.g = e.g
        |)
        |SELECT g AS event_type, bin, count(*) AS n_rows,
        |       CAST(min(v) AS BIGINT) AS lo, CAST(max(v) AS BIGINT) AS hi
        |FROM b GROUP BY 1, 2""".stripMargin)
}
