package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Tables.t

/** Relational coverage of SURVEY.md §2's operator inventory over the driver
  * testdata (TESTDATA.md), each with a DuckDB oracle (SparkEntry.oracleSql).
  *
  * Conventions shared with the oracles so the driver's hash compare is
  * byte-stable:
  *  - every computed column is aliased identically on both sides;
  *  - double aggregates are rounded (2-6 decimals) to absorb summation-order
  *    ulps between engines;
  *  - every query ends in a total ORDER BY (unique key tie-break);
  *  - derived integer types are cast so Spark and DuckDB agree (count →
  *    BIGINT, year()/len()/strpos() → INT, sum(int) → BIGINT).
  */
object CoreQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ── A1/A5-family aggregation (TPC-H Q1 shape; SURVEY §2.5) ────────────
    "q1_agg" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // ── TPC-H Q3 shape (shipping priority): dim-filtered broadcast join
    //    into the two-fact orderkey join, grouped revenue, bounded top-10
    //    via TakeOrderedAndProject — the canonical "find the hot orders"
    //    analytics query. Catalyst pushes both date predicates into the
    //    parquet scans; AQE picks the fact-fact join strategy. ─────────────
    "q3_top_orders" -> ((s, d) => {
      val cust = t(s, d, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val ord = t(s, d, "orders")
        .filter(col("o_orderdate") < lit("1998-06-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val li = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1998-06-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
          2).as("revenue"))
        .orderBy(desc("revenue"), col("l_orderkey"))
        .limit(10)
    }),

    // ── TPC-H Q5 shape (regional supplier volume): the 6-table star —
    //    local-supplier constraint (c_nationkey = s_nationkey) rides the
    //    join, dims broadcast, ONE fact shuffle on orderkey ────────────────
    // ── TPC-H Q6 shape: one filtered scan, one global sum — the
    //    pushdown-and-prune showcase (no join, no groupBy key) ───────────
    "q6_revenue_delta" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.03, 0.07) &&
          col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
          .as("revenue"))
    }),

    // ── TPC-H Q14 shape: promo revenue share — broadcast dim join,
    //    conditional aggregation, one fixed-ratio output ─────────────────
    // ── TPC-H q19 shape (adapted to the trimmed part schema): a
    //    DISJUNCTION of brand/size/quantity conjunctions — the classic
    //    OR-pushdown exercise; the quantity disjuncts must reach the
    //    lineitem scan as Or(...) pushed filters (PlanShapeSpec) and the
    //    small part side must broadcast ─────────────────────────────────────
    "q19_disjunctive" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .filter(col("l_quantity") <= 11 || col("l_quantity") >= 40)
        .select(col("l_partkey"), col("l_quantity"),
          (col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("rev"))
      val p = broadcast(t(s, d, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_size")))
      li.join(p, col("l_partkey") === col("p_partkey") &&
          ((col("p_brand") === "Brand#12" && col("p_size").between(1, 15)
            && col("l_quantity") <= 11) ||
           (col("p_brand") === "Brand#23" && col("p_size").between(1, 25)
            && col("l_quantity") >= 40)))
        .agg(round(sum(col("rev")), 2).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // ── TPC-H q4 shape: priority counts over a dated window where an
    //    EXISTS lineitem predicate holds (adapted: quantity > 45 stands in
    //    for the absent commit/receipt dates) — plans as a semi join, the
    //    orders side never duplicates ───────────────────────────────────────
    "q4_order_priority" -> ((s, d) => {
      val o = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_orderpriority"))
      val l = t(s, d, "lineitem").filter(col("l_quantity") > 45)
        .select(col("l_orderkey"))
      o.join(l, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }),

    // ── TPC-H q7 shape: shipping volume between two nation pairs — the
    //    SAME broadcast dimension joined twice under different roles
    //    (customer nation vs supplier nation), volume by year ───────────────
    "q7_nation_volume" -> ((s, d) => {
      val n = t(s, d, "nation").select(col("n_nationkey"))
      val cust = t(s, d, "customer")
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"),
          when(col("n_nationkey") < 12, "EAST").otherwise("WEST")
            .as("cust_region"))
      val supp = t(s, d, "supplier")
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"),
          when(col("n_nationkey") < 12, "EAST").otherwise("WEST")
            .as("supp_region"))
      t(s, d, "lineitem")
        .join(t(s, d, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .filter(col("cust_region") =!= col("supp_region"))
        .groupBy(col("cust_region"), col("supp_region"),
          year(col("l_shipdate")).as("l_year"))
        .agg(round(sum(col("l_extendedprice") *
          (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("cust_region"), col("supp_region"), col("l_year"))
    }),

    // ── TPC-H q8 shape: market share — the share of each year's customer-
    //    region revenue supplied by EAST suppliers; a conditional-sum
    //    ratio over the same two-role dimension join as q7 ─────────────────
    "q8_market_share" -> ((s, d) => {
      val n = t(s, d, "nation")
        .select(col("n_nationkey"), col("n_regionkey"))
      val cust = t(s, d, "customer")
        .join(broadcast(t(s, d, "region")
            .join(broadcast(n), col("r_regionkey") === col("n_regionkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("r_name").as("cust_region"))
      val supp = t(s, d, "supplier")
        .select(col("s_suppkey"),
          (col("s_nationkey") < 12).as("east_supp"))
      t(s, d, "lineitem")
        .join(t(s, d, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("cust_region"), year(col("l_shipdate")).as("l_year"))
        .agg(round(sum(when(col("east_supp"),
            col("l_extendedprice") * (lit(1) - col("l_discount")))
            .otherwise(lit(0.0))), 2).as("east_revenue"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("total_revenue"))
        .withColumn("east_share",
          round(col("east_revenue") / col("total_revenue"), 4))
        .orderBy(col("cust_region"), col("l_year"))
    }),

    // ── TPC-H q17 shape: small-quantity revenue — the correlated
    //    avg-per-part subquery decorrelates into one aggregate joined
    //    back on the part key (broadcast: part-count-sized) ─────────────────
    "q17_small_quantity" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val avgQty = li.groupBy(col("l_partkey").as("ap"))
        .agg((avg(col("l_quantity")) * 0.5).as("half_avg"))
      li.join(broadcast(avgQty), col("l_partkey") === col("ap"))
        .filter(col("l_quantity") < col("half_avg"))
        .agg(round(sum(col("l_extendedprice")) / 7.0, 2)
          .as("avg_yearly"),
          count(lit(1)).as("n_items"))
    }),

    // ── TPC-H q15 shape: top supplier(s) by shipped revenue in a
    //    quarter — the revenue "view" feeds a broadcast scalar max and a
    //    tie-keeping equality filter ────────────────────────────────────────
    "q15_top_supplier" -> ((s, d) => {
      val rev = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(round(sum(col("l_extendedprice") *
          (lit(1) - col("l_discount"))), 2).as("total_revenue"))
      val top = rev.agg(max(col("total_revenue")).as("mx"))
      rev.join(broadcast(top), col("total_revenue") === col("mx"))
        .join(t(s, d, "supplier").select(col("s_suppkey"), col("s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy(col("s_suppkey"))
    }),

    // ── TPC-H q13 shape: customer order-count distribution — LEFT outer
    //    join so zero-order customers land in the 0 bucket ──────────────────
    "q13_order_distribution" -> ((s, d) => {
      val perCust = t(s, d, "customer").select(col("c_custkey"))
        .join(t(s, d, "orders").select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_custkey")).as("c_count"))
      perCust.groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // ── TPC-H q18 shape: large-volume orders — a HAVING-filtered
    //    aggregate feeding a semi join back to the detail ──────────────────
    "q18_large_orders" -> ((s, d) => {
      val big = t(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 120)
      t(s, d, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          round(col("o_totalprice"), 2).as("o_totalprice"),
          round(col("total_qty"), 2).as("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    // ── TPC-H q22 shape: positive-balance customers above the average
    //    (scalar-subquery broadcast) with NO orders (anti join) ─────────────
    "q22_churned_customers" -> ((s, d) => {
      // q22 adapted: every customer in this testdata has SOME order, so
      // the anti join runs against RECENT orders — positive-balance
      // customers with no order since 2000 ("churned, money on the
      // table"); the average-balance threshold stays a broadcast scalar
      val c = t(s, d, "customer")
      val avgBal = c.filter(col("c_acctbal") > 0.0)
        .agg(avg(col("c_acctbal")).as("a"))
      val rich = c.join(broadcast(avgBal), col("c_acctbal") > col("a"))
        .select(col("c_custkey"), col("c_acctbal"), col("c_nationkey"))
      val recent = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      rich.join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("numcust"),
          round(sum(col("c_acctbal")), 2).as("totacctbal"))
        .orderBy(col("c_nationkey"))
    }),

    // ── TPC-H q2 shape (adapted: lineitem's per-(part, supplier) minimum
    //    unit price stands in for partsupp's supply cost): for each small
    //    part, the supplier(s) offering the MINIMUM unit price — the
    //    correlated-MIN subquery, decorrelated into a per-part min joined
    //    back on EXACT equality. unit prices are per-row divisions and
    //    min() picks actual values, so the equality is fp-safe (no sums,
    //    no rounding anywhere); unit_price emits as the RAW double. ────────
    "q2_min_cost_supplier" -> ((s, d) => {
      val small = broadcast(t(s, d, "part").filter(col("p_size") < 10)
        .select(col("p_partkey")))
      val ps = t(s, d, "lineitem")
        .join(small, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_partkey"), col("l_suppkey"))
        .agg(min(col("l_extendedprice") / col("l_quantity")).as("unit"))
      val mins = ps.groupBy(col("p_partkey").as("pk"))
        .agg(min(col("unit")).as("mu"))
      ps.join(mins, col("p_partkey") === col("pk") &&
          col("unit") === col("mu"))
        .join(broadcast(t(s, d, "supplier")
          .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
            col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, d, "nation")
          .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("p_partkey"), col("s_name"), col("n_name"),
          col("unit").as("unit_price"), col("s_acctbal"))
        .orderBy(col("p_partkey"), col("s_name"))
    }),

    // ── TPC-H q11 shape (adapted: shipped quantity × retail price stands
    //    in for partsupp stock value): nations holding an outsized share
    //    of total inventory value. Exact DECIMAL per-nation sums; the 2%
    //    threshold compares as IDENTICAL doubles on both engines (cast
    //    the exact decimals, multiply by the same double constant). ────────
    "q11_important_stock" -> ((s, d) => {
      val sup = broadcast(t(s, d, "supplier")
        .select(col("s_suppkey"), col("s_nationkey")))
      val prt = broadcast(t(s, d, "part")
        .select(col("p_partkey"), col("p_retailprice")))
      val nat = broadcast(t(s, d, "nation")
        .select(col("n_nationkey"), col("n_name")))
      val v = t(s, d, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
        .join(prt, col("l_partkey") === col("p_partkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(nat, col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("l_quantity").cast("decimal(4,0)") *
          col("p_retailprice").cast("decimal(6,2)")).as("val"))
      val thr = v.agg((sum(col("val")).cast("double") * lit(0.02))
        .as("_thr"))
      v.crossJoin(broadcast(thr))
        .filter(col("val").cast("double") > col("_thr"))
        .select(col("n_name"), col("val").cast("double").as("value"))
        .orderBy(desc("value"), col("n_name"))
    }),

    // ── TPC-H q12 shape (adapted: the schema has no ship mode, so the
    //    classifying dimension is LATENESS — shipped more than 60 days
    //    after ordering, the q21 definition): high- vs low-priority line
    //    counts per lateness class. One join, conditional counts, exact
    //    integers throughout. ──────────────────────────────────────────────
    "q12_late_priority" -> ((s, d) => {
      val high = Seq("1-URGENT", "2-HIGH")
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
        .join(t(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderdate"),
            col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .withColumn("lateness",
          when(col("l_shipdate") >
            col("o_orderdate") + expr("INTERVAL 60 DAY"), "LATE")
            .otherwise("ON-TIME"))
        .groupBy(col("lateness"))
        .agg(
          sum(when(col("o_orderpriority").isin(high: _*), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(!col("o_orderpriority").isin(high: _*), 1L)
            .otherwise(0L)).as("low_line_count"))
        .orderBy(col("lateness"))
    }),

    // ── TPC-H q9 shape (adapted: no partsupp table, so supply cost is
    //    modeled as 10% of retail price — deterministic and documented):
    //    profit by SUPPLIER nation × order year over one part family.
    //    part/supplier/nation broadcast; lineitem shuffles once for the
    //    orders join then aggregates on the tiny (nation, year) grid.
    //    (q10 lives in CurationQueries as q10_returned_revenue.) ───────────
    "q9_product_profit" -> ((s, d) => {
      val red = broadcast(t(s, d, "part")
        .filter(col("p_name").startsWith("red "))
        .select(col("p_partkey"), col("p_retailprice")))
      val sup = broadcast(t(s, d, "supplier")
        .select(col("s_suppkey"), col("s_nationkey")))
      val nat = broadcast(t(s, d, "nation")
        .select(col("n_nationkey"), col("n_name")))
      val ord = t(s, d, "orders")
        .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"))
        .join(red, col("l_partkey") === col("p_partkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(nat, col("s_nationkey") === col("n_nationkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"), col("o_year"))
        // exact DECIMAL terms (the q10_returned_revenue discipline): the
        // sum is order-free and the final decimal(38,2) cast rounds
        // HALF_UP identically on both engines — profit can be negative,
        // and HALF_UP (ties away from zero) matches DuckDB there too.
        // Cast widths are sized to the DATA (price < 1e6, qty ≤ 50 int,
        // discount 2dp, retail < 1e3) so every product stays under
        // Spark's 38-digit cap — generic (18,2) casts pushed the 3-factor
        // cost term to precision 40, where Spark's precision-loss rule
        // rounds at scale 4 while DuckDB keeps the exact scale-5 value
        // (observed: half the rows off by 0.01 after final rounding)
        .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
            (lit(1).cast("decimal(3,2)") -
              col("l_discount").cast("decimal(3,2)")) -
            lit(0.1).cast("decimal(2,1)") *
              col("p_retailprice").cast("decimal(6,2)") *
              col("l_quantity").cast("decimal(4,0)"))
          .cast("decimal(38,2)").cast("double").as("profit"))
        .orderBy(col("nation"), desc("o_year"))
    }),

    // ── TPC-H q16 shape (adapted: lineitem's DISTINCT (partkey, suppkey)
    //    stands in for the absent partsupp table; the "complaints"
    //    exclusion becomes negative-balance suppliers): supplier counts
    //    per (brand, type, size). One distinct shuffle on the bridge, part
    //    dims + exclusion set broadcast, anti join for NOT IN. ─────────────
    "q16_supplier_counts" -> ((s, d) => {
      val bridge = t(s, d, "lineitem")
        .select(col("l_partkey"), col("l_suppkey")).distinct()
      val pt = broadcast(t(s, d, "part")
        .filter(col("p_brand") =!= "Brand#45" &&
          col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
        .select(col("p_partkey"), col("p_brand"), col("p_type"),
          col("p_size")))
      val excluded = broadcast(t(s, d, "supplier")
        .filter(col("s_acctbal") < 0)
        .select(col("s_suppkey").as("l_suppkey")))
      bridge.join(pt, col("l_partkey") === col("p_partkey"))
        .join(excluded, Seq("l_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_type"),
          col("p_size"))
    }),

    // ── TPC-H q20 shape (adapted: "excess availability" becomes excess
    //    SHIPMENTS — suppliers who moved > 50 units of some red part in
    //    1996): the IN-subquery plans as a left-semi join against a
    //    pre-aggregated (suppkey, partkey) qualifier, so the supplier
    //    table is probed, never duplicated. ─────────────────────────────────
    "q20_excess_shipments" -> ((s, d) => {
      val red = broadcast(t(s, d, "part")
        .filter(col("p_name").startsWith("red "))
        .select(col("p_partkey")))
      val qualified = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .join(red, col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(sum(col("l_quantity")).as("qty"))
        .filter(col("qty") > 50)
        .select(col("l_suppkey").as("s_suppkey"))
      t(s, d, "supplier")
        .join(qualified, Seq("s_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
        .orderBy(col("s_name"))
    }),

    // ── TPC-H q21 shape (adapted: "late" = shipped more than 60 days
    //    after the order date — the only date pair this schema carries):
    //    suppliers who were the SOLE late supplier on a multi-supplier
    //    finished order. The correlated EXISTS / NOT EXISTS pair
    //    decorrelates into ONE per-order aggregate — n_sup ≥ 2 ⇔ EXISTS
    //    (another supplier), n_late_sup = 1 (with this row late) ⇔ NOT
    //    EXISTS (another LATE supplier) — so the plan is two orderkey-keyed
    //    exchanges and a broadcast supplier probe, no nested subquery
    //    re-scans. The oracle keeps the correlated form: the gate proves
    //    the decorrelation. ────────────────────────────────────────────────
    "q21_waiting_suppliers" -> ((s, d) => {
      val lo = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        .join(t(s, d, "orders").filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .withColumn("is_late",
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"))
      val perOrder = lo.groupBy(col("l_orderkey").as("ok"))
        .agg(countDistinct(col("l_suppkey")).as("n_sup"),
          countDistinct(when(col("is_late"), col("l_suppkey")))
            .as("n_late_sup"))
      lo.filter(col("is_late"))
        .join(perOrder, col("l_orderkey") === col("ok"))
        .filter(col("n_sup") >= 2 && col("n_late_sup") === 1)
        .join(broadcast(t(s, d, "supplier")
          .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(desc("numwait"), col("s_name"))
        .limit(20)
    }),

    "q14_promo_share" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-06-01").cast("timestamp"))
        .select(col("l_partkey"),
          (col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("rev"))
      li.join(broadcast(t(s, d, "part")
            .select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .agg(
          round(sum(when(col("p_type").startsWith("PROMO"), col("rev"))
            .otherwise(lit(0.0))), 2).as("promo_revenue"),
          round(sum(col("rev")), 2).as("total_revenue"),
          round(lit(100.0) *
            sum(when(col("p_type").startsWith("PROMO"), col("rev"))
              .otherwise(lit(0.0))) / sum(col("rev")), 4)
            .as("promo_share_pct"))
    }),

    "q5_region_volume" -> ((s, d) => {
      val ord = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      val asia = broadcast(t(s, d, "nation")
        .join(t(s, d, "region"), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .select(col("n_nationkey"), col("n_name")))
      val sup = broadcast(t(s, d, "supplier")
        .select(col("s_suppkey"), col("s_nationkey")))
      val cust = broadcast(t(s, d, "customer")
        .select(col("c_custkey"), col("c_nationkey")))
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(asia, col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
          2).as("revenue"))
        .orderBy(desc("revenue"), col("n_name"))
    }),

    // ── S-family scan: projection + predicate pushdown to parquet ─────────
    "s2_scan_pushdown" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_quantity") < 3)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // ── S1/S2 at the connector tier, BENCHED (VERDICT r12 #2): the PDF
    //    codec is the reference's core competence (enem_pdf_extractor.py
    //    959-996) but its throughput was invisible to the bench lines.
    //    Synthesize a real-PDF corpus IN-PLAN (one page per document, 50
    //    multi-page files, executor-side build+write via PdfSynth —
    //    deterministic bytes, idempotent overwrite), scan it back through
    //    the graft-pdf DSv2 connector (full content-stream + font decode
    //    per page), and value-gate a per-page rollup against a
    //    closed-form oracle reconstructing each page's EXACT text.
    //    Moduli 4 (line count), 5 (token-run length), 7 (token id), 11
    //    (image pages) are pairwise coprime — every combination
    //    executes. 100 TB shape: PDFs build and decode per-group on
    //    executors (only (group, bytes) rows exist in the plan, no
    //    driver bytes); the scan is one file per InputPartition with
    //    text decode pruned away when page_text is unprojected. ─────────
    "pdf_pages_scan" -> ((s, d) => {
      import s.implicits._
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft_pdf_scan_" +
        Integer.toHexString(d.hashCode)
      val conf = new org.apache.spark.util.SerializableConfiguration(
        s.sparkContext.hadoopConfiguration)
      // the per-group writes below overwrite only SURVIVING groups — a
      // testdata regeneration that shrinks the doc_id%50 residue set
      // would otherwise leave stale book_*.pdf from the previous corpus
      // in the listing and fail the gate with no hint of the cause
      locally {
        val p = new org.apache.hadoop.fs.Path(dir)
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
      }
      t(s, d, "documents").select(col("doc_id").cast("long")).as[Long]
        .groupByKey(_ % 50)
        .mapGroups { (g, it) =>
          val ids = it.toArray.sorted
          val pages: Seq[Seq[String]] = ids.toSeq.map { id =>
            s"DOC $id" +: (1L to (1 + id % 4)).map { j =>
              s"pg $id ln $j" +
                (" t" + ((id + j) % 7)) * (3 + ((id + j) % 5)).toInt
            }
          }
          val img = ids.zipWithIndex.collect {
            case (id, i) if id % 11 == 0 => i
          }.toSet
          (g, graft.functions.PdfSynth.build(pages, img))
        }
        .foreachPartition { (it: Iterator[(Long, Array[Byte])]) =>
          it.foreach { case (g, bytes) =>
            val p = new org.apache.hadoop.fs.Path(s"$dir/book_$g.pdf")
            val fs = p.getFileSystem(conf.value)
            val out = fs.create(p, true)
            try out.write(bytes) finally out.close()
          }
        }
      s.read.format("graft-pdf").load(dir)
        .select(
          regexp_extract(col("page_text"), "^DOC ([0-9]+)", 1)
            .cast("long").as("doc_id"),
          col("file_name"),
          col("page_idx").cast("long").as("page_idx"),
          (size(split(col("page_text"), "\n")) - 1).cast("long")
            .as("n_lines"),
          length(col("page_text")).cast("long").as("n_chars"),
          md5(col("page_text")).as("text_md5"),
          col("has_images"))
        .orderBy(col("doc_id"))
    }),

    // ── F1/F2/F5 composite filter predicates (SURVEY §2.2) ────────────────
    "f_filters" -> ((s, d) => {
      t(s, d, "documents")
        .filter(col("doc_id") >= 1 &&
          instr(col("text"), "join") > 0 && col("n_chars") > 200)
        .select(col("doc_id"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // ── T6 tokenizer: split + posexplode (the question-slicer shape) ──────
    "t6_tokenize" -> ((s, d) => {
      t(s, d, "documents")
        .select(col("doc_id"),
          posexplode(split(col("text"), "\\s+")).as(Seq("pos", "token")))
        .filter(length(col("token")) > 0)
        .orderBy(col("doc_id"), col("pos"))
    }),

    // ── F7 short-line filter after explode (answer-key line filter shape) ─
    "f7_short_tokens" -> ((s, d) => {
      t(s, d, "documents")
        .select(col("doc_id"),
          posexplode(split(col("text"), "\\s+")).as(Seq("pos", "token")))
        .filter(length(col("token")) > 0 && length(col("token")) <= 4)
        .orderBy(col("doc_id"), col("pos"))
    }),

    // ── T1/T2/T3 scalar string transforms ─────────────────────────────────
    "t_scalar_strings" -> ((s, d) => {
      t(s, d, "documents").select(
        col("doc_id"),
        upper(substring(col("text"), 1, 20)).as("head20"),
        regexp_replace(col("text"), "data", "DATA").as("replaced"),
        length(col("text")).as("len"),
        instr(col("text"), "join").cast("int").as("join_pos"))
        .orderBy(col("doc_id"))
    }),

    // ── T8/T12 field extraction + id construction ─────────────────────────
    "t8_extract_fields" -> ((s, d) => {
      t(s, d, "documents").select(
        col("doc_id"),
        regexp_extract(col("source"), "src([0-9]+)", 1).cast("int")
          .as("src_num"),
        concat_ws("_", col("lang"), col("doc_id")).as("synth_id"))
        .orderBy(col("doc_id"))
    }),

    // ── T9 subject bucketing as CASE WHEN + aggregation ───────────────────
    "t9_bucket_case" -> ((s, d) => {
      t(s, d, "lineitem")
        .withColumn("bucket",
          when(col("l_quantity") <= 10, "small")
            .when(col("l_quantity") <= 30, "mid")
            .otherwise("large"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
        .orderBy(col("bucket"))
    }),

    // ── T13 record templating ─────────────────────────────────────────────
    "t13_template" -> ((s, d) => {
      t(s, d, "documents").select(
        col("doc_id"),
        format_string("(Doc/%d)  %s", col("doc_id"),
          substring(col("text"), 1, 30)).as("record"))
        .orderBy(col("doc_id"))
    }),

    // ── J1 pairing equi-join (broadcast small side) ───────────────────────
    "j1_equi_join" -> ((s, d) => {
      t(s, d, "orders").join(broadcast(t(s, d, "customer")),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_name"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // ── J1 abort-check anti-join (customers with no large order) ──────────
    "j1_anti_join" -> ((s, d) => {
      t(s, d, "customer").join(
          t(s, d, "orders").filter(col("o_totalprice") > 450000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // ── semi-join (EXISTS) ────────────────────────────────────────────────
    "j_semi_join" -> ((s, d) => {
      t(s, d, "part").join(t(s, d, "lineitem"),
          col("p_partkey") === col("l_partkey"), "left_semi")
        .select(col("p_partkey"), col("p_name"))
        .orderBy(col("p_partkey"))
    }),

    // ── J2 answer lookup: build side aggregated, left outer + default ─────
    "j2_lookup_default" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
      t(s, d, "part").join(li, col("p_partkey") === col("l_partkey"), "left")
        .select(col("p_partkey"), coalesce(col("cnt"), lit(0L)).as("n_lines"))
        .orderBy(col("p_partkey"))
    }),

    // ── J3 range join against an inline dimension (subject ranges shape) ──
    "j3_range_join" -> ((s, d) => {
      import s.implicits._
      val ranges = Seq(("short", 0L, 200L), ("mid", 201L, 400L),
        ("long", 401L, 10000000L)).toDF("bucket", "lo", "hi")
      t(s, d, "documents").join(broadcast(ranges),
          col("n_chars").between(col("lo"), col("hi")))
        .select(col("doc_id"), col("bucket"))
        .orderBy(col("doc_id"))
    }),

    // ── multiway join (E1 shape: facts through two dims) ──────────────────
    "j_multiway" -> ((s, d) => {
      t(s, d, "customer")
        .join(broadcast(t(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_customers"),
          round(avg(col("c_acctbal")), 4).as("avg_bal"))
        .orderBy(col("r_name"))
    }),

    // ── A2/W1 running counter via window ──────────────────────────────────
    "a2_running_sum" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "events").select(col("event_id"), col("user_id"),
          round(sum(col("value")).over(w), 4).as("running_value"))
        .orderBy(col("event_id"))
    }),

    // ── W1 row numbering in partition order ───────────────────────────────
    "w1_row_number" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t(s, d, "events").select(col("event_id"),
          row_number().over(w).as("rn"))
        .orderBy(col("event_id"))
    }),

    // ── W2/T16 global id assignment with collection offset ────────────────
    // Scale form: range-partitioned sort + per-partition offsets
    // (zipWithIndex semantics) — no single-partition global window. Output
    // contract identical to `row_number() OVER (ORDER BY ts, event_id) +
    // 1000`, which remains the oracle.
    "w2_offset_ids" -> ((s, d) => {
      graft.sources.VectorCollection.assignIdsOrdered(
          t(s, d, "events").select(col("event_id"), col("ts")),
          offset = 1001L, orderCols = Seq("ts", "event_id"))
        .select(col("event_id"), col("id").as("point_id"))
        .orderBy(col("event_id"))
    }),

    // ── A3 per-group load counts + distinct ───────────────────────────────
    "a3_group_stats" -> ((s, d) => {
      t(s, d, "events").groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          round(sum(col("value")), 4).as("sum_value"),
          round(avg(col("value")), 4).as("avg_value"))
        .orderBy(col("event_type"))
    }),

    // ── A4 stats pivot (year×subject counts shape) ────────────────────────
    "a4_pivot_stats" -> ((s, d) => {
      val langs = Seq("de", "en", "es", "fr", "zh")
      val p = t(s, d, "documents").groupBy(col("source"))
        .pivot("lang", langs).agg(count(lit(1)))
      p.select(col("source") +:
          langs.map(l => coalesce(col(l), lit(0L)).as(l)): _*)
        .orderBy(col("source"))
    }),

    // ── A5 summary stats ──────────────────────────────────────────────────
    "a5_summary_stats" -> ((s, d) => {
      t(s, d, "lineitem").groupBy(col("l_returnflag"))
        .agg(min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          countDistinct(col("l_partkey")).as("n_parts"))
        .orderBy(col("l_returnflag"))
    }),

    // ── set ops: EXCEPT (load diffing, SURVEY §2.7) and INTERSECT ─────────
    "set_except" -> ((s, d) => {
      val all = t(s, d, "customer").select(col("c_custkey"))
      val bigSpenders = t(s, d, "orders")
        .filter(col("o_totalprice") > 200000)
        .select(col("o_custkey").as("c_custkey"))
      all.except(bigSpenders).orderBy(col("c_custkey"))
    }),

    "set_intersect" -> ((s, d) => {
      val bigSpenders = t(s, d, "orders")
        .filter(col("o_totalprice") > 300000)
        .select(col("o_custkey").as("c_custkey"))
      val recent = t(s, d, "orders")
        .filter(year(col("o_orderdate")) >= 1997)
        .select(col("o_custkey").as("c_custkey"))
      bigSpenders.intersect(recent).orderBy(col("c_custkey"))
    }),

    // ── window navigation: lag/lead/first_value over event streams ────────
    "w_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t(s, d, "events").select(col("event_id"),
          lag(col("event_type"), 1).over(w).as("prev_type"),
          lead(col("event_type"), 1).over(w).as("next_type"),
          first(col("event_type")).over(w
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("first_type"))
        .orderBy(col("event_id"))
    }),

    // ── unpivot: wide per-flag sums back to long (melt) ───────────────────
    "a_unpivot" -> ((s, d) => {
      val wide = t(s, d, "lineitem")
        .groupBy(col("l_linestatus"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(round(sum(col("l_quantity")), 2))
      wide.unpivot(Array(col("l_linestatus")),
          Array(col("A"), col("N"), col("R")), "flag", "qty")
        .filter(col("qty").isNotNull)
        .orderBy(col("l_linestatus"), col("flag"))
    }),

    // ── as-of join: latest prior click for each purchase, per user ────────
    "j_asof" -> ((s, d) => {
      val ev = t(s, d, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(max_by(col("value"), col("event_id")).as("click_value"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      graft.operators.AsOfJoin.asOfBackward(purchases, clicks,
          "user_id", "ts", Seq("click_value"), prefix = "click_")
        .select(col("event_id"), col("user_id"),
          date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"),
          round(col("click_click_value"), 4).as("click_value"))
        .orderBy(col("event_id"))
    }),

    // ── as-of join through the CUSTOM PLAN NODE (AsOfJoinNode →
    //    AsOfJoinStrategy → AsOfJoinExec single-pass merge) — same
    //    semantics as j_asof, same DuckDB ASOF oracle; the physical
    //    operator is the thing under test here. ───────────────────────────
    "j_asof_plan" -> ((s, d) => {
      graft.GraftExtensions.register(s)
      val ev = t(s, d, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(max_by(col("value"), col("event_id")).as("click_value"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      graft.plans.AsOfJoinPlan.asOfBackward(purchases, clicks,
          "user_id", "ts", Seq("click_value"), prefix = "click_")
        .select(col("event_id"), col("user_id"),
          date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"),
          round(col("click_click_value"), 4).as("click_value"))
        .orderBy(col("event_id"))
    }),

    // ── tolerance-bounded as-of: latest prior click, but only if within
    //    48h of the purchase (pandas merge_asof tolerance= shape) — stale
    //    matches null out; same single-exchange plan as j_asof ─────────────
    "j_asof_tolerance" -> ((s, d) => {
      val ev = t(s, d, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(max_by(col("value"), col("event_id")).as("click_value"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      graft.operators.AsOfJoin.asOfTolerance(purchases, clicks,
          "user_id", "ts", Seq("click_value"),
          toleranceSeconds = 48L * 3600, prefix = "click_")
        .select(col("event_id"), col("user_id"),
          date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"),
          round(col("click_click_value"), 4).as("click_value"))
        .orderBy(col("event_id"))
    }),

    // ── forward as-of join: NEXT click at-or-after each purchase ──────────
    "j_asof_forward" -> ((s, d) => {
      val ev = t(s, d, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(max_by(col("value"), col("event_id")).as("click_value"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      graft.operators.AsOfJoin.asOfForward(purchases, clicks,
          "user_id", "ts", Seq("click_value"), prefix = "click_")
        .select(col("event_id"), col("user_id"),
          date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"),
          round(col("click_click_value"), 4).as("click_value"))
        .orderBy(col("event_id"))
    }),

    // ── exact percentiles (median / p90, linear interpolation) ────────────
    // ── modal value per group with a DETERMINISTIC tie-break (highest
    //    count, then smallest value — engine mode() functions leave ties
    //    undefined, so the argmax is composed explicitly) ──────────────────
    "a_mode" -> ((s, d) => {
      val counts = t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("cnt").desc, col("l_quantity"))
      counts.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("l_returnflag"), col("l_quantity").as("mode_qty"),
          col("cnt").as("mode_count"))
        .orderBy(col("l_returnflag"))
    }),

    "a_percentiles" -> ((s, d) => {
      t(s, d, "lineitem").groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    // ── sessionization: gap-based session windows over the event stream
    //    (lag-diff → cumulative session ids → per-session rollup) ──────────
    "events_sessionize" -> ((s, d) => {
      val gapMinutes = 30
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      // One exchange + one sort feed BOTH window passes (lag, then the
      // running sum over its output) — verified in the physical plan; the
      // lag is materialized once and reused by the gap predicate.
      t(s, d, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_s",
          when(col("prev_ts").isNull ||
            col("ts").cast("long") - col("prev_ts").cast("long") >
              gapMinutes * 60L, 1L).otherwise(0L))
        .withColumn("session_id",
          sum(col("new_s")).over(byUser
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 4).as("session_value"),
          date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"))
        .orderBy(col("user_id"), col("session_id"))
    }),

    // ── session-duration distribution: the sessionize rollup feeding an
    //    exact percentile profile (p50/p90/p99 of session length) — the
    //    engagement-monitoring summary a product team reads daily ──────────
    "events_session_percentiles" -> ((s, d) => {
      val gapMinutes = 30
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val sess = t(s, d, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_s",
          when(col("prev_ts").isNull ||
            col("ts").cast("long") - col("prev_ts").cast("long") >
              gapMinutes * 60L, 1L).otherwise(0L))
        .withColumn("session_id",
          sum(col("new_s")).over(byUser
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_id"))
        // exact integer MICROseconds — floor(a)-floor(b) on seconds
        // diverges from the oracle on sub-second timestamps
        .agg((unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
            .as("dur_us"),
          count(lit(1)).as("n_events"))
      sess.agg(count(lit(1)).as("n_sessions"),
        round(expr("percentile(dur_us, 0.5)"), 4).as("p50_us"),
        round(expr("percentile(dur_us, 0.9)"), 4).as("p90_us"),
        round(expr("percentile(dur_us, 0.99)"), 4).as("p99_us"),
        max(col("dur_us")).as("max_us"),
        round(avg(col("n_events")), 4).as("avg_events"))
    }),

    // ── DAU/WAU stickiness: daily actives over trailing-7-day actives.
    //    EXACT distinct-user counts: the (day,user) grain dedups first, a
    //    user's activity then votes into each of the 7 windows it covers
    //    (explode + second distinct) — no approximate sketches, no
    //    quadratic self-join; every stage keyed on (day) or (day,user) ─────
    "events_dau_wau" -> ((s, d) => {
      val daily = t(s, d, "events")
        .select(to_date(col("ts")).as("day"), col("user_id"))
        .distinct()
      val dau = daily.groupBy(col("day")).agg(count(lit(1)).as("dau"))
      val wau = daily
        .select(explode(sequence(col("day"),
          date_add(col("day"), 6))).as("win_day"), col("user_id"))
        .distinct()
        .groupBy(col("win_day")).agg(count(lit(1)).as("wau"))
      dau.join(wau, col("day") === col("win_day"))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("dau"), col("wau"),
          round(col("dau").cast("double") / col("wau"), 4)
            .as("stickiness"))
        .orderBy(col("day"))
    }),

    // ── rollup: hierarchical totals (event_type ⊂ grand total) ────────────
    "events_rollup" -> ((s, d) => {
      t(s, d, "events")
        .rollup(col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
        .select(coalesce(col("event_type"), lit("ALL")).as("event_type"),
          col("n"), col("sum_value"))
        .orderBy(col("event_type"))
    }),

    // ── time bucketing (events → hourly rollup; streaming-adjacent) ───────
    "events_hourly" -> ((s, d) => {
      t(s, d, "events")
        .groupBy(date_format(date_trunc("hour", col("ts")),
          "yyyy-MM-dd HH:mm").as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
        .orderBy(col("hour"), col("event_type"))
    }),

    // ── approximate distinct (HLL++): the 100 TB scale form of A3's exact
    //    countDistinct — fixed-size sketch, no per-key shuffle of values.
    //    HLL estimates are data-deterministic (hash-based, not sampled), so
    //    the 5%-of-exact contract below is a stable oracle surface; the
    //    exact count rides along as the checked value. ──────────────────────
    "a_approx_distinct" -> ((s, d) => {
      t(s, d, "events").groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_users"),
          approx_count_distinct(col("user_id"), 0.02).as("approx"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("approx") - col("exact_users")) <=
            col("exact_users") * 0.05).as("approx_ok"))
        .orderBy(col("event_type"))
    }),

    // ── approximate percentiles (Greenwald-Khanna): the scale form of
    //    a_percentiles' exact sort-accumulate — bounded-memory sketch with
    //    rank error ≤ 1/accuracy. Deterministic for a given dataset; the
    //    0.1%-rank-accuracy estimate must land within 5% of the exact
    //    median (generous: the checked guarantee is on rank, the contract
    //    here is on value). ──────────────────────────────────────────────────
    "a_approx_quantiles" -> ((s, d) => {
      t(s, d, "lineitem").groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_extendedprice, 0.5)").as("exact_p50"),
          expr("approx_percentile(l_extendedprice, 0.5, 1000)")
            .as("approx_p50"))
        .select(col("l_returnflag"), round(col("exact_p50"), 4).as("p50"),
          (abs(col("approx_p50") - col("exact_p50")) <=
            abs(col("exact_p50")) * 0.05 + lit(0.001)).as("approx_ok"))
        .orderBy(col("l_returnflag"))
    }),

    // ── cube: all (type × hour-of-day) slices + both marginals + grand
    //    total in one pass (rollup's bigger sibling) ────────────────────────
    "events_cube" -> ((s, d) => {
      t(s, d, "events")
        .select(col("event_type"), hour(col("ts")).as("hod"), col("value"))
        .cube(col("event_type"), col("hod"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
        .select(coalesce(col("event_type"), lit("ALL")).as("event_type"),
          coalesce(col("hod"), lit(-1)).as("hod"),
          col("n"), col("sum_value"))
        .orderBy(col("event_type"), col("hod"))
    }),

    // ── quantile bucketing: ntile deciles per event type (the window form
    //    of train/eval stratification) ──────────────────────────────────────
    "w_ntile" -> ((s, d) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value"), col("event_id"))
      t(s, d, "events").select(col("event_id"),
          ntile(10).over(w).as("decile"))
        .orderBy(col("event_id"))
    }),

    // ── ranking-function family: rank / dense_rank / percent_rank /
    //    cume_dist over one keyed window (ties included by construction:
    //    l_quantity repeats within a suppkey) — completes the window-
    //    function surface next to row_number / ntile / lag-lead ────────────
    "w_rank_functions" -> ((s, d) => {
      val w = Window.partitionBy(col("l_suppkey")).orderBy(col("l_quantity"))
      val wAll = Window.partitionBy(col("l_suppkey"))
      // percent_rank/cume_dist emit exact rationals (r−1)/(n−1) and k/n;
      // round(x, 6) hits half boundaries (the source_gini lesson), so the
      // gate compares their exact INTEGER certificates instead:
      // round(pr·(n−1)) = r−1 and round(cd·n) = k, exact for n ≪ 2^26
      val n = count(lit(1)).over(wAll)
      t(s, d, "lineitem").filter(col("l_suppkey") < 10)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          round(percent_rank().over(w) * (n - 1)).cast("long")
            .as("prnk_num"),
          round(cume_dist().over(w) * n).cast("long").as("cdist_num"),
          n.as("n_part"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // ── full outer join: reconciliation shape (rows surviving on either
    //    side with defaults) — completes the join-type family ──────────────
    "j_full_outer" -> ((s, d) => {
      val custSample = t(s, d, "customer")
        .filter(col("c_custkey") % 3 === 0)
        .select(col("c_custkey").as("k"), col("c_name"))
      val bigOrders = t(s, d, "orders")
        .filter(col("o_totalprice") > 250000)
        .groupBy(col("o_custkey").as("k"))
        .agg(count(lit(1)).as("n_big"))
      custSample.join(bigOrders, Seq("k"), "full_outer")
        .select(col("k"), coalesce(col("c_name"), lit("?")).as("c_name"),
          coalesce(col("n_big"), lit(0L)).as("n_big"))
        .orderBy(col("k"))
    }),

    // ── dispersion statistics: stddev + correlation per group ─────────────
    "a_dispersion" -> ((s, d) => {
      t(s, d, "lineitem").groupBy(col("l_returnflag"))
        .agg(round(stddev_samp(col("l_extendedprice")), 4).as("sd_price"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6)
            .as("corr_qty_price"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    // ── outlier detection: per-group z-score flags (the data-quality
    //    screen a pipeline runs before training on numeric signals).
    //    Group stats broadcast back over the rows — two passes, no window
    //    over the whole table. ──────────────────────────────────────────────
    "a_outliers" -> ((s, d) => {
      val ev = t(s, d, "events")
      val stats = ev.groupBy(col("event_type"))
        .agg(avg(col("value")).as("mu"),
          stddev_samp(col("value")).as("sigma"))
      ev.join(broadcast(stats), Seq("event_type"))
        .select(col("event_id"),
          round((col("value") - col("mu")) / col("sigma"), 4).as("z"))
        // filter on the ROUNDED z: both engines compare identical values,
        // so the 3.0 boundary cannot flip on accumulation-order noise
        .filter(abs(col("z")) > 3.0)
        .orderBy(col("event_id"))
    }),

    // ── robust (median/MAD) extremes: the outlier screen that a heavy
    //    tail cannot poison — mean/stddev move with the contamination,
    //    median/MAD do not. Exact percentile on INTEGER-valued input
    //    (med/MAD are k.0 or k.5 — exact in both engines); ranking is on
    //    the ROUNDED |z| so the order cannot flip on a last-ulp. Top-20
    //    contract rather than a threshold: value-checked regardless of
    //    the corpus's tail shape. ──────────────────────────────────────────
    "a_mad_extremes" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val med = docs.agg(expr("percentile(n_chars, 0.5)").as("med"))
      val dev = docs.crossJoin(broadcast(med))
        .withColumn("adev", abs(col("n_chars") - col("med")))
      val mad = dev.agg(expr("percentile(adev, 0.5)").as("mad"),
        min(col("med")).as("med2"))
      docs.crossJoin(broadcast(mad))
        .select(col("doc_id"), col("n_chars"),
          round(lit(0.6745) * (col("n_chars") - col("med2")) / col("mad"), 4)
            .as("z"))
        .orderBy(abs(col("z")).desc, col("doc_id").asc)
        .limit(20)
    })
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |round(sum(l_quantity), 2) AS sum_qty,
        |round(sum(l_extendedprice), 2) AS sum_base,
        |round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |round(avg(l_quantity), 4) AS avg_qty,
        |round(avg(l_discount), 4) AS avg_disc,
        |count(*) AS n
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q3_top_orders" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |AND o_orderdate < TIMESTAMP '1998-06-01'
        |AND l_shipdate >= TIMESTAMP '1998-06-01'
        |GROUP BY 1, 2
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q6_revenue_delta" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |AND l_shipdate < TIMESTAMP '1997-01-01'
        |AND l_discount BETWEEN 0.03 AND 0.07
        |AND l_quantity < 24""".stripMargin,

    "q7_nation_volume" ->
      """SELECT
        |CASE WHEN cn.n_nationkey < 12 THEN 'EAST' ELSE 'WEST' END
        |  AS cust_region,
        |CASE WHEN sn.n_nationkey < 12 THEN 'EAST' ELSE 'WEST' END
        |  AS supp_region,
        |CAST(year(l_shipdate) AS INT) AS l_year,
        |round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |WHERE (cn.n_nationkey < 12) <> (sn.n_nationkey < 12)
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q8_market_share" ->
      """WITH rev AS (
        |  SELECT r_name AS cust_region,
        |  CAST(year(l_shipdate) AS INT) AS l_year,
        |  l_extendedprice * (1 - l_discount) AS rv,
        |  s_nationkey < 12 AS east_supp
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey)
        |SELECT cust_region, l_year,
        |round(sum(CASE WHEN east_supp THEN rv ELSE 0.0 END), 2)
        |  AS east_revenue,
        |round(sum(rv), 2) AS total_revenue,
        |round(round(sum(CASE WHEN east_supp THEN rv ELSE 0.0 END), 2)
        |  / round(sum(rv), 2), 4) AS east_share
        |FROM rev GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q17_small_quantity" ->
      """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
        |count(*) AS n_items
        |FROM lineitem l
        |WHERE l_quantity < (SELECT 0.5 * avg(l_quantity)
        |                    FROM lineitem WHERE l_partkey = l.l_partkey)
        |""".stripMargin,

    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2)
        |    AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "q13_order_distribution" ->
      """WITH per_cust AS (
        |  SELECT c_custkey, count(o_custkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY 1)
        |SELECT c_count, count(*) AS custdist
        |FROM per_cust GROUP BY 1
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, sum(l_quantity) AS total_qty
        |  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 120)
        |SELECT o_orderkey, o_custkey,
        |strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |round(o_totalprice, 2) AS o_totalprice,
        |round(total_qty, 2) AS total_qty
        |FROM orders JOIN big ON o_orderkey = l_orderkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "q22_churned_customers" ->
      """SELECT c_nationkey, count(*) AS numcust,
        |round(sum(c_acctbal), 2) AS totacctbal
        |FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
        |                   WHERE c_acctbal > 0.0)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q19_disjunctive" ->
      """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2)
        |  AS revenue,
        |count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity <= 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
        |       AND l_quantity >= 40)""".stripMargin,

    "q2_min_cost_supplier" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |  min(l_extendedprice / l_quantity) AS unit
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_size < 10 GROUP BY 1, 2)
        |SELECT l_partkey AS p_partkey, s_name, n_name,
        |unit AS unit_price, s_acctbal
        |FROM ps
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE unit = (SELECT min(unit) FROM ps p2
        |              WHERE p2.l_partkey = ps.l_partkey)
        |ORDER BY p_partkey, s_name""".stripMargin,

    "q11_important_stock" ->
      """WITH v AS (
        |  SELECT n_name,
        |  sum(CAST(l_quantity AS DECIMAL(4,0)) *
        |      CAST(p_retailprice AS DECIMAL(6,2))) AS val
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  GROUP BY 1)
        |SELECT n_name, CAST(val AS DOUBLE) AS value FROM v
        |WHERE CAST(val AS DOUBLE) >
        |  (SELECT CAST(sum(val) AS DOUBLE) * 0.02 FROM v)
        |ORDER BY value DESC, n_name""".stripMargin,

    "q12_late_priority" ->
      """SELECT
        |CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  THEN 'LATE' ELSE 'ON-TIME' END AS lateness,
        |CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |  THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |  THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q9_product_profit" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
        |CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |  (1 - CAST(l_discount AS DECIMAL(3,2)))
        |  - CAST(0.1 AS DECIMAL(2,1)) *
        |    CAST(p_retailprice AS DECIMAL(6,2)) *
        |    CAST(l_quantity AS DECIMAL(4,0))), 2) AS DOUBLE) AS profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE 'red %'
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,

    "q16_supplier_counts" ->
      """SELECT p_brand, p_type, p_size,
        |CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) b
        |JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#45'
        |AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
        |AND l_suppkey NOT IN
        |  (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q20_excess_shipments" ->
      """SELECT s_suppkey, s_name, s_acctbal FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE 'red %'
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  GROUP BY l_suppkey, l_partkey
        |  HAVING sum(l_quantity) > 50)
        |ORDER BY s_name""".stripMargin,

    "q21_waiting_suppliers" ->
      """WITH lo AS (
        |  SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F')
        |SELECT s_name, count(*) AS numwait
        |FROM lo l1 JOIN supplier ON s_suppkey = l1.l_suppkey
        |WHERE l1.l_shipdate > l1.o_orderdate + INTERVAL 60 DAY
        |AND EXISTS (SELECT 1 FROM lo l2
        |  WHERE l2.l_orderkey = l1.l_orderkey
        |  AND l2.l_suppkey <> l1.l_suppkey)
        |AND NOT EXISTS (SELECT 1 FROM lo l3
        |  WHERE l3.l_orderkey = l1.l_orderkey
        |  AND l3.l_suppkey <> l1.l_suppkey
        |  AND l3.l_shipdate > l3.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,

    "q14_promo_share" ->
      """WITH j AS (
        |  SELECT p.p_type, l.l_extendedprice * (1 - l.l_discount) AS rev
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
        |  AND l.l_shipdate < TIMESTAMP '1996-06-01')
        |SELECT
        |round(sum(CASE WHEN p_type LIKE 'PROMO%' THEN rev ELSE 0.0 END), 2)
        |  AS promo_revenue,
        |round(sum(rev), 2) AS total_revenue,
        |round(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%' THEN rev
        |  ELSE 0.0 END) / sum(rev), 4) AS promo_share_pct
        |FROM j""".stripMargin,

    "q5_region_volume" ->
      """SELECT n_name,
        |round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |  AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |AND o_orderdate >= TIMESTAMP '1996-01-01'
        |AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin,

    "s2_scan_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_quantity < 3 ORDER BY l_orderkey, l_linenumber""".stripMargin,

    // closed-form replay of the synthesized booklet corpus: per doc the
    // EXACT page text the codec must extract (lines joined by \n plus
    // the trailing \n — the pymupdf get_text contract PdfCodecSpec
    // pins), hashed on both sides; page_idx replays as the doc's rank
    // inside its book group (unique ORDER BY doc_id)
    "pdf_pages_scan" ->
      """WITH d AS (
        |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(doc_id % 50 AS BIGINT) AS g,
        |  'DOC ' || doc_id || chr(10) ||
        |  array_to_string(
        |    ['pg ' || doc_id || ' ln ' || j ||
        |      repeat(' t' || ((doc_id + j) % 7),
        |             CAST(3 + ((doc_id + j) % 5) AS INT))
        |     FOR j IN range(1, CAST(2 + doc_id % 4 AS BIGINT))],
        |    chr(10)) || chr(10) AS txt
        |  FROM documents)
        |SELECT doc_id,
        |'book_' || g || '.pdf' AS file_name,
        |CAST(row_number() OVER (PARTITION BY g ORDER BY doc_id) - 1
        |  AS BIGINT) AS page_idx,
        |CAST(2 + doc_id % 4 AS BIGINT) AS n_lines,
        |CAST(length(txt) AS BIGINT) AS n_chars,
        |md5(txt) AS text_md5,
        |doc_id % 11 = 0 AS has_images
        |FROM d ORDER BY doc_id""".stripMargin,

    "f_filters" ->
      """SELECT doc_id, n_chars FROM documents
        |WHERE doc_id >= 1 AND strpos(text, 'join') > 0 AND n_chars > 200
        |ORDER BY doc_id""".stripMargin,

    "t6_tokenize" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |  unnest(range(len(string_split_regex(text, '\s+')))) AS pos,
        |  unnest(string_split_regex(text, '\s+')) AS token
        |  FROM documents)
        |SELECT doc_id, CAST(pos AS INT) AS pos, token FROM tok
        |WHERE length(token) > 0
        |ORDER BY doc_id, pos""".stripMargin,

    "f7_short_tokens" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |  unnest(range(len(string_split_regex(text, '\s+')))) AS pos,
        |  unnest(string_split_regex(text, '\s+')) AS token
        |  FROM documents)
        |SELECT doc_id, CAST(pos AS INT) AS pos, token FROM tok
        |WHERE length(token) > 0 AND length(token) <= 4
        |ORDER BY doc_id, pos""".stripMargin,

    "t_scalar_strings" ->
      """SELECT doc_id,
        |upper(text[1:20]) AS head20,
        |regexp_replace(text, 'data', 'DATA', 'g') AS replaced,
        |CAST(length(text) AS INT) AS len,
        |CAST(strpos(text, 'join') AS INT) AS join_pos
        |FROM documents ORDER BY doc_id""".stripMargin,

    "t8_extract_fields" ->
      """SELECT doc_id,
        |CAST(regexp_extract(source, 'src([0-9]+)', 1) AS INT) AS src_num,
        |lang || '_' || CAST(doc_id AS VARCHAR) AS synth_id
        |FROM documents ORDER BY doc_id""".stripMargin,

    "t9_bucket_case" ->
      """SELECT CASE WHEN l_quantity <= 10 THEN 'small'
        |WHEN l_quantity <= 30 THEN 'mid' ELSE 'large' END AS bucket,
        |count(*) AS n, round(sum(l_quantity), 2) AS qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "t13_template" ->
      """SELECT doc_id, printf('(Doc/%d)  %s', doc_id, text[1:30]) AS record
        |FROM documents ORDER BY doc_id""".stripMargin,

    "j1_equi_join" ->
      """SELECT o_orderkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "j1_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin,

    "j_semi_join" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
        |ORDER BY p_partkey""".stripMargin,

    "j2_lookup_default" ->
      """SELECT p_partkey, coalesce(cnt, 0) AS n_lines
        |FROM part LEFT JOIN (
        |  SELECT l_partkey, count(*) AS cnt FROM lineitem GROUP BY 1
        |) ON p_partkey = l_partkey
        |ORDER BY p_partkey""".stripMargin,

    "j3_range_join" ->
      """SELECT doc_id, bucket
        |FROM documents JOIN (VALUES ('short', 0, 200), ('mid', 201, 400),
        |  ('long', 401, 10000000)) r(bucket, lo, hi)
        |ON n_chars BETWEEN lo AND hi
        |ORDER BY doc_id""".stripMargin,

    "j_multiway" ->
      """SELECT r_name, count(*) AS n_customers,
        |round(avg(c_acctbal), 4) AS avg_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "a2_running_sum" ->
      """SELECT event_id, user_id,
        |round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
        |  AS running_value
        |FROM events ORDER BY event_id""".stripMargin,

    "w1_row_number" ->
      """SELECT event_id, CAST(row_number() OVER (PARTITION BY user_id
        |ORDER BY ts, event_id) AS INT) AS rn
        |FROM events ORDER BY event_id""".stripMargin,

    "w2_offset_ids" ->
      """SELECT event_id,
        |row_number() OVER (ORDER BY ts, event_id) + 1000 AS point_id
        |FROM events ORDER BY event_id""".stripMargin,

    "a3_group_stats" ->
      """SELECT event_type, count(*) AS n,
        |count(DISTINCT user_id) AS n_users,
        |round(sum(value), 4) AS sum_value,
        |round(avg(value), 4) AS avg_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "a4_pivot_stats" ->
      """SELECT source,
        |count(CASE WHEN lang = 'de' THEN 1 END) AS de,
        |count(CASE WHEN lang = 'en' THEN 1 END) AS en,
        |count(CASE WHEN lang = 'es' THEN 1 END) AS es,
        |count(CASE WHEN lang = 'fr' THEN 1 END) AS fr,
        |count(CASE WHEN lang = 'zh' THEN 1 END) AS zh
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "a5_summary_stats" ->
      """SELECT l_returnflag, min(l_quantity) AS min_qty,
        |max(l_quantity) AS max_qty, round(avg(l_quantity), 4) AS avg_qty,
        |count(DISTINCT l_partkey) AS n_parts
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "set_except" ->
      """SELECT c_custkey FROM customer
        |EXCEPT SELECT o_custkey FROM orders WHERE o_totalprice > 200000
        |ORDER BY c_custkey""".stripMargin,

    "set_intersect" ->
      """SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) >= 1997
        |ORDER BY c_custkey""".stripMargin,

    "w_lag_lead" ->
      """SELECT event_id,
        |lag(event_type) OVER w AS prev_type,
        |lead(event_type) OVER w AS next_type,
        |first_value(event_type) OVER (PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,

    "a_unpivot" ->
      """SELECT l_linestatus, flag, qty FROM (
        |  SELECT l_linestatus,
        |  round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2) AS "A",
        |  round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2) AS "N",
        |  round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2) AS "R"
        |  FROM lineitem GROUP BY 1)
        |UNPIVOT (qty FOR flag IN ("A", "N", "R"))
        |ORDER BY l_linestatus, flag""".stripMargin,

    "j_asof" ->
      """WITH clicks AS (
        |  SELECT user_id, ts, arg_max(value, event_id) AS click_value
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |purch AS (
        |  SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id,
        |strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
        |round(c.click_value, 4) AS click_value
        |FROM purch p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,

    "j_asof_tolerance" ->
      """WITH clicks AS (
        |  SELECT user_id, ts, arg_max(value, event_id) AS click_value
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |purch AS (
        |  SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id,
        |CASE WHEN p.ts - c.ts <= INTERVAL 48 HOUR
        |  THEN strftime(c.ts, '%Y-%m-%d %H:%M:%S') END AS click_ts,
        |CASE WHEN p.ts - c.ts <= INTERVAL 48 HOUR
        |  THEN round(c.click_value, 4) END AS click_value
        |FROM purch p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,

    "j_asof_plan" ->
      """WITH clicks AS (
        |  SELECT user_id, ts, arg_max(value, event_id) AS click_value
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |purch AS (
        |  SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id,
        |strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
        |round(c.click_value, 4) AS click_value
        |FROM purch p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,

    "j_asof_forward" ->
      """WITH clicks AS (
        |  SELECT user_id, ts, arg_max(value, event_id) AS click_value
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |purch AS (
        |  SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id,
        |strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
        |round(c.click_value, 4) AS click_value
        |FROM purch p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.ts <= c.ts
        |ORDER BY p.event_id""".stripMargin,

    "a_mode" ->
      """WITH c AS (
        |  SELECT l_returnflag, l_quantity, count(*) AS cnt
        |  FROM lineitem GROUP BY 1, 2),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY l_returnflag
        |    ORDER BY cnt DESC, l_quantity) AS rk FROM c)
        |SELECT l_returnflag, l_quantity AS mode_qty, cnt AS mode_count
        |FROM r WHERE rk = 1 ORDER BY l_returnflag""".stripMargin,

    "a_percentiles" ->
      """SELECT l_returnflag,
        |round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
        |count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "events_sessionize" ->
      """WITH lagged AS (
        |  SELECT user_id, event_id, ts, value,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |       OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
        |       THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT user_id, ts, value,
        |  -- DuckDB's sum(INTEGER) yields HUGEINT; cast to match Spark's BIGINT
        |  CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS session_id
        |  FROM lagged)
        |SELECT user_id, session_id, count(*) AS n_events,
        |round(sum(value), 4) AS session_value,
        |strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start
        |FROM sessions GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "events_dau_wau" ->
      """WITH daily AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        |dau AS (SELECT day, count(*) AS dau FROM daily GROUP BY 1),
        |wau AS (
        |  SELECT win_day, count(DISTINCT user_id) AS wau FROM (
        |    SELECT CAST(day + i * INTERVAL 1 DAY AS DATE) AS win_day,
        |    user_id FROM daily, range(0, 7) t(i))
        |  GROUP BY 1)
        |SELECT strftime(d.day, '%Y-%m-%d') AS day, d.dau, w.wau,
        |round(d.dau::DOUBLE / w.wau, 4) AS stickiness
        |FROM dau d JOIN wau w ON d.day = w.win_day ORDER BY 1""".stripMargin,

    "events_session_percentiles" ->
      """WITH lagged AS (
        |  SELECT user_id, ts, event_id,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |       OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
        |       THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT user_id, ts,
        |  CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS session_id
        |  FROM lagged),
        |s AS (
        |  SELECT user_id, session_id,
        |  epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us,
        |  count(*) AS n_events
        |  FROM sessions GROUP BY 1, 2)
        |SELECT count(*) AS n_sessions,
        |round(quantile_cont(dur_us, 0.5), 4) AS p50_us,
        |round(quantile_cont(dur_us, 0.9), 4) AS p90_us,
        |round(quantile_cont(dur_us, 0.99), 4) AS p99_us,
        |max(dur_us) AS max_us,
        |round(avg(n_events), 4) AS avg_events
        |FROM s""".stripMargin,

    "events_rollup" ->
      """SELECT coalesce(event_type, 'ALL') AS event_type,
        |count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY ROLLUP (event_type) ORDER BY 1""".stripMargin,

    "events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour,
        |event_type, count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // the sketch queries' oracle surface: exact value + the tolerance
    // verdict (TRUE = the engine's estimate must sit within the contract)
    "a_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        |TRUE AS approx_ok
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "a_approx_quantiles" ->
      """SELECT l_returnflag,
        |round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |TRUE AS approx_ok
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "events_cube" ->
      """WITH base AS (
        |  SELECT event_type, CAST(hour(ts) AS INT) AS hod, value FROM events)
        |SELECT coalesce(event_type, 'ALL') AS event_type,
        |coalesce(hod, -1) AS hod,
        |count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM base GROUP BY CUBE (event_type, hod) ORDER BY 1, 2""".stripMargin,

    "w_rank_functions" ->
      """SELECT l_orderkey, l_linenumber, l_suppkey,
        |CAST(rank() OVER w AS INT) AS rnk,
        |CAST(dense_rank() OVER w AS INT) AS drnk,
        |CAST(round(percent_rank() OVER w *
        |  (count(*) OVER p - 1)) AS BIGINT) AS prnk_num,
        |CAST(round(cume_dist() OVER w *
        |  count(*) OVER p) AS BIGINT) AS cdist_num,
        |count(*) OVER p AS n_part
        |FROM lineitem WHERE l_suppkey < 10
        |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_quantity),
        |       p AS (PARTITION BY l_suppkey)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "w_ntile" ->
      """SELECT event_id, CAST(ntile(10) OVER
        |(PARTITION BY event_type ORDER BY value, event_id) AS INT) AS decile
        |FROM events ORDER BY event_id""".stripMargin,

    "j_full_outer" ->
      """WITH cs AS (
        |  SELECT c_custkey AS k, c_name FROM customer WHERE c_custkey % 3 = 0),
        |bo AS (
        |  SELECT o_custkey AS k, count(*) AS n_big FROM orders
        |  WHERE o_totalprice > 250000 GROUP BY 1)
        |SELECT coalesce(cs.k, bo.k) AS k,
        |coalesce(c_name, '?') AS c_name,
        |coalesce(n_big, 0) AS n_big
        |FROM cs FULL JOIN bo ON cs.k = bo.k ORDER BY 1""".stripMargin,

    "a_dispersion" ->
      """SELECT l_returnflag,
        |round(stddev_samp(l_extendedprice), 4) AS sd_price,
        |round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        |count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "a_outliers" ->
      """WITH s AS (
        |  SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sigma
        |  FROM events GROUP BY 1)
        |SELECT event_id, z FROM (
        |  SELECT event_id, round((value - mu) / sigma, 4) AS z
        |  FROM events JOIN s USING (event_type))
        |WHERE abs(z) > 3.0
        |ORDER BY event_id""".stripMargin,

    "a_mad_extremes" ->
      """WITH m AS (
        |  SELECT quantile_cont(n_chars, 0.5) AS med FROM documents),
        |d2 AS (
        |  SELECT doc_id, n_chars, abs(n_chars - m.med) AS adev, m.med
        |  FROM documents, m),
        |m2 AS (SELECT quantile_cont(adev, 0.5) AS mad,
        |  min(med) AS med2 FROM d2)
        |SELECT doc_id, n_chars,
        |round(0.6745::DOUBLE * (n_chars - m2.med2) / m2.mad, 4) AS z
        |FROM documents, m2
        |ORDER BY abs(round(0.6745::DOUBLE * (n_chars - m2.med2) / m2.mad,
        |  4)) DESC, doc_id LIMIT 20""".stripMargin
  )
}
