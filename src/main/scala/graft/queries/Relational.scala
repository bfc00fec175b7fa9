package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Relational core (SURVEY.md §2.2–§2.8, §7 M1): the pkg2 query surface —
  * search/filter/paginate, catalog joins, stats-page aggregations —
  * re-expressed over the TPC-H-ish fixtures.
  *
  * Oracle-parity discipline (SURVEY.md §5.2): every aggregate of a double is
  * wrapped in `round(_, k)` on BOTH sides (summation order differs between
  * engines by a few ulps); every query ends in a deterministic ORDER BY with
  * a unique tie-breaker; DuckDB's INT-width quirks (length/row_number/year →
  * BIGINT) are normalized by explicit casts in the oracle SQL.
  *
  * Scale notes: filters are native column predicates (pushed to parquet);
  * dims (region/nation/supplier, and the VALUES band table) are broadcast;
  * top-k is orderBy+limit → TakeOrderedAndProject (no global sort); all
  * group-bys get map-side partial aggregation from Catalyst for free.
  */
object Relational {
  type QFn = (SparkSession, String) => DataFrame

  private def revenue = col("l_extendedprice") * (lit(1) - col("l_discount"))
  private def tsNtz(s: String) = lit(s).cast("timestamp_ntz")

  val queries: Seq[(String, QFn)] = Seq(
    // A1/A2/A7 + P2 + O1 — TPC-H Q1 shape: flagship pricing summary.
    "q01_pricing_summary" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= tsNtz("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(revenue), 2).as("sum_disc_price"),
          round(sum(revenue * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg("l_quantity"), 2).as("avg_qty"),
          round(avg("l_extendedprice"), 2).as("avg_price"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // J1/J2 — 5-way star join, dims broadcast; revenue per customer nation.
    "q02_revenue_by_nation" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .filter(col("o_orderdate") >= tsNtz("1996-01-01") && col("o_orderdate") < tsNtz("1998-01-01"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(round(sum(revenue), 2).as("revenue"), count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // J1 + O3 — TPC-H Q3 shape: top-k by revenue → TakeOrderedAndProject.
    "q03_top_unshipped_orders" -> { (s, dir) =>
      Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < tsNtz("1998-03-15"))
        .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > tsNtz("1998-03-15"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(round(sum(revenue), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    },

    // J4 left-semi (EXISTS) — TPC-H Q4 shape.
    "q04_order_priority_exists" -> { (s, dir) =>
      val late = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") > tsNtz("1996-07-01"))
        .select(col("l_orderkey"))
      Tables.orders(s, dir)
        .filter(col("o_orderdate") >= tsNtz("1996-07-01") && col("o_orderdate") < tsNtz("1996-10-01"))
        .join(late, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    // J5 left-anti (NOT EXISTS) — customers with no urgent order, per nation.
    "q05_customers_without_orders" -> { (s, dir) =>
      val urgent = Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
      Tables.customer(s, dir)
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("n_customers").desc, col("n_name"))
    },

    // P2/P6/A2 — TPC-H Q6 shape: sargable filter-only aggregate, no shuffle
    // beyond the single-row final agg.
    "q06_revenue_forecast" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= tsNtz("1996-01-01") && col("l_shipdate") < tsNtz("1997-01-01")
          && col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("promo_revenue"),
          count(lit(1)).as("n_items"))
    },

    // A6 rollup + grouping_id over region→nation customer stats. SQL path:
    // Spark 4.1's DetectAmbiguousSelfJoin false-positives on the DataFrame
    // join→rollup combination (Expand re-exposes the pre-null-extended
    // attrs); the SQL analyzer has no dataset-id metadata so is immune.
    "q07_rollup_region_nation" -> { (s, dir) =>
      Tables.customer(s, dir).createOrReplaceTempView("v_customer")
      Tables.nation(s, dir).createOrReplaceTempView("v_nation")
      Tables.region(s, dir).createOrReplaceTempView("v_region")
      s.sql("""
        SELECT r_name, n_name, count(*) AS n_customers,
               round(sum(c_acctbal), 2) AS total_bal,
               CAST(grouping_id() AS INT) AS gid
        FROM v_customer
        JOIN v_nation ON c_nationkey = n_nationkey
        JOIN v_region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP(r_name, n_name)
        ORDER BY gid, r_name NULLS FIRST, n_name NULLS FIRST""")
    },

    // A6 cube over order status × priority.
    "q08_cube_status_priority" -> { (s, dir) =>
      Tables.orders(s, dir)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("total"),
          grouping_id().cast("int").as("gid"))
        .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    },

    // A3 exact distinct counts.
    "q09_distinct_stats" -> { (s, dir) =>
      Tables.orders(s, dir).agg(
        countDistinct(col("o_custkey")).as("n_active_customers"),
        countDistinct(col("o_orderpriority")).as("n_priorities"),
        countDistinct(year(col("o_orderdate"))).as("n_years"))
    },

    // W1 + O4 — per-group top-k via row_number window.
    "q10_top_parts_per_brand" -> { (s, dir) =>
      val w = Window.partitionBy("p_brand").orderBy(col("p_retailprice").desc, col("p_partkey"))
      Tables.part(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("p_brand", "p_name", "p_retailprice", "rn")
        .orderBy("p_brand", "rn")
    },

    // W4 ntile / percent_rank over supplier balances.
    "q11_supplier_percentiles" -> { (s, dir) =>
      val w = Window.orderBy(col("s_acctbal").desc, col("s_suppkey"))
      Tables.supplier(s, dir)
        .select(col("s_name"), col("s_acctbal"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 4).as("pr"))
        .orderBy(col("s_acctbal").desc, col("s_name"))
    },

    // U2/U3 intersect + except on customer-key sets.
    "q12_segment_set_ops" -> { (s, dir) =>
      val hb = Tables.customer(s, dir).filter(col("c_acctbal") > 5000).select(col("c_custkey"))
      val active = Tables.orders(s, dir).select(col("o_custkey").as("c_custkey")).distinct()
      val noOrders = hb.except(active).agg(count(lit(1)).as("n")).select(lit("hb_no_orders").as("tag"), col("n"))
      val withOrders = hb.intersect(active).agg(count(lit(1)).as("n")).select(lit("hb_active").as("tag"), col("n"))
      noOrders.unionByName(withOrders).orderBy("tag")
    },

    // A5 max_by with a unique (date, key) tuple — latest order per customer.
    "q13_latest_order_per_customer" -> { (s, dir) =>
      Tables.orders(s, dir)
        .groupBy(col("o_custkey").as("c_custkey"))
        .agg(max_by(col("o_orderkey"), struct(col("o_orderdate"), col("o_orderkey"))).as("last_orderkey"),
          max(col("o_orderdate")).as("last_orderdate"),
          max_by(col("o_totalprice"), struct(col("o_orderdate"), col("o_orderkey"))).as("last_totalprice"))
        .orderBy("c_custkey")
    },

    // P3/P4 + §2.8 string family — search-box semantics over part names.
    "q14_name_search" -> { (s, dir) =>
      Tables.part(s, dir)
        .filter(lower(col("p_name")).contains("al") || col("p_type").startsWith("PROMO"))
        .select(col("p_partkey"), lower(col("p_name")).as("name_lc"),
          length(col("p_name")).as("name_len"),
          substring(col("p_type"), 1, 4).as("type_prefix"),
          levenshtein(col("p_brand"), lit("Brand#11")).as("brand_dist"))
        .orderBy("p_partkey")
    },

    // §2.8 date family — monthly order stats.
    "q15_monthly_order_stats" -> { (s, dir) =>
      Tables.orders(s, dir)
        .groupBy(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
        .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("total"),
          min("o_totalprice").as("min_price"), max("o_totalprice").as("max_price"))
        .orderBy("y", "m")
    },

    // J8 theta/range join against a tiny broadcast band table.
    "q16_price_band_join" -> { (s, dir) =>
      import s.implicits._
      val bands = Seq(("low", 0.0, 100000.0), ("mid", 100000.0, 300000.0), ("high", 300000.0, 1e12))
        .toDF("band", "lo", "hi")
      Tables.orders(s, dir)
        .join(broadcast(bands), col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
        .groupBy("band")
        .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("band")
    },

    // U1 unionByName with missing columns — one parties table from two sources.
    "q17_union_parties" -> { (s, dir) =>
      val c = Tables.customer(s, dir).select(lit("customer").as("party_type"),
        col("c_mktsegment").as("segment"), col("c_acctbal").as("acctbal"))
      val p = Tables.supplier(s, dir).select(lit("supplier").as("party_type"),
        col("s_acctbal").as("acctbal"))
      c.unionByName(p, allowMissingColumns = true)
        .groupBy("party_type", "segment")
        .agg(count(lit(1)).as("n"), round(sum("acctbal"), 2).as("total_bal"))
        .orderBy(col("party_type"), col("segment").asc_nulls_first)
    })

  val oracles: Seq[(String, String)] = Seq(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base_price,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        | round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),2) AS sum_charge,
        | round(avg(l_quantity),2) AS avg_qty,
        | round(avg(l_extendedprice),2) AS avg_price,
        | round(avg(l_discount),4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_revenue_by_nation" ->
      """SELECT r_name, n_name, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue, count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY r_name, n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "q03_top_unshipped_orders" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15'
        |  AND l_shipdate > TIMESTAMP '1998-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderdate, l_orderkey
        |LIMIT 10""".stripMargin,

    "q04_order_priority_exists" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > TIMESTAMP '1996-07-01')
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q05_customers_without_orders" ->
      """SELECT n_name, count(*) AS n_customers
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY n_name
        |ORDER BY n_customers DESC, n_name""".stripMargin,

    "q06_revenue_forecast" ->
      """SELECT round(sum(l_extendedprice*l_discount),2) AS promo_revenue, count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    "q07_rollup_region_nation" ->
      """SELECT r_name, n_name, count(*) AS n_customers, round(sum(c_acctbal),2) AS total_bal,
        | CAST(grouping(r_name, n_name) AS INTEGER) AS gid
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY gid, r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,

    "q08_cube_status_priority" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
        | round(sum(o_totalprice),2) AS total,
        | CAST(grouping(o_orderstatus, o_orderpriority) AS INTEGER) AS gid
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q09_distinct_stats" ->
      """SELECT count(DISTINCT o_custkey) AS n_active_customers,
        | count(DISTINCT o_orderpriority) AS n_priorities,
        | count(DISTINCT year(o_orderdate)) AS n_years
        |FROM orders""".stripMargin,

    "q10_top_parts_per_brand" ->
      """SELECT p_brand, p_name, p_retailprice, CAST(rn AS INTEGER) AS rn FROM (
        | SELECT p_brand, p_name, p_retailprice, p_partkey,
        |  row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
        | FROM part) t
        |WHERE rn <= 3
        |ORDER BY p_brand, rn""".stripMargin,

    "q11_supplier_percentiles" ->
      """SELECT s_name, s_acctbal,
        | CAST(ntile(4) OVER (ORDER BY s_acctbal DESC, s_suppkey) AS INTEGER) AS quartile,
        | round(percent_rank() OVER (ORDER BY s_acctbal DESC, s_suppkey), 4) AS pr
        |FROM supplier
        |ORDER BY s_acctbal DESC, s_name""".stripMargin,

    "q12_segment_set_ops" ->
      """WITH hb AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
        | active AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders)
        |SELECT 'hb_no_orders' AS tag, count(*) AS n FROM (SELECT * FROM hb EXCEPT SELECT * FROM active) a
        |UNION ALL
        |SELECT 'hb_active' AS tag, count(*) AS n FROM (SELECT * FROM hb INTERSECT SELECT * FROM active) b
        |ORDER BY tag""".stripMargin,

    "q13_latest_order_per_customer" ->
      """SELECT o_custkey AS c_custkey, o_orderkey AS last_orderkey,
        | o_orderdate AS last_orderdate, o_totalprice AS last_totalprice
        |FROM (SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |       row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |      FROM orders) t
        |WHERE rn = 1
        |ORDER BY c_custkey""".stripMargin,

    "q14_name_search" ->
      """SELECT p_partkey, lower(p_name) AS name_lc,
        | CAST(length(p_name) AS INTEGER) AS name_len,
        | substring(p_type, 1, 4) AS type_prefix,
        | CAST(levenshtein(p_brand, 'Brand#11') AS INTEGER) AS brand_dist
        |FROM part
        |WHERE lower(p_name) LIKE '%al%' OR starts_with(p_type, 'PROMO')
        |ORDER BY p_partkey""".stripMargin,

    "q15_monthly_order_stats" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS y, CAST(month(o_orderdate) AS INTEGER) AS m,
        | count(*) AS n_orders, round(sum(o_totalprice),2) AS total,
        | min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
        |FROM orders
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "q16_price_band_join" ->
      """SELECT band, count(*) AS n_orders, round(sum(o_totalprice),2) AS total
        |FROM orders
        |JOIN (VALUES ('low', 0.0, 100000.0), ('mid', 100000.0, 300000.0), ('high', 300000.0, 1e12)) AS b(band, lo, hi)
        |  ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY band
        |ORDER BY band""".stripMargin,

    "q17_union_parties" ->
      """SELECT party_type, segment, count(*) AS n, round(sum(acctbal),2) AS total_bal
        |FROM (SELECT 'customer' AS party_type, c_mktsegment AS segment, c_acctbal AS acctbal FROM customer
        |      UNION ALL
        |      SELECT 'supplier' AS party_type, NULL AS segment, s_acctbal AS acctbal FROM supplier) u
        |GROUP BY party_type, segment
        |ORDER BY party_type, segment NULLS FIRST""".stripMargin)
}
