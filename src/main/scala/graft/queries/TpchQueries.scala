package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Relational workhorse queries over the TPC-H-ish tables — the reference's
  * Postgres side (materialized ROLLUP views, citation month counting, sorts
  * and limits; SURVEY.md §2.4 A8/A10/A11, §2.6).
  *
  * Float discipline: every money/quantity aggregate is computed in exact
  * DECIMAL and only cast to DOUBLE in the final projection, so Spark's
  * partial-aggregation order can never change a ULP vs the single-threaded
  * oracle.
  */
object TpchQueries {

  val entries: Seq[GraftQuery] = Seq(

    // Flagship scan→filter→agg: lineitem pricing summary (the shape of the
    // reference's per-dataset metric rollups).
    GraftQuery("q1_pricing_summary",
      (s, dir) => Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order")),
      Some("""SELECT l_returnflag, l_linestatus,
             |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
             |            (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
             |       count(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
             |GROUP BY 1, 2""".stripMargin)),

    // TPC-H Q8 shape: 7-table national-market-share join — the join-order
    // stress test (part→lineitem→supplier→orders→customer→nation×2→
    // region) the single-fact star (q5) doesn't exercise. Catalyst gets
    // selective dims first (PROMO parts, ASIA region, the date slice) and
    // broadcasts every dim at this SF; at scale AQE re-plans the
    // fact-side joins to sort-merge. Money in exact DECIMAL to the end
    // (q1 discipline); the share is one IEEE division on exact inputs.
    GraftQuery("q8_market_share",
      (s, dir) => {
        val vol = col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))
        Tables.part(s, dir).filter(col("p_type") === "PROMO")
          .join(Tables.lineitem(s, dir), col("p_partkey") === col("l_partkey"))
          .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
          .join(Tables.orders(s, dir)
            .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
              col("o_orderdate") <= lit("1996-12-31").cast("timestamp")),
            col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
          .join(Tables.nation(s, dir).as("n1"),
            col("c_nationkey") === col("n1.n_nationkey"))
          .join(Tables.region(s, dir).filter(col("r_name") === "ASIA"),
            col("n1.n_regionkey") === col("r_regionkey"))
          .join(Tables.nation(s, dir).as("n2"),
            col("s_nationkey") === col("n2.n_nationkey"))
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg(
            sum(when(col("n2.n_name") === "NATION_1", vol)
              .otherwise(lit(0).cast("decimal(18,2)"))).as("nv"),
            sum(vol).as("tv"))
          .select(col("o_year"),
            col("nv").cast("double").as("nation_volume"),
            col("tv").cast("double").as("total_volume"),
            (col("nv").cast("double") / col("tv").cast("double"))
              .as("mkt_share"))
      },
      Some("""WITH j AS (
             |  SELECT year(o_orderdate) AS o_year, n2.n_name AS supp_nation,
             |         CAST(l_extendedprice AS DECIMAL(18,2)) *
             |           (CAST(1 AS DECIMAL(18,2)) -
             |            CAST(l_discount AS DECIMAL(18,2))) AS vol
             |  FROM part
             |  JOIN lineitem ON p_partkey = l_partkey
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
             |  JOIN region ON n1.n_regionkey = r_regionkey
             |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
             |  WHERE p_type = 'PROMO' AND r_name = 'ASIA'
             |    AND o_orderdate BETWEEN TIMESTAMP '1995-01-01'
             |                        AND TIMESTAMP '1996-12-31'
             |)
             |SELECT o_year,
             |       CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN vol
             |                     ELSE CAST(0 AS DECIMAL(18,2)) END)
             |            AS DOUBLE) AS nation_volume,
             |       CAST(sum(vol) AS DOUBLE) AS total_volume,
             |       CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN vol
             |                     ELSE CAST(0 AS DECIMAL(18,2)) END)
             |            AS DOUBLE)
             |         / CAST(sum(vol) AS DOUBLE) AS mkt_share
             |FROM j GROUP BY 1""".stripMargin)),

    // A8: ROLLUP materialized view (`02-metrics-materialized-views.sql:1-21`)
    // — year/month subtotal rows with NULL grouping keys.
    GraftQuery("a8_rollup_view",
      (s, dir) => Tables.orders(s, dir)
        .rollup(year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("total_sales"),
          count(lit(1)).as("n_orders")),
      Some("""SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
             |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_sales,
             |       count(*) AS n_orders
             |FROM orders GROUP BY ROLLUP(1, 2)""".stripMargin)),

    // Window-function battery: rank family + offsets + running aggregates
    // within partitions (§2.5/§2.6 window-shaped ops as one surface).
    GraftQuery("w_window_battery",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.orders(s, dir).filter(col("o_orderkey") < 3000)
          .select(col("o_orderkey"), col("o_orderpriority"),
            rank().over(w).as("rnk"),
            dense_rank().over(w).as("drnk"),
            row_number().over(w).as("rn"),
            ntile(4).over(w).as("quartile"),
            lag(col("o_orderkey"), 1).over(w).as("prev_key"),
            lead(col("o_orderkey"), 1).over(w).as("next_key"),
            sum(col("o_totalprice").cast("decimal(18,2)")).over(run)
              .cast("double").as("running_total"))
      },
      Some("""SELECT o_orderkey, o_orderpriority,
             |  CAST(rank() OVER w AS INT) AS rnk,
             |  CAST(dense_rank() OVER w AS INT) AS drnk,
             |  CAST(row_number() OVER w AS INT) AS rn,
             |  CAST(ntile(4) OVER w AS INT) AS quartile,
             |  lag(o_orderkey, 1) OVER w AS prev_key,
             |  lead(o_orderkey, 1) OVER w AS next_key,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER
             |    (PARTITION BY o_orderpriority
             |     ORDER BY o_totalprice DESC, o_orderkey
             |     ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total
             |FROM orders WHERE o_orderkey < 3000
             |WINDOW w AS (PARTITION BY o_orderpriority
             |             ORDER BY o_totalprice DESC, o_orderkey)""".stripMargin)),

    // CUBE + grouping flags: all grouping-set combinations with subtotal
    // provenance (the ROLLUP sibling; A8 family).
    GraftQuery("a8_cube_grouping",
      (s, dir) => Tables.orders(s, dir)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          grouping_id().cast("int").as("gid")),
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
             |       CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid
             |FROM orders GROUP BY CUBE(1, 2)""".stripMargin)),

    // A10: month counting with NULL-date coercion — citation counting by
    // link_publication_date prefix (`metricsreader.py:346-350,1654-1672`).
    GraftQuery("a10_month_counts",
      (s, dir) => Tables.orders(s, dir)
        .withColumn("pub_month",
          coalesce(date_format(col("o_orderdate"), "yyyy-MM"), lit("1998-12")))
        .groupBy(col("pub_month"))
        .agg(count(lit(1)).as("citations")),
      Some("""SELECT coalesce(strftime(date_trunc('month', o_orderdate), '%Y-%m'),
             |                '1998-12') AS pub_month,
             |       count(*) AS citations
             |FROM orders GROUP BY 1""".stripMargin)),

    // A11: distinct value sets (`metricsdatabase.py:501-545`).
    GraftQuery("a11_distinct_sets",
      (s, dir) => Tables.orders(s, dir)
        .select(col("o_orderpriority")).distinct(),
      Some("SELECT DISTINCT o_orderpriority FROM orders")),

    // §2.6 sort + limit: top-20 orders by price, fully ordered for
    // determinism (client-side limit counters, `metricselasticsearch.py:283-313`).
    GraftQuery("s26_topk_orders",
      (s, dir) => Tables.orders(s, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
        .select(col("o_orderkey"),
          col("o_totalprice").cast("decimal(18,2)").cast("double")
            .as("o_totalprice")),
      Some("""SELECT o_orderkey,
             |       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice
             |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin)),

    // A16: group fingerprint — md5 over the sorted member list
    // (`es_eventlog_sync.py:469-482` portal hash).
    GraftQuery("a16_group_fingerprint",
      (s, dir) => Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(md5(concat_ws("",
          sort_array(collect_list(col("o_orderkey").cast("string")))))
          .as("fingerprint")),
      Some("""SELECT o_custkey,
             |       md5(string_agg(CAST(o_orderkey AS VARCHAR), ''
             |           ORDER BY CAST(o_orderkey AS VARCHAR))) AS fingerprint
             |FROM orders GROUP BY 1""".stripMargin)),

    // Skew battery in the hard gate: the salting operators must be EXACT —
    // identical results to the unsalted plans they replace at scale. The
    // oracles are the plain SQL forms; any salt leakage (lost rows, double
    // counts, per-bucket distinct overlap) hash-mismatches.
    GraftQuery("a_salted_distinct",
      (s, dir) => graft.operators.Skew.saltedDistinctAgg(
        Tables.events(s, dir), Seq(col("event_type")), col("user_id"),
        buckets = 16),
      Some("""SELECT event_type,
             |       CAST(count(DISTINCT user_id) AS BIGINT) AS unique_count,
             |       count(*) AS total_count
             |FROM events GROUP BY 1""".stripMargin)),

    GraftQuery("j_salted_join",
      (s, dir) => {
        val urgent = Tables.orders(s, dir)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey").as("l_orderkey"), col("o_custkey"))
        graft.operators.Skew.saltedJoin(
          Tables.lineitem(s, dir)
            .select(col("l_orderkey"), col("l_partkey"), col("l_quantity")),
          urgent, "l_orderkey",
          discriminator = col("l_partkey"), buckets = 8)
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_items"),
            sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
              .as("total_qty"))
      },
      Some("""SELECT o_custkey, count(*) AS n_items,
             |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE o_orderpriority = '1-URGENT'
             |GROUP BY 1""".stripMargin)),

    // Shipping-priority top-k (TPC-H Q3 shape): selective dim filter →
    // fact join → agg → global top-10. Scale: both join sides carry their
    // filters into the scan (pushdown asserted for this family in PlanSpec);
    // the planner broadcasts the filtered customer side at this SF and AQE
    // re-plans it at 100× (no hint pinned — at 100 TB the customer side
    // outgrows broadcast and SMJ on the shuffle keys is the right call).
    // The top-10 runs as TakeOrderedAndProject: per-partition heaps, never
    // a global sort.
    GraftQuery("q3_shipping_priority",
      (s, dir) => {
        val cut = lit("1998-06-15").cast("timestamp")
        Tables.lineitem(s, dir).filter(col("l_shipdate") > cut)
          .join(Tables.orders(s, dir).filter(col("o_orderdate") < cut),
            col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, dir)
              .filter(col("c_mktsegment") === "BUILDING"),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"),
            col("o_orderpriority"))
          .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some("""SELECT l_orderkey, o_orderdate, o_orderpriority,
             |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
             |            (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1998-06-15'
             |  AND l_shipdate > TIMESTAMP '1998-06-15'
             |GROUP BY 1, 2, 3
             |ORDER BY revenue DESC, l_orderkey
             |LIMIT 10""".stripMargin)),
  )
}
