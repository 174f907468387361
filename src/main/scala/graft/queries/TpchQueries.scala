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
  )
}
