package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Set operations + remaining aggregation shapes (SURVEY.md §2.7, A2/A9/A14). */
object SetOpQueries {

  val entries: Seq[GraftQuery] = Seq(

    // §2.7: union + dedup of two scans into one key set
    // (`metricsreporter.py:706-790` doi_dict merge).
    GraftQuery("s27_union_dedup",
      (s, dir) => Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("key"))
        .unionByName(Tables.customer(s, dir)
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey").as("key")))
        .dropDuplicates("key"),
      Some("""SELECT o_custkey AS key FROM orders WHERE o_orderpriority = '1-URGENT'
             |UNION
             |SELECT c_custkey AS key FROM customer WHERE c_mktsegment = 'BUILDING'""".stripMargin)),

    // §2.7: intersection of two key sets (citation pids ∩ portal pids,
    // `es_eventlog_sync.py:402-407`).
    GraftQuery("s27_intersect",
      (s, dir) => Tables.orders(s, dir)
        .filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("key"))
        .intersect(Tables.customer(s, dir)
          .filter(col("c_acctbal") > 5000)
          .select(col("c_custkey").as("key"))),
      Some("""SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'F'
             |INTERSECT
             |SELECT c_custkey AS key FROM customer WHERE c_acctbal > 5000""".stripMargin)),

    // A2: per-entity keyed aggregation via collect + explode — the per-PID
    // filters agg (`metricsreader.py:184-203`): collect each customer's
    // distinct priorities, explode back, count customers per priority.
    GraftQuery("a2_explode_group",
      (s, dir) => Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(collect_set(col("o_orderpriority")).as("prios"))
        .select(col("o_custkey"), explode(col("prios")).as("prio"))
        .groupBy(col("prio"))
        .agg(count(lit(1)).as("n_customers")),
      Some("""SELECT o_orderpriority AS prio,
             |       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
             |FROM orders GROUP BY 1""".stripMargin)),

    // A9: facet counts — value→count per field (`solrclient.py:72-104`).
    GraftQuery("a9_facet_counts",
      (s, dir) => Tables.documents(s, dir)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs")),
      Some("SELECT lang, source, count(*) AS n_docs FROM documents GROUP BY 1, 2")),

    // A15: catalog per-entry summaries — per catalog entity, usage metric
    // pivot plus a side-count merged positionally (`metricsreader.py:471-630`,
    // the A2+J1 composition). Catalog = customers whose key lands in the
    // events user-id space.
    GraftQuery("a15_catalog_summary",
      (s, dir) => {
        val usage = Tables.events(s, dir)
          .groupBy(col("user_id"))
          .agg(
            countDistinct(when(col("event_type") === "view",
              col("event_id"))).as("views"),
            countDistinct(when(col("event_type") === "purchase",
              col("event_id"))).as("downloads"))
        val citations = Tables.orders(s, dir)
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("citations"))
        Tables.customer(s, dir).filter(col("c_custkey") < 150)
          .join(usage, col("c_custkey") === col("user_id"), "left")
          .join(citations, col("c_custkey") === col("o_custkey"), "left")
          .select(col("c_custkey"),
            coalesce(col("views"), lit(0L)).as("views"),
            coalesce(col("downloads"), lit(0L)).as("downloads"),
            coalesce(col("citations"), lit(0L)).as("citations"))
      },
      Some("""SELECT c_custkey,
             |       coalesce((SELECT CAST(count(DISTINCT event_id) AS BIGINT)
             |                 FROM events
             |                 WHERE user_id = c_custkey AND event_type = 'view'), 0) AS views,
             |       coalesce((SELECT CAST(count(DISTINCT event_id) AS BIGINT)
             |                 FROM events
             |                 WHERE user_id = c_custkey AND event_type = 'purchase'), 0) AS downloads,
             |       coalesce((SELECT count(*) FROM orders
             |                 WHERE o_custkey = c_custkey), 0) AS citations
             |FROM customer WHERE c_custkey < 150""".stripMargin)),

    // Data-quality audit report (dbt-test style): referential integrity,
    // uniqueness, null-rate, and domain checks across the warehouse in
    // ONE union-of-aggregates frame — the assertion pass a pipeline runs
    // before promoting a load (the reference's ingest drops + handled-
    // flag reconciliation, generalized). Each check is an independent
    // anti-join or filter-agg subplan; the union is of one-row frames,
    // so the whole report is a handful of parallel scans, no cross-check
    // shuffle. Anti-joins broadcast the dim side at this SF and AQE-plan
    // at scale — the j9/J10 machinery reused as assertions.
    GraftQuery("a_dq_report",
      (s, dir) => {
        val orders = Tables.orders(s, dir)
        val cust = Tables.customer(s, dir)
        val li = Tables.lineitem(s, dir)
        val ev = Tables.events(s, dir)
        val docs = Tables.documents(s, dir)
        def chk(name: String, df: org.apache.spark.sql.DataFrame) =
          df.agg(count(lit(1)).as("n_bad"))
            .select(lit(name).as("check_name"), col("n_bad"))
        chk("orders_orphan_custkey",
          orders.join(cust, orders("o_custkey") === cust("c_custkey"),
            "left_anti"))
          .unionByName(chk("lineitem_orphan_orderkey",
            li.join(orders, li("l_orderkey") === orders("o_orderkey"),
              "left_anti")))
          .unionByName(chk("events_dup_event_id",
            ev.groupBy(col("event_id")).agg(count(lit(1)).as("n"))
              .filter(col("n") > 1)))
          .unionByName(chk("events_null_user",
            ev.filter(col("user_id").isNull)))
          .unionByName(chk("documents_empty_text",
            docs.filter(length(col("text")) === 0)))
          .unionByName(chk("orders_nonpositive_price",
            orders.filter(col("o_totalprice") <= 0)))
      },
      Some("""SELECT 'orders_orphan_custkey' AS check_name,
             |       count(*) AS n_bad
             |FROM orders o
             |WHERE NOT EXISTS (SELECT 1 FROM customer c
             |                  WHERE c.c_custkey = o.o_custkey)
             |UNION ALL
             |SELECT 'lineitem_orphan_orderkey', count(*)
             |FROM lineitem l
             |WHERE NOT EXISTS (SELECT 1 FROM orders o
             |                  WHERE o.o_orderkey = l.l_orderkey)
             |UNION ALL
             |SELECT 'events_dup_event_id', count(*)
             |FROM (SELECT event_id FROM events GROUP BY 1
             |      HAVING count(*) > 1)
             |UNION ALL
             |SELECT 'events_null_user', count(*)
             |FROM events WHERE user_id IS NULL
             |UNION ALL
             |SELECT 'documents_empty_text', count(*)
             |FROM documents WHERE length(text) = 0
             |UNION ALL
             |SELECT 'orders_nonpositive_price', count(*)
             |FROM orders WHERE o_totalprice <= 0""".stripMargin)),

    // A14: null-key normalization (`metricsreader.py:1684-1686` country
    // NULL→"US"): synthesize nulls via nullif, then coalesce-normalize.
    GraftQuery("a14_normalize_null",
      (s, dir) => Tables.documents(s, dir)
        .select(coalesce(nullif(col("lang"), lit("en")), lit("n/a")).as("lang_norm"))
        .groupBy(col("lang_norm"))
        .agg(count(lit(1)).as("n_docs")),
      Some("""SELECT coalesce(nullif(lang, 'en'), 'n/a') AS lang_norm,
             |       count(*) AS n_docs
             |FROM documents GROUP BY 1""".stripMargin)),
  )
}
