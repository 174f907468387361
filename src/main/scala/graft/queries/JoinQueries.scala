package graft.queries

import graft.Tables
import graft.operators.Joins
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.3 join repertoire mapped onto the synthetic star schema.
  * The orders-per-customer chain (each order "obsoletes" the previous one)
  * stands in for the reference's obsolescence/identifier graph.
  */
object JoinQueries {

  /** (child, parent) edge list: every order points at the customer's
    * previous order — the obsolescence chain shape (`pid_resolution.py:207-282`). */
  private def orderEdges(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
    Tables.orders(s, dir).select(
      col("o_orderkey").as("child"),
      lag(col("o_orderkey"), 1).over(w).as("parent"))
  }

  val entries: Seq[GraftQuery] = Seq(

    // Co-located fact-fact join via bucketing: both sides pre-bucketed on
    // the join key into catalog tables, so the recurring orders⋈lineitem
    // join reads matching buckets with NO per-query exchange on either
    // side (plan shape pinned in BucketSpec) — the 100 TB answer when the
    // big-big join repeats across a workload. Values are layout-invariant,
    // so the oracle is the plain join SQL.
    GraftQuery("j_bucketed_join",
      (s, dir) => {
        val base = Scratch.dir("bucketed", dir)
        val suffix = new java.io.File(base).getName
          .stripPrefix("graft_").replace('-', '_')
        val (ot, lt) = (s"orders_$suffix", s"lineitem_$suffix")
        Scratch.buildOnce(base) {
          s.sql(s"DROP TABLE IF EXISTS $ot")
          s.sql(s"DROP TABLE IF EXISTS $lt")
          Tables.orders(s, dir).write.mode("overwrite")
            .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
            .option("path", s"$base/orders").saveAsTable(ot)
          Tables.lineitem(s, dir).write.mode("overwrite")
            .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
            .option("path", s"$base/lineitem").saveAsTable(lt)
        }
        s.table(ot)
          .join(s.table(lt), col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderpriority"), col("l_returnflag"))
          .agg(sum(col("l_quantity")).as("sum_qty"),
            count(lit(1)).as("n_lines"))
      },
      Some("""SELECT o_orderpriority, l_returnflag,
             |       sum(l_quantity) AS sum_qty, count(*) AS n_lines
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |GROUP BY 1, 2""".stripMargin)),

    // J4/J6: broadcast dimension lookup join — PID→family / nodeId→name
    // lookups (`metricsreader.py:1259-1343`, `metricsreporter.py:678-703`).
    GraftQuery("j4_broadcast_lookup",
      (s, dir) => Tables.customer(s, dir)
        .join(broadcast(Tables.nation(s, dir)
          .join(broadcast(Tables.region(s, dir)),
            col("n_regionkey") === col("r_regionkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), col("r_name"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("c_acctbal").cast("decimal(18,2)")).cast("double")
            .as("total_acctbal")),
      Some("""SELECT n_name, r_name, count(*) AS n_customers,
             |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
             |FROM customer
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY 1, 2""".stripMargin)),

    // J1: substring-containment theta join (`metricsreader.py:440-462`) —
    // broadcast-nested-loop; small probe side, exactly like citations/request.
    GraftQuery("j1_theta_contains",
      (s, dir) => {
        val probes = Tables.supplier(s, dir).filter(col("s_suppkey") < 10)
          .select(col("s_suppkey").cast("string").as("target"))
        Joins.thetaContainsJoin(Tables.supplier(s, dir), probes,
          col("s_name"), col("target"))
          .groupBy(col("target")).agg(count(lit(1)).as("n_matches"))
      },
      Some("""SELECT CAST(t.s_suppkey AS VARCHAR) AS target, count(*) AS n_matches
             |FROM supplier s,
             |     (SELECT s_suppkey FROM supplier WHERE s_suppkey < 10) t
             |WHERE contains(lower(s.s_name), CAST(t.s_suppkey AS VARCHAR))
             |GROUP BY 1""".stripMargin)),

    // J1 scale path: the same citation-lookup shape as j1_theta_contains,
    // but via canonical-DOI normalization to a hash EQUI-join
    // (Joins.idMatchJoin mode "scale" — SURVEY §7.4.3). Fact ids carry
    // `doi:` decoration, probe ids carry resolver-URL decoration; both
    // normalize to the same `10.5063/fk2<key>` core. PlanSpec asserts the
    // executed plan contains no BroadcastNestedLoopJoin — the property the
    // parity fallback cannot offer at real citation volumes
    // (`metricsreader.py:440-462` is the reference's #1 per-request cost).
    GraftQuery("j1_equi_normalized",
      (s, dir) => {
        val facts = Tables.orders(s, dir)
          .select(concat(lit("doi:10.5063/FK2"),
            col("o_orderkey").cast("string")).as("fact_id"),
            col("o_totalprice"))
        val probes = Tables.orders(s, dir)
          .filter(col("o_orderkey") < 100)
          .select(concat(lit("https://doi.org/10.5063/FK2"),
            col("o_orderkey").cast("string")).as("probe_id"))
        Joins.idMatchJoin(facts, probes, col("fact_id"), col("probe_id"))
          .groupBy(col("canonical_id"))
          .agg(count(lit(1)).as("n_matches"),
            sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
              .as("total_value"))
      },
      Some("""WITH f AS (
             |  SELECT lower(regexp_extract('doi:10.5063/FK2' || o_orderkey,
             |           '(10\.\d{4,}(?:\.\d+)*/\S+)', 1)) AS canonical_id,
             |         o_totalprice
             |  FROM orders
             |), p AS (
             |  SELECT lower(regexp_extract(
             |           'https://doi.org/10.5063/FK2' || o_orderkey,
             |           '(10\.\d{4,}(?:\.\d+)*/\S+)', 1)) AS canonical_id
             |  FROM orders WHERE o_orderkey < 100
             |)
             |SELECT canonical_id, count(*) AS n_matches,
             |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             |         AS total_value
             |FROM f JOIN p USING (canonical_id)
             |WHERE canonical_id <> ''
             |GROUP BY 1""".stripMargin)),

    // J2: obsolescence-chain rollup — resolve every order to its chain head
    // by pointer jumping, then sum over the chain with "last wins" for the
    // terminal value (`metricsreader.py:633-670`). The resolve is
    // MATERIALIZED per (session, dir) like the identifier family dim: the
    // reference resolves obsolescence chains in its index-sync job, not per
    // request (`es_sysmeta_sync.py:159-286`), so repeated queries serve
    // from the checkpointed (node, root) dimension and pay only the
    // join+rollup.
    GraftQuery("j2_chain_rollup",
      (s, dir) => {
        // lag-derived edges list every order as a child, so node discovery
        // (union+distinct+seed join) is skippable; 4 jumps/round covers
        // depth 20+ in two barriers (measured 3× faster than classic
        // doubling at this scale, where per-job overhead dominates)
        val roots = graft.api.IdentifierDim.materialized(s, dir, "orderRoots") {
          Joins.resolveRoots(orderEdges(s, dir),
            edgesCoverAllNodes = true, jumpsPerRound = 4)
        }
        Tables.orders(s, dir)
          .join(roots, col("o_orderkey") === col("node"))
          .groupBy(col("root"))
          .agg(count(lit(1)).as("n_chain"),
            sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
              .as("total_value"),
            max_by(col("o_totalprice"), col("o_orderkey")).as("last_value"))
      },
      Some("""SELECT min(o_orderkey) AS root, count(*) AS n_chain,
             |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
             |       arg_max(o_totalprice, o_orderkey) AS last_value
             |FROM orders GROUP BY o_custkey""".stripMargin)),

    // J3: bounded transitive closure — identifier-family expansion
    // (`pid_resolution.py:285-416`), depth-capped like the reference (≤20;
    // 3 here keeps the oracle tractable).
    GraftQuery("j3_closure_pairs",
      (s, dir) => Joins.closurePairs(orderEdges(s, dir), maxDepth = 3),
      Some("""WITH RECURSIVE e AS (
             |  SELECT o_orderkey AS child,
             |         lag(o_orderkey) OVER (PARTITION BY o_custkey
             |                               ORDER BY o_orderkey) AS parent
             |  FROM orders
             |), walk AS (
             |  SELECT child AS node, parent AS ancestor, 1 AS depth
             |  FROM e WHERE parent IS NOT NULL
             |  UNION ALL
             |  SELECT w.node, e2.parent, w.depth + 1
             |  FROM walk w JOIN e e2 ON w.ancestor = e2.child
             |  WHERE e2.parent IS NOT NULL AND w.depth < 3
             |)
             |SELECT node, ancestor, depth FROM walk""".stripMargin)),

    // J5: array-containment membership (`metricsreader.py:827-830` ANY()).
    GraftQuery("j5_array_membership",
      (s, dir) => Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(collect_set(col("o_orderpriority")).as("prios"))
        .select(array_contains(col("prios"), "1-URGENT").as("has_urgent"))
        .groupBy(col("has_urgent")).agg(count(lit(1)).as("n_customers")),
      Some("""WITH c AS (
             |  SELECT o_custkey, list(DISTINCT o_orderpriority) AS prios
             |  FROM orders GROUP BY 1
             |)
             |SELECT list_contains(prios, '1-URGENT') AS has_urgent,
             |       count(*) AS n_customers
             |FROM c GROUP BY 1""".stripMargin)),

    // J9: anti join — "skip already present" dedup (`metricsdatabase.py:1264-1319`).
    GraftQuery("j9_anti_join",
      (s, dir) => Tables.customer(s, dir)
        .join(Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey")),
      Some("""SELECT c_custkey FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey
             |                    AND o_orderpriority = '1-URGENT')""".stripMargin)),

    // Semi join — filter-by-set membership (reference filters events by
    // request PID sets, `metricsreader.py:205-228`).
    GraftQuery("j_semi_join",
      (s, dir) => Tables.customer(s, dir)
        .join(Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey")),
      Some("""SELECT c_custkey FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |              WHERE o_custkey = c_custkey
             |                AND o_orderpriority = '1-URGENT')""".stripMargin)),

    // J10: set difference — portal-pid expunge (`es_eventlog_sync.py:350-352`).
    GraftQuery("j10_except_diff",
      (s, dir) => Tables.orders(s, dir)
        .select(col("o_custkey").as("custkey")).distinct()
        .except(Tables.customer(s, dir)
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey").as("custkey"))),
      Some("""SELECT DISTINCT o_custkey AS custkey FROM orders
             |EXCEPT
             |SELECT c_custkey AS custkey FROM customer
             |WHERE c_mktsegment = 'BUILDING'""".stripMargin)),

    // J7: left-join enrichment with null-preserving dimension columns
    // (`metricsreporter.py:334-453` per-DOI metadata).
    GraftQuery("j7_enrich_left",
      (s, dir) => Tables.orders(s, dir)
        .join(Tables.customer(s, dir),
          col("o_custkey") === col("c_custkey"), "left")
        .groupBy(coalesce(col("c_mktsegment"), lit("unknown")).as("segment"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("total_price")),
      Some("""SELECT coalesce(c_mktsegment, 'unknown') AS segment,
             |       count(*) AS n_orders,
             |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
             |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
             |GROUP BY 1""".stripMargin)),

    // As-of temporal enrichment: every view/click event picks the user's
    // most recent signup value at-or-before its timestamp. Spark has no
    // built-in as-of join; this is the union+window form (one shuffle).
    // DuckDB's native ASOF JOIN is the oracle.
    GraftQuery("j11_asof_join",
      (s, dir) => {
        val events = Tables.events(s, dir)
        val updates = events.filter(col("event_type") === "signup")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("value")).as("signup_value"))
        val probes = events.filter(col("event_type").isin("view", "click"))
          .select(col("event_id"), col("user_id"), col("ts"))
        Joins.asofJoin(probes, updates, "user_id", "ts",
          Seq("signup_value"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            sum(when(col("asof_signup_value").isNull, 1L).otherwise(0L))
              .as("n_before_signup"),
            round(sum(coalesce(col("asof_signup_value"), lit(0.0))), 4)
              .as("sum_asof_value"))
      },
      Some("""WITH u AS (SELECT user_id, ts, max(value) AS signup_value
             |           FROM events WHERE event_type = 'signup'
             |           GROUP BY 1, 2),
             |p AS (SELECT event_id, user_id, ts FROM events
             |      WHERE event_type IN ('view', 'click')),
             |a AS (SELECT p.user_id, u.signup_value
             |      FROM p ASOF LEFT JOIN u
             |        ON p.user_id = u.user_id AND p.ts >= u.ts)
             |SELECT user_id, count(*) AS n_events,
             |       sum(CASE WHEN signup_value IS NULL THEN 1 ELSE 0 END)::BIGINT
             |         AS n_before_signup,
             |       round(sum(coalesce(signup_value, 0.0)), 4) AS sum_asof_value
             |FROM a GROUP BY 1""".stripMargin)),

    // Interval-overlap join: user sessions × maintenance windows — how
    // many sessions touched each 6-hour window. Bucketed equi-join +
    // residual overlap, never a cross product.
    GraftQuery("j12_interval_join",
      (s, dir) => {
        val sess = graft.operators.Sessionize.sessionStats(
          Tables.events(s, dir), col("user_id"), col("ts"), col("event_id"),
          3600L)
          .select(col("user_id"), col("session_seq"),
            // cast AFTER dividing truncates to whole seconds — matching
            // the oracle's integer `//` exactly; bare double division
            // would keep fractional seconds and flip boundary overlaps
            (unix_micros(col("session_start")) / 1000000L).cast("long")
              .as("s_start"),
            (unix_micros(col("session_end")) / 1000000L).cast("long")
              .as("s_end"))
        val windows = s.range(90).select(col("id").as("w_id"),
          (lit(1704067200L) + col("id") * 86400L).as("w_start"),
          (lit(1704067200L) + col("id") * 86400L + 21600L).as("w_end"))
        graft.operators.Enrich.intervalJoin(sess, windows,
          "s_start", "s_end", "w_start", "w_end", bucketBits = 15)
          .groupBy(col("w_id")).agg(count(lit(1)).as("n_sessions"))
      },
      Some("""WITH g AS (
             |  SELECT user_id, ts, event_id,
             |         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER
             |                (PARTITION BY user_id ORDER BY ts, event_id))
             |              <= 3600000000 THEN 0 ELSE 1 END AS is_new
             |  FROM events
             |), s AS (
             |  SELECT user_id, ts,
             |         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                           ROWS UNBOUNDED PRECEDING) AS session_seq
             |  FROM g
             |), sess AS (
             |  SELECT user_id, session_seq,
             |         epoch_us(min(ts)) // 1000000 AS s_start,
             |         epoch_us(max(ts)) // 1000000 AS s_end
             |  FROM s GROUP BY 1, 2
             |), w AS (
             |  SELECT i::BIGINT AS w_id,
             |         1704067200 + i * 86400 AS w_start,
             |         1704067200 + i * 86400 + 21600 AS w_end
             |  FROM (SELECT unnest(generate_series(0, 89)) AS i))
             |SELECT w_id, count(*) AS n_sessions
             |FROM sess JOIN w ON s_start <= w_end AND w_start <= s_end
             |GROUP BY 1""".stripMargin)),

    // Bench headline: five-way star join + aggregate (TPC-H Q5 shape) —
    // the scale test for join strategy (broadcast dims, shuffle facts).
    GraftQuery("q5_star_join",
      (s, dir) => Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.supplier(s, dir),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum((col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
        ).cast("double").as("revenue"),
          count(lit(1)).as("n_items")),
      Some("""SELECT n_name,
             |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
             |            (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
             |       count(*) AS n_items
             |FROM customer
             |JOIN orders   ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |JOIN nation   ON s_nationkey = n_nationkey
             |JOIN region   ON n_regionkey = r_regionkey
             |GROUP BY 1""".stripMargin)),

    // Entity-resolution fuzzy match: distinct names, blocked on the first
    // token (the classic blocking key), candidate pairs filtered by edit
    // distance — Joins.blockedFuzzyPairs, which also carries the hot-block
    // cap (blocks above blockCap drop before the self-join; the cap never
    // fires on this corpus — max first-token block ≪ 10000 — so the ANSI
    // oracle replays uncapped).
    GraftQuery("j_fuzzy_name_match",
      (s, dir) => Joins.blockedFuzzyPairs(
        Tables.part(s, dir), col("p_name"),
        split(col("p_name"), " ").getItem(0), maxDist = 3),
      Some("""WITH n AS (SELECT DISTINCT p_name FROM part),
             |p AS (SELECT p_name, string_split(p_name, ' ')[1] AS blk
             |      FROM n)
             |SELECT a.p_name AS name_a, b.p_name AS name_b,
             |       CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
             |FROM p a JOIN p b
             |  ON a.blk = b.blk AND a.p_name < b.p_name
             |WHERE levenshtein(a.p_name, b.p_name) <= 3""".stripMargin)),

    // Entity resolution end-to-end: the fuzzy-pair machinery composed
    // with Hash-Min components — blocked levenshtein candidates become
    // undirected edges, every connected spelling cluster collapses to a
    // canonical entity (its lexicographic min). This is the operator-
    // composition story: the SAME connectedComponents that clusters
    // near-dup documents resolves name variants, with string node ids
    // (least/min are total orders on strings too). Oracle: recursive CTE
    // over the replayed pair list.
    GraftQuery("j_entity_resolution",
      (s, dir) => {
        val pairs = Joins.blockedFuzzyPairs(
          Tables.part(s, dir), col("p_name"),
          split(col("p_name"), " ").getItem(0), maxDist = 3)
          .select(col("name_a").as("i"), col("name_b").as("j"))
        graft.operators.Dedup.connectedComponents(pairs)
          .select(col("node").as("name"), col("component").as("entity"))
      },
      Some("""WITH RECURSIVE n AS (SELECT DISTINCT p_name FROM part),
             |pb AS (SELECT p_name, string_split(p_name, ' ')[1] AS blk
             |       FROM n),
             |p AS (SELECT a.p_name AS i, b.p_name AS j
             |      FROM pb a JOIN pb b
             |        ON a.blk = b.blk AND a.p_name < b.p_name
             |      WHERE levenshtein(a.p_name, b.p_name) <= 3),
             |u AS (SELECT i AS a, j AS b FROM p
             |      UNION SELECT j, i FROM p),
             |reach(a, b) AS (
             |  SELECT a, b FROM u
             |  UNION
             |  SELECT r.a, u.b FROM reach r JOIN u ON r.b = u.a
             |)
             |SELECT a AS name, least(a, min(b)) AS entity
             |FROM reach GROUP BY a""".stripMargin)),

    // Incremental entity resolution: today's catalog additions fold into
    // yesterday's canonical entities (Dedup.incrementalComponents over
    // STRING node ids — contraction works on any orderable key) without
    // re-clustering the historical pair set. Names split new/old by an
    // md5 bucket of the NAME (a pure value predicate both engines
    // replay); the blocked-levenshtein pair predicate depends only on
    // the two names, so the old↔old subset of the full pair set IS
    // yesterday's pairs. Incremental must equal full recompute
    // bit-for-bit — the oracle is the SAME full-closure recursive CTE
    // as j_entity_resolution.
    GraftQuery("j_incremental_entities",
      (s, dir) => {
        val pairs = Joins.blockedFuzzyPairs(
          Tables.part(s, dir), col("p_name"),
          split(col("p_name"), " ").getItem(0), maxDist = 3)
          .select(col("name_a").as("i"), col("name_b").as("j"))
          .localCheckpoint()
        val isNew = (c: org.apache.spark.sql.Column) =>
          substring(md5(c), 1, 1) < "4"
        val prev = graft.operators.Dedup.connectedComponents(
          pairs.filter(!isNew(col("i")) && !isNew(col("j"))))
        graft.operators.Dedup.incrementalComponents(prev,
          pairs.filter(isNew(col("i")) || isNew(col("j"))))
          .select(col("node").as("name"), col("component").as("entity"))
      },
      Some("""WITH RECURSIVE n AS (SELECT DISTINCT p_name FROM part),
             |pb AS (SELECT p_name, string_split(p_name, ' ')[1] AS blk
             |       FROM n),
             |p AS (SELECT a.p_name AS i, b.p_name AS j
             |      FROM pb a JOIN pb b
             |        ON a.blk = b.blk AND a.p_name < b.p_name
             |      WHERE levenshtein(a.p_name, b.p_name) <= 3),
             |u AS (SELECT i AS a, j AS b FROM p
             |      UNION SELECT j, i FROM p),
             |reach(a, b) AS (
             |  SELECT a, b FROM u
             |  UNION
             |  SELECT r.a, u.b FROM reach r JOIN u ON r.b = u.a
             |)
             |SELECT a AS name, least(a, min(b)) AS entity
             |FROM reach GROUP BY a""".stripMargin)),

    // Snapshot diff (CDC): two loads of `orders` — the later one wider by a
    // year and with every 97th price restated — classified added / removed /
    // changed / unchanged per key via fingerprint compare. The oracle
    // classifies by comparing the columns directly, so it also proves the
    // xxhash64 fingerprint introduces no false matches on this corpus.
    // ("removed" is structurally empty here — the old snapshot is a subset
    // — but the branch is exercised by OperatorsSpec.)
    GraftQuery("j_snapshot_diff",
      (s, dir) => {
        val orders = Tables.orders(s, dir)
        val oldSnap = orders
          .filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
        val newSnap = orders
          .filter(col("o_orderdate") < lit("2000-01-01").cast("timestamp"))
          .select(col("o_orderkey"),
            when(col("o_orderkey") % 97 === 0, col("o_totalprice") * 2)
              .otherwise(col("o_totalprice")).as("o_totalprice"),
            col("o_orderstatus"))
        Joins.snapshotDiff(oldSnap, newSnap, "o_orderkey",
          Seq("o_totalprice", "o_orderstatus"))
          .groupBy(col("change_type")).agg(count(lit(1)).as("n_keys"))
      },
      Some("""WITH o AS (
             |  SELECT o_orderkey AS k, o_totalprice AS p, o_orderstatus AS st
             |  FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01'
             |), n AS (
             |  SELECT o_orderkey AS k,
             |         CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice * 2
             |              ELSE o_totalprice END AS p,
             |         o_orderstatus AS st
             |  FROM orders WHERE o_orderdate < TIMESTAMP '2000-01-01'
             |), d AS (
             |  SELECT CASE WHEN o.k IS NULL THEN 'added'
             |              WHEN n.k IS NULL THEN 'removed'
             |              WHEN o.p IS DISTINCT FROM n.p
             |                OR o.st IS DISTINCT FROM n.st THEN 'changed'
             |              ELSE 'unchanged' END AS change_type
             |  FROM o FULL OUTER JOIN n ON o.k = n.k
             |)
             |SELECT change_type, count(*) AS n_keys
             |FROM d GROUP BY 1""".stripMargin)),

    // Row-level as-of grading: j11_asof_join grades Joins.asofJoin
    // through a per-user aggregate, which could mask a wrong MATCHED
    // INSTANT as long as sums balance; this emits every (fact, matched
    // dim ts, matched value) row raw — including asof_ts, carried in the
    // payload struct — against DuckDB's native ASOF LEFT JOIN, so the
    // inequality/tie/matched-row semantics are graded row-exactly against
    // an independent implementation.
    GraftQuery("j_asof_row",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        // (key, time)-unique dim: simultaneous signups collapse to max
        val dim = ev.filter(col("event_type") === "signup")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("value")).as("value"))
        val fact = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        Joins.asofJoin(fact, dim, "user_id", "ts", Seq("ts", "value"))
          .select(col("event_id"), col("user_id"), col("ts"),
            col("asof_ts"), col("asof_value"))
      },
      Some("""WITH dim AS (
             |  SELECT user_id, ts, max(value) AS value
             |  FROM events WHERE event_type = 'signup' GROUP BY 1, 2
             |), fact AS (
             |  SELECT event_id, user_id, ts
             |  FROM events WHERE event_type = 'purchase'
             |)
             |SELECT f.event_id, f.user_id, f.ts,
             |       d.ts AS asof_ts, d.value AS asof_value
             |FROM fact f ASOF LEFT JOIN dim d
             |  ON f.user_id = d.user_id AND f.ts >= d.ts""".stripMargin)),

    // MERGE INTO apply (Joins.mergeApply): a synthesized CDC batch —
    // modulo-folded keys force multiple changes per key (latest-by-seq
    // wins) and all four MERGE classes: update (key in base), insert
    // (key absent), delete ('D' op), pass-through. Graded row-level on
    // the merged snapshot; the oracle replays the latest-change window
    // and the full-outer fold, so a seq-ordering slip, a delete leak, or
    // a payload taken from the wrong side hash-mismatches.
    GraftQuery("j_merge_apply",
      (s, dir) => {
        val orders = Tables.orders(s, dir)
        val base = orders
          .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
        val changes = orders
          .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
          .select((col("o_orderkey") % 4000).as("o_orderkey"),
            col("o_orderkey").as("seq"),
            when(col("o_orderkey") % 13 === 0, lit("D"))
              .otherwise(lit("U")).as("op"),
            (col("o_totalprice") * 2).as("o_totalprice"),
            lit("M").as("o_orderstatus"))
        Joins.mergeApply(base, changes, "o_orderkey", "seq", "op")
      },
      Some("""WITH base AS (
             |  SELECT o_orderkey, o_totalprice, o_orderstatus
             |  FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
             |), ch AS (
             |  SELECT o_orderkey % 4000 AS k, o_orderkey AS seq,
             |         CASE WHEN o_orderkey % 13 = 0 THEN 'D' ELSE 'U' END
             |           AS op,
             |         o_totalprice * 2 AS p, 'M' AS st
             |  FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
             |), latest AS (
             |  SELECT k, op, p, st FROM ch
             |  QUALIFY row_number() OVER (PARTITION BY k ORDER BY seq DESC)
             |    = 1
             |)
             |SELECT coalesce(b.o_orderkey, c.k) AS o_orderkey,
             |       CASE WHEN c.k IS NOT NULL THEN c.p
             |            ELSE b.o_totalprice END AS o_totalprice,
             |       CASE WHEN c.k IS NOT NULL THEN c.st
             |            ELSE b.o_orderstatus END AS o_orderstatus
             |FROM base b FULL OUTER JOIN latest c ON b.o_orderkey = c.k
             |WHERE c.op IS NULL OR c.op <> 'D'""".stripMargin)),

    // SCD Type-2 dimension build (Joins.scd2Build): the per-user
    // event_type stream read as an attribute change log — consecutive
    // duplicates collapse, each surviving state gets its validity
    // interval and a current-row flag. One shuffle on the key; both
    // window passes share the exchange. The oracle replays the collapse
    // and the interval stamp with the same (ts, event_id) total order,
    // so a tie-break slip or an off-by-one row in the collapse
    // hash-mismatches row-level.
    GraftQuery("j_scd2_dimension",
      (s, dir) => Joins.scd2Build(Tables.events(s, dir),
        key = "user_id", state = "event_type",
        ts = "ts", tieBreak = "event_id")
        .withColumnRenamed("event_type", "state"),
      Some("""WITH o AS (
             |  SELECT user_id, event_type AS state, ts, event_id,
             |         lag(event_type) OVER w AS prev_state,
             |         lag(event_id) OVER w AS prev_id
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |), c AS (
             |  SELECT user_id, state, ts, event_id FROM o
             |  WHERE prev_id IS NULL OR state IS DISTINCT FROM prev_state
             |)
             |SELECT user_id, state, ts AS valid_from,
             |       lead(ts) OVER w2 AS valid_to,
             |       CAST(row_number() OVER w2 AS INTEGER) AS version,
             |       (lead(ts) OVER w2 IS NULL) AS is_current
             |FROM c
             |WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin)),

    // Iterative link-authority scoring (Joins.pageRank) over the
    // co-purchase graph: part A links to part B when B follows A within
    // an order's line sequence. Integer micro-unit arithmetic makes the
    // 10-iteration fixpoint bit-replayable — the oracle unrolls the same
    // integer recurrence as 10 CTE levels, so every truncating division
    // and damping step is graded exactly, not to a float tolerance.
    GraftQuery("j_pagerank",
      (s, dir) => {
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic data
        // (11,785 dup pairs at sf0.01) — adding l_partkey makes the
        // partkey SEQUENCE deterministic, so both engines derive the
        // same edge multiset
        val w = Window.partitionBy(col("l_orderkey"))
          .orderBy(col("l_linenumber"), col("l_partkey"))
        val edges = Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
          .withColumn("dst", lead(col("l_partkey"), 1).over(w))
          .filter(col("dst").isNotNull && col("dst") =!= col("l_partkey"))
          .select(col("l_partkey").as("src"), col("dst"))
        Joins.pageRank(edges, iterations = 10)
          .select(col("node").as("part"), col("pr").as("rank_micro"))
      },
      Some {
        val levels = (1 to 10).map { k =>
          s"""r$k AS (
             |  SELECT n.node,
             |         CAST(150000 + (850 * coalesce(s.s, 0)) // 1000
             |           AS BIGINT) AS pr
             |  FROM n LEFT JOIN (
             |    SELECT e.dst AS node, sum(r${k - 1}.pr // d.outd) AS s
             |    FROM e JOIN d USING (src)
             |           JOIN r${k - 1} ON r${k - 1}.node = e.src
             |    GROUP BY 1) s USING (node))"""
        }.mkString(",\n")
        s"""WITH e0 AS (
           |  SELECT l_partkey,
           |         lead(l_partkey) OVER (PARTITION BY l_orderkey
           |                               ORDER BY l_linenumber, l_partkey) AS dst
           |  FROM lineitem),
           |e AS (SELECT l_partkey AS src, dst FROM e0
           |      WHERE dst IS NOT NULL AND dst <> l_partkey),
           |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
           |d AS (SELECT src, count(*) AS outd FROM e GROUP BY 1),
           |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr FROM n),
           |$levels
           |SELECT node AS part, pr AS rank_micro FROM r10""".stripMargin
      }),

    // HITS hubs & authorities (Joins.hitsScores) over the DIRECTED
    // co-purchase graph — the link-analysis complement of j_pagerank
    // (authority = endorsed by good hubs, hub = endorses good
    // authorities). 2 full rounds, exact integer micro-units with
    // max-renormalization in DECIMAL(38,0); the oracle unrolls the
    // identical recurrence so every renormalized score is graded
    // row-exact, zero-fill included.
    GraftQuery("j_hits_scores",
      (s, dir) => {
        val w = Window.partitionBy(col("l_orderkey"))
          .orderBy(col("l_linenumber"), col("l_partkey"))
        val edges = Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
          .withColumn("dst", lead(col("l_partkey"), 1).over(w))
          .filter(col("dst").isNotNull && col("dst") =!= col("l_partkey"))
          .select(col("l_partkey").as("src"), col("dst"))
        Joins.hitsScores(edges, rounds = 2)
      },
      Some("""WITH e0 AS (
             |  SELECT l_partkey,
             |         lead(l_partkey) OVER (PARTITION BY l_orderkey
             |                               ORDER BY l_linenumber, l_partkey) AS dst
             |  FROM lineitem),
             |raw AS (SELECT l_partkey AS src, dst FROM e0
             |        WHERE dst IS NOT NULL AND dst <> l_partkey),
             |e AS (SELECT DISTINCT src, dst FROM raw),
             |a1r AS (SELECT dst AS node, count(*)::BIGINT * 1000000 AS a
             |        FROM e GROUP BY 1),
             |a1m AS (SELECT max(a) AS m FROM a1r),
             |a1 AS (SELECT node,
             |         CAST(a::HUGEINT * 1000000 // m AS BIGINT) AS a
             |       FROM a1r, a1m),
             |h1r AS (SELECT e.src AS node, sum(a1.a) AS h
             |        FROM e JOIN a1 ON a1.node = e.dst GROUP BY 1),
             |h1m AS (SELECT max(h) AS m FROM h1r),
             |h1 AS (SELECT node,
             |         CAST(h::HUGEINT * 1000000 // m AS BIGINT) AS h
             |       FROM h1r, h1m),
             |a2r AS (SELECT e.dst AS node, sum(h1.h) AS a
             |        FROM e JOIN h1 ON h1.node = e.src GROUP BY 1),
             |a2m AS (SELECT max(a) AS m FROM a2r),
             |a2 AS (SELECT node,
             |         CAST(a::HUGEINT * 1000000 // m AS BIGINT) AS a
             |       FROM a2r, a2m),
             |h2r AS (SELECT e.src AS node, sum(a2.a) AS h
             |        FROM e JOIN a2 ON a2.node = e.dst GROUP BY 1),
             |h2m AS (SELECT max(h) AS m FROM h2r),
             |h2 AS (SELECT node,
             |         CAST(h::HUGEINT * 1000000 // m AS BIGINT) AS h
             |       FROM h2r, h2m),
             |n AS (SELECT DISTINCT node FROM (
             |  SELECT src AS node FROM e UNION ALL SELECT dst FROM e))
             |SELECT n.node, coalesce(a2.a, 0)::BIGINT AS auth_micro,
             |       coalesce(h2.h, 0)::BIGINT AS hub_micro
             |FROM n LEFT JOIN a2 USING (node)
             |       LEFT JOIN h2 USING (node)""".stripMargin)),

    // Market-basket lift over co-purchase pairs: within-order item
    // pairs (a < b — at most C(7,2) per order, bounded by the order
    // width, never by item popularity), pair support vs the two item
    // supports, lift as the exact rational
    // `n_ab·N·10⁶ div (n_a·n_b)` in micro-units — the association-rule
    // screen (support/confidence/lift) every recommendation pipeline
    // starts from. One explode-free pair self-join co-partitioned on
    // the order key + two broadcast joins against the item-support
    // aggregate; filter to pairs seen ≥ 3 times.
    GraftQuery("j_copurchase_lift",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_partkey")).distinct()
        val n = Tables.orders(s, dir).count()
        val sup = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("n_i"))
        val pairs = li.as("x").join(li.as("y"),
            col("x.l_orderkey") === col("y.l_orderkey") &&
              col("x.l_partkey") < col("y.l_partkey"))
          .groupBy(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
          .agg(count(lit(1)).as("n_ab"))
          .filter(col("n_ab") >= 3)
        pairs
          .join(sup.select(col("l_partkey").as("a"), col("n_i").as("n_a")), "a")
          .join(sup.select(col("l_partkey").as("b"), col("n_i").as("n_b")), "b")
          .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
            expr(s"n_ab * ${n}L * 1000000L div (n_a * n_b)")
              .as("lift_micro"),
            expr("n_ab * 1000000L div n_a").as("conf_micro"))
      },
      Some("""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey
             |            FROM lineitem),
             |n AS (SELECT count(*) AS n FROM orders),
             |sup AS (SELECT l_partkey, count(*) AS n_i FROM li GROUP BY 1),
             |p AS (SELECT x.l_partkey AS a, y.l_partkey AS b,
             |        count(*) AS n_ab
             |      FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey
             |        AND x.l_partkey < y.l_partkey
             |      GROUP BY 1, 2 HAVING count(*) >= 3)
             |SELECT a, b, n_ab, sa.n_i AS n_a, sb.n_i AS n_b,
             |       CAST(n_ab * (SELECT n FROM n) * 1000000
             |         // (sa.n_i * sb.n_i) AS BIGINT) AS lift_micro,
             |       CAST(n_ab * 1000000 // sa.n_i AS BIGINT) AS conf_micro
             |FROM p JOIN sup sa ON sa.l_partkey = p.a
             |       JOIN sup sb ON sb.l_partkey = p.b""".stripMargin)),

    // Personalized PageRank (Joins.pageRankPersonalized) on the
    // co-purchase graph: all teleport mass rerouted to the seed set
    // (parts with partkey % 17 = 0 — 12/118/1177 seeds at
    // sf0.001/0.01/0.1), 6 rounds from the teleport-vector init (seeds
    // hold their share, everything else 0 — strict localization). The
    // oracle unrolls the identical integer recurrence with the seed
    // teleport table as a per-level left join — a wrong teleport split
    // (N div |S|), a wrong init, a seed outside the node set, or a
    // lost no-in-edge seed all hash-mismatch.
    GraftQuery("j_pagerank_personalized",
      (s, dir) => {
        val w = Window.partitionBy(col("l_orderkey"))
          .orderBy(col("l_linenumber"), col("l_partkey"))
        val edges = Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
          .withColumn("dst", lead(col("l_partkey"), 1).over(w))
          .filter(col("dst").isNotNull && col("dst") =!= col("l_partkey"))
          .select(col("l_partkey").as("src"), col("dst"))
        val seeds = Tables.part(s, dir)
          .filter(col("p_partkey") % 17 === 0)
          .select(col("p_partkey").as("node"))
        Joins.pageRankPersonalized(edges, seeds, iterations = 6)
          .select(col("node").as("part"), col("pr").as("ppr_micro"))
      },
      Some {
        val levels = (1 to 6).map { k =>
          s"""r$k AS (
             |  SELECT n.node,
             |         CAST(coalesce(t.tp, 0) +
             |           (850 * coalesce(s.s, 0)) // 1000 AS BIGINT) AS pr
             |  FROM n LEFT JOIN tpv t USING (node)
             |         LEFT JOIN (
             |    SELECT e.dst AS node, sum(r${k - 1}.pr // d.outd) AS s
             |    FROM e JOIN d USING (src)
             |           JOIN r${k - 1} ON r${k - 1}.node = e.src
             |    GROUP BY 1) s USING (node))"""
        }.mkString(",\n")
        s"""WITH e0 AS (
           |  SELECT l_partkey,
           |         lead(l_partkey) OVER (PARTITION BY l_orderkey
           |                               ORDER BY l_linenumber, l_partkey) AS dst
           |  FROM lineitem),
           |e AS (SELECT l_partkey AS src, dst FROM e0
           |      WHERE dst IS NOT NULL AND dst <> l_partkey),
           |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
           |d AS (SELECT src, count(*) AS outd FROM e GROUP BY 1),
           |sd AS (SELECT p_partkey AS node FROM part
           |       WHERE p_partkey % 17 = 0
           |         AND p_partkey IN (SELECT node FROM n)),
           |tpv AS (SELECT node,
           |          CAST((150000 * (SELECT count(*) FROM n))
           |            // (SELECT count(*) FROM sd) AS BIGINT) AS tp
           |        FROM sd),
           |r0 AS (SELECT n.node, CAST(coalesce(t.tp, 0) AS BIGINT) AS pr
           |       FROM n LEFT JOIN tpv t USING (node)),
           |$levels
           |SELECT node AS part, pr AS ppr_micro FROM r6""".stripMargin
      }),

    // Incremental (warm-start) PageRank (Joins.pageRankIncremental): the
    // co-purchase graph split into a base (15/16 of orders) and an
    // appended delta (orders with l_orderkey % 16 = 0 — whole new orders,
    // the daily-growth shape). Ranks the base cold (10 rounds), then
    // re-converges the FULL graph in 3 warm rounds starting from those
    // ranks — delta-new nodes init at uniform 1.0, everything else keeps
    // its prior rank. The integer recurrence keeps the warm path
    // bit-replayable too: the oracle unrolls 10 cold levels over the base
    // graph, seeds w0 = coalesce(base rank, 1000000) over the full node
    // set, and unrolls 3 warm levels over the full graph — so a wrong
    // init default, a stale out-degree (a delta edge must dilute an old
    // node's contribution from warm round 1), or an extra/missing round
    // all hash-mismatch row-level. The convergence claim (3 warm rounds
    // strictly dominate the same cold budget and beat a 6-round cold
    // budget — corpus-sized join+agg passes saved per refresh) is graded
    // separately in OperatorsSpec against a 40-round fixpoint.
    GraftQuery("j_pagerank_incremental",
      (s, dir) => {
        val w = Window.partitionBy(col("l_orderkey"))
          .orderBy(col("l_linenumber"), col("l_partkey"))
        val all = Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
          .withColumn("dst", lead(col("l_partkey"), 1).over(w))
          .filter(col("dst").isNotNull && col("dst") =!= col("l_partkey"))
        // whole-order split AFTER the per-order lead: the delta is
        // complete new orders, so base edges are unchanged by the split
        val edgesAll = all.select(col("l_partkey").as("src"), col("dst"))
        // the base graph's cold ranks are "yesterday's" artifact —
        // materialized once (same amortization as v_ivfpq_topk's index
        // build), so the timed path is exactly the daily refresh: read
        // prior ranks + 3 warm rounds over the full graph
        val base = Scratch.dir("pagerank_prev", dir)
        Scratch.buildOnce(base) {
          val edgesOld = all.filter(col("l_orderkey") % 16 =!= 0)
            .select(col("l_partkey").as("src"), col("dst"))
          Joins.pageRank(edgesOld, iterations = 10)
            .write.mode("overwrite").parquet(s"$base/prev")
        }
        val prev = s.read.parquet(s"$base/prev")
        Joins.pageRankIncremental(prev, edgesAll, iterations = 3)
          .select(col("node").as("part"), col("pr").as("rank_micro"))
      },
      Some {
        def level(k: Int, prev: String, e: String, d: String, n: String) =
          s"""$prev$k AS (
             |  SELECT n.node,
             |         CAST(150000 + (850 * coalesce(s.s, 0)) // 1000
             |           AS BIGINT) AS pr
             |  FROM $n n LEFT JOIN (
             |    SELECT e.dst AS node, sum(p.pr // d.outd) AS s
             |    FROM $e e JOIN $d d USING (src)
             |           JOIN $prev${k - 1} p ON p.node = e.src
             |    GROUP BY 1) s USING (node))"""
        val cold = (1 to 10).map(level(_, "r", "eo", "dold", "nold"))
          .mkString(",\n")
        val warm = (1 to 3).map(level(_, "w", "e", "d", "n")).mkString(",\n")
        s"""WITH e0 AS (
           |  SELECT l_orderkey, l_partkey,
           |         lead(l_partkey) OVER (PARTITION BY l_orderkey
           |                               ORDER BY l_linenumber, l_partkey) AS dst
           |  FROM lineitem),
           |e1 AS (SELECT l_orderkey, l_partkey AS src, dst FROM e0
           |       WHERE dst IS NOT NULL AND dst <> l_partkey),
           |e AS (SELECT src, dst FROM e1),
           |eo AS (SELECT src, dst FROM e1 WHERE l_orderkey % 16 <> 0),
           |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
           |nold AS (SELECT src AS node FROM eo UNION SELECT dst FROM eo),
           |d AS (SELECT src, count(*) AS outd FROM e GROUP BY 1),
           |dold AS (SELECT src, count(*) AS outd FROM eo GROUP BY 1),
           |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr FROM nold),
           |$cold,
           |w0 AS (SELECT n.node, CAST(coalesce(r10.pr, 1000000) AS BIGINT) AS pr
           |       FROM n LEFT JOIN r10 USING (node)),
           |$warm
           |SELECT node AS part, pr AS rank_micro FROM w3""".stripMargin
      }),

    // Per-node triangle counts + local clustering coefficient
    // (Joins.triangleCounts) over the same co-purchase graph j_pagerank
    // ranks — the link-graph quality signal that separates communities
    // (neighbors interlink) from hubs/spam (neighbors never do).
    // Degree-ordered orientation bounds the wedge join's fan-out at
    // O(√m) per node (Suri & Vassilvitskii, WWW'11), so no hub ever
    // explodes the self-join; each triangle is found exactly once at
    // its lowest corner. The coefficient is exact integer micro-units,
    // and the oracle replays the SAME orientation construction (not the
    // naive all-wedges join, which would explode at the sf1 gate) —
    // dedup, degrees, orientation, wedge close, corner counts, and the
    // integer division all hash-exact.
    GraftQuery("j_triangle_count",
      (s, dir) => {
        val w = Window.partitionBy(col("l_orderkey"))
          .orderBy(col("l_linenumber"), col("l_partkey"))
        val edges = Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
          .withColumn("dst", lead(col("l_partkey"), 1).over(w))
          .filter(col("dst").isNotNull && col("dst") =!= col("l_partkey"))
          .select(col("l_partkey").as("src"), col("dst"))
        Joins.triangleCounts(edges)
      },
      Some("""WITH e0 AS (
             |  SELECT l_partkey,
             |         lead(l_partkey) OVER (PARTITION BY l_orderkey
             |                               ORDER BY l_linenumber, l_partkey) AS dst
             |  FROM lineitem),
             |raw AS (SELECT l_partkey AS src, dst FROM e0
             |        WHERE dst IS NOT NULL AND dst <> l_partkey),
             |und AS (SELECT DISTINCT least(src, dst) AS a,
             |               greatest(src, dst) AS b FROM raw),
             |deg AS (
             |  SELECT node, count(*) AS d FROM (
             |    SELECT a AS node FROM und UNION ALL SELECT b FROM und)
             |  GROUP BY 1
             |), o AS (
             |  SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND u.a < u.b)
             |              THEN u.a ELSE u.b END AS u,
             |         CASE WHEN da.d < db.d OR (da.d = db.d AND u.a < u.b)
             |              THEN u.b ELSE u.a END AS v
             |  FROM und u JOIN deg da ON da.node = u.a
             |             JOIN deg db ON db.node = u.b
             |), od AS (SELECT o.u, o.v, deg.d AS dv
             |          FROM o JOIN deg ON deg.node = o.v),
             |tri AS (
             |  SELECT o1.u AS x, o1.v AS y, o2.v AS z
             |  FROM od o1 JOIN od o2 ON o2.u = o1.u
             |         AND (o1.dv < o2.dv OR (o1.dv = o2.dv AND o1.v < o2.v))
             |       JOIN o o3 ON o3.u = o1.v AND o3.v = o2.v
             |), corners AS (SELECT unnest([x, y, z]) AS node FROM tri),
             |t AS (SELECT node, count(*)::BIGINT AS triangles
             |      FROM corners GROUP BY 1)
             |SELECT deg.node, deg.d::BIGINT AS degree,
             |       coalesce(t.triangles, 0)::BIGINT AS triangles,
             |       CAST(CASE WHEN deg.d >= 2
             |            THEN (2 * coalesce(t.triangles, 0) * 1000000)
             |                   // (deg.d * (deg.d - 1))
             |            ELSE 0 END AS BIGINT) AS coeff_micro
             |FROM deg LEFT JOIN t USING (node)""".stripMargin)),

    // Label-propagation communities (Joins.labelPropagation) over the
    // same co-purchase graph as j_triangle_count: 4 synchronous rounds
    // of deterministic neighbor-plurality voting (ties -> smallest
    // label), each round one adjacency⋈labels join + two partial-agg
    // shuffles, labels broadcast. The oracle unrolls the identical
    // recurrence 4 times — plurality replayed as max-vote window +
    // min(label) — so every round's tie-breaks are graded row-exact.
    GraftQuery("j_label_propagation",
      (s, dir) => {
        val w = Window.partitionBy(col("l_orderkey"))
          .orderBy(col("l_linenumber"), col("l_partkey"))
        val edges = Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
          .withColumn("dst", lead(col("l_partkey"), 1).over(w))
          .filter(col("dst").isNotNull && col("dst") =!= col("l_partkey"))
          .select(col("l_partkey").as("src"), col("dst"))
        Joins.labelPropagation(edges, rounds = 4)
      },
      Some("""WITH e0 AS (
             |  SELECT l_partkey,
             |         lead(l_partkey) OVER (PARTITION BY l_orderkey
             |                               ORDER BY l_linenumber, l_partkey) AS dst
             |  FROM lineitem),
             |raw AS (SELECT l_partkey AS src, dst FROM e0
             |        WHERE dst IS NOT NULL AND dst <> l_partkey),
             |und AS (SELECT DISTINCT least(src, dst) AS a,
             |               greatest(src, dst) AS b FROM raw),
             |adj AS (SELECT a AS node, b AS nbr FROM und
             |        UNION ALL SELECT b, a FROM und),
             |l0 AS (SELECT DISTINCT node, node AS lbl FROM adj),
             |c1 AS (SELECT adj.node, l.lbl, count(*) AS v
             |       FROM adj JOIN l0 l ON l.node = adj.nbr GROUP BY 1, 2),
             |l1 AS (SELECT node, min(lbl) AS lbl FROM (
             |         SELECT node, lbl, v,
             |                max(v) OVER (PARTITION BY node) AS mx FROM c1)
             |       WHERE v = mx GROUP BY node),
             |c2 AS (SELECT adj.node, l.lbl, count(*) AS v
             |       FROM adj JOIN l1 l ON l.node = adj.nbr GROUP BY 1, 2),
             |l2 AS (SELECT node, min(lbl) AS lbl FROM (
             |         SELECT node, lbl, v,
             |                max(v) OVER (PARTITION BY node) AS mx FROM c2)
             |       WHERE v = mx GROUP BY node),
             |c3 AS (SELECT adj.node, l.lbl, count(*) AS v
             |       FROM adj JOIN l2 l ON l.node = adj.nbr GROUP BY 1, 2),
             |l3 AS (SELECT node, min(lbl) AS lbl FROM (
             |         SELECT node, lbl, v,
             |                max(v) OVER (PARTITION BY node) AS mx FROM c3)
             |       WHERE v = mx GROUP BY node),
             |c4 AS (SELECT adj.node, l.lbl, count(*) AS v
             |       FROM adj JOIN l3 l ON l.node = adj.nbr GROUP BY 1, 2),
             |l4 AS (SELECT node, min(lbl) AS lbl FROM (
             |         SELECT node, lbl, v,
             |                max(v) OVER (PARTITION BY node) AS mx FROM c4)
             |       WHERE v = mx GROUP BY node)
             |SELECT node, lbl AS community FROM l4""".stripMargin)),

    // Resource-allocation link prediction (Joins.resourceAllocationPairs)
    // over the co-purchase graph: top-100 NEW links by Σ 10⁶ div deg(w)
    // over common neighbors of degree ≤ 64, exact integer micro-units,
    // unique total order (score desc, a, b). The degree cap is part of
    // the graded contract (oracle replays the same predicate) and the
    // excluded-hub count is surfaced in n_hubs_dropped; 64 sits at this
    // graph's p98 (near-regular, max degree 83), so the audit column is
    // exercised (> 0 dropped) at every graded sf.
    GraftQuery("j_ra_linkpred",
      (s, dir) => {
        val w = Window.partitionBy(col("l_orderkey"))
          .orderBy(col("l_linenumber"), col("l_partkey"))
        val edges = Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
          .withColumn("dst", lead(col("l_partkey"), 1).over(w))
          .filter(col("dst").isNotNull && col("dst") =!= col("l_partkey"))
          .select(col("l_partkey").as("src"), col("dst"))
        Joins.resourceAllocationPairs(edges, maxWedgeDegree = 64L,
          topK = 100)
      },
      Some("""WITH e0 AS (
             |  SELECT l_partkey,
             |         lead(l_partkey) OVER (PARTITION BY l_orderkey
             |                               ORDER BY l_linenumber, l_partkey) AS dst
             |  FROM lineitem),
             |raw AS (SELECT l_partkey AS src, dst FROM e0
             |        WHERE dst IS NOT NULL AND dst <> l_partkey),
             |und AS (SELECT DISTINCT least(src, dst) AS a,
             |               greatest(src, dst) AS b FROM raw),
             |adj AS (SELECT a AS w, b AS x FROM und
             |        UNION ALL SELECT b, a FROM und),
             |deg AS (SELECT w, count(*) AS d FROM adj GROUP BY 1),
             |ok AS (SELECT adj.w, adj.x, deg.d
             |       FROM adj JOIN deg USING (w) WHERE d <= 64),
             |wedge AS (SELECT o1.x AS a, o2.x AS b, o1.d
             |          FROM ok o1 JOIN ok o2
             |            ON o1.w = o2.w AND o1.x < o2.x),
             |nw AS (SELECT a, b FROM wedge
             |       WHERE NOT EXISTS (SELECT 1 FROM und
             |                         WHERE und.a = wedge.a
             |                           AND und.b = wedge.b)),
             |sc AS (SELECT w2.a, w2.b,
             |              CAST(sum(1000000 // w2.d) AS BIGINT)
             |                AS score_micro,
             |              count(*)::BIGINT AS n_common
             |       FROM wedge w2 JOIN (SELECT DISTINCT a, b FROM nw) n2
             |         ON w2.a = n2.a AND w2.b = n2.b
             |       GROUP BY 1, 2)
             |SELECT a, b, score_micro, n_common,
             |       (SELECT count(*) FROM deg WHERE d > 64)::BIGINT
             |         AS n_hubs_dropped
             |FROM sc
             |ORDER BY score_micro DESC, a, b LIMIT 100""".stripMargin)),

    // SAMPLED RA scoring (r13 VERDICT #7) on its SOUND contract — the
    // monitoring composition: yesterday's exact top-100 (built once,
    // the v_ivfpq_topk amortization discipline) re-scored on the graph
    // by an unbiased q=1/2 neighbor-sampled estimator whose wedge
    // stream dies into a broadcast candidate probe instead of the
    // corpus-pair agg. Sampled top-k SELECTION is graded nowhere
    // because it is measurably unsound (recall 0.07-0.17 here, 0.13
    // even on a heavy-overlap graph; winner's-curse inflation +42% —
    // the full negative result and the Hoeffding per-pair bound live
    // on the operator scaladoc). The hash-derived sample is
    // deterministic, so the oracle replays the serve exactly,
    // candidates and sampling included.
    GraftQuery("j_ra_linkpred_sampled",
      (s, dir) => {
        val w = Window.partitionBy(col("l_orderkey"))
          .orderBy(col("l_linenumber"), col("l_partkey"))
        val edges = Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
          .withColumn("dst", lead(col("l_partkey"), 1).over(w))
          .filter(col("dst").isNotNull && col("dst") =!= col("l_partkey"))
          .select(col("l_partkey").as("src"), col("dst"))
        val base = Scratch.dir("ra_sampled_cands", dir)
        Scratch.buildOnce(base) {
          Joins.resourceAllocationPairs(edges, maxWedgeDegree = 64L,
              topK = 100)
            .select(col("a"), col("b"))
            .write.mode("overwrite").parquet(s"$base/cands")
        }
        Joins.resourceAllocationScoresSampled(edges,
          s.read.parquet(s"$base/cands"),
          maxWedgeDegree = 64L, sampleDiv = 2)
      },
      Some("""WITH e0 AS (
             |  SELECT l_partkey,
             |         lead(l_partkey) OVER (PARTITION BY l_orderkey
             |                               ORDER BY l_linenumber, l_partkey) AS dst
             |  FROM lineitem),
             |raw AS (SELECT l_partkey AS src, dst FROM e0
             |        WHERE dst IS NOT NULL AND dst <> l_partkey),
             |und AS (SELECT DISTINCT least(src, dst) AS a,
             |               greatest(src, dst) AS b FROM raw),
             |adj AS (SELECT a AS w, b AS x FROM und
             |        UNION ALL SELECT b, a FROM und),
             |deg AS (SELECT w, count(*) AS d FROM adj GROUP BY 1),
             |ok AS (SELECT adj.w, adj.x, deg.d
             |       FROM adj JOIN deg USING (w) WHERE d <= 64),
             |wedge AS (SELECT o1.x AS a, o2.x AS b, o1.d
             |          FROM ok o1 JOIN ok o2
             |            ON o1.w = o2.w AND o1.x < o2.x),
             |-- agg BEFORE the new-link anti-filter (commutes: the anti
             |-- key is exactly the grouping key — the Spark operator's
             |-- own plan) so the 10x-data wedge CTE is referenced ONCE;
             |-- the r14 sf1 gate OOM-spilled the disk on the two-pass
             |-- NOT EXISTS formulation
             |sc AS (SELECT a, b, CAST(sum(1000000 // d) AS BIGINT)
             |                AS score_micro
             |       FROM wedge GROUP BY 1, 2),
             |nsc AS (SELECT sc.* FROM sc LEFT JOIN und
             |          ON und.a = sc.a AND und.b = sc.b
             |        WHERE und.a IS NULL),
             |cand AS (SELECT a, b FROM nsc
             |         ORDER BY score_micro DESC, a, b LIMIT 100),
             |oks AS (SELECT adj.w, adj.x, deg.d
             |        FROM adj JOIN deg USING (w)
             |        WHERE d <= 64
             |          AND ('0x' || substring(md5(adj.w::VARCHAR || ','
             |                || adj.x::VARCHAR), 1, 15))::BIGINT % 2 = 0),
             |sw AS (SELECT o1.x AS a, o2.x AS b, o1.d
             |       FROM oks o1 JOIN oks o2
             |         ON o1.w = o2.w AND o1.x < o2.x),
             |est AS (SELECT sw.a, sw.b,
             |               CAST(sum(1000000 // sw.d) * 4 AS BIGINT)
             |                 AS score_est_micro,
             |               count(*)::BIGINT AS n_common_sampled
             |        FROM sw JOIN cand ON sw.a = cand.a AND sw.b = cand.b
             |        GROUP BY 1, 2)
             |SELECT c.a, c.b,
             |       coalesce(e.score_est_micro, 0)::BIGINT
             |         AS score_est_micro,
             |       coalesce(e.n_common_sampled, 0)::BIGINT
             |         AS n_common_sampled
             |FROM cand c LEFT JOIN est e
             |  ON e.a = c.a AND e.b = c.b""".stripMargin)),
  )
}
