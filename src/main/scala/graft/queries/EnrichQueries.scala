package graft.queries

import graft.Tables
import graft.operators.Enrich
import org.apache.spark.sql.functions._

/** Ingest-enrichment pipeline queries (SURVEY.md §2.2 F9/F10/F13/F16 + DOI
  * canonicalization). The events table carries no ip/ua/request columns, so
  * they are derived deterministically from existing columns first — the
  * enrichment operators themselves then run exactly as they would on real
  * log fields, and the oracle re-derives the same inputs.
  */
object EnrichQueries {

  private val Cidrs = Seq("10.5.0.0/16", "10.17.0.0/16", "10.33.0.0/16")

  // The same OR-joined dictionary regexes drive Spark and the oracle (the
  // dicts contain no quotes, but escape defensively for the SQL literal).
  private val RobotRe = Enrich.RobotUaPattern.replace("'", "''")
  private val MachineRe = Enrich.MachineUaPattern.replace("'", "''")

  // UAs for the non-view/click/purchase/signup (= error) slice: exercises
  // dictionary-only patterns — anchored `^ruby$`, plain `ADmantX`, and the
  // class `[^a]fish` (sawfish matches, "a fish" before it would not).
  private val ErrorUas = Seq("WebCrawler-Spider/1.0", "ruby",
    "ADmantX Platform Semantic Analyzer", "sawfish/1.3")

  private def derived(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.events(s, dir)
      .withColumn("ip", concat_ws(".", lit(10), col("user_id") % 64,
        col("event_id") % 200, col("event_id") % 7))
      .withColumn("ua",
        when(col("event_type") === "view", "Mozilla/5.0 (X11; Linux x86_64)")
          .when(col("event_type") === "click", "Googlebot/2.1 (+http://www.google.com/bot.html)")
          .when(col("event_type") === "purchase", "curl/7.88.1")
          .when(col("event_type") === "signup", "python-requests/2.28")
          .otherwise(element_at(lit(ErrorUas.toArray),
            (col("event_id") % 4 + 1).cast("int"))))
      .withColumn("request",
        when(col("event_type") === "view",
          concat(lit("/cn/v2/query/solr/?q="), col("event_id")))
          .otherwise(concat(lit("/cn/v2/object/"), col("event_id"))))

  private val derivedSql =
    s"""SELECT event_id, ts, event_type,
      |       '10.' || (user_id % 64) || '.' || (event_id % 200) || '.' ||
      |         (event_id % 7) AS ip,
      |       CASE event_type
      |         WHEN 'view' THEN 'Mozilla/5.0 (X11; Linux x86_64)'
      |         WHEN 'click' THEN 'Googlebot/2.1 (+http://www.google.com/bot.html)'
      |         WHEN 'purchase' THEN 'curl/7.88.1'
      |         WHEN 'signup' THEN 'python-requests/2.28'
      |         ELSE list_extract([${ErrorUas.map(u => s"'$u'").mkString(", ")}],
      |                           (event_id % 4 + 1)::INT) END AS ua,
      |       CASE WHEN event_type = 'view'
      |            THEN '/cn/v2/query/solr/?q=' || event_id
      |            ELSE '/cn/v2/object/' || event_id END AS request
      |FROM events""".stripMargin

  val entries: Seq[GraftQuery] = Seq(

    // F9+F10+F13+F16 fused: CIDR tagging, UA regex tagging, derived session
    // key, search flag — one codegen'd projection, then a rollup by tag set.
    GraftQuery("f_enrich_tags",
      (s, dir) => {
        val e = derived(s, dir)
          .withColumn("tags", Enrich.tags(Seq(
            "robot_ua" -> col("ua").rlike(Enrich.RobotUaPattern),
            "machine_ua" -> col("ua").rlike(Enrich.MachineUaPattern),
            "robot_ip" -> Enrich.ipInCidrs(col("ip"), Cidrs))))
          .withColumn("session_key",
            Enrich.sessionKey(col("ip"), col("ua"), col("ts")))
          .withColumn("searchevent",
            Enrich.searchEvent(col("request"), "/cn/v2/query/solr/"))
        e.groupBy(concat_ws(",", col("tags")).as("tags_str"), col("searchevent"))
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("session_key")).as("n_sessions"))
      },
      Some(s"""WITH e AS ($derivedSql),
              |t AS (
              |  SELECT *,
              |    list_reduce(list_transform(string_split(ip, '.'),
              |                x -> x::BIGINT), (a, b) -> a * 256 + b) AS ipl
              |  FROM e
              |), g AS (
              |  SELECT event_id, searchevent, session_key,
              |    concat_ws(',',
              |      CASE WHEN regexp_matches(ua, '$RobotRe')
              |           THEN 'robot_ua' END,
              |      CASE WHEN regexp_matches(ua, '$MachineRe')
              |           THEN 'machine_ua' END,
              |      CASE WHEN (ipl >> 16) IN (2565, 2577, 2593)
              |           THEN 'robot_ip' END) AS tags_str
              |  FROM (SELECT *,
              |          md5(ip || ' ' || ua) || '|' || strftime(ts, '%Y%m%d%H') AS session_key,
              |          starts_with(request, '/cn/v2/query/solr/') AS searchevent
              |        FROM t)
              |)
              |SELECT tags_str, searchevent, count(*) AS n_events,
              |       CAST(count(DISTINCT session_key) AS BIGINT) AS n_sessions
              |FROM g GROUP BY 1, 2""".stripMargin)),

    // F1+F2: the base event-predicate template every metrics query starts
    // from (`metricselasticsearch.py:209-265`): robot/machine tags excluded
    // via arrays_overlap, event-type term filter, date range.
    GraftQuery("f1_base_filter",
      (s, dir) => {
        val e = derived(s, dir)
          .withColumn("tags", Enrich.tags(Seq(
            "robot_ua" -> col("ua").rlike(Enrich.RobotUaPattern),
            "machine_ua" -> col("ua").rlike(Enrich.MachineUaPattern),
            "robot_ip" -> Enrich.ipInCidrs(col("ip"), Cidrs))))
        e.filter(!arrays_overlap(col("tags"),
            lit(Array("robot_ua", "machine_ua", "robot_ip"))) &&
            col("event_type").isin("view", "purchase") &&
            col("ts") >= to_date(lit("2024-01-05")) &&
            col("ts") < to_date(lit("2024-01-20")))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_events"))
      },
      Some(s"""WITH e AS ($derivedSql),
              |t AS (
              |  SELECT *,
              |    list_reduce(list_transform(string_split(ip, '.'),
              |                x -> x::BIGINT), (a, b) -> a * 256 + b) AS ipl
              |  FROM e
              |)
              |SELECT event_type, count(*) AS n_events
              |FROM t
              |WHERE NOT (regexp_matches(ua, '$RobotRe')
              |           OR regexp_matches(ua, '$MachineRe')
              |           OR (ipl >> 16) IN (2565, 2577, 2593))
              |  AND event_type IN ('view', 'purchase')
              |  AND ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-20'
              |GROUP BY 1""".stripMargin)),

    // Geohash dimension rollup (`00-metrics-tables.sql:26` geohash4;
    // `elastic_notes.rst:236-238`): coordinates derived deterministically,
    // encoded with Enrich.geohash, grouped. The oracle reproduces the same
    // interleaved-bit arithmetic, generated from one formula.
    GraftQuery("f_geohash_rollup",
      (s, dir) => Tables.events(s, dir)
        .withColumn("lat", (col("user_id") % 170).cast("double") - 85.0 + 0.37)
        .withColumn("lon", (col("event_id") % 350).cast("double") - 175.0 + 0.29)
        .groupBy(Enrich.geohash(col("lat"), col("lon"), 4).as("geohash4"))
        .agg(count(lit(1)).as("n_events")),
      Some {
        val base32 = "0123456789bcdefghjkmnpqrstuvwxyz"
        def bitSql(i: Int): String = {
          // least(...) mirrors the engine's boundary clamp (lat=90/lon=180)
          val (f, k) =
            if (i % 2 == 0) ("least((lon + 180.0) / 360.0, 0.9999999999999999)", i / 2)
            else ("least((lat + 90.0) / 180.0, 0.9999999999999999)", i / 2)
          s"(CAST(floor($f * ${math.pow(2, k + 1).toLong}) AS BIGINT) % 2)"
        }
        val chars = (0 until 4).map { c =>
          val idx = (0 until 5).map(j => s"${bitSql(c * 5 + j)} * ${16 >> j}")
            .mkString(" + ")
          s"substring('$base32', CAST($idx AS INT) + 1, 1)"
        }.mkString(" || ")
        s"""WITH e AS (
           |  SELECT (user_id % 170)::DOUBLE - 85.0 + 0.37 AS lat,
           |         (event_id % 350)::DOUBLE - 175.0 + 0.29 AS lon
           |  FROM events
           |)
           |SELECT $chars AS geohash4, count(*) AS n_events
           |FROM e GROUP BY 1""".stripMargin
      }),

    // GeoIP range lookup (F15 scale path): fact ips bucket-equi-join a
    // 512-row range dimension, residual BETWEEN filter — never a nested
    // loop. The oracle runs the plain theta join (equivalent on
    // non-overlapping ranges).
    GraftQuery("f_geoip_range",
      (s, dir) => {
        import org.apache.spark.sql.functions.{shiftleft => shl}
        val ranges = s.range(512).select(
          shl(col("id"), 23).as("range_start"),
          (shl(col("id") + 1, 23) - 1).as("range_end"),
          element_at(array(Seq("US", "DE", "FR", "JP", "BR").map(lit): _*),
            (col("id") % 5 + 1).cast("int")).as("country"))
        val facts = Tables.events(s, dir).select(col("event_id"),
          pmod(col("user_id") * 2654435761L, lit(4294967296L)).as("ip"))
        Enrich.rangeLookup(facts, col("ip"), ranges, bucketBits = 23)
          .groupBy(col("country")).agg(count(lit(1)).as("n"))
      },
      Some("""WITH r AS (
             |  SELECT (i::BIGINT << 23) AS range_start,
             |         ((i::BIGINT + 1) << 23) - 1 AS range_end,
             |         list_extract(['US', 'DE', 'FR', 'JP', 'BR'],
             |                      (i % 5 + 1)::INT) AS country
             |  FROM (SELECT unnest(generate_series(0, 511)) AS i)),
             |e AS (SELECT event_id,
             |        (user_id * 2654435761) % 4294967296 AS ip FROM events)
             |SELECT country, count(*) AS n
             |FROM e JOIN r ON e.ip BETWEEN r.range_start AND r.range_end
             |GROUP BY 1""".stripMargin)),

    // DOI canonicalization: per-source rewrite rules, first match wins
    // (`es_sysmeta_sync.py:403-438`).
    GraftQuery("f_canonical_id",
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"), Enrich.canonicalId(Seq(
          col("source").isin("src0", "src1", "src2", "src3", "src4") ->
            concat(lit("doi:10.5063/"), lpad(col("doc_id").cast("string"), 6, "0")),
          contains(col("source"), lit("1")) ->
            lower(concat(lit("DOI:10.6073/PKG"), col("doc_id")))),
          fallback = concat(lit("urn:uuid:"), md5(col("doc_id").cast("string"))))
          .as("canonical")),
      Some("""SELECT doc_id,
             |  CASE WHEN source IN ('src0','src1','src2','src3','src4')
             |       THEN 'doi:10.5063/' || lpad(doc_id::VARCHAR, 6, '0')
             |       WHEN contains(source, '1')
             |       THEN lower('DOI:10.6073/PKG' || doc_id)
             |       ELSE 'urn:uuid:' || md5(doc_id::VARCHAR) END AS canonical
             |FROM documents""".stripMargin)),
  )
}
