package graft.queries

import graft.Tables
import graft.api.MetricsApi
import graft.operators.Multimodal

/** End-to-end request-interpreter queries (SURVEY.md §3.1): a JSON
  * `MetricsRequest` — the engine's external query language — interpreted
  * into a plan and verified against the oracle, plus the multimodal
  * feature-extraction path.
  */
object ApiQueries {

  private val userList = (0 until 50).map(u => s""""$u"""").mkString(", ")
  private val userInList = (0 until 50).mkString(", ")

  /** The landing-page request fixture: 50 users, January 2024 by day,
    * views+downloads (mirrors `LandingPageQueryRequest.json`). */
  val landingPageRequest: String =
    s"""{
       |  "metrics": ["views", "downloads"],
       |  "filterBy": [
       |    {"filterType": "user", "values": [$userList], "interpretAs": "list"},
       |    {"filterType": "time", "values": ["2024-01-01", "2024-02-04"],
       |     "interpretAs": "range"}
       |  ],
       |  "groupBy": ["day"]
       |}""".stripMargin

  val entries: Seq[GraftQuery] = Seq(

    GraftQuery("api_landing_page",
      (s, dir) => MetricsApi.interpretJson(s, dir, landingPageRequest),
      Some(s"""WITH spine AS (
              |  SELECT strftime(unnest(generate_series(DATE '2024-01-01',
              |           DATE '2024-02-04', INTERVAL 1 DAY)), '%Y-%m-%d') AS period
              |), agg AS (
              |  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS period,
              |         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
              |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS downloads
              |  FROM events
              |  WHERE user_id IN ($userInList)
              |    AND ts >= TIMESTAMP '2024-01-01'
              |    AND ts < TIMESTAMP '2024-02-05'
              |  GROUP BY 1
              |)
              |SELECT s.period, coalesce(views, 0) AS views,
              |       coalesce(downloads, 0) AS downloads
              |FROM spine s LEFT JOIN agg USING (period)""".stripMargin)),

    // The reference's COLUMN-ORIENTED response shape (§1.1: parallel
    // arrays months[]/views[]/downloads[] plus resultDetails totals,
    // `metricsreader.py:315-323,1609-1615`) — arrays joined to strings so
    // the oracle hash-compares them exactly.
    GraftQuery("api_columnar_response",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val long = MetricsApi.interpretJson(s, dir, landingPageRequest)
        MetricsApi.columnarResponse(long, Seq("views", "downloads"))
          .select(
            array_join(col("periods"), ",").as("periods"),
            array_join(transform(col("views"), _.cast("string")), ",")
              .as("views"),
            array_join(transform(col("downloads"), _.cast("string")), ",")
              .as("downloads"),
            col("total_views"), col("total_downloads"))
      },
      Some(s"""WITH spine AS (
              |  SELECT strftime(unnest(generate_series(DATE '2024-01-01',
              |           DATE '2024-02-04', INTERVAL 1 DAY)), '%Y-%m-%d') AS period
              |), agg AS (
              |  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS period,
              |         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
              |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS downloads
              |  FROM events
              |  WHERE user_id IN ($userInList)
              |    AND ts >= TIMESTAMP '2024-01-01'
              |    AND ts < TIMESTAMP '2024-02-05'
              |  GROUP BY 1
              |), lng AS (
              |  SELECT s.period, coalesce(views, 0) AS views,
              |         coalesce(downloads, 0) AS downloads
              |  FROM spine s LEFT JOIN agg USING (period)
              |)
              |SELECT array_to_string(list(period ORDER BY period), ',') AS periods,
              |       array_to_string(list(views ORDER BY period), ',') AS views,
              |       array_to_string(list(downloads ORDER BY period), ',') AS downloads,
              |       sum(views)::BIGINT AS total_views,
              |       sum(downloads)::BIGINT AS total_downloads
              |FROM lng""".stripMargin)),

    // Grouped variant: month unit × eventType dimension (repo/portal chart
    // shape, `metricsreader.py:786-796`).
    GraftQuery("api_grouped_by_type",
      (s, dir) => MetricsApi.interpretJson(s, dir,
        """{"metrics": ["views", "downloads", "clicks"],
          |"filterBy": [{"filterType": "eventType",
          |  "values": ["view", "purchase", "click"], "interpretAs": "list"}],
          |"groupBy": ["month", "eventType"]}""".stripMargin),
      Some("""SELECT strftime(date_trunc('month', ts), '%Y-%m') AS period,
             |       event_type,
             |       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
             |       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS downloads,
             |       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks
             |FROM events WHERE event_type IN ('view', 'purchase', 'click')
             |GROUP BY 1, 2""".stripMargin)),

    // Dataset landing-page path (§3.1): request ids expand to identifier
    // families (J4) before filtering, then the month series.
    GraftQuery("api_dataset_family",
      (s, dir) => MetricsApi.interpretJson(s, dir,
        """{"metrics": ["views", "downloads"],
          |"filterBy": [
          |  {"filterType": "dataset", "values": ["3", "57"],
          |   "interpretAs": "list"},
          |  {"filterType": "time", "values": ["2024-01-01", "2024-02-29"],
          |   "interpretAs": "range"}],
          |"groupBy": ["month"]}""".stripMargin),
      Some("""WITH spine AS (
             |  SELECT strftime(unnest(generate_series(DATE '2024-01-01',
             |           DATE '2024-02-29', INTERVAL 1 MONTH)), '%Y-%m') AS period
             |), agg AS (
             |  SELECT strftime(date_trunc('month', ts), '%Y-%m') AS period,
             |         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
             |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS downloads
             |  FROM events
             |  WHERE (user_id % 50) IN (3, 7)
             |    AND ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-03-01'
             |  GROUP BY 1
             |)
             |SELECT s.period, coalesce(views, 0) AS views,
             |       coalesce(downloads, 0) AS downloads
             |FROM spine s LEFT JOIN agg USING (period)""".stripMargin)),

    // Catalog path (§3.1): per-entity summary shape (A15), not a series.
    GraftQuery("api_catalog_summary",
      (s, dir) => MetricsApi.interpretJson(s, dir,
        """{"metrics": ["views", "downloads"],
          |"filterBy": [{"filterType": "catalog",
          |  "values": ["1", "2", "3", "4", "5"], "interpretAs": "list"}],
          |"groupBy": []}""".stripMargin),
      Some("""SELECT user_id AS entity,
             |       CAST(count(DISTINCT CASE WHEN event_type = 'view'
             |                           THEN event_id END) AS BIGINT) AS views,
             |       CAST(count(DISTINCT CASE WHEN event_type = 'purchase'
             |                           THEN event_id END) AS BIGINT) AS downloads
             |FROM events WHERE user_id IN (1, 2, 3, 4, 5)
             |GROUP BY 1""".stripMargin)),

    // Repository-profile path (§3.2): node filter (skip-CN dispatch, F3) +
    // month histogram.
    GraftQuery("api_repository_profile",
      (s, dir) => MetricsApi.interpretJson(s, dir,
        """{"metrics": ["views", "downloads"],
          |"filterBy": [
          |  {"filterType": "repository", "values": ["urn:node:B"],
          |   "interpretAs": "list"},
          |  {"filterType": "time", "values": ["2024-01-01", "2024-03-31"],
          |   "interpretAs": "range"}],
          |"groupBy": ["month"]}""".stripMargin),
      Some("""WITH spine AS (
             |  SELECT strftime(unnest(generate_series(DATE '2024-01-01',
             |           DATE '2024-03-31', INTERVAL 1 MONTH)), '%Y-%m') AS period
             |), agg AS (
             |  SELECT strftime(date_trunc('month', ts), '%Y-%m') AS period,
             |         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
             |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS downloads
             |  FROM events
             |  WHERE (['urn:node:A','urn:node:B','urn:node:C','urn:node:D','urn:node:E'])
             |          [(user_id % 5 + 1)::INT] = 'urn:node:B'
             |    AND ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-04-01'
             |  GROUP BY 1
             |)
             |SELECT s.period, coalesce(views, 0) AS views,
             |       coalesce(downloads, 0) AS downloads
             |FROM spine s LEFT JOIN agg USING (period)""".stripMargin)),

    // User-charts path (FIXTURES §5.2): %m/%d/%Y range dates, range filter
    // named after the unit, plural groupBy, country dimension.
    GraftQuery("api_user_charts",
      (s, dir) => MetricsApi.interpretJson(s, dir,
        """{"metrics": ["views", "downloads"],
          |"filterBy": [
          |  {"filterType": "user",
          |   "values": ["10", "11", "12", "13", "14", "15"],
          |   "interpretAs": "list"},
          |  {"filterType": "month", "values": ["01/05/2024", "01/25/2024"],
          |   "interpretAs": "range"}],
          |"groupBy": ["months", "country"]}""".stripMargin),
      Some("""SELECT strftime(date_trunc('month', ts), '%Y-%m') AS period,
             |       (['US','DE','FR','BR','JP','IN','GB','CA','AU','NL'])
             |         [(user_id % 10 + 1)::INT] AS country,
             |       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
             |       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS downloads
             |FROM events
             |WHERE user_id IN (10, 11, 12, 13, 14, 15)
             |  AND ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-26'
             |GROUP BY 1, 2""".stripMargin)),

    // Portal path with a collection-query filter (interpretAs=query):
    // portal membership + `field:value` boolean expression compiled to one
    // Catalyst predicate (`metricsreader.py:151-156,1449-1453`).
    // The reference's STORED collection-query shape (`es_eventlog_sync.py:239`):
    // leading negated clause, parenthesized disjunction, quoted phrase.
    GraftQuery("api_collection_query",
      (s, dir) => MetricsApi.interpretJson(s, dir,
        """{"metrics": ["views", "downloads"],
          |"filterBy": [
          |  {"filterType": "query",
          |   "values": ["-event_type:err* AND (event_type:view OR event_type:\"purchase\")"],
          |   "interpretAs": "query"}],
          |"groupBy": ["month"]}""".stripMargin),
      Some("""SELECT strftime(date_trunc('month', ts), '%Y-%m') AS period,
             |       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
             |       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS downloads
             |FROM events
             |WHERE NOT coalesce(starts_with(event_type, 'err'), FALSE)
             |  AND (event_type = 'view' OR event_type = 'purchase')
             |GROUP BY 1""".stripMargin)),

    GraftQuery("api_portal_query",
      (s, dir) => MetricsApi.interpretJson(s, dir,
        """{"metrics": ["views", "clicks"],
          |"filterBy": [
          |  {"filterType": "portal", "values": ["portal-2"],
          |   "interpretAs": "list"},
          |  {"filterType": "query",
          |   "values": ["event_type:view OR event_type:click AND props:{\"k\":\\ 1*"],
          |   "interpretAs": "query"}],
          |"groupBy": ["month"]}""".stripMargin),
      Some("""SELECT strftime(date_trunc('month', ts), '%Y-%m') AS period,
             |       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
             |       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks
             |FROM events
             |WHERE (user_id % 7) = 2
             |  AND (event_type = 'view'
             |       OR (event_type = 'click' AND starts_with(props, '{"k": 1')))
             |GROUP BY 1""".stripMargin)),

    // The `/metrics/filters` catalog route (reference `app.py:29-31`): the
    // accepted filter types with their enumerable value domains, served
    // from the materialized node/portal dimensions plus the event-type
    // domain. The oracle rebuilds each domain from the dim-generating
    // formulas over the distinct identifier set.
    GraftQuery("api_filters_catalog",
      (s, dir) => MetricsApi.filtersCatalog(s, dir),
      Some("""WITH u AS (SELECT DISTINCT user_id FROM events)
             |SELECT 'eventType' AS filter_type, event_type AS value
             |FROM (SELECT DISTINCT event_type FROM events)
             |UNION ALL
             |SELECT DISTINCT 'repository',
             |       (['urn:node:A','urn:node:B','urn:node:C','urn:node:D','urn:node:E'])
             |         [(user_id % 5 + 1)::INT]
             |FROM u
             |UNION ALL
             |SELECT DISTINCT 'country',
             |       (['US','DE','FR','BR','JP','IN','GB','CA','AU','NL'])
             |         [(user_id % 10 + 1)::INT]
             |FROM u
             |UNION ALL
             |SELECT DISTINCT 'portal', 'portal-' || (user_id % 7)
             |FROM u""".stripMargin)),

    // Multimodal feature extraction: typed binary media records through the
    // mapPartitions pass, rolled up by mime. The payload carries a GENUINE
    // image header (33-byte PNG sig+IHDR chunk / 12-byte JPEG SOI+SOF0) that the
    // engine parses back out; the oracle recomputes the decoded-dimension
    // sums from the generating formula and the header sizes from the spec
    // constants, so a wrong parse offset or endianness hash-mismatches.
    // Histogram bin 7 covers the post-header payload (ascii 0x70-0x7f).
    GraftQuery("m_media_features",
      (s, dir) => Multimodal.featureSummary(s, Tables.documents(s, dir)),
      Some("""SELECT CASE WHEN doc_id % 3 = 0 THEN 'image/png'
             |            WHEN doc_id % 3 = 1 THEN 'image/jpeg'
             |            ELSE 'video/mp4' END AS mime,
             |       count(*) AS n_media,
             |       CAST(sum(octet_length(text::BLOB) +
             |                CASE doc_id % 3 WHEN 0 THEN 33 WHEN 1 THEN 12
             |                     ELSE 0 END) AS BIGINT) AS total_bytes,
             |       CAST(sum(CASE WHEN doc_id % 3 = 2
             |                THEN greatest((n_chars * 100) // 1000, 1)
             |                ELSE 1 END) AS BIGINT) AS total_frames,
             |       CAST(sum(length(regexp_extract_all(text, '[\x70-\x7f]'))) AS BIGINT) AS hist_bin7_sum,
             |       CAST(sum(CASE WHEN doc_id % 3 <= 1
             |                THEN doc_id % 640 + 64 ELSE 0 END) AS BIGINT) AS decoded_w_sum,
             |       CAST(sum(CASE WHEN doc_id % 3 <= 1
             |                THEN doc_id % 480 + 48 ELSE 0 END) AS BIGINT) AS decoded_h_sum
             |FROM documents GROUP BY 1""".stripMargin)),

    // Audio plumbing parity for the multimodal row: synthesize canonical
    // WAV containers from column arithmetic, decode them back with the
    // real RIFF chunk-walker, roll up by channel count. Every output
    // column is recomputed by the oracle from the generating formulas, so
    // a little-endian slip on either side hash-mismatches.
    GraftQuery("m_audio_features",
      (s, dir) => Multimodal.audioSummary(s, Tables.documents(s, dir)),
      Some("""SELECT CAST(doc_id % 2 + 1 AS INTEGER) AS channels,
             |       count(*) AS n_media,
             |       CAST(sum((doc_id % 3 + 1) * 8000) AS BIGINT) AS rate_sum,
             |       CAST(sum(octet_length(text::BLOB)) AS BIGINT)
             |         AS payload_bytes,
             |       CAST(sum((octet_length(text::BLOB) * 1000)
             |                // ((doc_id % 3 + 1) * 8000 * (doc_id % 2 + 1) * 2))
             |         AS BIGINT) AS duration_ms_sum,
             |       16 AS bits_max
             |FROM documents GROUP BY 1""".stripMargin)),

    // ViT patch tiling: 32×32 grid over the image slice, dimensions
    // decoded from the genuine embedded headers, edge tiles clipped. The
    // oracle replays the grid arithmetic from the dimension-generating
    // formulas, so a parse error, a ceil slip, or a clip off-by-one
    // hash-mismatches on thousands of tiles.
    GraftQuery("m_image_patches",
      (s, dir) => Multimodal.patchGrid(s, Tables.documents(s, dir)),
      Some("""WITH img AS (SELECT doc_id AS media_id,
             |               (doc_id % 640 + 64)::INT AS w,
             |               (doc_id % 480 + 48)::INT AS h
             |             FROM documents WHERE doc_id % 3 <= 1),
             |g AS (SELECT media_id, w, h,
             |        unnest(generate_series(0, (w + 31) // 32 - 1)) AS px
             |      FROM img),
             |p AS (SELECT media_id, w, h, px,
             |        unnest(generate_series(0, (h + 31) // 32 - 1)) AS py
             |      FROM g)
             |SELECT media_id, px::INT AS patch_x, py::INT AS patch_y,
             |       (px * 32)::INT AS x0, (py * 32)::INT AS y0,
             |       least(32, w - px * 32)::INT AS pw,
             |       least(32, h - py * 32)::INT AS ph
             |FROM p""".stripMargin)),

    // Per-row image dimension decode over a six-way header zoo (r15
    // VERDICT #7): canonical PNG, canonical JPEG, JPEG with APP0 +
    // fill byte + progressive SOF2 (the segment-walk path), truncated
    // PNG, bare text, and SOI-EOI-no-SOF — the junk rows MUST surface
    // as NULL dims, not fabricated values or exceptions. The oracle
    // recomputes decodability and the dimensions from the generating
    // formulas per case, so a parse offset slip, a walker overrun into
    // entropy bytes, or a junk row decoding at all hash-mismatches
    // row-by-row.
    GraftQuery("m_image_dims",
      (s, dir) => Multimodal.imageDimsProbe(s, Tables.documents(s, dir)),
      Some("""SELECT doc_id AS media_id, (doc_id % 6)::INT AS kind,
             |       CASE WHEN doc_id % 6 <= 2
             |            THEN doc_id % 640 + 64 END::INT AS width,
             |       CASE WHEN doc_id % 6 <= 2
             |            THEN doc_id % 480 + 48 END::INT AS height,
             |       (doc_id % 6 <= 2) AS decoded
             |FROM documents""".stripMargin)),

    // Video frame sampling: ≤ 8 uniformly-strided frame indices per clip
    // at a 40 ms frame interval, each with its timestamp and a probe byte
    // read at the frame's proportional payload offset. The oracle replays
    // the full index/stride/offset arithmetic from the generating columns
    // (duration = n_chars × 100 ms; payload = the ASCII text, so char
    // position ≡ byte position), so an off-by-one in the stride ceiling,
    // the sequence bound, or the seek-offset division hash-mismatches.
    GraftQuery("m_frame_sample",
      (s, dir) => Multimodal.sampleVideoFrames(s, Tables.documents(s, dir)),
      Some("""WITH v AS (
             |  SELECT doc_id, text, length(text) AS len,
             |         (n_chars * 100) // 40 AS n_frames,
             |         greatest(1, (((n_chars * 100) // 40) + 7) // 8)
             |           AS stride
             |  FROM documents
             |  WHERE doc_id % 3 = 2 AND (n_chars * 100) // 40 > 0
             |), f AS (
             |  SELECT doc_id, text, len, n_frames,
             |         unnest(generate_series(0, n_frames - 1, stride))
             |           AS frame_idx
             |  FROM v
             |)
             |SELECT doc_id AS media_id, frame_idx,
             |       frame_idx * 40 AS ts_ms,
             |       ascii(substr(text,
             |         ((frame_idx * len) // n_frames + 1)::INT, 1))
             |         AS probe_byte
             |FROM f""".stripMargin)),
  )
}
