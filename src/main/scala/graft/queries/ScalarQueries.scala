package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Scalar-function battery (SURVEY.md §2.8): the reference's date / string /
  * hash / codec / json scalar surface, exercised per-row and verified
  * value-exact against DuckDB. All pure projections — fused into the scan.
  */
object ScalarQueries {

  val entries: Seq[GraftQuery] = Seq(

    // Date parse/format/arithmetic (`metricsreader.py:278-298`,
    // `metricsreporter.py:609-675` month iteration / last_day).
    GraftQuery("f_date_battery",
      (s, dir) => Tables.events(s, dir).filter(col("event_id") < 200)
        .select(col("event_id"),
          year(col("ts")).as("y"),
          month(col("ts")).as("m"),
          dayofmonth(col("ts")).as("d"),
          hour(col("ts")).as("h"),
          date_format(col("ts"), "yyyy-MM").as("ym"),
          last_day(col("ts")).cast("string").as("eom"),
          add_months(col("ts"), 2).cast("string").as("plus2m"),
          unix_micros(col("ts")).as("us"),
          (unix_micros(col("ts")) / lit(1000000L)).cast("long").as("epoch_s")),
      Some("""SELECT event_id, year(ts) AS y, month(ts) AS m, day(ts) AS d,
             |       hour(ts) AS h, strftime(ts, '%Y-%m') AS ym,
             |       strftime(last_day(ts::DATE), '%Y-%m-%d') AS eom,
             |       strftime((ts + INTERVAL 2 MONTH)::DATE, '%Y-%m-%d') AS plus2m,
             |       epoch_us(ts) AS us,
             |       CAST(floor(epoch_us(ts) / 1000000) AS BIGINT) AS epoch_s
             |FROM events WHERE event_id < 200""".stripMargin)),

    // String case/slice/find/regex (`metricsreader.py:444-446,854-876`,
    // `metricsdatabase.py:409-413`).
    GraftQuery("f_string_battery",
      (s, dir) => Tables.documents(s, dir).filter(col("doc_id") < 200)
        .select(col("doc_id"),
          upper(col("source")).as("src_u"),
          substring(col("text"), 1, 12).as("prefix12"),
          length(col("text")).as("len"),
          instr(col("text"), "spark").as("spark_pos"),
          element_at(split(col("text"), " "), 1).as("first_tok"),
          col("text").startsWith("the").as("starts_the"),
          regexp_extract(col("text"), "[a-z]{5,}", 0).as("first_long_tok"),
          reverse(col("source")).as("src_rev"),
          lpad(col("doc_id").cast("string"), 5, "0").as("padded"),
          translate(col("source"), "src", "SRC").as("trans")),
      Some("""SELECT doc_id, upper(source) AS src_u,
             |       substring(text, 1, 12) AS prefix12,
             |       length(text) AS len,
             |       instr(text, 'spark') AS spark_pos,
             |       string_split(text, ' ')[1] AS first_tok,
             |       starts_with(text, 'the') AS starts_the,
             |       regexp_extract(text, '[a-z]{5,}') AS first_long_tok,
             |       reverse(source) AS src_rev,
             |       lpad(doc_id::VARCHAR, 5, '0') AS padded,
             |       translate(source, 'src', 'SRC') AS trans
             |FROM documents WHERE doc_id < 200""".stripMargin)),

    // Hash / codec / json (`es_eventlog_sync.py:469-482` md5;
    // `search.conf:196-225` base64+json; `metricsdatabase.py:374-375` json).
    GraftQuery("f_hash_codec",
      (s, dir) => Tables.events(s, dir).filter(col("event_id") < 200)
        .select(col("event_id"),
          md5(col("props")).as("md5_props"),
          sha2(col("props"), 256).as("sha_props"),
          base64(col("props").cast("binary")).as("b64"),
          get_json_object(col("props"), "$.k").cast("long").as("k_val"),
          hex(col("event_id")).as("id_hex")),
      Some("""SELECT event_id, md5(props) AS md5_props,
             |       sha256(props) AS sha_props,
             |       to_base64(props::BLOB) AS b64,
             |       json_extract_string(props, '$.k')::BIGINT AS k_val,
             |       to_hex(event_id) AS id_hex
             |FROM events WHERE event_id < 200""".stripMargin)),
  )
}
