package graft.queries

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Text-analysis suite over `documents`: language ID (stopword heuristic),
  * quality scoring, token counting, and rolling-hash fingerprinting — the
  * per-document scoring pass of a training-data pipeline. All pure
  * projections (no shuffle except the final verify sink).
  */
object TextQueries {

  private val StopEn = Seq("the", "a", "of", "and", "to", "in", "is", "or")
  private val StopEs = Seq("el", "la", "de", "y", "en", "que", "los")
  private val StopDe = Seq("der", "die", "das", "und", "zu", "den")
  private val StopFr = Seq("le", "la", "de", "et", "les", "des")

  private def sqlList(xs: Seq[String]) = xs.map(x => s"'$x'").mkString(", ")

  val entries: Seq[GraftQuery] = Seq(

    // Language ID: per-language stopword hit counts, argmax with a fixed
    // tie-break order (en > es > de > fr).
    GraftQuery("t_langid",
      (s, dir) => {
        val toks = split(col("text"), " ")
        def score(stops: Seq[String]) =
          size(filter(toks, t => t.isin(stops: _*)))
        Tables.documents(s, dir).select(col("doc_id"), col("lang"),
          score(StopEn).as("s_en"), score(StopEs).as("s_es"),
          score(StopDe).as("s_de"), score(StopFr).as("s_fr"))
          .withColumn("predicted",
            when(col("s_en") >= col("s_es") && col("s_en") >= col("s_de") &&
              col("s_en") >= col("s_fr"), "en")
              .when(col("s_es") >= col("s_de") && col("s_es") >= col("s_fr"), "es")
              .when(col("s_de") >= col("s_fr"), "de")
              .otherwise("fr"))
      },
      Some(s"""WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS toks
              |           FROM documents),
              |sc AS (SELECT doc_id, lang,
              |  length(list_filter(toks, t -> t IN (${sqlList(StopEn)}))) AS s_en,
              |  length(list_filter(toks, t -> t IN (${sqlList(StopEs)}))) AS s_es,
              |  length(list_filter(toks, t -> t IN (${sqlList(StopDe)}))) AS s_de,
              |  length(list_filter(toks, t -> t IN (${sqlList(StopFr)}))) AS s_fr
              |  FROM d)
              |SELECT doc_id, lang, s_en, s_es, s_de, s_fr,
              |  CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
              |       WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
              |       WHEN s_de >= s_fr THEN 'de'
              |       ELSE 'fr' END AS predicted
              |FROM sc""".stripMargin)),

    // Quality scoring: token stats + stopword ratio → composite score.
    GraftQuery("t_quality",
      (s, dir) => {
        val toks = split(col("text"), " ")
        val nToks = size(toks)
        val stopHits = size(filter(toks, t => t.isin(StopEn: _*)))
        Tables.documents(s, dir).select(col("doc_id"),
          nToks.as("n_tokens"),
          (aggregate(toks, lit(0L), (a, t) => a + length(t)).cast("double") /
            nToks.cast("double")).as("avg_tok_len"),
          (stopHits.cast("double") / nToks.cast("double")).as("stop_ratio"))
          .withColumn("quality",
            round(col("stop_ratio") * 0.5 +
              least(col("n_tokens").cast("double") / 200.0, lit(1.0)) * 0.5, 6))
      },
      Some(s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
              |           FROM documents),
              |q AS (SELECT doc_id,
              |        length(toks) AS n_tokens,
              |        list_reduce(list_transform(toks, t -> length(t)::BIGINT),
              |          (a, b) -> a + b)::DOUBLE / length(toks) AS avg_tok_len,
              |        length(list_filter(toks, t -> t IN (${sqlList(StopEn)})))::DOUBLE
              |          / length(toks) AS stop_ratio
              |      FROM d)
              |SELECT doc_id, n_tokens, avg_tok_len, stop_ratio,
              |       round(stop_ratio * 0.5 +
              |             least(n_tokens::DOUBLE / 200.0, 1.0) * 0.5, 6) AS quality
              |FROM q""".stripMargin)),

    // Token counting: whitespace tokens + BPE-ish regex tokens + chars.
    GraftQuery("t_token_count",
      (s, dir) => Tables.documents(s, dir).select(col("doc_id"),
        size(split(col("text"), " ")).as("ws_tokens"),
        size(regexp_extract_all(col("text"),
          lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).as("re_tokens"),
        length(col("text")).as("n_chars_computed")),
      Some("""SELECT doc_id,
             |       length(string_split(text, ' ')) AS ws_tokens,
             |       length(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS re_tokens,
             |       length(text) AS n_chars_computed
             |FROM documents""".stripMargin)),

    // Rolling-hash fingerprint: min over 8-char shingle hashes (winnowing
    // min-fingerprint) — O(len) per doc, no shuffle.
    GraftQuery("t_fingerprint",
      (s, dir) => Tables.documents(s, dir).select(col("doc_id"), expr(
        """array_min(transform(sequence(1, greatest(length(text) - 7, 1)),
          |  i -> cast(conv(substring(md5(substring(text, i, 8)), 1, 15), 16, 10)
          |            AS BIGINT)))""".stripMargin).as("fingerprint")),
      Some("""SELECT doc_id,
             |  list_min(list_transform(generate_series(1, greatest(length(text) - 7, 1)),
             |    i -> ('0x' || substring(md5(substring(text, i, 8)), 1, 15))::BIGINT))
             |    AS fingerprint
             |FROM documents""".stripMargin)),
  )
}
