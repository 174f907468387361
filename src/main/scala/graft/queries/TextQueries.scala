package graft.queries

import graft.Tables
import graft.operators.{Dedup, Sketches}
import org.apache.spark.sql.functions._

/** Text-analysis suite over `documents`: language ID (stopword heuristic),
  * quality scoring, token counting, and rolling-hash fingerprinting — the
  * per-document scoring pass of a training-data pipeline. All pure
  * projections (no shuffle except the final verify sink).
  */
object TextQueries {

  private[queries] val StopEn = Seq("the", "a", "of", "and", "to", "in", "is", "or")
  private val StopEs = Seq("el", "la", "de", "y", "en", "que", "los")
  private val StopDe = Seq("der", "die", "das", "und", "zu", "den")
  private val StopFr = Seq("le", "la", "de", "et", "les", "des")

  private[queries] def sqlList(xs: Seq[String]) = xs.map(x => s"'$x'").mkString(", ")

  /** Frozen BPE merge table: the export of `Bpe.learnMerges(corpus
    * word-freq, 64)` over the sf0.01 documents corpus — the shipped model
    * artifact the `t_bpe_tokenize` gate applies (train once, freeze the
    * merges, apply everywhere). Regenerate by re-running the trainer if
    * the corpus generator ever changes. */
  private val FrozenBpeMerges: Seq[(String, String, Long)] = Seq(
    ("e", "r", 4568L), ("i", "n", 2760L), ("o", "w", 2747L),
    ("o", "r", 2696L), ("s", "t", 2676L), ("m", "er", 1852L),
    ("a", "t", 1845L), ("l", "u", 1831L), ("a", "r", 1758L),
    ("p", "ar", 1758L), ("j", "o", 964L), ("jo", "in", 964L),
    ("a", "s", 947L), ("as", "h", 947L), ("h", "ash", 947L),
    ("r", "ow", 943L), ("at", "c", 937L), ("atc", "h", 937L),
    ("b", "atch", 937L), ("a", "n", 936L), ("c", "an", 936L),
    ("s", "can", 936L), ("c", "o", 934L), ("c", "u", 934L),
    ("co", "lu", 934L), ("colu", "m", 934L), ("colum", "n", 934L),
    ("cu", "st", 934L), ("cust", "o", 934L), ("custo", "mer", 934L),
    ("f", "i", 933L), ("fi", "l", 933L), ("fil", "t", 933L),
    ("filt", "er", 933L), ("a", "l", 928L), ("al", "l", 928L),
    ("m", "all", 928L), ("s", "mall", 928L), ("g", "e", 918L),
    ("l", "ow", 918L), ("mer", "ge", 918L), ("s", "low", 918L),
    ("c", "t", 912L), ("ct", "or", 912L), ("d", "er", 912L),
    ("e", "ctor", 912L), ("or", "der", 912L), ("v", "ector", 912L),
    ("in", "e", 910L), ("l", "ine", 910L), ("a", "b", 908L),
    ("ab", "l", 908L), ("abl", "e", 908L), ("at", "a", 908L),
    ("d", "ata", 908L), ("t", "able", 908L), ("u", "p", 904L),
    ("a", "g", 901L), ("ag", "g", 901L), ("a", "lu", 897L),
    ("alu", "e", 897L), ("v", "alue", 897L), ("e", "y", 896L),
    ("k", "ey", 896L))

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

    // Language-ID confusion matrix: declared vs predicted language counts
    // plus per-cell share of the declared language's row — the eval
    // cross-tab that tells you WHERE the classifier fails, not just how
    // often. Same classifier as t_langid; one extra tiny agg + window over
    // the |langs|² cells.
    GraftQuery("t_langid_confusion",
      (s, dir) => {
        val toks = split(col("text"), " ")
        def score(stops: Seq[String]) =
          size(filter(toks, t => t.isin(stops: _*)))
        import org.apache.spark.sql.expressions.Window
        Tables.documents(s, dir).select(col("lang"),
          score(StopEn).as("s_en"), score(StopEs).as("s_es"),
          score(StopDe).as("s_de"), score(StopFr).as("s_fr"))
          .withColumn("predicted",
            when(col("s_en") >= col("s_es") && col("s_en") >= col("s_de") &&
              col("s_en") >= col("s_fr"), "en")
              .when(col("s_es") >= col("s_de") && col("s_es") >= col("s_fr"), "es")
              .when(col("s_de") >= col("s_fr"), "de")
              .otherwise("fr"))
          .groupBy(col("lang"), col("predicted"))
          .agg(count(lit(1)).as("n_docs"))
          .withColumn("row_share", col("n_docs").cast("double") /
            sum(col("n_docs")).over(Window.partitionBy(col("lang"))))
      },
      Some(s"""WITH d AS (SELECT lang, string_split(text, ' ') AS toks
              |           FROM documents),
              |sc AS (SELECT lang,
              |  length(list_filter(toks, t -> t IN (${sqlList(StopEn)}))) AS s_en,
              |  length(list_filter(toks, t -> t IN (${sqlList(StopEs)}))) AS s_es,
              |  length(list_filter(toks, t -> t IN (${sqlList(StopDe)}))) AS s_de,
              |  length(list_filter(toks, t -> t IN (${sqlList(StopFr)}))) AS s_fr
              |  FROM d),
              |p AS (SELECT lang,
              |  CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
              |       WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
              |       WHEN s_de >= s_fr THEN 'de'
              |       ELSE 'fr' END AS predicted
              |  FROM sc),
              |c AS (SELECT lang, predicted, count(*) AS n_docs
              |      FROM p GROUP BY 1, 2)
              |SELECT lang, predicted, n_docs,
              |       n_docs::DOUBLE /
              |         sum(n_docs) OVER (PARTITION BY lang) AS row_share
              |FROM c""".stripMargin)),

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
          // raw rational combination — no in-query round (exact-half
          // boundary, see t_unigram_logprob); op order mirrors the oracle
          .withColumn("quality",
            col("stop_ratio") * 0.5 +
              least(col("n_tokens").cast("double") / 200.0, lit(1.0)) * 0.5)
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
              |       stop_ratio * 0.5 +
              |         least(n_tokens::DOUBLE / 200.0, 1.0) * 0.5 AS quality
              |FROM q""".stripMargin)),

    // Model-based quality filtering: the fastText-shaped hashed linear
    // classifier (unigram + bigram feature hashing, mean-margin keep
    // rule) — a pure projection, zero shuffles at any corpus size. The
    // oracle replays bucket, scramble, and integer milliweight sum
    // exactly, so a hash, modulus, or fold slip on either side
    // hash-mismatches.
    GraftQuery("t_quality_classifier",
      (s, dir) => graft.operators.Classifier.score(
        Tables.documents(s, dir), col("doc_id"), col("text")),
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
             |           FROM documents),
             |f AS (SELECT doc_id,
             |        list_transform(w, t ->
             |          (('0x' || substring(md5(t), 1, 15))::BIGINT % 512)
             |            * 2654435761 % 2001 - 1000) AS uw,
             |        CASE WHEN length(w) >= 2 THEN
             |          list_transform(generate_series(1, length(w) - 1), i ->
             |            (('0x' || substring(md5(w[i] || ' ' || w[i+1]), 1, 15))::BIGINT % 512)
             |              * 2654435761 % 2001 - 1000)
             |        ELSE [] END AS bw
             |      FROM d),
             |q AS (SELECT doc_id,
             |        (length(uw) + length(bw))::BIGINT AS n_features,
             |        (list_reduce(uw, (a, b) -> a + b) +
             |         CASE WHEN length(bw) > 0
             |              THEN list_reduce(bw, (a, b) -> a + b) ELSE 0 END)::DOUBLE
             |          / ((length(uw) + length(bw)) * 1000) AS quality_score
             |      FROM f)
             |SELECT doc_id, n_features, quality_score,
             |       quality_score > 0 AS keep
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

    // C4-style cleaning pipeline: one projection computes every quality
    // gate and emits kept + machine-readable drop reasons — the composed
    // filter pass a corpus cleaning job runs before tokenization.
    GraftQuery("t_clean_pipeline",
      (s, dir) => {
        val toks = split(col("text"), " ")
        val nToks = size(toks)
        val stopRatio = size(filter(toks, t => t.isin(StopEn: _*)))
          .cast("double") / nToks.cast("double")
        val avgLen = aggregate(toks, lit(0L), (a, t) => a + length(t))
          .cast("double") / nToks.cast("double")
        Tables.documents(s, dir)
          .select(col("doc_id"), nToks.as("n_tokens"),
            avgLen.as("avg_tok_len"), stopRatio.as("stop_ratio"))
          .withColumn("reasons", array_join(filter(array(
            when(col("n_tokens") < 5, "too_short"),
            when(col("n_tokens") > 5000, "too_long"),
            when(col("avg_tok_len") < 2 || col("avg_tok_len") > 12,
              "weird_tokens"),
            when(col("stop_ratio") < 0.01, "no_stopwords")),
            x => x.isNotNull), ","))
          .withColumn("kept", col("reasons") === "")
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
              |SELECT doc_id, n_tokens, avg_tok_len, stop_ratio, reasons,
              |       reasons = '' AS kept
              |FROM (SELECT *,
              |        coalesce(array_to_string(list_filter([
              |          CASE WHEN n_tokens < 5 THEN 'too_short' END,
              |          CASE WHEN n_tokens > 5000 THEN 'too_long' END,
              |          CASE WHEN avg_tok_len < 2 OR avg_tok_len > 12 THEN 'weird_tokens' END,
              |          CASE WHEN stop_ratio < 0.01 THEN 'no_stopwords' END],
              |          x -> x IS NOT NULL), ','), '') AS reasons
              |      FROM q)""".stripMargin)),

    // PII scrubbing — the redaction pass every released training corpus
    // runs (emails, IPv4s, phone numbers → typed placeholder tokens). The
    // corpus carries no PII, so deterministic PII is synthesized per doc
    // first; the scrub chain and per-category counts are then graded
    // value-exact. Patterns use only Java-regex ∩ RE2 constructs so the
    // identical strings drive Spark and the oracle; replacement order is
    // email → phone → IP (none can match inside another's replacement).
    // Shuffle-free single projection — survives 100 TB as a pure map.
    GraftQuery("t_pii_scrub",
      (s, dir) => {
        val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val PhoneRe = "\\+1-555-\\d{4}"
        val IpRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
        val raw = concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.org from "),
          (col("doc_id") * 37) % 256, lit("."), (col("doc_id") * 11) % 256,
          lit(".0."), col("doc_id") % 8,
          when(col("doc_id") % 3 === 0,
            concat(lit(" call +1-555-"),
              lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
            .otherwise(lit("")))
        Tables.documents(s, dir)
          .select(col("doc_id"), raw.as("raw"))
          .select(col("doc_id"),
            regexp_replace(regexp_replace(regexp_replace(col("raw"),
              EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>"), IpRe, "<IP>")
              .as("clean"),
            regexp_count(col("raw"), lit(EmailRe)).cast("long").as("n_emails"),
            regexp_count(col("raw"), lit(PhoneRe)).cast("long").as("n_phones"),
            regexp_count(col("raw"), lit(IpRe)).cast("long").as("n_ips"))
      },
      Some("""WITH r AS (
             |  SELECT doc_id,
             |    text || ' contact user' || doc_id || '@example.org from ' ||
             |    (doc_id * 37) % 256 || '.' || (doc_id * 11) % 256 ||
             |    '.0.' || doc_id % 8 ||
             |    CASE WHEN doc_id % 3 = 0
             |         THEN ' call +1-555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
             |         ELSE '' END AS raw
             |  FROM documents)
             |SELECT doc_id,
             |  regexp_replace(regexp_replace(regexp_replace(raw,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |    '\+1-555-\d{4}', '<PHONE>', 'g'),
             |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS clean,
             |  CAST(length(regexp_extract_all(raw,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
             |  CAST(length(regexp_extract_all(raw, '\+1-555-\d{4}')) AS BIGINT) AS n_phones,
             |  CAST(length(regexp_extract_all(raw,
             |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips
             |FROM r""".stripMargin)),

    // Stratified deterministic sampling: hash-gated per-language rates —
    // downsample the dominant language, keep the tail. Reproducible across
    // runs (pure function of doc_id); no shuffle, no rand().
    GraftQuery("t_stratified_sample",
      (s, dir) => graft.operators.Sampling.stratifiedSample(
        Tables.documents(s, dir).select(col("doc_id"), col("lang")),
        col("doc_id"), col("lang"),
        Map("en" -> 0.5, "es" -> 0.25), defaultRate = 0.1),
      Some("""SELECT doc_id, lang FROM documents
             |WHERE ('0x' || substring(md5(doc_id::VARCHAR), 1, 15))::BIGINT
             |        / 1152921504606846976.0
             |      < CASE WHEN lang = 'en' THEN 0.5
             |             WHEN lang = 'es' THEN 0.25
             |             ELSE 0.1 END""".stripMargin)),

    // Exactly-k-per-stratum deterministic sample: fixed-size reproducible
    // reservoir per language (hash-ranked; rate gates give binomial sizes,
    // this gives exact ones — the eval-set construction shape).
    GraftQuery("t_per_group_sample",
      (s, dir) => graft.operators.Sampling.fixedSizePerGroup(
        Tables.documents(s, dir).select(col("doc_id"), col("lang")),
        col("doc_id"), col("lang"), k = 20),
      Some("""WITH h AS (
             |  SELECT doc_id, lang,
             |         ('0x' || substring(md5(doc_id::VARCHAR), 1, 15))::BIGINT
             |           / 1152921504606846976.0 AS hu
             |  FROM documents
             |), r AS (
             |  SELECT doc_id, lang,
             |         row_number() OVER (PARTITION BY lang
             |                            ORDER BY hu, doc_id) AS rn
             |  FROM h
             |)
             |SELECT doc_id, lang FROM r WHERE rn <= 20""".stripMargin)),

    // Length-weighted deterministic sampling: keep probability
    // n_chars/600 (clamped) — the quality/length-proportional corpus
    // selection pass, as the same shuffle-free hash gate as the uniform
    // samplers.
    GraftQuery("t_weighted_sample",
      (s, dir) => graft.operators.Sampling.weightedSample(
        Tables.documents(s, dir).select(col("doc_id"), col("lang"),
          col("n_chars")),
        col("doc_id"), col("n_chars"), weightScale = 600.0),
      Some("""SELECT doc_id, lang, n_chars FROM documents
             |WHERE ('0x' || substring(md5(doc_id::VARCHAR), 1, 15))::BIGINT
             |        / 1152921504606846976.0
             |      < least(n_chars / 600.0, 1.0)""".stripMargin)),

    // Token-budget corpus selection: keep the highest-vocabulary-richness
    // documents whose running token count fits 2/5 of the corpus — exact,
    // but WITHOUT the single-partition global cumsum window (distributed
    // two-level prefix sum: tiny bucket-offset frame + parallel
    // within-bucket windows). The oracle is the naive global window, so
    // any bucket-boundary off-by-one in the offsets hash-mismatches.
    GraftQuery("t_budget_select",
      (s, dir) => graft.operators.Sampling.budgetSelect(
        Tables.documents(s, dir),
        col("doc_id"),
        size(array_distinct(split(col("text"), " "))),
        size(split(col("text"), " ")),
        budgetNumer = 2, budgetDenom = 5, bucketWidth = 8),
      Some("""WITH b AS (
             |  SELECT doc_id,
             |         len(list_distinct(string_split(text, ' '))) AS score,
             |         len(string_split(text, ' ')) AS tok
             |  FROM documents
             |), t AS (
             |  SELECT doc_id, score, tok,
             |         CAST(sum(tok) OVER (
             |           ORDER BY score DESC, doc_id
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |           AS BIGINT) AS cum_tok
             |  FROM b
             |)
             |SELECT doc_id, score, tok, cum_tok FROM t
             |WHERE cum_tok <= (SELECT CAST(sum(tok) * 2 // 5 AS BIGINT)
             |                  FROM b)""".stripMargin)),

    // Deterministic epoch shuffle: reproducible per-epoch random training
    // order — hash key from (doc_id, epoch seed), shard = key mod 16,
    // position within shard. One shard-key shuffle, per-shard parallel
    // ordering, no global sort.
    GraftQuery("t_shard_shuffle",
      (s, dir) => graft.operators.Sampling.epochShuffle(
        Tables.documents(s, dir), col("doc_id"),
        epochSeed = "ep1", numShards = 16),
      Some("""WITH t AS (
             |  SELECT doc_id,
             |         ('0x' || substring(md5(doc_id::VARCHAR || ':ep1'),
             |                            1, 15))::BIGINT AS shuffle_key
             |  FROM documents
             |)
             |SELECT doc_id, shuffle_key, shuffle_key % 16 AS shard,
             |       CAST(row_number() OVER (
             |         PARTITION BY shuffle_key % 16
             |         ORDER BY shuffle_key, doc_id) AS BIGINT) AS pos
             |FROM t""".stripMargin)),

    // TF-IDF relevance scoring over the corpus vocabulary: one explode +
    // two aggregations (term rows shuffle once on term for document
    // frequency, once on (doc, term) for term frequency). The probe terms
    // keep the oracle small; the plan is the full-vocabulary shape.
    GraftQuery("t_tfidf",
      (s, dir) => {
        val probeTerms = Seq("the", "data", "el", "und", "le")
        val docs = Tables.documents(s, dir)
        // corpus size as a one-row aggregate cross-joined into the plan —
        // no driver action, the whole query is ONE job
        val stats = docs.agg(count(lit(1)).cast("double").as("n"))
        val terms = docs.select(col("doc_id"),
          explode(split(col("text"), " ")).as("term"))
          .filter(col("term").isin(probeTerms: _*))
        val dfreq = terms.groupBy(col("term"))
          .agg(countDistinct(col("doc_id")).as("df"))
        terms.groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"))
          .join(dfreq, "term")
          .crossJoin(broadcast(stats))
          .select(col("doc_id"), col("term"), col("tf"),
            round(col("tf") * log(col("n") / col("df")), 6)
              .as("tfidf"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
             |  FROM documents
             |), p AS (
             |  SELECT doc_id, term FROM t
             |  WHERE term IN ('the', 'data', 'el', 'und', 'le')
             |), dfreq AS (
             |  SELECT term, count(DISTINCT doc_id) AS df FROM p GROUP BY 1
             |), tf AS (
             |  SELECT doc_id, term, count(*) AS tf FROM p GROUP BY 1, 2
             |)
             |SELECT doc_id, tf.term, tf,
             |       round(tf * ln((SELECT count(*) FROM documents)::DOUBLE / df), 6)
             |         AS tfidf
             |FROM tf JOIN dfreq ON tf.term = dfreq.term""".stripMargin)),

    // BM25 relevance (k1=1.2, b=0.75): tf saturation + length
    // normalization on top of the tf-idf scaffolding — the ranking
    // function retrieval-based curation actually uses.
    GraftQuery("t_bm25",
      (s, dir) => {
        val probeTerms = Seq("the", "data", "el", "und", "le")
        val docs = Tables.documents(s, dir)
        val lens = docs.select(col("doc_id"),
          size(split(col("text"), " ")).cast("double").as("dl"))
        // (N, avgdl) as a one-row aggregate cross-joined into the plan —
        // no docs.count()/head() driver actions, the query is ONE job
        val stats = lens.agg(count(lit(1)).cast("double").as("n"),
          avg(col("dl")).as("avgdl"))
        val terms = docs.select(col("doc_id"),
          explode(split(col("text"), " ")).as("term"))
          .filter(col("term").isin(probeTerms: _*))
        val dfreq = terms.groupBy(col("term"))
          .agg(countDistinct(col("doc_id")).as("df"))
        val tf = terms.groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).cast("double").as("tf"))
        val k1 = 1.2; val b = 0.75
        tf.join(dfreq, "term").join(lens, "doc_id")
          .crossJoin(broadcast(stats))
          .select(col("doc_id"), col("term"),
            round(
              log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
                (col("tf") * lit(k1 + 1)) /
                (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))), 6)
              .as("bm25"))
      },
      Some("""WITH lens AS (
             |  SELECT doc_id, length(string_split(text, ' '))::DOUBLE AS dl
             |  FROM documents
             |), stats AS (
             |  SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM lens
             |), t AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
             |  FROM documents
             |), p AS (
             |  SELECT doc_id, term FROM t
             |  WHERE term IN ('the', 'data', 'el', 'und', 'le')
             |), dfreq AS (
             |  SELECT term, count(DISTINCT doc_id) AS df FROM p GROUP BY 1
             |), tf AS (
             |  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM p GROUP BY 1, 2
             |)
             |SELECT tf.doc_id, tf.term,
             |       round(ln((n - df + 0.5) / (df + 0.5) + 1.0) *
             |             (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6)
             |         AS bm25
             |FROM tf
             |JOIN dfreq ON tf.term = dfreq.term
             |JOIN lens ON tf.doc_id = lens.doc_id
             |CROSS JOIN stats""".stripMargin)),

    // Mixture reweighting: resample the multi-language corpus to target
    // proportions — budget set by the most under-represented source, each
    // source hash-downsampled to its share; no oversampling/duplication.
    GraftQuery("t_mixture_sample",
      (s, dir) => {
        val (sampled, _) = graft.operators.Sampling.mixToProportions(
          Tables.documents(s, dir).select(col("doc_id"), col("lang")),
          col("doc_id"), col("lang"),
          Map("en" -> 0.5, "es" -> 0.3, "de" -> 0.2))
        sampled
      },
      Some("""WITH c AS (SELECT lang, count(*) AS n FROM documents
             |           WHERE lang IN ('en', 'es', 'de') GROUP BY 1),
             |b AS (SELECT min(n::DOUBLE / (CASE lang WHEN 'en' THEN 0.5
             |                                        WHEN 'es' THEN 0.3
             |                                        WHEN 'de' THEN 0.2 END)::DOUBLE)
             |        AS t FROM c),
             |r AS (SELECT lang,
             |        (CASE lang WHEN 'en' THEN 0.5 WHEN 'es' THEN 0.3
             |                   WHEN 'de' THEN 0.2 END)::DOUBLE * t / n::DOUBLE
             |          AS rate
             |      FROM c, b)
             |SELECT d.doc_id, d.lang FROM documents d JOIN r USING (lang)
             |WHERE ('0x' || substring(md5(d.doc_id::VARCHAR), 1, 15))::BIGINT
             |        / 1152921504606846976.0 < rate""".stripMargin)),

    // Sequence packing: shard-local concat-then-split token bins — the
    // cleaned-corpus → fixed-length-training-examples step. One window per
    // shard; no global sort.
    GraftQuery("t_pack_sequences",
      (s, dir) => graft.operators.Packing.packSequences(
        Tables.documents(s, dir), col("doc_id"),
        size(split(col("text"), " ")).cast("long"),
        shards = 16, capacity = 2048L),
      Some("""SELECT doc_id,
             |       length(string_split(text, ' '))::BIGINT AS n_tokens,
             |       (doc_id % 16)::INT AS shard,
             |       (sum(length(string_split(text, ' '))::BIGINT)
             |          OVER (PARTITION BY doc_id % 16 ORDER BY doc_id))::BIGINT
             |         AS cum_tokens,
             |       ((sum(length(string_split(text, ' '))::BIGINT)
             |           OVER (PARTITION BY doc_id % 16 ORDER BY doc_id)
             |         - length(string_split(text, ' '))) // 2048)::BIGINT AS bin,
             |       (sum(length(string_split(text, ' '))::BIGINT)
             |          OVER (PARTITION BY doc_id % 16 ORDER BY doc_id)
             |        - length(string_split(text, ' '))
             |        - ((sum(length(string_split(text, ' '))::BIGINT)
             |              OVER (PARTITION BY doc_id % 16 ORDER BY doc_id)
             |            - length(string_split(text, ' '))) // 2048) * 2048)::BIGINT
             |         AS bin_offset
             |FROM documents""".stripMargin)),

    // Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD'03):
    // per doc, hash every 8-char shingle, slide a w=4 window over the
    // hash sequence, keep each window's MINIMUM — the guarantee plain
    // min-fingerprinting (t_fingerprint) lacks: any shared substring of
    // length >= w+7 chars produces at least one COMMON selected hash, so
    // matches cannot slip between samples. Entirely within-row via the
    // native WinnowExpr (one codegen'd JVM loop per doc, hashing
    // straight over byte ranges with a single char-offset pass — r12:
    // ~7× over the interpreted-lambda form it is spec-pinned
    // bit-identical to; 4.05 s lambda → 1.83 s substring-native →
    // 0.52–0.56 s byte-range at sf0.1, see SCALE.md), no shuffle —
    // scan-speed at 100 TB like every other doc battery. The oracle
    // replays the lambda semantics, so the native port stays
    // value-graded.
    GraftQuery("t_winnow_fingerprints",
      (s, dir) => graft.operators.Dedup.winnowFingerprints(
        Tables.documents(s, dir), col("doc_id"), col("text"), k = 8, w = 4),
      Some("""WITH h AS (
             |  SELECT doc_id,
             |    list_transform(generate_series(1, greatest(length(text) - 7, 1)),
             |      i -> ('0x' || substring(md5(substring(text, i, 8)), 1, 15))::BIGINT)
             |      AS hs
             |  FROM documents)
             |SELECT doc_id,
             |       unnest(list_distinct(list_transform(
             |         generate_series(1, greatest(length(hs) - 3, 1)),
             |         j -> list_min(hs[j:j+3])))) AS fp
             |FROM h""".stripMargin)),

    // Square-root temperature resampling (tau=2): target share
    // proportional to sqrt(n_lang) — the standard multilingual rebalance
    // that lifts tail languages. The closed-form per-source rate
    // sqrt(n_min)/sqrt(n_s) avoids any float SUM over sources (addition
    // order would break oracle bit-parity) and sqrt/divide are IEEE
    // correctly-rounded in both engines, so the hash-gate threshold is
    // bit-identical. Shuffle-free gate after one tiny count agg.
    GraftQuery("t_temperature_mix",
      (s, dir) => {
        val (sampled, _) = graft.operators.Sampling.temperatureMixSqrt(
          Tables.documents(s, dir).select(col("doc_id"), col("lang")),
          col("doc_id"), col("lang"))
        sampled
      },
      Some("""WITH c AS (SELECT lang AS src, count(*) AS n FROM documents
             |           WHERE lang IS NOT NULL GROUP BY 1),
             |m AS (SELECT min(n) AS mn FROM c),
             |r AS (SELECT src, sqrt(mn::DOUBLE) / sqrt(n::DOUBLE) AS rate
             |      FROM c, m)
             |SELECT d.doc_id, d.lang FROM documents d JOIN r ON r.src = d.lang
             |WHERE ('0x' || substring(md5(d.doc_id::VARCHAR), 1, 15))::BIGINT
             |        / 1152921504606846976.0 < rate""".stripMargin)),

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

    // Gopher-style repetition battery: duplicate-word fraction, the
    // character share of the single most frequent bigram, and the
    // duplicate-trigram fraction, composed into a keep flag (Rae et al.
    // 2021 §A1.1 thresholds, adapted to word-soup docs). Entirely
    // within-row — the top bigram comes from one O(n log n) sort + run
    // fold over the gram array, so the whole battery is shuffle-free and
    // embarrassingly parallel at 100 TB (no per-doc groupBy explode).
    GraftQuery("t_repetition",
      (s, dir) => {
        val ws = split(col("text"), " ")
        val d = Tables.documents(s, dir).select(col("doc_id"),
          col("n_chars"), ws.as("ws"), size(ws).cast("long").as("nw"))
        def grams(n: Int) = transform(
          sequence(lit(1), col("nw") - (n - 1)),
          i => concat_ws(" ",
            (0 until n).map(k => element_at(col("ws"), (i + k).cast("int"))): _*))
        // first maximal run in the ascending sort = most frequent gram,
        // ties broken toward the lexicographically smallest — the same
        // pick as the oracle's ORDER BY count DESC, gram ASC
        val folded = aggregate(array_sort(grams(2)),
          named_struct(lit("prev"), lit(""), lit("run"), lit(0L),
            lit("best"), lit(0L), lit("bestg"), lit("")),
          (a, g) => {
            val run = when(g === a.getField("prev"),
              a.getField("run") + 1).otherwise(lit(1L))
            named_struct(lit("prev"), g, lit("run"), run,
              lit("best"), greatest(run, a.getField("best")),
              lit("bestg"), when(run > a.getField("best"), g)
                .otherwise(a.getField("bestg")))
          })
        val dwf = (col("nw") - size(array_distinct(col("ws"))))
          .cast("double") / col("nw")
        val total3 = col("nw") - 2
        val dtf = (total3 - size(array_distinct(grams(3))))
          .cast("double") / total3
        d.select(col("doc_id"), col("nw").as("n_words"),
            dwf.as("dup_word_frac"), dtf.as("dup_trigram_frac"),
            col("n_chars"), folded.as("f"))
          .select(col("doc_id"), col("n_words"), col("dup_word_frac"),
            col("f.bestg").as("top_bigram"),
            (col("f.best") * length(col("f.bestg"))).cast("double")
              / col("n_chars") as "top_bigram_frac",
            col("dup_trigram_frac"))
          .withColumn("keep", col("dup_word_frac") <= 0.60
            && col("top_bigram_frac") <= 0.20
            && col("dup_trigram_frac") <= 0.30)
      },
      Some("""WITH w AS (SELECT doc_id, n_chars, string_split(text, ' ') AS ws
             |           FROM documents),
             |base AS (SELECT doc_id, n_chars, ws, len(ws) AS nw FROM w),
             |g2 AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g
             |       FROM base, unnest(generate_series(1, nw - 1)) AS t(i)),
             |g2c AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2),
             |top2 AS (SELECT doc_id, g, c FROM g2c
             |         QUALIFY row_number() OVER (PARTITION BY doc_id
             |           ORDER BY c DESC, g ASC) = 1),
             |g3 AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
             |       FROM base, unnest(generate_series(1, nw - 2)) AS t(i)),
             |g3c AS (SELECT doc_id, count(*) AS total3,
             |          count(DISTINCT g) AS uniq3
             |        FROM g3 GROUP BY 1)
             |SELECT b.doc_id,
             |       CAST(b.nw AS BIGINT) AS n_words,
             |       (b.nw - len(list_distinct(b.ws)))::DOUBLE / b.nw
             |         AS dup_word_frac,
             |       top2.g AS top_bigram,
             |       (top2.c * length(top2.g))::DOUBLE / b.n_chars
             |         AS top_bigram_frac,
             |       (g3c.total3 - g3c.uniq3)::DOUBLE / g3c.total3
             |         AS dup_trigram_frac,
             |       ((b.nw - len(list_distinct(b.ws)))::DOUBLE / b.nw <= 0.60
             |        AND (top2.c * length(top2.g))::DOUBLE / b.n_chars <= 0.20
             |        AND (g3c.total3 - g3c.uniq3)::DOUBLE / g3c.total3 <= 0.30)
             |         AS keep
             |FROM base b JOIN top2 USING (doc_id) JOIN g3c USING (doc_id)"""
        .stripMargin)),

    // Sharded inverted index: term → "doc:tf" posting strings, sharded by
    // doc-id range (128 docs/shard) the way a real engine bounds posting
    // lists — a common term's postings never concentrate on one task, so
    // the build survives 100 TB where a single collect_list-per-term
    // would OOM on stopwords. Global df rides a window sum over shards.
    GraftQuery("t_inverted_index",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        Tables.documents(s, dir)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
          .groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"))
          .withColumn("shard", expr("doc_id DIV 128"))
          .groupBy(col("term"), col("shard"))
          .agg(count(lit(1)).as("df_shard"), sum(col("tf")).as("tf_shard"),
            array_join(transform(
              array_sort(collect_list(struct(col("doc_id"), col("tf")))),
              e => concat(e.getField("doc_id"), lit(":"), e.getField("tf"))),
              " ").as("postings"))
          .withColumn("df",
            sum(col("df_shard")).over(Window.partitionBy(col("term"))))
      },
      Some("""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
             |           FROM documents),
             |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
             |g AS (SELECT term, doc_id // 128 AS shard,
             |        CAST(count(*) AS BIGINT) AS df_shard,
             |        CAST(sum(tf) AS BIGINT) AS tf_shard,
             |        string_agg(doc_id || ':' || tf, ' ' ORDER BY doc_id)
             |          AS postings
             |      FROM tf GROUP BY 1, 2)
             |SELECT term, shard, df_shard, tf_shard, postings,
             |       CAST(sum(df_shard) OVER (PARTITION BY term) AS BIGINT)
             |         AS df
             |FROM g""".stripMargin)),

    // Corpus-wide top-k bigrams — the vocabulary-building pass of a BPE/
    // tokenizer-training pipeline. Adjacent-token pairs via two shifted
    // slices zipped in-plan (no explode-then-self-join), then one hash agg
    // and a TakeOrderedAndProject top-100 (count desc, bigram asc — fully
    // deterministic). Scale: partial aggregation absorbs the n-gram
    // explosion map-side; the shuffle carries only distinct bigrams.
    GraftQuery("t_top_ngrams",
      (s, dir) => {
        val toks = split(col("text"), " ")
        Tables.documents(s, dir)
          .select(toks.as("toks"))
          .filter(size(col("toks")) >= 2)
          .select(explode(zip_with(
            slice(col("toks"), lit(1), size(col("toks")) - 1),
            slice(col("toks"), lit(2), size(col("toks")) - 1),
            (a, b) => concat(a, lit(" "), b))).as("bigram"))
          .groupBy(col("bigram"))
          .agg(count(lit(1)).as("n_occurrences"))
          .orderBy(col("n_occurrences").desc, col("bigram"))
          .limit(100)
      },
      Some("""WITH d AS (
             |  SELECT string_split(text, ' ') AS toks FROM documents
             |  WHERE length(string_split(text, ' ')) >= 2),
             |b AS (
             |  SELECT unnest(list_transform(generate_series(1, length(toks) - 1),
             |           i -> toks[i] || ' ' || toks[i + 1])) AS bigram
             |  FROM d)
             |SELECT bigram, count(*) AS n_occurrences
             |FROM b GROUP BY 1
             |ORDER BY n_occurrences DESC, bigram
             |LIMIT 100""".stripMargin)),

    // BPE merge-pair counting — one round of byte-pair-encoding tokenizer
    // training: adjacent character-pair frequencies weighted by word
    // frequency. Pair extraction runs on the DISTINCT-word table (vocab-
    // sized, not corpus-sized — the standard BPE trick), weighted by the
    // word counts from one corpus pass; 2-char substrings via sequence()
    // keep it a pure projection between the two hash aggs.
    GraftQuery("t_bpe_pairs",
      (s, dir) => {
        val wc = Tables.documents(s, dir)
          .select(explode(split(col("text"), " ")).as("word"))
          .groupBy(col("word")).agg(count(lit(1)).as("wf"))
          .filter(length(col("word")) >= 2)
        wc.select(col("wf"), explode(expr(
          "transform(sequence(1, length(word) - 1), i -> substr(word, i, 2))"))
          .as("pair"))
          .groupBy(col("pair"))
          .agg(sum(col("wf")).as("pair_count"))
          .orderBy(col("pair_count").desc, col("pair"))
          .limit(50)
      },
      Some("""WITH w AS (
             |  SELECT unnest(string_split(text, ' ')) AS word FROM documents
             |), wc AS (
             |  SELECT word, count(*) AS wf FROM w GROUP BY 1
             |  HAVING length(word) >= 2
             |), p AS (
             |  SELECT wf, unnest(list_transform(
             |           generate_series(1, length(word) - 1),
             |           i -> substr(word, i, 2))) AS pair
             |  FROM wc
             |)
             |SELECT pair, CAST(sum(wf) AS BIGINT) AS pair_count
             |FROM p GROUP BY 1
             |ORDER BY pair_count DESC, pair
             |LIMIT 50""".stripMargin)),

    // BPE tokenization with a learned merge table through the SCALE apply
    // path (Bpe.applyMergesScalable: one per-partition rank-priority pass,
    // cost independent of the rule count — the replay path's per-rule
    // regexp_replace fold cannot reach production rule counts). The merge
    // table is the frozen export of Bpe.learnMerges(corpus word-freq, 64)
    // — the model artifact a tokenizer ships (train once, freeze, apply
    // everywhere), same frozen-constant discipline as the ANN oracle
    // seeds; OperatorsSpec proves scalable == replay on the live-learned
    // list. The oracle replays the merges in order over the spaced char
    // sequence (two replace passes per rule: one pass misses every other
    // occurrence of a back-to-back run because the shared separator space
    // is consumed; alternation makes two passes complete).
    GraftQuery("t_bpe_tokenize",
      (s, dir) => {
        val wc = Tables.documents(s, dir)
          .select(explode(split(col("text"), " ")).as("word"))
          .groupBy(col("word")).agg(count(lit(1)).as("freq"))
        graft.operators.Bpe.applyMergesScalable(wc, FrozenBpeMerges)
      },
      Some {
        val spaced = "' ' || array_to_string(list_transform(" +
          "generate_series(1, length(word)), i -> word[i]), ' ') || ' '"
        // DuckDB's binder caps expression nesting at 128, so the 64-rule
        // fold (2 replaces per rule) is staged through chained CTEs of 16
        // rules each instead of one 128-deep expression
        val stages = FrozenBpeMerges.grouped(16).toSeq.zipWithIndex.map {
          case (group, gi) =>
            val folded = group.foldLeft("t") { case (acc, (l, r, _)) =>
              s"replace(replace($acc, ' $l $r ', ' $l$r '), ' $l $r ', ' $l$r ')"
            }
            val from = if (gi == 0) "s0" else s"s$gi"
            s"s${gi + 1} AS (SELECT word, freq, $folded AS t FROM $from)"
        }
        val last = s"s${FrozenBpeMerges.grouped(16).size}"
        s"""WITH w AS (
           |  SELECT unnest(string_split(text, ' ')) AS word FROM documents
           |), wc AS (
           |  SELECT word, count(*) AS freq FROM w GROUP BY 1
           |), s0 AS (
           |  SELECT word, freq, $spaced AS t FROM wc
           |), ${stages.mkString(",\n")}
           |SELECT word, freq, trim(t) AS tokens FROM $last""".stripMargin
      }),

    // BPE TRAINING at production round counts through the driver-local
    // scale path (Bpe.learnMergesLocal: one Spark job aggregates the
    // vocab-sized word-freq table, then an incremental in-process merge
    // loop — lazy-deletion max-heap + per-merge delta updates — trains
    // 256 rounds in milliseconds where the per-round-job distributed loop
    // takes minutes; OperatorsSpec proves the two paths emit the same
    // list). The oracle independently REPLAYS THE FIRST 16 TRAINING
    // ROUNDS — per round: weighted adjacent-pair counts over the current
    // fused vocabulary, argmax with the (count DESC, Sep-joined pair key
    // ASC) tie-break, then the two-pass alternating replace that fuses
    // the winner (the binder-depth CTE staging trick proven by
    // t_bpe_tokenize's 64-rule oracle) — and pins the merge-list prefix
    // (left, right, count per round). The Spark side adds the invariants
    // SQL cannot replay for the 240-round tail: winner counts are
    // non-increasing (a fused pair's successors can never outnumber it)
    // and the learned tokenizer reconstructs every vocabulary word
    // losslessly.
    GraftQuery("t_bpe_train",
      (s, dir) => {
        import s.implicits._
        val wc = Tables.documents(s, dir)
          .select(explode(split(col("text"), " ")).as("word"))
          .groupBy(col("word")).agg(count(lit(1)).as("freq"))
        val merges = graft.operators.Bpe.learnMergesLocal(wc, rounds = 256)
        require(merges.size >= 16, s"t_bpe_train: corpus exhausted after " +
          s"${merges.size} merges — the 16-round graded prefix needs a " +
          "corpus with at least 16 mergeable pairs")
        val nonInc = merges.sliding(2).forall(w => w(0)._3 >= w(1)._3)
        val flags = graft.operators.Bpe.applyMergesScalable(wc, merges)
          .agg(
            bool_and(translate(col("tokens"), " ", "") === col("word"))
              .as("lossless"),
            // early stop is legal ONLY on exhaustion — i.e. every word
            // fused to a single symbol (its tokens carry no space); a
            // spurious early stop with pairs remaining fails this row
            (lit(merges.size == 256) ||
              bool_and(!col("tokens").contains(" ")))
              .as("trained_to_cap_or_exhausted"))
          .withColumn("counts_nonincreasing", lit(nonInc))
        val prefix = merges.take(16).zipWithIndex.map {
          case ((l, r, n), i) => (i + 1, l, r, n)
        }.toDF("round", "m_left", "m_right", "m_count")
        prefix.crossJoin(broadcast(flags))
      },
      Some {
        val spaced = "' ' || array_to_string(list_transform(" +
          "generate_series(1, length(word)), i -> word[i]), ' ') || ' '"
        def stage(i: Int): String = {
          val l = "string_split(w.pair, chr(1))[1]"
          val r = "string_split(w.pair, chr(1))[2]"
          // MATERIALIZED: each round references its predecessor twice
          // (pair count + fuse) — inlining would double the scan tree per
          // round, 2^16 reads of the base table by round 16
          s"""p$i AS (
             |  SELECT freq, unnest(list_transform(generate_series(1, len(tk) - 1),
             |           j -> tk[j] || chr(1) || tk[j + 1])) AS pair
             |  FROM (SELECT freq, string_split(trim(t), ' ') AS tk FROM s${i - 1})),
             |w$i AS MATERIALIZED (SELECT pair, sum(freq) AS n FROM p$i GROUP BY 1
             |        ORDER BY n DESC, pair LIMIT 1),
             |s$i AS MATERIALIZED (
             |  SELECT word, freq,
             |    replace(replace(t,
             |        ' ' || $l || ' ' || $r || ' ', ' ' || $l || $r || ' '),
             |        ' ' || $l || ' ' || $r || ' ', ' ' || $l || $r || ' ') AS t
             |  FROM s${i - 1} CROSS JOIN w$i w)"""
        }
        val unions = (1 to 16).map(i =>
          s"SELECT $i AS round, string_split(pair, chr(1))[1] AS m_left, " +
            s"string_split(pair, chr(1))[2] AS m_right, " +
            s"CAST(n AS BIGINT) AS m_count FROM w$i")
          .mkString(" UNION ALL ")
        s"""WITH w AS (
           |  SELECT unnest(string_split(text, ' ')) AS word FROM documents
           |), wc AS (
           |  SELECT word, count(*) AS freq FROM w GROUP BY 1
           |), s0 AS (
           |  SELECT word, freq, $spaced AS t FROM wc
           |), ${(1 to 16).map(stage).mkString(",\n")}
           |SELECT round, m_left, m_right, m_count,
           |       TRUE AS lossless, TRUE AS trained_to_cap_or_exhausted,
           |       TRUE AS counts_nonincreasing
           |FROM ($unions)""".stripMargin
      }),

    // Unigram language-model scoring: corpus-trained token log-probs →
    // per-document mean surprisal, the classic LM-based quality filter
    // (low mean logprob = gibberish/boilerplate candidates). Per-token
    // logprobs round to 4dp and sum in DECIMAL so partial-agg order can
    // never move the result; the vocab joins back on the term equi-key
    // (broadcast at this SF, shuffle join at 100 TB — either is one pass).
    GraftQuery("t_unigram_logprob",
      (s, dir) => {
        val toks = Tables.documents(s, dir)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        // corpus token total as a broadcast one-row aggregate (the BM25
        // pattern) — derived from the vocab counts, so the corpus is never
        // exploded a second time just for one number
        val vocabCounts = toks.groupBy(col("term")).agg(count(lit(1)).as("tf"))
        val total = vocabCounts.agg(sum(col("tf")).as("total"))
        val vocab = vocabCounts
          .crossJoin(broadcast(total))
          .withColumn("logprob",
            round(log(col("tf").cast("double") / col("total")), 4)
              .cast("decimal(18,4)"))
          .select(col("term"), col("logprob"))
        toks.join(vocab, Seq("term"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tokens"),
            // decimal sum → double FIRST, then one double division: both
            // engines' decimal-division scale rules never enter the plan.
            // Deliberately NO in-query round: the quotient can land on an
            // exact decimal half (sf1 hit -3.4025375), where Spark rounds
            // the binary double and DuckDB rounds at decimal precision —
            // emitting the raw IEEE quotient keeps the two engines
            // bit-identical and leaves rounding to the comparator, which
            // applies one implementation to both sides
            (sum(col("logprob")).cast("double") / count(lit(1)))
              .as("mean_logprob"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
             |  FROM documents
             |), v AS (
             |  SELECT term,
             |         CAST(round(ln(count(*)::DOUBLE / sum(count(*)) OVER ()), 4)
             |              AS DECIMAL(18,4)) AS logprob
             |  FROM t GROUP BY term
             |)
             |SELECT doc_id, count(*) AS n_tokens,
             |       CAST(sum(logprob) AS DOUBLE) / count(*) AS mean_logprob
             |FROM t JOIN v USING (term)
             |GROUP BY 1""".stripMargin)),

    // Corpus composition card: per-(lang, source) doc/token/char volumes
    // plus exact median document length — the summary table every dataset
    // release ships. One hash-agg shuffle; the exact percentile keeps its
    // per-group value list bounded by group cardinality (for monitoring at
    // 100 TB swap in approx_percentile; exact here because the oracle is).
    GraftQuery("t_corpus_stats",
      (s, dir) => Tables.documents(s, dir)
        .select(col("lang"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"),
          col("n_chars"))
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          sum(col("n_chars")).as("total_chars"),
          (sum(col("n_tokens")).cast("double") / count(lit(1)))
            .as("avg_tokens"),
          round(expr("percentile(n_tokens, 0.5)"), 6).as("median_tokens")),
      Some("""WITH d AS (
             |  SELECT lang, source,
             |         CAST(length(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             |         n_chars
             |  FROM documents)
             |SELECT lang, source, count(*) AS n_docs,
             |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
             |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
             |       CAST(sum(n_tokens) AS DOUBLE) / count(*) AS avg_tokens,
             |       round(quantile_cont(n_tokens, 0.5), 6) AS median_tokens
             |FROM d GROUP BY 1, 2""".stripMargin)),

    // Bigram language-model scoring with add-1 smoothing: corpus-trained
    // transition log-probs → per-document mean bigram surprisal, the
    // context-aware upgrade of t_unigram_logprob (a doc of common words in
    // impossible ORDER scores badly here but fine there). Per-bigram
    // logprobs use the unigram gate's determinism contract: round to 4dp,
    // sum in DECIMAL (partial-agg order can never move the result), emit
    // the raw IEEE quotient and let the comparator round. Scale shape: the
    // bigram dictionary is built from ONE explode (two partial-agg
    // shuffles over (w1,w2)/(w1) term rows), then joined back on the
    // (w1,w2) equi-key — broadcast at this SF, shuffle join at 100 TB;
    // vocab size V rides in as a broadcast one-row aggregate.
    GraftQuery("t_bigram_logprob",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val ws = split(col("text"), " ")
        val bg = docs.select(col("doc_id"), ws.as("w"))
          .filter(size(col("w")) >= 2)
          .select(col("doc_id"),
            explode(transform(sequence(lit(1), size(col("w")) - 1), i =>
              struct(element_at(col("w"), i).as("w1"),
                element_at(col("w"), i + 1).as("w2")))).as("p"))
          .select(col("doc_id"), col("p.w1"), col("p.w2"))
        val c2 = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
        val c1 = bg.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
        val vocab = docs.select(explode(ws).as("term"))
          .agg(countDistinct(col("term")).cast("double").as("v"))
        val dict = c2.join(c1, Seq("w1")).crossJoin(broadcast(vocab))
          .select(col("w1"), col("w2"),
            round(log((col("c2") + 1.0) / (col("c1") + col("v"))), 4)
              .cast("decimal(18,4)").as("lp"))
        bg.join(dict, Seq("w1", "w2"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_bigrams"),
            (sum(col("lp")).cast("double") / count(lit(1)))
              .as("mean_logprob"))
      },
      Some("""WITH d AS (
             |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
             |), bgz AS (
             |  SELECT doc_id, unnest(list_zip(w, w[2:])) AS p FROM d
             |), bg AS (
             |  SELECT doc_id, p[1] AS w1, p[2] AS w2 FROM bgz
             |  WHERE p[2] IS NOT NULL
             |), c2 AS (
             |  SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2
             |), c1 AS (
             |  SELECT w1, count(*) AS c1 FROM bg GROUP BY 1
             |), v AS (
             |  SELECT count(DISTINCT term) AS v
             |  FROM (SELECT unnest(w) AS term FROM d)
             |), dict AS (
             |  SELECT w1, w2,
             |         CAST(round(ln((c2 + 1.0) / (c1 + (SELECT v FROM v))), 4)
             |              AS DECIMAL(18,4)) AS lp
             |  FROM c2 JOIN c1 USING (w1)
             |)
             |SELECT doc_id, count(*) AS n_bigrams,
             |       CAST(sum(lp) AS DOUBLE) / count(*) AS mean_logprob
             |FROM bg JOIN dict USING (w1, w2)
             |GROUP BY 1""".stripMargin)),

    // Interpolated Kneser-Ney bigram plausibility (Kneser & Ney, ICASSP
    // 1995; Chen & Goodman 1999 eq. 4.25 with absolute discount D=3/4) —
    // the LM-based quality filter next to the add-one t_bigram_logprob:
    // KN backs off to CONTINUATION probability (how many contexts a word
    // follows) rather than raw frequency, the distinction that separates
    // "Francisco" (frequent, one context) from genuinely productive
    // words. Exact integers throughout: multiplying the interpolation
    // through by 4 clears the 3/4 discount, so
    //   p_micro = (max(4·c12−3, 0)·10⁶ + 3·N1+(w1·)·pcont_micro)
    //               div (4·c1),
    //   pcont_micro = N1+(·w2)·10⁶ div B
    // — two truncating divisions both engines replay bit-exactly. Per-doc
    // score = mean bigram probability in micro-units (log-free: exact).
    // Shuffles: the bigram count exchange + two type-count aggs over the
    // DICTIONARY (vocab-sized), then one dictionary join back to the
    // probe docs — the t_bigram_logprob budget, one extra vocab-sized agg.
    GraftQuery("t_kn_bigram_score",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val ws = split(col("text"), " ")
        val bg = docs.select(col("doc_id"), ws.as("w"))
          .filter(size(col("w")) >= 2)
          .select(col("doc_id"),
            explode(transform(sequence(lit(1), size(col("w")) - 1), i =>
              struct(element_at(col("w"), i).as("w1"),
                element_at(col("w"), i + 1).as("w2")))).as("p"))
          .select(col("doc_id"), col("p.w1"), col("p.w2"))
        val c2 = bg.groupBy(col("w1"), col("w2"))
          .agg(count(lit(1)).as("c12"))
        val byW1 = c2.groupBy(col("w1"))
          .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1"))
        val nctx = c2.groupBy(col("w2")).agg(count(lit(1)).as("nc"))
        val b = c2.agg(count(lit(1)).as("bt"))
        val dict = c2.join(byW1, Seq("w1")).join(nctx, Seq("w2"))
          .crossJoin(broadcast(b))
          .select(col("w1"), col("w2"), expr(
            """(greatest(4L * c12 - 3L, 0L) * 1000000L +
              | 3L * n1 * (nc * 1000000L div bt)) div (4L * c1)"""
              .stripMargin).as("p_micro"))
        bg.filter(col("doc_id") < 20)
          .join(dict, Seq("w1", "w2"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_bigrams"),
            sum(col("p_micro")).as("sum_p_micro"))
          .withColumn("mean_p_micro",
            expr("sum_p_micro div n_bigrams"))
      },
      Some("""WITH d AS (
             |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
             |), bgz AS (
             |  SELECT doc_id, unnest(list_zip(w, w[2:])) AS p FROM d
             |), bg AS (
             |  SELECT doc_id, p[1] AS w1, p[2] AS w2 FROM bgz
             |  WHERE p[2] IS NOT NULL
             |), c2 AS (
             |  SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2
             |), byw1 AS (
             |  SELECT w1, sum(c12) AS c1, count(*) AS n1 FROM c2 GROUP BY 1
             |), nctx AS (
             |  SELECT w2, count(*) AS nc FROM c2 GROUP BY 1
             |), b AS (SELECT count(*) AS bt FROM c2
             |), dict AS (
             |  SELECT w1, w2,
             |    (greatest(4 * c12 - 3, 0) * 1000000 +
             |     3 * n1 * (nc * 1000000 // bt)) // (4 * c1) AS p_micro
             |  FROM c2 JOIN byw1 USING (w1) JOIN nctx USING (w2), b
             |)
             |SELECT doc_id, count(*) AS n_bigrams,
             |       CAST(sum(p_micro) AS BIGINT) AS sum_p_micro,
             |       CAST(sum(p_micro) // count(*) AS BIGINT) AS mean_p_micro
             |FROM bg JOIN dict USING (w1, w2)
             |WHERE doc_id < 20
             |GROUP BY 1""".stripMargin)),

    // Sliding-window RAG chunking: overlapping 32-token windows every 24
    // tokens (8-token overlap), stopping at the first window that covers
    // the document tail — the retrieval/embedding prep pass. Pure
    // projection + explode, zero shuffles (the 100 TB shape: runs at scan
    // speed; see operators/Chunking.scala).
    GraftQuery("t_rag_chunks",
      (s, dir) => graft.operators.Chunking.slidingChunks(
        Tables.documents(s, dir), col("doc_id"), col("text"),
        window = 32, stride = 24),
      Some("""WITH d AS (
             |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
             |), s AS (
             |  SELECT doc_id, w,
             |         unnest(generate_series(0, len(w) - 1, 24)) AS start
             |  FROM d
             |)
             |SELECT doc_id, start // 24 AS chunk_idx,
             |       CAST(least(32, len(w) - start) AS BIGINT) AS chunk_tokens,
             |       array_to_string(w[start + 1:start + 32], ' ') AS chunk_text
             |FROM s WHERE start = 0 OR start + 8 < len(w)""".stripMargin)),

    // CCNet-style quality bucketing: per-language head/middle/tail
    // terciles by token "commonness" (mean corpus frequency of the doc's
    // tokens — the exact-rational stand-in for the LM-perplexity ranking
    // CCNet uses, chosen because sum(tf)/n is bit-identical across
    // engines, so the tercile ORDERING can never flip on a float ulp).
    // One explode + tf join + per-doc agg, then one per-language window —
    // the window state is one ntile counter per partition, safe at 100 TB.
    GraftQuery("t_freq_bucket",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val toks = Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"),
            explode(split(col("text"), " ")).as("term"))
        val tf = toks.groupBy(col("term")).agg(count(lit(1)).as("tf"))
        val stats = toks.join(tf, Seq("term"))
          .groupBy(col("doc_id"), col("lang"))
          .agg(count(lit(1)).as("n_tokens"),
            (sum(col("tf")).cast("double") / count(lit(1)))
              .as("commonness"))
        val w = Window.partitionBy(col("lang"))
          .orderBy(col("commonness").desc, col("doc_id"))
        stats.select(col("doc_id"), col("lang"), col("n_tokens"),
          col("commonness"),
          when(ntile(3).over(w) === 1, "head")
            .when(ntile(3).over(w) === 2, "middle")
            .otherwise("tail").as("bucket"))
      },
      Some("""WITH d AS (
             |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
             |  FROM documents
             |), tf AS (
             |  SELECT term, count(*) AS tf FROM d GROUP BY 1
             |), s AS (
             |  SELECT doc_id, lang, count(*) AS n_tokens,
             |         CAST(sum(tf) AS DOUBLE) / count(*) AS commonness
             |  FROM d JOIN tf USING (term) GROUP BY 1, 2
             |)
             |SELECT doc_id, lang, n_tokens, commonness,
             |       CASE ntile(3) OVER (PARTITION BY lang
             |                           ORDER BY commonness DESC, doc_id)
             |         WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail'
             |       END AS bucket
             |FROM s""".stripMargin)),

    // Heavy hitters over word trigrams: count-min-sketch prefilter
    // (Sketches.heavyHitters), exact verification pass. The sketch phase
    // is internal — output equals the plain GROUP BY/HAVING oracle
    // exactly, which is the point: at 100 TB the sketch turns "shuffle
    // every distinct n-gram" into "shuffle only near-threshold n-grams"
    // without changing a single output row.
    GraftQuery("t_heavy_hitters",
      (s, dir) => {
        val ws = split(col("text"), " ")
        val grams = when(size(ws) >= 3,
          transform(sequence(lit(1), size(ws) - 2),
            i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1),
              element_at(ws, i + 2))))
          .otherwise(array().cast("array<string>"))
        Sketches.heavyHitters(
          Tables.documents(s, dir).select(explode(grams).as("g")),
          col("g"), threshold = 5L)
          .select(col("item").as("ngram"), col("cnt"))
      },
      Some("""WITH w AS (
             |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
             |), t AS (
             |  SELECT ws[j] || ' ' || ws[j+1] || ' ' || ws[j+2] AS ngram
             |  FROM w, unnest(generate_series(1, len(ws) - 2)) AS u(j)
             |)
             |SELECT ngram, count(*) AS cnt
             |FROM t GROUP BY 1 HAVING count(*) >= 5""".stripMargin)),

    // Character-entropy quality signal — the classic near-gibberish /
    // near-repetition detector (CCNet and RefinedWeb gate on compression
    // ratio; Shannon char entropy is its declarative stand-in: low bits ≈
    // repetitive, high bits ≈ random noise). Computed SHUFFLE-FREE per
    // row: distinct chars × an occurrence count via nested higher-order
    // functions — O(len × alphabet) inside codegen, no (doc, char)
    // explosion — where the oracle replays the textbook explode+group
    // formulation, so the fused plan is graded against the naive one.
    // Intermediates materialize as columns before reuse (the tree-not-DAG
    // lesson from cdcChunkDedup).
    GraftQuery("t_char_entropy",
      (s, dir) => {
        val staged = Tables.documents(s, dir)
          .filter(length(col("text")) > 0)
          .select(col("doc_id"), split(col("text"), "").as("__chars"))
          .withColumn("__n", size(col("__chars")))
        val entropyBits = expr(
          """-aggregate(
            |   transform(array_distinct(__chars),
            |             c -> size(filter(__chars, x -> x = c))),
            |   cast(0.0 as double),
            |   (acc, k) -> acc + (k / cast(__n as double))
            |                     * ln(k / cast(__n as double)))
            | / ln(2.0)""".stripMargin)
        staged.select(col("doc_id"), col("__n").cast("long").as("n_chars"),
          round(entropyBits, 6).as("entropy_bits"))
          .withColumn("keep",
            col("entropy_bits") >= 2.0 && col("entropy_bits") <= 5.5)
      },
      Some("""WITH c AS (
             |  SELECT doc_id, substring(text, j, 1) AS ch
             |  FROM documents, unnest(generate_series(1, length(text))) AS u(j)
             |  WHERE length(text) > 0
             |), g AS (
             |  SELECT doc_id, ch, count(*) AS k FROM c GROUP BY 1, 2
             |), n AS (
             |  SELECT doc_id, sum(k) AS n FROM g GROUP BY 1
             |), e AS (
             |  SELECT g.doc_id, CAST(max(n.n) AS BIGINT) AS n_chars,
             |         round(-sum((g.k / CAST(n.n AS DOUBLE))
             |                    * ln(g.k / CAST(n.n AS DOUBLE))) / ln(2), 6)
             |           AS entropy_bits
             |  FROM g JOIN n USING (doc_id) GROUP BY 1
             |)
             |SELECT doc_id, n_chars, entropy_bits,
             |       entropy_bits >= 2.0 AND entropy_bits <= 5.5 AS keep
             |FROM e""".stripMargin)),

    // ES significant_terms parity (JLH heuristic): terms overrepresented
    // in a foreground slice (lang='de') vs the whole corpus, by DOC
    // frequency — the ES aggregation family the reference's backend
    // exposes next to composite/date-histogram (S5/A1 cluster). JLH =
    // (fg% - bg%) × (fg% / bg%). DETERMINISM: every input is an exact
    // BIGINT cast to double (< 2^53, lossless), and the score is three
    // IEEE ops evaluated in one fixed shape on both engines — exactly
    // rounded, so the doubles (and the top-50 cut they order) are
    // bit-identical. Scale: the explode is absorbed by map-side partial
    // agg (one shuffle on term), the two totals are broadcast one-row
    // frames, and the top-50 is a TakeOrderedAndProject — no global sort.
    GraftQuery("t_significant_terms",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val docTerms = docs.select(col("lang"),
          explode(array_distinct(split(col("text"), " "))).as("term"))
        val totals = docs.agg(
          count(lit(1)).as("bg_total"),
          count(when(col("lang") === "de", lit(1))).as("fg_total"))
        docTerms
          .groupBy(col("term"))
          .agg(count(when(col("lang") === "de", lit(1))).as("fg_df"),
            count(lit(1)).as("bg_df"))
          .filter(col("fg_df") >= 3)
          .crossJoin(broadcast(totals))
          .withColumn("fg_pct",
            col("fg_df").cast("double") / col("fg_total").cast("double"))
          .withColumn("bg_pct",
            col("bg_df").cast("double") / col("bg_total").cast("double"))
          .filter(col("fg_pct") > col("bg_pct"))
          .select(col("term"), col("fg_df"), col("bg_df"),
            ((col("fg_pct") - col("bg_pct")) *
              (col("fg_pct") / col("bg_pct"))).as("jlh"))
          .orderBy(col("jlh").desc, col("term"))
          .limit(50)
      },
      Some("""WITH dt AS (
             |  SELECT lang, unnest(list_distinct(string_split(text, ' ')))
             |           AS term
             |  FROM documents
             |), tot AS (
             |  SELECT count(*) AS bg_total,
             |         count(*) FILTER (WHERE lang = 'de') AS fg_total
             |  FROM documents
             |), pt AS (
             |  SELECT term,
             |         CAST(count(*) FILTER (WHERE lang = 'de') AS BIGINT)
             |           AS fg_df,
             |         CAST(count(*) AS BIGINT) AS bg_df
             |  FROM dt GROUP BY 1
             |), sc AS (
             |  SELECT term, fg_df, bg_df,
             |         CAST(fg_df AS DOUBLE) / CAST(fg_total AS DOUBLE)
             |           AS fg_pct,
             |         CAST(bg_df AS DOUBLE) / CAST(bg_total AS DOUBLE)
             |           AS bg_pct
             |  FROM pt, tot WHERE fg_df >= 3
             |)
             |SELECT term, fg_df, bg_df,
             |       (fg_pct - bg_pct) * (fg_pct / bg_pct) AS jlh
             |FROM sc WHERE fg_pct > bg_pct
             |ORDER BY jlh DESC, term
             |LIMIT 50""".stripMargin)),

    // PMI collocation mining (word2phrase-style): adjacent word pairs
    // whose observed frequency beats independence — the phrase-vocabulary
    // pass that runs before tokenizer training ("new york" → one token).
    // Scored by lift = P(ab) / (P(a)·P(b)) = (c_ab·N) / (c_a·c_b), the
    // monotone log-free form of PMI — same ranking, no transcendental in
    // the compare path. All inputs exact BIGINTs cast to double; one
    // multiply and one divide per side in a fixed shape → bit-identical.
    // Scale: bigram explosion absorbed map-side (distinct bigrams on the
    // wire), unigram dictionary is vocab-sized (broadcast here, shuffle
    // equi-join at 100 TB), token total is a broadcast one-row frame.
    GraftQuery("t_pmi_collocations",
      (s, dir) => {
        val toks = Tables.documents(s, dir)
          .select(split(col("text"), " ").as("toks"))
        val uni = toks.select(explode(col("toks")).as("w"))
          .groupBy(col("w")).agg(count(lit(1)).as("c"))
        val total = uni.agg(sum(col("c")).as("n"))
        val bi = toks.filter(size(col("toks")) >= 2)
          .select(explode(zip_with(
            slice(col("toks"), lit(1), size(col("toks")) - 1),
            slice(col("toks"), lit(2), size(col("toks")) - 1),
            (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
          .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
          .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_ab"))
          .filter(col("c_ab") >= 5)
        bi
          .join(uni.select(col("w").as("w1"), col("c").as("c_a")), Seq("w1"))
          .join(uni.select(col("w").as("w2"), col("c").as("c_b")), Seq("w2"))
          .crossJoin(broadcast(total))
          .select(col("w1"), col("w2"), col("c_ab"),
            ((col("c_ab").cast("double") * col("n").cast("double")) /
              (col("c_a").cast("double") * col("c_b").cast("double")))
              .as("lift"))
          .orderBy(col("lift").desc, col("w1"), col("w2"))
          .limit(50)
      },
      Some("""WITH d AS (
             |  SELECT string_split(text, ' ') AS toks FROM documents
             |), uc AS (
             |  SELECT w, CAST(count(*) AS BIGINT) AS c
             |  FROM (SELECT unnest(toks) AS w FROM d) GROUP BY 1
             |), tot AS (
             |  SELECT CAST(sum(c) AS BIGINT) AS n FROM uc
             |), bc AS (
             |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_ab
             |  FROM (SELECT
             |          unnest(list_transform(
             |            generate_series(1, length(toks) - 1),
             |            i -> toks[i])) AS w1,
             |          unnest(list_transform(
             |            generate_series(1, length(toks) - 1),
             |            i -> toks[i + 1])) AS w2
             |        FROM d WHERE length(toks) >= 2)
             |  GROUP BY 1, 2 HAVING count(*) >= 5
             |)
             |SELECT bc.w1, bc.w2, c_ab,
             |       (CAST(c_ab AS DOUBLE) * CAST(n AS DOUBLE)) /
             |       (CAST(a.c AS DOUBLE) * CAST(b.c AS DOUBLE)) AS lift
             |FROM bc
             |JOIN uc a ON bc.w1 = a.w
             |JOIN uc b ON bc.w2 = b.w
             |CROSS JOIN tot
             |ORDER BY lift DESC, w1, w2
             |LIMIT 50""".stripMargin)),

    // Per-group keyword extraction: top-5 TF-IDF terms PER SOURCE — the
    // corpus-card / topic-fingerprint pass (what does each ingest feed
    // talk about?). Unlike the global heaps above, the cut is per-group:
    // row_number over (source | score desc, term) plans a
    // WindowGroupLimit, so every partition pre-prunes to 5 rows per
    // source before the final window — the per-group top-k never sees a
    // global sort. Ranking runs on the 6dp-ROUNDED score (the t_tfidf
    // discipline), term-tiebroken, so the cut is engine-reproducible.
    GraftQuery("t_keywords_per_source",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, dir)
        val stats = docs.agg(count(lit(1)).cast("double").as("n"))
        val terms = docs.select(col("doc_id"), col("source"),
          explode(split(col("text"), " ")).as("term"))
        val dfreq = terms.groupBy(col("term"))
          .agg(countDistinct(col("doc_id")).as("df"))
        val scored = terms.groupBy(col("source"), col("term"))
          .agg(count(lit(1)).as("tf"))
          .join(dfreq, "term")
          .crossJoin(broadcast(stats))
          .withColumn("score", round(col("tf") * log(col("n") / col("df")), 6))
        scored
          .withColumn("rank", row_number().over(Window.partitionBy(col("source"))
            .orderBy(col("score").desc, col("term"))))
          .filter(col("rank") <= 5)
          .select(col("source"), col("rank"), col("term"),
            col("tf"), col("df"), col("score"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id, source, unnest(string_split(text, ' ')) AS term
             |  FROM documents
             |), dfreq AS (
             |  SELECT term, count(DISTINCT doc_id) AS df FROM t GROUP BY 1
             |), tf AS (
             |  SELECT source, term, CAST(count(*) AS BIGINT) AS tf
             |  FROM t GROUP BY 1, 2
             |), sc AS (
             |  SELECT source, tf.term AS term, tf, CAST(df AS BIGINT) AS df,
             |         round(tf * ln((SELECT count(*) FROM documents)::DOUBLE
             |                       / df), 6) AS score
             |  FROM tf JOIN dfreq ON tf.term = dfreq.term
             |)
             |SELECT source, CAST(rank AS INTEGER) AS rank, term, tf, df,
             |       score
             |FROM (SELECT *, row_number() OVER (PARTITION BY source
             |        ORDER BY score DESC, term) AS rank FROM sc)
             |WHERE rank <= 5""".stripMargin)),

    // Positional phrase search: find documents containing the exact token
    // sequence "fast table" by POSTINGS-INTERSECTION — each phrase term's
    // (doc, position) postings are filtered AT THE SCAN (selective
    // predicate on the exploded term), then an equi-join on
    // (doc, adjusted position) checks adjacency. This is the positional
    // inverted-index query plan: work scales with the phrase terms'
    // posting lists, not the corpus — a LIKE '%fast table%' scan (the
    // naive plan) reads every byte of every document instead. The oracle
    // replays token positions, so tokenization-boundary bugs (substring
    // false hits like "breakfast table") can't pass.
    GraftQuery("t_phrase_search",
      (s, dir) => {
        val pos = Tables.documents(s, dir)
          .select(col("doc_id"),
            posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
        val p1 = pos.filter(col("tok") === "fast")
          .select(col("doc_id"), col("pos"))
        val p2 = pos.filter(col("tok") === "table")
          .select(col("doc_id"), (col("pos") - 1).as("pos"))
        p1.join(p2, Seq("doc_id", "pos"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_matches"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
             |), hits AS (
             |  SELECT doc_id, i FROM t,
             |    unnest(generate_series(1, length(w) - 1)) AS u(i)
             |  WHERE w[i] = 'fast' AND w[i + 1] = 'table'
             |)
             |SELECT doc_id, count(*) AS n_matches
             |FROM hits GROUP BY 1""".stripMargin)),

    // Mergeable top-k rollup (Sketches.topkSummaries/topkMerge): the
    // heavy-hitter GOLD-TABLE shape — per-language top-20 word summaries
    // (exact counts + the period's epsilon = the 21st count) merged to
    // the global top-10 with deterministic [lo, hi] bounds, raw text
    // never re-read at merge time (Agarwal et al., Mergeable Summaries,
    // PODS'12). Completes the sketch-rollup family: HLL
    // (a_hll_partial_merge) and KMV (a_kmv_rollup) roll up distincts,
    // this rolls up top-k. The oracle replays exact per-language counts,
    // the rank-(k+1) epsilon, and the bound arithmetic — hash-exact
    // including tie-breaks, so truncation accounting can't drift.
    GraftQuery("t_topk_rollup",
      (s, dir) => {
        val words = Tables.documents(s, dir)
          .select(col("lang"), explode(split(col("text"), " ")).as("term"))
        graft.operators.Sketches.topkMerge(
          graft.operators.Sketches.topkSummaries(
            words, col("lang"), col("term"), k = 20), k = 10)
      },
      Some("""WITH w AS (
             |  SELECT lang AS period, unnest(string_split(text, ' ')) AS term
             |  FROM documents
             |), c AS (
             |  SELECT period, term, count(*)::BIGINT AS cnt
             |  FROM w GROUP BY 1, 2
             |), r AS (
             |  SELECT period, term, cnt,
             |         row_number() OVER (PARTITION BY period
             |                            ORDER BY cnt DESC, term) AS rk
             |  FROM c
             |), eps AS (
             |  SELECT period,
             |         coalesce(max(CASE WHEN rk = 21 THEN cnt END), 0) AS eps
             |  FROM r GROUP BY 1
             |), s AS (
             |  SELECT r.period, r.term, r.cnt, eps.eps
             |  FROM r JOIN eps USING (period) WHERE rk <= 20
             |), tot AS (
             |  SELECT coalesce(sum(eps), 0) AS total_eps
             |  FROM (SELECT DISTINCT period, eps FROM s)
             |), m AS (
             |  SELECT term, sum(cnt)::BIGINT AS lo,
             |         sum(eps)::BIGINT AS tracked_eps
             |  FROM s GROUP BY 1
             |)
             |SELECT m.term, m.lo,
             |       (m.lo + (tot.total_eps::BIGINT - m.tracked_eps))::BIGINT AS hi
             |FROM m, tot
             |ORDER BY hi DESC, term LIMIT 10""".stripMargin)),

    // WEIGHTED quantiles from histogram summaries (Sketches.
    // histSummariesWeightedBy + histQuantilesBy): per-language
    // token-weighted document-length bounds — "the char length below
    // which half / 90% of the TOKENS sit", the question a training
    // budget asks (a 10×-longer doc matters 10× as much; the unweighted
    // quantile over-counts short docs). Each row contributes its token
    // count to its length bin; the same lossless count-addition merge
    // and ceil-rank scan then run over summed weight — one
    // summary-sized shuffle for every language at once. The oracle
    // replays binning, per-language weight totals, the cumulative
    // merge, and the rank pick hash-exact.
    GraftQuery("t_weighted_quantiles",
      (s, dir) => {
        val summaries = graft.operators.Sketches.histSummariesWeightedBy(
          Tables.documents(s, dir), Seq(col("lang")),
          length(col("text")), size(split(col("text"), " ")).cast("long"),
          lo = 0L, width = 20L, bins = 30)
        graft.operators.Sketches.histQuantilesBy(
          summaries, Seq(col("lang")), Seq(0.5, 0.9),
          lo = 0L, width = 20L)
      },
      Some("""WITH h AS (
             |  SELECT lang,
             |         CAST(least(greatest(
             |           floor((length(text) - 0.0) / 20.0), 0), 29)
             |           AS BIGINT) AS bin,
             |         CAST(len(string_split(text, ' ')) AS BIGINT) AS w
             |  FROM documents WHERE text IS NOT NULL
             |), m AS (
             |  SELECT lang, bin, sum(w) AS cnt FROM h GROUP BY 1, 2
             |), n AS (SELECT lang, sum(cnt) AS n FROM m GROUP BY 1),
             |c AS (
             |  SELECT a.lang, a.bin, sum(b.cnt) AS cum
             |  FROM m a JOIN m b ON b.lang = a.lang AND b.bin <= a.bin
             |  GROUP BY 1, 2
             |), qq AS (
             |  SELECT unnest([0.5::DOUBLE, 0.9::DOUBLE]) AS q
             |), pick AS (
             |  SELECT n.lang, qq.q, min(c.bin) AS bin
             |  FROM n CROSS JOIN qq
             |  JOIN c ON c.lang = n.lang AND c.cum >= ceil(qq.q * n.n)
             |  GROUP BY 1, 2
             |)
             |SELECT lang, q, 0 + bin * 20 AS value_lo,
             |       0 + (bin + 1) * 20 AS value_hi
             |FROM pick""".stripMargin)),

    // EXACT weighted quantiles (Sketches.orderStatisticsWeighted /
    // weightedQuantilesDisc): the token-budget median/p90 of document
    // length — the smallest length whose cumulative TOKEN mass reaches
    // ceil(q · Σtokens) — computed exactly by the weighted quickselect:
    // each histogram-refinement pass sums weight per bin (one narrow
    // partial-agg shuffle), never a global sort. t_weighted_quantiles
    // bounds the same answer to a 20-char bin; this pins the exact
    // value — the pair every threshold pipeline wants (bounded gold for
    // dashboards, exact for the cutoff actually applied). The oracle is
    // the running-weight formulation (RANGE-frame cumulative sum) the
    // engine exists to avoid funneling through one sort partition.
    GraftQuery("t_weighted_exact_quantiles",
      (s, dir) => graft.operators.Sketches.weightedQuantilesDisc(
        Tables.documents(s, dir), length(col("text")),
        size(split(col("text"), " ")).cast("long"), Seq(0.5, 0.9)),
      Some("""WITH d AS (
             |  SELECT length(text)::BIGINT AS v,
             |         len(string_split(text, ' '))::BIGINT AS w
             |  FROM documents WHERE text IS NOT NULL
             |), dd AS (SELECT v, w FROM d WHERE w > 0),
             |tot AS (SELECT sum(w) AS tw FROM dd),
             |r AS (SELECT v, sum(w) OVER (ORDER BY v) AS cum FROM dd),
             |qq AS (SELECT unnest([0.5::DOUBLE, 0.9::DOUBLE]) AS q)
             |SELECT qq.q, min(r.v) AS value
             |FROM qq CROSS JOIN tot
             |JOIN r ON r.cum >= ceil(qq.q * tot.tw)
             |GROUP BY 1""".stripMargin)),

    // Per-GROUP exact weighted quantiles (Sketches.
    // groupedWeightedQuantilesDisc): the token-budget p50/p90 doc
    // length PER LANGUAGE, exact — per-group weighted rank
    // ceil(q × W_g) refined through the broadcast ranges table, one
    // weighted-cell pass serving every language at once. The oracle is
    // the per-group running-weight cumulative (PARTITION BY + RANGE
    // frame) — fine at 5 languages, a per-group sort funnel at 5M
    // groups, which is why the refinement exists.
    GraftQuery("t_weighted_grouped_quantiles",
      (s, dir) => graft.operators.Sketches.groupedWeightedQuantilesDisc(
        Tables.documents(s, dir), col("lang"), length(col("text")),
        size(split(col("text"), " ")).cast("long"), Seq(0.5, 0.9)),
      Some("""WITH d AS (
             |  SELECT lang AS grp, length(text)::BIGINT AS v,
             |         len(string_split(text, ' '))::BIGINT AS w
             |  FROM documents WHERE text IS NOT NULL
             |), dd AS (SELECT * FROM d WHERE w > 0),
             |tot AS (SELECT grp, sum(w) AS tw FROM dd GROUP BY 1),
             |r AS (
             |  SELECT grp, v,
             |         sum(w) OVER (PARTITION BY grp ORDER BY v) AS cum
             |  FROM dd
             |), qq AS (SELECT unnest([0.5::DOUBLE, 0.9::DOUBLE]) AS q)
             |SELECT tot.grp AS "group", qq.q, min(r.v) AS value
             |FROM tot CROSS JOIN qq
             |JOIN r ON r.grp = tot.grp AND r.cum >= ceil(qq.q * tot.tw)
             |GROUP BY 1, 2""".stripMargin)),

    // WEIGHTED top-k rollup (Sketches.topkSummariesWeighted +
    // topkMerge): top sources by TOKEN mass — per-language top-10
    // source summaries where each doc contributes its token count, the
    // epsilon is the rank-11 token sum, and the global top-5 carries
    // the same [lo, hi] bound arithmetic over weighted summaries. The
    // mixture question a training corpus asks: a source of few huge
    // docs outweighs one of many tiny docs, which a count-based top-k
    // inverts. Oracle replays weighted counts, epsilons, and bounds
    // hash-exact including tie-breaks.
    GraftQuery("t_topk_weighted",
      (s, dir) => graft.operators.Sketches.topkMerge(
        graft.operators.Sketches.topkSummariesWeighted(
          Tables.documents(s, dir), col("lang"), col("source"),
          size(split(col("text"), " ")).cast("long"), k = 10), k = 5),
      Some("""WITH c AS (
             |  SELECT lang AS period, source AS term,
             |         sum(len(string_split(text, ' ')))::BIGINT AS cnt
             |  FROM documents GROUP BY 1, 2
             |), r AS (
             |  SELECT period, term, cnt,
             |         row_number() OVER (PARTITION BY period
             |                            ORDER BY cnt DESC, term) AS rk
             |  FROM c
             |), eps AS (
             |  SELECT period,
             |         coalesce(max(CASE WHEN rk = 11 THEN cnt END), 0) AS eps
             |  FROM r GROUP BY 1
             |), s AS (
             |  SELECT r.period, r.term, r.cnt, eps.eps
             |  FROM r JOIN eps USING (period) WHERE rk <= 10
             |), tot AS (
             |  SELECT coalesce(sum(eps), 0) AS total_eps
             |  FROM (SELECT DISTINCT period, eps FROM s)
             |), m AS (
             |  SELECT term, sum(cnt)::BIGINT AS lo,
             |         sum(eps)::BIGINT AS tracked_eps
             |  FROM s GROUP BY 1
             |)
             |SELECT m.term, m.lo,
             |       (m.lo + (tot.total_eps::BIGINT - m.tracked_eps))::BIGINT AS hi
             |FROM m, tot
             |ORDER BY hi DESC, term LIMIT 5""".stripMargin)),

    // Per-language vocabulary diversity: unigram Shannon entropy (nats,
    // H = ln n − Σ c·ln c / n — the algebraically-stable one-pass form)
    // and type-token ratio. The corpus-quality signal that separates
    // template/boilerplate shards (low H for their size) from natural
    // text, next to the repetition and quality-classifier batteries.
    // One explode absorbed map-side into (lang, term) counts, then one
    // tiny per-language aggregate; nothing corpus-sized leaves the
    // first exchange. Float-graded (check.py rounds 6dp): the summand
    // magnitudes keep double drift ~1e-12, far under the comparator.
    GraftQuery("t_lang_entropy",
      (s, dir) => {
        val words = Tables.documents(s, dir)
          .select(col("lang"), explode(split(col("text"), " ")).as("term"))
          .filter(length(col("term")) > 0)
        val c = words.groupBy(col("lang"), col("term"))
          .agg(count(lit(1)).cast("double").as("c"))
        c.groupBy(col("lang")).agg(
          sum(col("c")).cast("long").as("n_tokens"),
          count(lit(1)).as("n_types"),
          (log(sum(col("c"))) -
            sum(col("c") * log(col("c"))) / sum(col("c"))).as("entropy"),
          (count(lit(1)).cast("double") / sum(col("c")))
            .as("type_token_ratio"))
      },
      Some("""WITH w AS (
             |  SELECT lang, unnest(string_split(text, ' ')) AS term
             |  FROM documents
             |), ww AS (SELECT lang, term FROM w WHERE length(term) > 0),
             |c AS (
             |  SELECT lang, term, count(*)::DOUBLE AS c
             |  FROM ww GROUP BY 1, 2
             |)
             |SELECT lang, sum(c)::BIGINT AS n_tokens,
             |       count(*)::BIGINT AS n_types,
             |       ln(sum(c)) - sum(c * ln(c)) / sum(c) AS entropy,
             |       count(*)::DOUBLE / sum(c) AS type_token_ratio
             |FROM c GROUP BY 1""".stripMargin)),

    // Corpus n-gram novelty (Dedup.noveltyScores): per doc, the exact
    // fraction of its distinct 5-gram shingles first seen in THIS doc
    // (min doc_id across the corpus) — the batch-freshness signal next
    // to decontamination. Planted full clones (doc_id+100000 of
    // doc_id<50) must score novelty_micro = 0: every shingle's first
    // occurrence is the original. Shingles hash to 60 bits before any
    // exchange; the oracle replays the same md5-derived hash, so even
    // collisions grade identically.
    GraftQuery("t_novelty",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        val aug = docs.unionAll(
          Tables.documents(s, dir).filter(col("doc_id") < 50)
            .select((col("doc_id") + 100000L).as("doc_id"), col("text")))
        graft.operators.Dedup.noveltyScores(aug, col("doc_id"),
          col("text"), n = 5)
      },
      Some("""WITH aug AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 100000, text FROM documents
             |  WHERE doc_id < 50),
             |w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM aug),
             |t AS (SELECT doc_id,
             |        ws[j] || ' ' || ws[j+1] || ' ' || ws[j+2] || ' ' ||
             |          ws[j+3] || ' ' || ws[j+4] AS s
             |      FROM w, unnest(generate_series(1, len(ws) - 4))
             |        AS u(j)),
             |sh AS (SELECT DISTINCT doc_id,
             |         ('0x' || substring(md5(s), 1, 15))::BIGINT AS h
             |       FROM t),
             |f AS (SELECT h, min(doc_id) AS first_doc FROM sh GROUP BY 1),
             |nv AS (SELECT first_doc AS doc_id, count(*) AS n_novel
             |       FROM f GROUP BY 1),
             |tot AS (SELECT doc_id, count(*) AS n_shingles FROM sh
             |        GROUP BY 1)
             |SELECT tot.doc_id, tot.n_shingles::BIGINT AS n_shingles,
             |       coalesce(nv.n_novel, 0)::BIGINT AS n_novel,
             |       CAST(coalesce(nv.n_novel, 0) * 1000000
             |         // tot.n_shingles AS BIGINT) AS novelty_micro
             |FROM tot LEFT JOIN nv USING (doc_id)""".stripMargin)),
  )
}
