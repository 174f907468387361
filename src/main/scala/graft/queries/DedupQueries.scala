package graft.queries

import graft.Tables
import graft.operators.Dedup

import org.apache.spark.sql.functions._

/** Training-data deduplication suite over the `documents` corpus: exact,
  * MinHash+LSH, SimHash, and bounded pairwise n-gram Jaccard — each verified
  * value-exact against a DuckDB oracle that reproduces the same md5-derived
  * hash family.
  */
object DedupQueries {

  /** Shared frozen ∪ delta corpus + 3-batch streaming gram-registry fold
    * for the streaming ExactSubstr pair (coverage + trim serves) — ONE
    * build keyed to ONE Scratch base so the two graded serves can never
    * drift apart on corpus or fold parameters (the plantedClones lesson:
    * r15 found nine entries carrying one corpus block verbatim).
    * Returns (final gold parquet path, the corpus frame). */
  private def streamExactSubstrBase(s: org.apache.spark.sql.SparkSession,
                                    dir: String)
      : (String, org.apache.spark.sql.DataFrame) = {
    val base = Scratch.dir("stream_exactsubstr_gold", dir)
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
    val planted = plantedClones(docs)
    val rev = docs.filter(col("doc_id") % 113 === 0)
      .select(col("doc_id"),
        concat_ws(" ", reverse(split(col("text"), " "))).as("text"))
    val corpus = docs.unionByName(planted)
      .unionByName(rev.select((col("doc_id") + 1200000000L)
        .as("doc_id"), col("text")))
      .unionByName(rev.select((col("doc_id") + 1300000000L)
        .as("doc_id"), col("text")))
    val fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    Scratch.buildOnce(base) {
      for ((pfx, m) <- Seq(("aa_", 0), ("bb_", 1), ("cc_", 2)))
        Scratch.dumpJsonl(corpus.filter(col("doc_id") % 3 === m),
          s"$base/stage$m", s"$base/src", pfx, fmt)
      val gold = graft.streaming.StreamDedup.streamExactSubstrGold(
        s, s"$base/src", corpus, s"$base/gold", s"$base/cp",
        minLen = 25)
      s.read.parquet(gold)
        .write.mode("overwrite").parquet(s"$base/final")
    }
    (s"$base/final", corpus)
  }

  /** Default tokenized-docs source for the oracle CTE chain. */
  private[queries] val DefaultDocsSql =
    "SELECT doc_id, string_split(text, ' ') AS w FROM documents"

  /** Shared oracle CTE: tokenized docs + distinct 3-gram shingles, over a
    * pluggable doc source (queries that inject synthetic rows pass their
    * own UNION'd source). */
  private[queries] def shingleCte(docsSql: String = DefaultDocsSql): String =
    s"""d AS ($docsSql),
       |s AS (SELECT doc_id,
       |        CASE WHEN length(w) >= 3
       |             THEN list_distinct(list_transform(generate_series(1, length(w) - 2),
       |                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
       |             ELSE [] END AS sh
       |      FROM d)""".stripMargin

  private val ShingleCte = shingleCte()

  /** Shared oracle fragment: shingles → minhash signatures → band keys —
    * the probe structure every LSH query builds on. */
  private[queries] def minhashBandsCte(docsSql: String = DefaultDocsSql): String =
    s"""${shingleCte(docsSql)},
       |m AS (SELECT doc_id, sh,
       |        list_transform(generate_series(1, 8), j ->
       |          list_min(list_transform(sh,
       |            x -> ([${Dedup.MinhashA.mkString(", ")}][j] *
       |                  (('0x' || substring(md5(x), 1, 15))::BIGINT & 1073741823)
       |                  + [${Dedup.MinhashB.mkString(", ")}][j])
       |                 % 1073741789))) AS mh
       |      FROM s),
       |bk AS (SELECT doc_id,
       |         unnest(list_transform(generate_series(0, 3),
       |           k -> k || ':' || mh[2*k+1] || ':' || mh[2*k+2])) AS band_key
       |       FROM m)""".stripMargin

  private lazy val MinhashBandsCte: String = minhashBandsCte()

  /** Shared oracle fragment: minhash pairs closed into components (ends
    * with the recursive `reach` CTE) — composed by the group and corpus
    * queries so the pair pipeline is defined once. */
  private lazy val MinhashComponentsCte: String =
    s"""$MinhashBandsCte,
       |c AS (SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
       |      FROM bk a JOIN bk b ON a.band_key = b.band_key
       |                         AND a.doc_id < b.doc_id),
       |v AS (SELECT i, j,
       |        length(list_intersect(si.sh, sj.sh))::DOUBLE /
       |          length(list_distinct(si.sh || sj.sh)) AS jac
       |      FROM c JOIN s si ON si.doc_id = c.i
       |             JOIN s sj ON sj.doc_id = c.j),
       |p AS (SELECT i, j FROM v WHERE jac >= 0.5),
       |und AS (SELECT i AS a, j AS b FROM p
       |        UNION SELECT j AS a, i AS b FROM p),
       |reach AS (SELECT a, b FROM und
       |          UNION
       |          SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a)""".stripMargin

  /** Planted word-grain clones shared by the ExactSubstr entries (r15
    * review: nine entries carried this block verbatim, and the
    * coverage/trim pairs' contracts require their corpora identical by
    * construction): each %97 doc contributes a clone of tokens
    * [o, o+len) at a doc_id-derived offset, len ∈ {25, 50, 200}. */
  private def plantedClones(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs.filter(col("doc_id") % 97 === 0)
      .withColumn("o", (col("doc_id") % 7 + 1).cast("int"))
      .withColumn("len", expr(
        "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 25 WHEN 1 THEN 50 " +
          "ELSE 200 END"))
      .withColumn("w", split(col("text"), " "))
      .filter(size(col("w")) >= col("o") + col("len") - 1)
      .select((col("doc_id") + 1000000000L).as("doc_id"),
        concat_ws(" ", expr("slice(w, o, len)")).as("text"))

  /** Planted char-offset clones for the char/byte-grain entries: each
    * %89 doc contributes chars [o, o+len), len ∈ {40, 90, 200}. */
  private def charClones(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs.filter(col("doc_id") % 89 === 0)
      .withColumn("o", (col("doc_id") % 11 + 1).cast("int"))
      .withColumn("len", expr(
        "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 40 WHEN 1 THEN 90 " +
          "ELSE 200 END"))
      .filter(length(col("text")) >= col("o") + col("len") - 1)
      .select((col("doc_id") + 1000000000L).as("doc_id"),
        expr("substring(text, o, len)").as("text"))

  /** The synthetic over-width giant: doc 0's text repeated past the
    * 2²⁰-token repr-packing width (always past it, never more than one
    * repetition past), doc_id 2e9. */
  private def giantOf(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs.filter(col("doc_id") === 0)
      .withColumn("w", split(col("text"), " "))
      .select(lit(2000000000L).as("doc_id"),
        concat_ws(" ", flatten(array_repeat(col("w"),
          (lit(1048576) / size(col("w"))).cast("int") + 1)))
          .as("text"))

  /** Oracle twin of documents ∪ [[plantedClones]] (src + corpus CTEs). */
  private val PlantedCorpusCte: String =
    """src AS (
      |  SELECT doc_id, string_split(text, ' ') AS w,
      |         (1 + doc_id % 7)::INT AS o,
      |         CASE (doc_id % 3)::INT WHEN 0 THEN 25 WHEN 1 THEN 50
      |              ELSE 200 END AS len
      |  FROM documents WHERE doc_id % 97 = 0),
      |corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000000,
      |         array_to_string(w[o : o + len - 1], ' ')
      |  FROM src WHERE length(w) >= o + len - 1)""".stripMargin

  /** [[PlantedCorpusCte]] plus the [[giantOf]] row — the quarantine /
    * segmented corpus. */
  private val GiantCorpusCte: String =
    """src AS (
      |  SELECT doc_id, string_split(text, ' ') AS w,
      |         (1 + doc_id % 7)::INT AS o,
      |         CASE (doc_id % 3)::INT WHEN 0 THEN 25 WHEN 1 THEN 50
      |              ELSE 200 END AS len
      |  FROM documents WHERE doc_id % 97 = 0),
      |corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000000,
      |         array_to_string(w[o : o + len - 1], ' ')
      |  FROM src WHERE length(w) >= o + len - 1
      |  UNION ALL
      |  SELECT 2000000000::BIGINT,
      |         rtrim(repeat(text || ' ',
      |           (1048576 // length(string_split(text, ' ')))::INT
      |             + 1))
      |  FROM documents WHERE doc_id = 0)""".stripMargin

  /** [[PlantedCorpusCte]] plus the two reversed-token copies of each
    * %113 doc — the incremental entries' frozen ∪ delta corpus. */
  private val IncrCorpusCte: String =
    """src AS (
      |  SELECT doc_id, string_split(text, ' ') AS w,
      |         (1 + doc_id % 7)::INT AS o,
      |         CASE (doc_id % 3)::INT WHEN 0 THEN 25 WHEN 1 THEN 50
      |              ELSE 200 END AS len
      |  FROM documents WHERE doc_id % 97 = 0),
      |corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000000,
      |         array_to_string(w[o : o + len - 1], ' ')
      |  FROM src WHERE length(w) >= o + len - 1
      |  UNION ALL
      |  SELECT doc_id + 1200000000,
      |         array_to_string(list_reverse(string_split(text, ' ')),
      |                         ' ')
      |  FROM documents WHERE doc_id % 113 = 0
      |  UNION ALL
      |  SELECT doc_id + 1300000000,
      |         array_to_string(list_reverse(string_split(text, ' ')),
      |                         ' ')
      |  FROM documents WHERE doc_id % 113 = 0)""".stripMargin

  val entries: Seq[GraftQuery] = Seq(

    // Exact dedup: content-hash group, min-id survivor. One shuffle on the
    // hash; at 100 TB this is the cheapest and first dedup pass.
    GraftQuery("d_exact_dedup",
      (s, dir) => Dedup.exactDedup(Tables.documents(s, dir),
        col("doc_id"), col("text")),
      Some("""SELECT md5(text) AS content_hash, count(*) AS n_copies,
             |       min(doc_id) AS keep_id
             |FROM documents GROUP BY 1""".stripMargin)),

    // MinHash(8) + LSH(4 bands × 2 rows) near-dup pairs, Jaccard-verified
    // at 0.5 — candidates come only from band-key collisions, so the
    // self-join never materializes n² pairs.
    GraftQuery("d_minhash_lsh",
      (s, dir) => Dedup.minhashLshPairs(Tables.documents(s, dir),
        col("doc_id"), col("text"),
        shingleSize = 3, numHashes = 8, bands = 4, threshold = 0.5),
      Some(s"""WITH $MinhashBandsCte,
              |c AS (SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
              |      FROM bk a JOIN bk b ON a.band_key = b.band_key
              |                         AND a.doc_id < b.doc_id),
              |v AS (SELECT i, j,
              |        length(list_intersect(si.sh, sj.sh))::DOUBLE /
              |          length(list_distinct(si.sh || sj.sh)) AS jac
              |      FROM c JOIN s si ON si.doc_id = c.i
              |             JOIN s sj ON sj.doc_id = c.j)
              |SELECT i, j, jac FROM v WHERE jac >= 0.5""".stripMargin)),

    // Incremental ingest dedup: a new batch (doc_id ≡ 0 mod 5) probes the
    // existing corpus's content-hash and LSH band-key index — the
    // production dedup shape, where admitted batches never re-pair the
    // whole corpus. The driver corpus carries no duplicate texts at the
    // gate SF, which would leave the exact-hash layer vacuously all-false;
    // a synthetic fresh doc (id −1) duplicating corpus doc 1 is injected
    // on BOTH sides so a broken content-hash join hash-mismatches.
    GraftQuery("d_incremental_dedup",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val synth = docs.filter(col("doc_id") === 1)
          .select(lit(-1L).as("doc_id"), col("text"))
        Dedup.incrementalDedupFlags(
          corpus = docs.filter(col("doc_id") % 5 =!= 0)
            .select(col("doc_id"), col("text")),
          fresh = docs.filter(col("doc_id") % 5 === 0)
            .select(col("doc_id"), col("text")).union(synth),
          col("doc_id"), col("text"))
      },
      Some {
        val docsWithSynth =
          s"""$DefaultDocsSql
             |           UNION ALL
             |           SELECT CAST(-1 AS BIGINT), string_split(text, ' ')
             |           FROM documents WHERE doc_id = 1""".stripMargin
        s"""WITH ${minhashBandsCte(docsWithSynth)},
           |c AS (SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
           |      FROM bk a JOIN bk b ON a.band_key = b.band_key
           |      WHERE (a.doc_id % 5 = 0 OR a.doc_id = -1)
           |        AND b.doc_id % 5 <> 0 AND b.doc_id >= 0),
           |v AS (SELECT i, j,
           |        length(list_intersect(si.sh, sj.sh))::DOUBLE /
           |          length(list_distinct(si.sh || sj.sh)) AS jac
           |      FROM c JOIN s si ON si.doc_id = c.i
           |             JOIN s sj ON sj.doc_id = c.j),
           |near AS (SELECT i AS doc_id, count(*) AS n
           |         FROM v WHERE jac >= 0.5 GROUP BY 1),
           |f AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
           |      UNION ALL
           |      SELECT CAST(-1 AS BIGINT), text FROM documents WHERE doc_id = 1),
           |ex AS (SELECT DISTINCT f.doc_id FROM f
           |       JOIN documents c2 ON md5(c2.text) = md5(f.text)
           |       WHERE c2.doc_id % 5 <> 0)
           |SELECT f.doc_id,
           |       f.doc_id IN (SELECT doc_id FROM ex) AS exact_dup,
           |       CAST(coalesce(near.n, 0) AS BIGINT) AS n_near_dups
           |FROM f LEFT JOIN near USING (doc_id)""".stripMargin
      }),

    // Benchmark decontamination: corpus docs (doc_id % 61 ≠ 0) sharing any
    // 8-gram with the benchmark slice (doc_id % 61 = 0, a slice that lands
    // on a planted near-dup member so the hit path is exercised) are
    // flagged — the pre-training hygiene pass. 8-grams keep accidental
    // overlap near zero in the synthetic vocabulary, so hits are genuinely
    // duplicated spans.
    GraftQuery("d_decontaminate",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Dedup.decontaminationFlags(
          corpus = docs.filter(col("doc_id") % 61 =!= 0),
          benchmark = docs.filter(col("doc_id") % 61 === 0),
          col("doc_id"), col("text"), n = 8)
      },
      Some {
        val gram8 = (0 until 8).map(k => s"w[i+$k]").mkString(" || ' ' || ")
        s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
           |           FROM documents),
           |sh AS (SELECT doc_id,
           |         unnest(list_distinct(CASE WHEN length(w) >= 8
           |           THEN list_transform(generate_series(1, length(w) - 7),
           |                  i -> $gram8)
           |           ELSE [] END)) AS s
           |       FROM d),
           |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 61 = 0),
           |hits AS (SELECT doc_id, count(*) AS n
           |         FROM sh JOIN bench USING (s)
           |         WHERE doc_id % 61 <> 0
           |         GROUP BY 1)
           |SELECT d.doc_id,
           |       CAST(coalesce(hits.n, 0) AS BIGINT) AS n_shared_ngrams,
           |       coalesce(hits.n, 0) > 0 AS contaminated
           |FROM d LEFT JOIN hits USING (doc_id)
           |WHERE d.doc_id % 61 <> 0""".stripMargin
      }),

    // SPAN-level decontamination (r16): contaminated 8-gram spans are
    // REMOVED and the rest of the doc survives — the variant that keeps
    // a long document's clean text when it shares one boilerplate
    // n-gram with the eval suite. Same corpus/benchmark split as
    // d_decontaminate; oracle replays the mark → interval-union →
    // complement rebuild with the incr_trim formulation.
    GraftQuery("d_decontaminate_trim",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Dedup.decontaminationTrim(
          corpus = docs.filter(col("doc_id") % 61 =!= 0),
          benchmark = docs.filter(col("doc_id") % 61 === 0),
          col("doc_id"), col("text"), n = 8)
      },
      Some {
        val gram8 = (0 until 8).map(k => s"w[i+$k]").mkString(" || ' ' || ")
        s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
           |           FROM documents),
           |t AS (SELECT doc_id, length(w)::BIGINT AS n_tokens, w FROM d
           |      WHERE doc_id % 61 <> 0),
           |bench AS (SELECT DISTINCT
           |            unnest(CASE WHEN length(w) >= 8
           |              THEN list_transform(generate_series(1,
           |                     length(w) - 7), i -> $gram8)
           |              ELSE [] END) AS s
           |          FROM d WHERE doc_id % 61 = 0),
           |occ AS (SELECT doc_id, i::BIGINT AS pos, $gram8 AS s
           |        FROM t, unnest(generate_series(1,
           |          greatest(length(w) - 7, 0))) AS u(i)),
           |marked AS (SELECT doc_id, pos FROM occ JOIN bench USING (s)),
           |cov AS (SELECT DISTINCT m.doc_id, u.t::BIGINT AS t
           |        FROM marked m,
           |             unnest(generate_series(m.pos, m.pos + 7)) AS u(t)),
           |tok AS (SELECT doc_id, i::BIGINT AS t, w[i] AS tok
           |        FROM t, unnest(generate_series(1, length(w))) AS u(i)),
           |kept AS (SELECT k.doc_id, count(*) AS n_kept,
           |           string_agg(k.tok, ' ' ORDER BY k.t) AS txt
           |         FROM (SELECT tok.* FROM tok LEFT JOIN cov
           |                 ON cov.doc_id = tok.doc_id AND cov.t = tok.t
           |               WHERE cov.doc_id IS NULL) k
           |         GROUP BY k.doc_id)
           |SELECT t.doc_id, t.n_tokens,
           |       (t.n_tokens - coalesce(k.n_kept, 0))::BIGINT AS n_removed,
           |       coalesce(k.txt, '') AS trimmed_text
           |FROM t LEFT JOIN kept k ON k.doc_id = t.doc_id""".stripMargin
      }),

    // Bloom-prefiltered decontamination — the same hygiene pass for the
    // regime where the benchmark shingle set is too big to broadcast
    // exactly: distributed BloomFilterAggregate build, codegen'd
    // might_contain probe on the narrow corpus shingle stream, exact
    // confirm semi-join on the surviving trickle. Output is bit-identical
    // to the exact path (FPs removed by the confirm join; FNs impossible),
    // so the oracle is the plain exact SQL.
    GraftQuery("d_bloom_decontaminate",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Dedup.bloomDecontaminationFlags(
          corpus = docs.filter(col("doc_id") % 53 =!= 0),
          benchmark = docs.filter(col("doc_id") % 53 === 0),
          col("doc_id"), col("text"), n = 8)
      },
      Some {
        val gram8 = (0 until 8).map(k => s"w[i+$k]").mkString(" || ' ' || ")
        s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
           |           FROM documents),
           |sh AS (SELECT doc_id,
           |         unnest(list_distinct(CASE WHEN length(w) >= 8
           |           THEN list_transform(generate_series(1, length(w) - 7),
           |                  i -> $gram8)
           |           ELSE [] END)) AS s
           |       FROM d),
           |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 53 = 0),
           |hits AS (SELECT doc_id, count(*) AS n
           |         FROM sh JOIN bench USING (s)
           |         WHERE doc_id % 53 <> 0
           |         GROUP BY 1)
           |SELECT d.doc_id,
           |       CAST(coalesce(hits.n, 0) AS BIGINT) AS n_shared_ngrams,
           |       coalesce(hits.n, 0) > 0 AS contaminated
           |FROM d LEFT JOIN hits USING (doc_id)
           |WHERE d.doc_id % 53 <> 0""".stripMargin
      }),

    // Bloom-prefiltered SPAN decontamination — the no-broadcast scale
    // path of d_decontaminate_trim: sketch build + codegen'd
    // might_contain probe on the positional gram stream before any
    // shuffle + exact confirm semi-join. Output bit-identical to the
    // exact path, so the oracle is the same replay (on the %53 split
    // the bloom flags entry uses).
    GraftQuery("d_bloom_decontaminate_trim",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Dedup.bloomDecontaminationTrim(
          corpus = docs.filter(col("doc_id") % 53 =!= 0),
          benchmark = docs.filter(col("doc_id") % 53 === 0),
          col("doc_id"), col("text"), n = 8)
      },
      Some {
        val gram8 = (0 until 8).map(k => s"w[i+$k]").mkString(" || ' ' || ")
        s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
           |           FROM documents),
           |t AS (SELECT doc_id, length(w)::BIGINT AS n_tokens, w FROM d
           |      WHERE doc_id % 53 <> 0),
           |bench AS (SELECT DISTINCT
           |            unnest(CASE WHEN length(w) >= 8
           |              THEN list_transform(generate_series(1,
           |                     length(w) - 7), i -> $gram8)
           |              ELSE [] END) AS s
           |          FROM d WHERE doc_id % 53 = 0),
           |occ AS (SELECT doc_id, i::BIGINT AS pos, $gram8 AS s
           |        FROM t, unnest(generate_series(1,
           |          greatest(length(w) - 7, 0))) AS u(i)),
           |marked AS (SELECT doc_id, pos FROM occ JOIN bench USING (s)),
           |cov AS (SELECT DISTINCT m.doc_id, u.t::BIGINT AS t
           |        FROM marked m,
           |             unnest(generate_series(m.pos, m.pos + 7)) AS u(t)),
           |tok AS (SELECT doc_id, i::BIGINT AS t, w[i] AS tok
           |        FROM t, unnest(generate_series(1, length(w))) AS u(i)),
           |kept AS (SELECT k.doc_id, count(*) AS n_kept,
           |           string_agg(k.tok, ' ' ORDER BY k.t) AS txt
           |         FROM (SELECT tok.* FROM tok LEFT JOIN cov
           |                 ON cov.doc_id = tok.doc_id AND cov.t = tok.t
           |               WHERE cov.doc_id IS NULL) k
           |         GROUP BY k.doc_id)
           |SELECT t.doc_id, t.n_tokens,
           |       (t.n_tokens - coalesce(k.n_kept, 0))::BIGINT AS n_removed,
           |       coalesce(k.txt, '') AS trimmed_text
           |FROM t LEFT JOIN kept k ON k.doc_id = t.doc_id""".stripMargin
      }),

    // SimHash: one 60-bit signature per doc (no shuffle at all) — hamming
    // clustering then finds near-dups without any pairwise text compare.
    GraftQuery("d_simhash",
      (s, dir) => {
        graft.plans.GraftFunctions.register(s) // native one-pass kernel
        Tables.documents(s, dir)
          .withColumn("toks", split(col("text"), " "))
          .select(col("doc_id"),
            call_function("graft_simhash", col("toks")).as("simhash"))
      },
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             |h AS (SELECT doc_id,
             |        list_transform(toks,
             |          t -> ('0x' || substring(md5(t), 1, 15))::BIGINT) AS hs
             |      FROM d)
             |SELECT doc_id,
             |  list_reduce(list_transform(generate_series(0, 59), j ->
             |    CASE WHEN list_reduce(list_transform(hs,
             |                h -> CASE WHEN ((h >> j) & 1) = 1 THEN 1 ELSE -1 END),
             |              (a, b) -> a + b) > 0
             |         THEN (1::BIGINT << j) ELSE 0::BIGINT END),
             |    (a, b) -> a + b) AS simhash
             |FROM h""".stripMargin)),

    // SimHash near-dup pairs: 4 bands × 15 bits — pigeonhole-complete for
    // hamming ≤ 3; bit_count(xor) verifies exactly. Completes the simhash
    // pipeline (signature → candidates → verified pairs).
    GraftQuery("d_simhash_pairs",
      (s, dir) => {
        graft.plans.GraftFunctions.register(s)
        Dedup.simhashPairs(
          Tables.documents(s, dir)
            .withColumn("toks", split(col("text"), " "))
            .select(col("doc_id"),
              call_function("graft_simhash", col("toks")).as("simhash")),
          bands = 4, bitsPerBand = 15, maxHamming = 3)
      },
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             |h AS (SELECT doc_id,
             |        list_transform(toks,
             |          t -> ('0x' || substring(md5(t), 1, 15))::BIGINT) AS hs
             |      FROM d),
             |sg AS (SELECT doc_id,
             |  list_reduce(list_transform(generate_series(0, 59), j ->
             |    CASE WHEN list_reduce(list_transform(hs,
             |                x -> CASE WHEN ((x >> j) & 1) = 1 THEN 1 ELSE -1 END),
             |              (a, b) -> a + b) > 0
             |         THEN (1::BIGINT << j) ELSE 0::BIGINT END),
             |    (a, b) -> a + b) AS simhash
             |FROM h),
             |bd AS (SELECT doc_id, simhash, b.band,
             |         (simhash >> (b.band * 15)) & 32767 AS slice
             |       FROM sg, (SELECT unnest(generate_series(0, 3)) AS band) b),
             |p AS (SELECT DISTINCT a.doc_id AS i, b.doc_id AS j,
             |        bit_count(xor(a.simhash, b.simhash))::INT AS hamming
             |      FROM bd a JOIN bd b ON a.band = b.band AND a.slice = b.slice
             |                         AND a.doc_id < b.doc_id)
             |SELECT i, j, hamming FROM p WHERE hamming <= 3""".stripMargin)),

    // Near-dup GROUPS: connected components over the verified LSH pairs —
    // every clustered doc labelled with its group's canonical (min) id.
    // The oracle closes the same pair set with a recursive CTE.
    GraftQuery("d_dedup_groups",
      (s, dir) => Dedup.nearDupComponents(Tables.documents(s, dir),
        col("doc_id"), col("text"),
        shingleSize = 3, numHashes = 8, bands = 4, threshold = 0.5)
        .select(col("node").as("doc_id"), col("component")),
      Some(s"""WITH RECURSIVE $MinhashComponentsCte
              |SELECT a AS doc_id, least(a, min(b)) AS component
              |FROM reach GROUP BY a""".stripMargin)),

    // TRUE arbitrary-length ExactSubstr (r12 VERDICT #5, the stretch):
    // distributed prefix-doubling suffix ranks — collision-free span
    // detection for ANY length >= 25, graded on PLANTED spans of length
    // 25, 50 and 200 at arbitrary (doc_id-derived) offsets: each %97
    // document contributes a clone holding tokens [o, o+len) of its
    // source, so the corpus contains known duplicated spans with
    // non-multiple-of-25 tails at both ends. The Spark side runs the
    // suffix-rank algorithm (log2 L doubling rounds, equality-
    // representative ranks, zero hashing); the oracle replays the
    // INDEPENDENT every-offset md5-gram formulation — the two agree by
    // the coverage-equivalence theorem in the operator's scaladoc, so a
    // rank-class bug, a padding slip at short suffixes, or a tail
    // rounded to gram stride all hash-mismatch row-level.
    GraftQuery("d_exact_substr",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), col("text"))
        val planted = plantedClones(docs)
        Dedup.exactSubstrCoverage(docs.unionByName(planted),
          col("doc_id"), col("text"), minLen = 25)
      },
      Some(s"""WITH $PlantedCorpusCte,
             |d AS (SELECT doc_id, string_split(text, ' ') AS w
             |      FROM corpus),
             |t AS (SELECT doc_id, length(w)::BIGINT AS n_tokens, w FROM d),
             |occ AS (SELECT doc_id, n_tokens, i::BIGINT AS pos,
             |          md5(array_to_string(w[i:i+24], ' ')) AS h
             |        FROM t, unnest(generate_series(1,
             |          greatest(length(w) - 24, 0))) AS u(i)),
             |dup AS (SELECT h FROM occ GROUP BY h HAVING count(*) >= 2),
             |spans AS (
             |  SELECT doc_id, pos,
             |    greatest(0, pos + 25 - greatest(coalesce(
             |      max(pos + 25) OVER (PARTITION BY doc_id ORDER BY pos
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |      0), pos)) AS adds
             |  FROM occ JOIN dup USING (h)),
             |pd AS (SELECT doc_id, count(*) AS n_dup_starts,
             |         sum(adds) AS covered
             |       FROM spans GROUP BY doc_id)
             |SELECT t.doc_id, t.n_tokens,
             |       CASE WHEN t.n_tokens >= 1048576 THEN NULL
             |            ELSE coalesce(pd.n_dup_starts, 0) END::BIGINT
             |         AS n_dup_starts,
             |       CASE WHEN t.n_tokens >= 1048576 THEN NULL
             |            ELSE coalesce(pd.covered, 0) END::BIGINT
             |         AS covered_tokens,
             |       CASE WHEN t.n_tokens >= 1048576 THEN NULL
             |            ELSE coalesce(pd.covered, 0) * 1000000 // t.n_tokens
             |            END::BIGINT AS dup_frac_micro,
             |       (t.n_tokens >= 1048576) AS quarantined
             |FROM t LEFT JOIN pd USING (doc_id)""".stripMargin)),

    // Deep-round suffix ranks (r13): the SAME planted corpus at
    // minLen=200 — seven doubling rounds (vs four at L=25) and a
    // k=128/off=72 final shift, the depth where the rank path's
    // L-independent per-position bytes beat the gram path's 200-token
    // md5 per position (the documented crossover). Only the planted
    // 200-spans (doc_id % 3 = 2) are long enough to surface, so the
    // expected signal is sparse and the short-suffix -1 padding is
    // stressed on every doc shorter than 128 tokens. Oracle: the
    // independent every-offset 200-gram formulation.
    GraftQuery("d_exact_substr_l200",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), col("text"))
        val planted = plantedClones(docs)
        Dedup.exactSubstrCoverage(docs.unionByName(planted),
          col("doc_id"), col("text"), minLen = 200)
      },
      Some(s"""WITH $PlantedCorpusCte,
             |d AS (SELECT doc_id, string_split(text, ' ') AS w
             |      FROM corpus),
             |t AS (SELECT doc_id, length(w)::BIGINT AS n_tokens, w FROM d),
             |occ AS (SELECT doc_id, n_tokens, i::BIGINT AS pos,
             |          md5(array_to_string(w[i:i+199], ' ')) AS h
             |        FROM t, unnest(generate_series(1,
             |          greatest(length(w) - 199, 0))) AS u(i)),
             |dup AS (SELECT h FROM occ GROUP BY h HAVING count(*) >= 2),
             |spans AS (
             |  SELECT doc_id, pos,
             |    greatest(0, pos + 200 - greatest(coalesce(
             |      max(pos + 200) OVER (PARTITION BY doc_id ORDER BY pos
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |      0), pos)) AS adds
             |  FROM occ JOIN dup USING (h)),
             |pd AS (SELECT doc_id, count(*) AS n_dup_starts,
             |         sum(adds) AS covered
             |       FROM spans GROUP BY doc_id)
             |SELECT t.doc_id, t.n_tokens,
             |       CASE WHEN t.n_tokens >= 1048576 THEN NULL
             |            ELSE coalesce(pd.n_dup_starts, 0) END::BIGINT
             |         AS n_dup_starts,
             |       CASE WHEN t.n_tokens >= 1048576 THEN NULL
             |            ELSE coalesce(pd.covered, 0) END::BIGINT
             |         AS covered_tokens,
             |       CASE WHEN t.n_tokens >= 1048576 THEN NULL
             |            ELSE coalesce(pd.covered, 0) * 1000000 // t.n_tokens
             |            END::BIGINT AS dup_frac_micro,
             |       (t.n_tokens >= 1048576) AS quarantined
             |FROM t LEFT JOIN pd USING (doc_id)""".stripMargin)),

    // Arbitrary-length ExactSubstr TRIM (r13): the removal transform on
    // the same planted corpus as d_exact_substr — the suffix-rank
    // machinery feeds dupSpanTrim's within-row merged-interval rebuild,
    // so spans of length 25/50/200 at arbitrary offsets are REMOVED
    // (not just measured) with collision-free detection. The oracle is
    // the independent every-offset md5-gram formulation + exploded
    // covered-set rebuild (the d_dup_span_trim mechanism over the
    // planted corpus): interval merging, tail arithmetic AND the
    // reassembled string are graded value-exact.
    GraftQuery("d_exact_substr_trim",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), col("text"))
        val planted = plantedClones(docs)
        Dedup.exactSubstrTrim(docs.unionByName(planted),
          col("doc_id"), col("text"), minLen = 25)
      },
      Some(s"""WITH $PlantedCorpusCte,
             |d AS (SELECT doc_id, string_split(text, ' ') AS w
             |      FROM corpus),
             |t AS (SELECT doc_id, length(w)::BIGINT AS n_tokens, w FROM d),
             |occ AS (SELECT doc_id, i::BIGINT AS pos,
             |          md5(array_to_string(w[i:i+24], ' ')) AS h
             |        FROM t, unnest(generate_series(1,
             |          greatest(length(w) - 24, 0))) AS u(i)),
             |dup AS (SELECT h FROM occ GROUP BY h HAVING count(*) >= 2),
             |cov AS (SELECT DISTINCT o.doc_id, u.t::BIGINT AS t
             |        FROM occ o JOIN dup USING (h),
             |             unnest(generate_series(o.pos, o.pos + 24)) AS u(t)),
             |tok AS (SELECT doc_id, i::BIGINT AS t, w[i] AS tok
             |        FROM t, unnest(generate_series(1, length(w))) AS u(i)),
             |kept AS (SELECT k.doc_id, count(*) AS n_kept,
             |           string_agg(k.tok, ' ' ORDER BY k.t) AS txt
             |         FROM (SELECT tok.* FROM tok LEFT JOIN cov
             |                 ON cov.doc_id = tok.doc_id AND cov.t = tok.t
             |               WHERE cov.doc_id IS NULL) k
             |         GROUP BY k.doc_id)
             |SELECT t.doc_id, t.n_tokens,
             |       CASE WHEN t.n_tokens >= 1048576 THEN NULL
             |            ELSE t.n_tokens - coalesce(k.n_kept, 0) END::BIGINT
             |         AS n_removed,
             |       CASE WHEN t.n_tokens >= 1048576 THEN NULL
             |            ELSE coalesce(k.txt, '') END AS trimmed_text,
             |       (t.n_tokens >= 1048576) AS quarantined
             |FROM t LEFT JOIN kept k ON k.doc_id = t.doc_id""".stripMargin)),

    // KEEP-ONE-COPY ExactSubstr trim (r13): the variant the paper
    // DISCUSSES (the authors' released tool removes all copies — that
    // is d_exact_substr_trim) — every duplicated window class keeps its
    // minimum (doc_id, pos) occurrence; on this planted corpus the ORIGINAL
    // docs (small ids) therefore keep their spans intact while the
    // +1e9 clones trim to empty, and self-repetitions keep their first
    // occurrence. The oracle replays the argmin with window functions
    // over the same every-offset gram classes (identical class
    // partition, identical doc*2^20+pos total order), so the winner
    // choice, interval merge AND rebuilt string grade value-exact.
    GraftQuery("d_exact_substr_keepfirst",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), col("text"))
        val planted = plantedClones(docs)
        Dedup.exactSubstrTrimKeepFirst(docs.unionByName(planted),
          col("doc_id"), col("text"), minLen = 25)
      },
      Some(s"""WITH $PlantedCorpusCte,
             |d AS (SELECT doc_id, string_split(text, ' ') AS w
             |      FROM corpus),
             |t AS (SELECT doc_id, length(w)::BIGINT AS n_tokens, w FROM d),
             |occ AS (SELECT doc_id, i::BIGINT AS pos,
             |          md5(array_to_string(w[i:i+24], ' ')) AS h
             |        FROM t, unnest(generate_series(1,
             |          greatest(length(w) - 24, 0))) AS u(i)),
             |occ2 AS (SELECT doc_id, pos,
             |           count(*) OVER (PARTITION BY h) AS n,
             |           min(doc_id * 1048576 + pos) OVER (PARTITION BY h)
             |             AS mn
             |         FROM occ),
             |marked AS (SELECT doc_id, pos FROM occ2
             |           WHERE n >= 2 AND doc_id * 1048576 + pos <> mn),
             |cov AS (SELECT DISTINCT m.doc_id, u.t::BIGINT AS t
             |        FROM marked m,
             |             unnest(generate_series(m.pos, m.pos + 24)) AS u(t)),
             |tok AS (SELECT doc_id, i::BIGINT AS t, w[i] AS tok
             |        FROM t, unnest(generate_series(1, length(w))) AS u(i)),
             |kept AS (SELECT k.doc_id, count(*) AS n_kept,
             |           string_agg(k.tok, ' ' ORDER BY k.t) AS txt
             |         FROM (SELECT tok.* FROM tok LEFT JOIN cov
             |                 ON cov.doc_id = tok.doc_id AND cov.t = tok.t
             |               WHERE cov.doc_id IS NULL) k
             |         GROUP BY k.doc_id)
             |SELECT t.doc_id, t.n_tokens,
             |       CASE WHEN t.n_tokens >= 1048576 THEN NULL
             |            ELSE t.n_tokens - coalesce(k.n_kept, 0) END::BIGINT
             |         AS n_removed,
             |       CASE WHEN t.n_tokens >= 1048576 THEN NULL
             |            ELSE coalesce(k.txt, '') END AS trimmed_text,
             |       (t.n_tokens >= 1048576) AS quarantined
             |FROM t LEFT JOIN kept k ON k.doc_id = t.doc_id""".stripMargin)),

    // KEEP-ONE-COPY at TRUE BYTE GRAIN (r15 VERDICT #4): the winner
    // rule — each duplicated window class keeps its minimum
    // (doc_id, pos) occurrence — must be grain-independent, and this
    // grades it over byte hex pairs: grain="byte" tokenizes to 2-nibble
    // hex tokens, the rank build addresses BYTES, and the oracle
    // replays the argmin over every-BYTE-offset md5 windows of the hex
    // encoding (hex-pair windows group byte windows exactly — the
    // d_exact_substr_utf8 bijection). The corpus (documents ∪ char
    // clones) is ASCII, so the oracle's kept-byte rebuild decodes
    // losslessly; mid-char-cut lenient decode on multi-byte text is
    // spec-pinned (OperatorsSpec), since no SQL oracle can replay
    // U+FFFD substitution.
    GraftQuery("d_exact_substr_keepfirst_bytes",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), col("text"))
        val planted = charClones(docs)
        Dedup.exactSubstrTrimKeepFirst(docs.unionByName(planted),
          col("doc_id"), col("text"), minLen = 40, grain = "byte")
      },
      Some("""WITH src AS (
             |  SELECT doc_id, text,
             |         (1 + doc_id % 11)::INT AS o,
             |         CASE (doc_id % 3)::INT WHEN 0 THEN 40 WHEN 1 THEN 90
             |              ELSE 200 END AS len
             |  FROM documents WHERE doc_id % 89 = 0),
             |corpus AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 1000000000, substring(text, o, len)
             |  FROM src WHERE length(text) >= o + len - 1),
             |t AS (SELECT doc_id, hex(encode(text)) AS hx,
             |        octet_length(encode(text))::BIGINT AS n_tokens
             |      FROM corpus),
             |el AS (SELECT * FROM t WHERE n_tokens < 1048576),
             |occ AS (SELECT doc_id, i::BIGINT AS pos,
             |          md5(substring(hx, (2 * i - 1)::INT, 80)) AS h
             |        FROM el, unnest(generate_series(1,
             |          greatest(n_tokens - 39, 0)::INT)) AS u(i)),
             |occ2 AS (SELECT doc_id, pos,
             |           count(*) OVER (PARTITION BY h) AS n,
             |           min(doc_id * 1048576 + pos) OVER (PARTITION BY h)
             |             AS mn
             |         FROM occ),
             |marked AS (SELECT doc_id, pos FROM occ2
             |           WHERE n >= 2 AND doc_id * 1048576 + pos <> mn),
             |cov AS (SELECT DISTINCT m.doc_id, u.t::BIGINT AS t
             |        FROM marked m,
             |             unnest(generate_series(m.pos, m.pos + 39)) AS u(t)),
             |tok AS (SELECT doc_id, i::BIGINT AS t,
             |          substring(hx, (2 * i - 1)::INT, 2) AS tok
             |        FROM el, unnest(generate_series(1,
             |          n_tokens::INT)) AS u(i)),
             |kept AS (SELECT k.doc_id, count(*) AS n_kept,
             |           string_agg(k.tok, '' ORDER BY k.t) AS hxkept
             |         FROM (SELECT tok.* FROM tok LEFT JOIN cov
             |                 ON cov.doc_id = tok.doc_id AND cov.t = tok.t
             |               WHERE cov.doc_id IS NULL) k
             |         GROUP BY k.doc_id)
             |SELECT t.doc_id, t.n_tokens,
             |       CASE WHEN t.n_tokens >= 1048576 THEN NULL
             |            ELSE t.n_tokens - coalesce(k.n_kept, 0) END::BIGINT
             |         AS n_removed,
             |       CASE WHEN t.n_tokens >= 1048576 THEN NULL
             |            ELSE coalesce(decode(unhex(k.hxkept)), '') END
             |         AS trimmed_text,
             |       (t.n_tokens >= 1048576) AS quarantined
             |FROM t LEFT JOIN kept k ON k.doc_id = t.doc_id""".stripMargin)),

    // KEEP-ONE-COPY over the SEGMENTED giant (r15 VERDICT #4): the
    // 2^20-token book participates in keep-first trimming, and the
    // winner stays the UNSEGMENTED argmin — the engine computes the
    // class min over DECODED (original doc, original pos), never the
    // synthetic segment ids (which sort after every direct id and
    // would otherwise hand every mixed class to the small doc). On
    // this corpus doc 0 (id 0) beats the giant (id 2e9) for every
    // shared span, so doc 0 survives INTACT while the giant trims to
    // its junction-window residue — the oracle replays the same argmin
    // over every-offset grams with a 2^21 position packing (giant
    // positions exceed 2^20; the packing must stay order-isomorphic to
    // (doc, pos) for ALL rows).
    GraftQuery("d_exact_substr_keepfirst_segmented",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), col("text"))
        val planted = plantedClones(docs)
        val giant = giantOf(docs)
        Dedup.exactSubstrTrimKeepFirstSegmented(
          docs.unionByName(planted).unionByName(giant),
          col("doc_id"), col("text"), minLen = 25)
      },
      Some(s"""WITH $GiantCorpusCte,
             |d AS (SELECT doc_id, string_split(text, ' ') AS w
             |      FROM corpus),
             |t AS (SELECT doc_id, length(w)::BIGINT AS n_tokens, w FROM d),
             |tok AS (SELECT doc_id, n_tokens,
             |          unnest(generate_series(1, length(w)))::BIGINT AS pos,
             |          unnest(w) AS tok
             |        FROM t),
             |occ AS (SELECT doc_id, pos,
             |          md5(string_agg(tok, ' ') OVER (
             |            PARTITION BY doc_id ORDER BY pos
             |            ROWS BETWEEN CURRENT ROW AND 24 FOLLOWING)) AS h
             |        FROM tok
             |        QUALIFY pos <= n_tokens - 24),
             |occ2 AS (SELECT doc_id, pos,
             |           count(*) OVER (PARTITION BY h) AS n,
             |           min(doc_id * 2097152 + pos) OVER (PARTITION BY h)
             |             AS mn
             |         FROM occ),
             |marked AS (SELECT doc_id, pos FROM occ2
             |           WHERE n >= 2 AND doc_id * 2097152 + pos <> mn),
             |cov AS (SELECT DISTINCT m.doc_id, u.t::BIGINT AS t
             |        FROM marked m,
             |             unnest(generate_series(m.pos, m.pos + 24)) AS u(t)),
             |kept AS (SELECT k.doc_id, count(*) AS n_kept,
             |           string_agg(k.tok, ' ' ORDER BY k.t) AS txt
             |         FROM (SELECT tok.doc_id, tok.pos AS t, tok.tok
             |               FROM tok LEFT JOIN cov
             |                 ON cov.doc_id = tok.doc_id AND cov.t = tok.pos
             |               WHERE cov.doc_id IS NULL) k
             |         GROUP BY k.doc_id)
             |SELECT t.doc_id, t.n_tokens,
             |       CASE WHEN t.n_tokens > 1073716248 THEN NULL
             |            ELSE t.n_tokens - coalesce(k.n_kept, 0) END::BIGINT
             |         AS n_removed,
             |       CASE WHEN t.n_tokens > 1073716248 THEN NULL
             |            ELSE coalesce(k.txt, '') END AS trimmed_text,
             |       (t.n_tokens > 1073716248) AS quarantined
             |FROM t LEFT JOIN kept k ON k.doc_id = t.doc_id""".stripMargin)),

    // Over-width QUARANTINE (r13 VERDICT #2): the graded proof that one
    // pathological book-length doc can no longer kill a corpus
    // ExactSubstr run. The corpus is d_exact_substr's planted set PLUS
    // a synthetic giant — doc 0's text repeated past the 2^20-token
    // repr-packing width (doc_id 2e9). The run COMPLETES: the giant
    // surfaces flagged quarantined=true with NULL measures, its content
    // neither marks nor is marked (doc 0's own coverage is unchanged
    // even though the giant replicates it R times), and every other
    // doc's spans stay exact against the independent every-offset
    // md5-gram replay, which excludes over-width docs by the same width
    // predicate.
    GraftQuery("d_exact_substr_quarantine",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), col("text"))
        val planted = plantedClones(docs)
        // repeat doc 0's tokens floor(2^20/W)+1 times: always past the
        // width, never more than one repetition past it
        val giant = giantOf(docs)
        Dedup.exactSubstrCoverage(
          docs.unionByName(planted).unionByName(giant),
          col("doc_id"), col("text"), minLen = 25)
      },
      Some(s"""WITH $GiantCorpusCte,
             |d AS (SELECT doc_id, string_split(text, ' ') AS w
             |      FROM corpus),
             |t AS (SELECT doc_id, length(w)::BIGINT AS n_tokens, w FROM d),
             |-- width exclusion BEFORE the lateral unnest: DuckDB does not
             |-- push the predicate below it, and the giant doc would
             |-- otherwise materialize its 2^20-element list per position
             |el AS (SELECT * FROM t WHERE n_tokens < 1048576),
             |occ AS (SELECT doc_id, n_tokens, i::BIGINT AS pos,
             |          md5(array_to_string(w[i:i+24], ' ')) AS h
             |        FROM el, unnest(generate_series(1,
             |          greatest(length(w) - 24, 0))) AS u(i)),
             |dup AS (SELECT h FROM occ GROUP BY h HAVING count(*) >= 2),
             |spans AS (
             |  SELECT doc_id, pos,
             |    greatest(0, pos + 25 - greatest(coalesce(
             |      max(pos + 25) OVER (PARTITION BY doc_id ORDER BY pos
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |      0), pos)) AS adds
             |  FROM occ JOIN dup USING (h)),
             |pd AS (SELECT doc_id, count(*) AS n_dup_starts,
             |         sum(adds) AS covered
             |       FROM spans GROUP BY doc_id)
             |SELECT t.doc_id, t.n_tokens,
             |       CASE WHEN t.n_tokens >= 1048576 THEN NULL
             |            ELSE coalesce(pd.n_dup_starts, 0) END::BIGINT
             |         AS n_dup_starts,
             |       CASE WHEN t.n_tokens >= 1048576 THEN NULL
             |            ELSE coalesce(pd.covered, 0) END::BIGINT
             |         AS covered_tokens,
             |       CASE WHEN t.n_tokens >= 1048576 THEN NULL
             |            ELSE coalesce(pd.covered, 0) * 1000000 // t.n_tokens
             |            END::BIGINT AS dup_frac_micro,
             |       (t.n_tokens >= 1048576) AS quarantined
             |FROM t LEFT JOIN pd USING (doc_id)""".stripMargin)),

    // Over-width SEGMENTATION (r14 VERDICT #2: quarantine keeps the run
    // alive but leaves a book's duplication unexamined): the SAME
    // giant-bearing corpus as d_exact_substr_quarantine, run through
    // exactSubstrCoverageSegmented — the giant is cut into overlap
    // segments (synthetic rank units), its marks decode back, and its
    // duplicated spans ARE detected: the giant is doc 0's text repeated
    // R times, so (unlike the quarantine entry, where both read
    // inert/NULL) doc 0 must now read near-fully covered and the giant
    // itself near-fully self-covered. Oracle: the every-offset replay
    // with NO width exclusion — the giant's 2^20-token gram stream is
    // formulated as a zipped unnest + windowed string_agg (a streaming
    // O(n·g) scan) because the lateral-unnest + per-position list slice
    // the narrower entries use would materialize the giant's token list
    // once per position (the DuckDB scale trap recorded in r14).
    GraftQuery("d_exact_substr_segmented",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), col("text"))
        val planted = plantedClones(docs)
        val giant = giantOf(docs)
        Dedup.exactSubstrCoverageSegmented(
          docs.unionByName(planted).unionByName(giant),
          col("doc_id"), col("text"), minLen = 25)
      },
      Some(s"""WITH $GiantCorpusCte,
             |d AS (SELECT doc_id, string_split(text, ' ') AS w
             |      FROM corpus),
             |t AS (SELECT doc_id, length(w)::BIGINT AS n_tokens, w FROM d),
             |-- zipped unnest: one streamed row per token, no per-position
             |-- list slicing (the giant would otherwise copy its 2^20-
             |-- element list once per unnested position)
             |tok AS (SELECT doc_id, n_tokens,
             |          unnest(generate_series(1, length(w)))::BIGINT AS pos,
             |          unnest(w) AS tok
             |        FROM t),
             |occ AS (SELECT doc_id, n_tokens, pos,
             |          md5(string_agg(tok, ' ') OVER (
             |            PARTITION BY doc_id ORDER BY pos
             |            ROWS BETWEEN CURRENT ROW AND 24 FOLLOWING)) AS h
             |        FROM tok
             |        QUALIFY pos <= n_tokens - 24),
             |dup AS (SELECT h FROM occ GROUP BY h HAVING count(*) >= 2),
             |spans AS (
             |  SELECT doc_id, pos,
             |    greatest(0, pos + 25 - greatest(coalesce(
             |      max(pos + 25) OVER (PARTITION BY doc_id ORDER BY pos
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |      0), pos)) AS adds
             |  FROM occ JOIN dup USING (h)),
             |pd AS (SELECT doc_id, count(*) AS n_dup_starts,
             |         sum(adds) AS covered
             |       FROM spans GROUP BY doc_id)
             |SELECT t.doc_id, t.n_tokens,
             |       CASE WHEN t.n_tokens > 1073716248 THEN NULL
             |            ELSE coalesce(pd.n_dup_starts, 0) END::BIGINT
             |         AS n_dup_starts,
             |       CASE WHEN t.n_tokens > 1073716248 THEN NULL
             |            ELSE coalesce(pd.covered, 0) END::BIGINT
             |         AS covered_tokens,
             |       CASE WHEN t.n_tokens > 1073716248 THEN NULL
             |            ELSE coalesce(pd.covered, 0) * 1000000 // t.n_tokens
             |            END::BIGINT AS dup_frac_micro,
             |       (t.n_tokens > 1073716248) AS quarantined
             |FROM t LEFT JOIN pd USING (doc_id)""".stripMargin)),

    // Segmented TRIM (r15): the giant is REMOVED from, not just
    // measured — the segmented rank build marks its duplicated window
    // starts (here: everything, the giant being doc 0 repeated R
    // times), marks decode back, and the r15 complement-interval
    // rebuild reassembles survivors in O(n + intervals) where the old
    // per-token exists() scan would have paid ~n²/g on a fully-covered
    // 2^20-token doc. Giant and doc 0 both trim to '' (each fully
    // covered by the other); every other doc matches the
    // width-unlimited replay. Oracle: streaming tok/window-gram
    // formulation (the segmented-coverage lesson) + anti-join kept
    // rebuild with ordered string_agg.
    GraftQuery("d_exact_substr_trim_segmented",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), col("text"))
        val planted = plantedClones(docs)
        val giant = giantOf(docs)
        Dedup.exactSubstrTrimSegmented(
          docs.unionByName(planted).unionByName(giant),
          col("doc_id"), col("text"), minLen = 25)
      },
      Some(s"""WITH $GiantCorpusCte,
             |d AS (SELECT doc_id, string_split(text, ' ') AS w
             |      FROM corpus),
             |t AS (SELECT doc_id, length(w)::BIGINT AS n_tokens, w FROM d),
             |tok AS (SELECT doc_id, n_tokens,
             |          unnest(generate_series(1, length(w)))::BIGINT AS pos,
             |          unnest(w) AS tok
             |        FROM t),
             |occ AS (SELECT doc_id, pos,
             |          md5(string_agg(tok, ' ') OVER (
             |            PARTITION BY doc_id ORDER BY pos
             |            ROWS BETWEEN CURRENT ROW AND 24 FOLLOWING)) AS h
             |        FROM tok
             |        QUALIFY pos <= n_tokens - 24),
             |dup AS (SELECT h FROM occ GROUP BY h HAVING count(*) >= 2),
             |cov AS (SELECT DISTINCT o.doc_id, u.t::BIGINT AS t
             |        FROM occ o JOIN dup USING (h),
             |             unnest(generate_series(o.pos, o.pos + 24)) AS u(t)),
             |kept AS (SELECT k.doc_id, count(*) AS n_kept,
             |           string_agg(k.tok, ' ' ORDER BY k.t) AS txt
             |         FROM (SELECT tok.doc_id, tok.pos AS t, tok.tok
             |               FROM tok LEFT JOIN cov
             |                 ON cov.doc_id = tok.doc_id AND cov.t = tok.pos
             |               WHERE cov.doc_id IS NULL) k
             |         GROUP BY k.doc_id)
             |SELECT t.doc_id, t.n_tokens,
             |       CASE WHEN t.n_tokens > 1073716248 THEN NULL
             |            ELSE t.n_tokens - coalesce(k.n_kept, 0) END::BIGINT
             |         AS n_removed,
             |       CASE WHEN t.n_tokens > 1073716248 THEN NULL
             |            ELSE coalesce(k.txt, '') END AS trimmed_text,
             |       (t.n_tokens > 1073716248) AS quarantined
             |FROM t LEFT JOIN kept k ON k.doc_id = t.doc_id""".stripMargin)),

    // BYTE-grain ExactSubstr (r13 VERDICT #3, the last fidelity delta
    // with Lee et al. §4.1, which dedups byte sequences where the word
    // path dedups space-split tokens): the SAME suffix-rank machinery
    // at single-character positions — rank_1's class dimension is
    // alphabet-sized (broadcasts instead of shuffling), positions are
    // ~5x the word count for the same corpus (priced in SCALE.md), and
    // minLen=40 CHARS exercises the k=32/off=8 final-shift path over
    // five doubling rounds. Planted: each %89 doc contributes a clone
    // of chars [o, o+len) at char offsets derived from its id, len in
    // {40, 90, 200} — substring duplicates that word grain cannot even
    // express (they cut mid-word). Oracle: the independent every-
    // CHAR-offset md5 40-gram replay.
    GraftQuery("d_exact_substr_bytes",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), col("text"))
        val planted = charClones(docs)
        Dedup.exactSubstrCoverage(docs.unionByName(planted),
          col("doc_id"), col("text"), minLen = 40, grain = "char")
      },
      Some("""WITH src AS (
             |  SELECT doc_id, text,
             |         (1 + doc_id % 11)::INT AS o,
             |         CASE (doc_id % 3)::INT WHEN 0 THEN 40 WHEN 1 THEN 90
             |              ELSE 200 END AS len
             |  FROM documents WHERE doc_id % 89 = 0),
             |corpus AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 1000000000, substring(text, o, len)
             |  FROM src WHERE length(text) >= o + len - 1),
             |t AS (SELECT doc_id, length(text)::BIGINT AS n_tokens, text
             |      FROM corpus),
             |el AS (SELECT * FROM t WHERE n_tokens < 1048576),
             |occ AS (SELECT doc_id, n_tokens, i::BIGINT AS pos,
             |          md5(substring(text, i::INT, 40)) AS h
             |        FROM el, unnest(generate_series(1,
             |          greatest(length(text) - 39, 0))) AS u(i)),
             |dup AS (SELECT h FROM occ GROUP BY h HAVING count(*) >= 2),
             |spans AS (
             |  SELECT doc_id, pos,
             |    greatest(0, pos + 40 - greatest(coalesce(
             |      max(pos + 40) OVER (PARTITION BY doc_id ORDER BY pos
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |      0), pos)) AS adds
             |  FROM occ JOIN dup USING (h)),
             |pd AS (SELECT doc_id, count(*) AS n_dup_starts,
             |         sum(adds) AS covered
             |       FROM spans GROUP BY doc_id)
             |SELECT t.doc_id, t.n_tokens,
             |       CASE WHEN t.n_tokens >= 1048576 THEN NULL
             |            ELSE coalesce(pd.n_dup_starts, 0) END::BIGINT
             |         AS n_dup_starts,
             |       CASE WHEN t.n_tokens >= 1048576 THEN NULL
             |            ELSE coalesce(pd.covered, 0) END::BIGINT
             |         AS covered_tokens,
             |       CASE WHEN t.n_tokens >= 1048576 THEN NULL
             |            ELSE coalesce(pd.covered, 0) * 1000000 // t.n_tokens
             |            END::BIGINT AS dup_frac_micro,
             |       (t.n_tokens >= 1048576) AS quarantined
             |FROM t LEFT JOIN pd USING (doc_id)""".stripMargin)),

    // BYTE-grain ExactSubstr TRIM — the released deduplicate-text-
    // datasets transform exactly: duplicated BYTE spans (>= 40 chars,
    // any length, any offset) REMOVED from every doc, survivors
    // rejoined with NO separator. Same planted char-offset clones as
    // d_exact_substr_bytes (clones of len 40/90/200 trim to empty;
    // their source docs lose the cloned span even when it cuts
    // mid-word). Oracle: every-CHAR-offset md5 40-gram classes +
    // exploded covered-set + ordered no-separator string_agg rebuild —
    // interval merge, tail arithmetic AND the reassembled string grade
    // value-exact.
    GraftQuery("d_exact_substr_trim_bytes",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), col("text"))
        val planted = charClones(docs)
        Dedup.exactSubstrTrim(docs.unionByName(planted),
          col("doc_id"), col("text"), minLen = 40, grain = "char")
      },
      Some("""WITH src AS (
             |  SELECT doc_id, text,
             |         (1 + doc_id % 11)::INT AS o,
             |         CASE (doc_id % 3)::INT WHEN 0 THEN 40 WHEN 1 THEN 90
             |              ELSE 200 END AS len
             |  FROM documents WHERE doc_id % 89 = 0),
             |corpus AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 1000000000, substring(text, o, len)
             |  FROM src WHERE length(text) >= o + len - 1),
             |t AS (SELECT doc_id, length(text)::BIGINT AS n_tokens, text
             |      FROM corpus),
             |el AS (SELECT * FROM t WHERE n_tokens < 1048576),
             |occ AS (SELECT doc_id, i::BIGINT AS pos,
             |          md5(substring(text, i::INT, 40)) AS h
             |        FROM el, unnest(generate_series(1,
             |          greatest(length(text) - 39, 0))) AS u(i)),
             |dup AS (SELECT h FROM occ GROUP BY h HAVING count(*) >= 2),
             |cov AS (SELECT DISTINCT o.doc_id, u.t::BIGINT AS t
             |        FROM occ o JOIN dup USING (h),
             |             unnest(generate_series(o.pos, o.pos + 39)) AS u(t)),
             |tok AS (SELECT doc_id, i::BIGINT AS t,
             |          substring(text, i::INT, 1) AS tok
             |        FROM el, unnest(generate_series(1,
             |          length(text))) AS u(i)),
             |kept AS (SELECT k.doc_id, count(*) AS n_kept,
             |           string_agg(k.tok, '' ORDER BY k.t) AS txt
             |         FROM (SELECT tok.* FROM tok LEFT JOIN cov
             |                 ON cov.doc_id = tok.doc_id AND cov.t = tok.t
             |               WHERE cov.doc_id IS NULL) k
             |         GROUP BY k.doc_id)
             |SELECT t.doc_id, t.n_tokens,
             |       CASE WHEN t.n_tokens >= 1048576 THEN NULL
             |            ELSE t.n_tokens - coalesce(k.n_kept, 0) END::BIGINT
             |         AS n_removed,
             |       CASE WHEN t.n_tokens >= 1048576 THEN NULL
             |            ELSE coalesce(k.txt, '') END AS trimmed_text,
             |       (t.n_tokens >= 1048576) AS quarantined
             |FROM t LEFT JOIN kept k ON k.doc_id = t.doc_id""".stripMargin)),

    // UTF-8 BYTE-addressed ExactSubstr (r14 VERDICT #3: grain="char"
    // indexes characters; the released deduplicate-text-datasets tool
    // indexes BYTES — divergent on multi-byte text). The corpus is the
    // documents table with 'a'/'e' translated to 'ä'/'é' (every doc
    // multi-byte, ~2 bytes per translated char), plus char-offset
    // clones of the %89 docs: grain="byte" must report byte-addressed
    // n_tokens/positions/coverage — on THIS corpus provably different
    // from char grain (byte lengths exceed char lengths wherever a
    // 2-byte char appears; the unit spec pins the divergence).
    // Oracle: every-BYTE-offset md5 windows over the hex encoding of
    // the UTF-8 bytes (hex is a bijection, so hex-pair windows group
    // byte windows exactly — no blob arithmetic needed).
    GraftQuery("d_exact_substr_utf8",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"),
            translate(col("text"), "ae", "äé").as("text"))
        val planted = charClones(docs)
        Dedup.exactSubstrCoverage(docs.unionByName(planted),
          col("doc_id"), col("text"), minLen = 40, grain = "byte")
      },
      Some("""WITH base AS (
             |  SELECT doc_id, translate(text, 'ae', 'äé') AS text
             |  FROM documents),
             |src AS (
             |  SELECT doc_id, text,
             |         (1 + doc_id % 11)::INT AS o,
             |         CASE (doc_id % 3)::INT WHEN 0 THEN 40 WHEN 1 THEN 90
             |              ELSE 200 END AS len
             |  FROM base WHERE doc_id % 89 = 0),
             |corpus AS (
             |  SELECT doc_id, text FROM base
             |  UNION ALL
             |  SELECT doc_id + 1000000000, substring(text, o, len)
             |  FROM src WHERE length(text) >= o + len - 1),
             |t AS (SELECT doc_id, hex(encode(text)) AS hx,
             |        octet_length(encode(text))::BIGINT AS n_tokens
             |      FROM corpus),
             |el AS (SELECT * FROM t WHERE n_tokens < 1048576),
             |occ AS (SELECT doc_id, n_tokens, i::BIGINT AS pos,
             |          md5(substring(hx, (2 * i - 1)::INT, 80)) AS h
             |        FROM el, unnest(generate_series(1,
             |          greatest(n_tokens - 39, 0)::INT)) AS u(i)),
             |dup AS (SELECT h FROM occ GROUP BY h HAVING count(*) >= 2),
             |spans AS (
             |  SELECT doc_id, pos,
             |    greatest(0, pos + 40 - greatest(coalesce(
             |      max(pos + 40) OVER (PARTITION BY doc_id ORDER BY pos
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |      0), pos)) AS adds
             |  FROM occ JOIN dup USING (h)),
             |pd AS (SELECT doc_id, count(*) AS n_dup_starts,
             |         sum(adds) AS covered
             |       FROM spans GROUP BY doc_id)
             |SELECT t.doc_id, t.n_tokens,
             |       CASE WHEN t.n_tokens >= 1048576 THEN NULL
             |            ELSE coalesce(pd.n_dup_starts, 0) END::BIGINT
             |         AS n_dup_starts,
             |       CASE WHEN t.n_tokens >= 1048576 THEN NULL
             |            ELSE coalesce(pd.covered, 0) END::BIGINT
             |         AS covered_tokens,
             |       CASE WHEN t.n_tokens >= 1048576 THEN NULL
             |            ELSE coalesce(pd.covered, 0) * 1000000 // t.n_tokens
             |            END::BIGINT AS dup_frac_micro,
             |       (t.n_tokens >= 1048576) AS quarantined
             |FROM t LEFT JOIN pd USING (doc_id)""".stripMargin)),

    // INCREMENTAL ExactSubstr (r13 VERDICT #4, the last dedup operator
    // without an incremental twin): suffix-rank tables are not
    // mergeable, so the fold is the gram-registry discipline — frozen
    // state (docs/marks/registry parquet, built once) + one delta
    // probe, frozen text never re-read. The delta exercises BOTH
    // retro-mark directions: the %97 planted clones duplicate frozen
    // spans (previously-UNIQUE frozen grams must newly mark via their
    // registry (d1,p1) slot), and two reversed-token copies of each
    // %113 doc duplicate only each other (delta-internal marks with no
    // frozen hit). The oracle is the full-recompute every-offset
    // replay over frozen ∪ delta — bit-equality IS the graded
    // contract; the periodic-exact-recompute trigger is documented on
    // the operator.
    GraftQuery("d_exact_substr_incremental",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), col("text"))
        val planted = plantedClones(docs)
        val rev = docs.filter(col("doc_id") % 113 === 0)
          .select(col("doc_id"),
            concat_ws(" ", reverse(split(col("text"), " "))).as("text"))
        val delta = planted
          .unionByName(rev.select((col("doc_id") + 1200000000L)
            .as("doc_id"), col("text")))
          .unionByName(rev.select((col("doc_id") + 1300000000L)
            .as("doc_id"), col("text")))
        val base = Scratch.dir("exact_substr_incr", dir)
        Scratch.buildOnce(base) {
          val (d0, m0, r0) = Dedup.exactSubstrGramState(
            docs, col("doc_id"), col("text"), minLen = 25)
          d0.write.mode("overwrite").parquet(s"$base/docs")
          m0.write.mode("overwrite").parquet(s"$base/marks")
          r0.write.mode("overwrite").parquet(s"$base/registry")
        }
        val (d1, m1, _) = Dedup.exactSubstrIncremental(
          s.read.parquet(s"$base/docs"),
          s.read.parquet(s"$base/marks"),
          s.read.parquet(s"$base/registry"),
          delta, col("doc_id"), col("text"), minLen = 25)
        Dedup.exactSubstrCoverageFromMarks(d1, m1, minLen = 25)
      },
      Some(s"""WITH $IncrCorpusCte,
             |d AS (SELECT doc_id, string_split(text, ' ') AS w
             |      FROM corpus),
             |t AS (SELECT doc_id, length(w)::BIGINT AS n_tokens, w FROM d),
             |-- same width exclusion as the engine's gramOcc (r14 ADVICE:
             |-- an over-width doc's grams must neither mark nor be marked,
             |-- and the predicate does not push below the lateral unnest)
             |el AS (SELECT * FROM t WHERE n_tokens < 1048576),
             |occ AS (SELECT doc_id, n_tokens, i::BIGINT AS pos,
             |          md5(array_to_string(w[i:i+24], ' ')) AS h
             |        FROM el, unnest(generate_series(1,
             |          greatest(length(w) - 24, 0))) AS u(i)),
             |dup AS (SELECT h FROM occ GROUP BY h HAVING count(*) >= 2),
             |spans AS (
             |  SELECT doc_id, pos,
             |    greatest(0, pos + 25 - greatest(coalesce(
             |      max(pos + 25) OVER (PARTITION BY doc_id ORDER BY pos
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |      0), pos)) AS adds
             |  FROM occ JOIN dup USING (h)),
             |pd AS (SELECT doc_id, count(*) AS n_dup_starts,
             |         sum(adds) AS covered
             |       FROM spans GROUP BY doc_id)
             |SELECT t.doc_id, t.n_tokens,
             |       CASE WHEN t.n_tokens >= 1048576 THEN NULL
             |            ELSE coalesce(pd.n_dup_starts, 0) END::BIGINT
             |         AS n_dup_starts,
             |       CASE WHEN t.n_tokens >= 1048576 THEN NULL
             |            ELSE coalesce(pd.covered, 0) END::BIGINT
             |         AS covered_tokens,
             |       CASE WHEN t.n_tokens >= 1048576 THEN NULL
             |            ELSE coalesce(pd.covered, 0) * 1000000 // t.n_tokens
             |            END::BIGINT AS dup_frac_micro,
             |       (t.n_tokens >= 1048576) AS quarantined
             |FROM t LEFT JOIN pd USING (doc_id)""".stripMargin)),

    // INCREMENTAL TRIM serve (r14 VERDICT residual #4 → r15 directive
    // #6): the gram-registry state stored `marks` but could only serve
    // coverage — exactSubstrTrimFromMarks now emits TRIMMED TEXT from
    // the same state with no rank rounds and no gram explode (one
    // tokenize pass over the corpus text — the cost any trim pays —
    // plus the marks join and the within-row interval rebuild). Same
    // frozen state + delta as d_exact_substr_incremental (the Scratch
    // base is shared, so the state build amortizes once per run);
    // graded bit-equal to the full-recompute trim over frozen ∪ delta.
    GraftQuery("d_exact_substr_incr_trim",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), col("text"))
        val planted = plantedClones(docs)
        val rev = docs.filter(col("doc_id") % 113 === 0)
          .select(col("doc_id"),
            concat_ws(" ", reverse(split(col("text"), " "))).as("text"))
        val delta = planted
          .unionByName(rev.select((col("doc_id") + 1200000000L)
            .as("doc_id"), col("text")))
          .unionByName(rev.select((col("doc_id") + 1300000000L)
            .as("doc_id"), col("text")))
        val base = Scratch.dir("exact_substr_incr", dir)
        Scratch.buildOnce(base) {
          val (d0, m0, r0) = Dedup.exactSubstrGramState(
            docs, col("doc_id"), col("text"), minLen = 25)
          d0.write.mode("overwrite").parquet(s"$base/docs")
          m0.write.mode("overwrite").parquet(s"$base/marks")
          r0.write.mode("overwrite").parquet(s"$base/registry")
        }
        val (_, m1, _) = Dedup.exactSubstrIncremental(
          s.read.parquet(s"$base/docs"),
          s.read.parquet(s"$base/marks"),
          s.read.parquet(s"$base/registry"),
          delta, col("doc_id"), col("text"), minLen = 25)
        Dedup.exactSubstrTrimFromMarks(docs.unionByName(delta),
          col("doc_id"), col("text"), m1, minLen = 25)
      },
      Some(s"""WITH $IncrCorpusCte,
             |d AS (SELECT doc_id, string_split(text, ' ') AS w
             |      FROM corpus),
             |t AS (SELECT doc_id, length(w)::BIGINT AS n_tokens, w FROM d),
             |el AS (SELECT * FROM t WHERE n_tokens < 1048576),
             |occ AS (SELECT doc_id, i::BIGINT AS pos,
             |          md5(array_to_string(w[i:i+24], ' ')) AS h
             |        FROM el, unnest(generate_series(1,
             |          greatest(length(w) - 24, 0))) AS u(i)),
             |dup AS (SELECT h FROM occ GROUP BY h HAVING count(*) >= 2),
             |cov AS (SELECT DISTINCT o.doc_id, u.t::BIGINT AS t
             |        FROM occ o JOIN dup USING (h),
             |             unnest(generate_series(o.pos, o.pos + 24)) AS u(t)),
             |tok AS (SELECT doc_id, i::BIGINT AS t, w[i] AS tok
             |        FROM el, unnest(generate_series(1, length(w))) AS u(i)),
             |kept AS (SELECT k.doc_id, count(*) AS n_kept,
             |           string_agg(k.tok, ' ' ORDER BY k.t) AS txt
             |         FROM (SELECT tok.* FROM tok LEFT JOIN cov
             |                 ON cov.doc_id = tok.doc_id AND cov.t = tok.t
             |               WHERE cov.doc_id IS NULL) k
             |         GROUP BY k.doc_id)
             |SELECT t.doc_id, t.n_tokens,
             |       CASE WHEN t.n_tokens >= 1048576 THEN NULL
             |            ELSE t.n_tokens - coalesce(k.n_kept, 0) END::BIGINT
             |         AS n_removed,
             |       CASE WHEN t.n_tokens >= 1048576 THEN NULL
             |            ELSE coalesce(k.txt, '') END AS trimmed_text,
             |       (t.n_tokens >= 1048576) AS quarantined
             |FROM t LEFT JOIN kept k ON k.doc_id = t.doc_id""".stripMargin)),

    // BYTE-GRAIN INCREMENTAL ExactSubstr (r15 VERDICT #3, the last
    // ungraded grain × fold composition): the gram-registry daily fold
    // at grain="byte" — the incremental twin of the released
    // deduplicate-text-datasets transform's BYTE addressing. Frozen
    // corpus: documents with 'a'/'e' → 'ä'/'é' (every doc multi-byte,
    // so byte addressing provably diverges from char). Delta exercises
    // both retro-mark directions: char-offset clones of the %89 frozen
    // docs duplicate frozen BYTE spans (previously-unique frozen grams
    // newly mark via their registry (d1,p1) slot), and two
    // reversed-word copies of each %113 doc duplicate only each other.
    // Oracle: the full-recompute every-BYTE-offset replay over frozen
    // ∪ delta (hex-pair windows group byte windows exactly) —
    // bit-equality with the fold IS the graded contract.
    GraftQuery("d_exact_substr_utf8_incr",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"),
            translate(col("text"), "ae", "äé").as("text"))
        val planted = charClones(docs)
        val rev = docs.filter(col("doc_id") % 113 === 0)
          .select(col("doc_id"),
            concat_ws(" ", reverse(split(col("text"), " "))).as("text"))
        val delta = planted
          .unionByName(rev.select((col("doc_id") + 1200000000L)
            .as("doc_id"), col("text")))
          .unionByName(rev.select((col("doc_id") + 1300000000L)
            .as("doc_id"), col("text")))
        val base = Scratch.dir("exact_substr_utf8_incr", dir)
        Scratch.buildOnce(base) {
          val (d0, m0, r0) = Dedup.exactSubstrGramState(
            docs, col("doc_id"), col("text"), minLen = 40,
            grain = "byte")
          d0.write.mode("overwrite").parquet(s"$base/docs")
          m0.write.mode("overwrite").parquet(s"$base/marks")
          r0.write.mode("overwrite").parquet(s"$base/registry")
        }
        val (d1, m1, _) = Dedup.exactSubstrIncremental(
          s.read.parquet(s"$base/docs"),
          s.read.parquet(s"$base/marks"),
          s.read.parquet(s"$base/registry"),
          delta, col("doc_id"), col("text"), minLen = 40,
          grain = "byte")
        Dedup.exactSubstrCoverageFromMarks(d1, m1, minLen = 40)
      },
      Some("""WITH base AS (
             |  SELECT doc_id, translate(text, 'ae', 'äé') AS text
             |  FROM documents),
             |src AS (
             |  SELECT doc_id, text,
             |         (1 + doc_id % 11)::INT AS o,
             |         CASE (doc_id % 3)::INT WHEN 0 THEN 40 WHEN 1 THEN 90
             |              ELSE 200 END AS len
             |  FROM base WHERE doc_id % 89 = 0),
             |corpus AS (
             |  SELECT doc_id, text FROM base
             |  UNION ALL
             |  SELECT doc_id + 1000000000, substring(text, o, len)
             |  FROM src WHERE length(text) >= o + len - 1
             |  UNION ALL
             |  SELECT doc_id + 1200000000,
             |         array_to_string(list_reverse(string_split(text, ' ')),
             |                         ' ')
             |  FROM base WHERE doc_id % 113 = 0
             |  UNION ALL
             |  SELECT doc_id + 1300000000,
             |         array_to_string(list_reverse(string_split(text, ' ')),
             |                         ' ')
             |  FROM base WHERE doc_id % 113 = 0),
             |t AS (SELECT doc_id, hex(encode(text)) AS hx,
             |        octet_length(encode(text))::BIGINT AS n_tokens
             |      FROM corpus),
             |el AS (SELECT * FROM t WHERE n_tokens < 1048576),
             |occ AS (SELECT doc_id, n_tokens, i::BIGINT AS pos,
             |          md5(substring(hx, (2 * i - 1)::INT, 80)) AS h
             |        FROM el, unnest(generate_series(1,
             |          greatest(n_tokens - 39, 0)::INT)) AS u(i)),
             |dup AS (SELECT h FROM occ GROUP BY h HAVING count(*) >= 2),
             |spans AS (
             |  SELECT doc_id, pos,
             |    greatest(0, pos + 40 - greatest(coalesce(
             |      max(pos + 40) OVER (PARTITION BY doc_id ORDER BY pos
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |      0), pos)) AS adds
             |  FROM occ JOIN dup USING (h)),
             |pd AS (SELECT doc_id, count(*) AS n_dup_starts,
             |         sum(adds) AS covered
             |       FROM spans GROUP BY doc_id)
             |SELECT t.doc_id, t.n_tokens,
             |       CASE WHEN t.n_tokens >= 1048576 THEN NULL
             |            ELSE coalesce(pd.n_dup_starts, 0) END::BIGINT
             |         AS n_dup_starts,
             |       CASE WHEN t.n_tokens >= 1048576 THEN NULL
             |            ELSE coalesce(pd.covered, 0) END::BIGINT
             |         AS covered_tokens,
             |       CASE WHEN t.n_tokens >= 1048576 THEN NULL
             |            ELSE coalesce(pd.covered, 0) * 1000000 // t.n_tokens
             |            END::BIGINT AS dup_frac_micro,
             |       (t.n_tokens >= 1048576) AS quarantined
             |FROM t LEFT JOIN pd USING (doc_id)""".stripMargin)),

    // Duplicated-span fraction (Lee et al. ACL'22 ExactSubstr at fixed
    // gram length): per doc, the exact fraction of tokens covered by a
    // 25-token span occurring >= 2 times in the corpus — the trim/drop
    // signal for boilerplate and mirror pages. Interval-union coverage
    // is exact integer arithmetic; the oracle replays it with a running
    // window-max formulation (same math, different mechanism).
    GraftQuery("d_dup_span_fraction",
      (s, dir) => Dedup.dupSpanFraction(Tables.documents(s, dir),
        col("doc_id"), col("text"), g = 25),
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
             |           FROM documents),
             |t AS (SELECT doc_id, length(w)::BIGINT AS n_tokens, w FROM d),
             |occ AS (SELECT doc_id, n_tokens, i::BIGINT AS pos,
             |          md5(array_to_string(w[i:i+24], ' ')) AS h
             |        FROM t, unnest(generate_series(1,
             |          greatest(length(w) - 24, 0))) AS u(i)),
             |dup AS (SELECT h FROM occ GROUP BY h HAVING count(*) >= 2),
             |spans AS (
             |  SELECT doc_id, pos,
             |    greatest(0, pos + 25 - greatest(coalesce(
             |      max(pos + 25) OVER (PARTITION BY doc_id ORDER BY pos
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |      0), pos)) AS adds
             |  FROM occ JOIN dup USING (h)),
             |pd AS (SELECT doc_id, count(*) AS n_dup_grams,
             |         sum(adds) AS covered
             |       FROM spans GROUP BY doc_id)
             |SELECT t.doc_id, t.n_tokens,
             |       coalesce(pd.n_dup_grams, 0)::BIGINT AS n_dup_grams,
             |       coalesce(pd.covered, 0)::BIGINT AS covered_tokens,
             |       (coalesce(pd.covered, 0) * 1000000 // t.n_tokens)::BIGINT
             |         AS dup_frac_micro
             |FROM t LEFT JOIN pd USING (doc_id)""".stripMargin)),

    // ExactSubstr TRIM (the r11 stretch): d_dup_span_fraction measures
    // duplicated-span coverage; this is the production transform that
    // REMOVES those spans (Lee et al. 2022) — every token covered by a
    // corpus-duplicated 25-gram is dropped and the survivors rejoin.
    // The oracle rebuilds the trimmed text independently (exploded
    // covered-position set + ordered string_agg), so the interval-union
    // arithmetic, the merged-interval scan AND the reassembled string
    // are all graded value-exact; n_removed doubles as the
    // covered_tokens cross-check against the fraction query.
    GraftQuery("d_dup_span_trim",
      (s, dir) => Dedup.dupSpanTrim(Tables.documents(s, dir),
        col("doc_id"), col("text"), g = 25),
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
             |           FROM documents),
             |t AS (SELECT doc_id, length(w)::BIGINT AS n_tokens, w FROM d),
             |occ AS (SELECT doc_id, i::BIGINT AS pos,
             |          md5(array_to_string(w[i:i+24], ' ')) AS h
             |        FROM t, unnest(generate_series(1,
             |          greatest(length(w) - 24, 0))) AS u(i)),
             |dup AS (SELECT h FROM occ GROUP BY h HAVING count(*) >= 2),
             |cov AS (SELECT DISTINCT o.doc_id, u.t::BIGINT AS t
             |        FROM occ o JOIN dup USING (h),
             |             unnest(generate_series(o.pos, o.pos + 24)) AS u(t)),
             |tok AS (SELECT doc_id, i::BIGINT AS t, w[i] AS tok
             |        FROM t, unnest(generate_series(1, length(w))) AS u(i)),
             |kept AS (SELECT k.doc_id, count(*) AS n_kept,
             |           string_agg(k.tok, ' ' ORDER BY k.t) AS txt
             |         FROM (SELECT tok.* FROM tok LEFT JOIN cov
             |                 ON cov.doc_id = tok.doc_id AND cov.t = tok.t
             |               WHERE cov.doc_id IS NULL) k
             |         GROUP BY k.doc_id)
             |SELECT t.doc_id, t.n_tokens,
             |       (t.n_tokens - coalesce(k.n_kept, 0))::BIGINT AS n_removed,
             |       coalesce(k.txt, '') AS trimmed_text
             |FROM t LEFT JOIN kept k ON k.doc_id = t.doc_id""".stripMargin)),

    // Canonical-pick by QUALITY: within each near-dup group keep the
    // LONGEST member (ties -> smallest id) — the "keep best copy" rule a
    // production dedup actually ships (min-id keeps whichever landed
    // first; this keeps the most complete text). Components + one dim
    // join + one per-group window; the window runs on the component
    // frame (clustered docs only), never the corpus.
    GraftQuery("d_canonical_best",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
        val comp = Dedup.nearDupComponents(Tables.documents(s, dir),
            col("doc_id"), col("text"),
            shingleSize = 3, numHashes = 8, bands = 4, threshold = 0.5)
          .select(col("node").as("doc_id"), col("component"))
        comp.join(Tables.documents(s, dir)
            .select(col("doc_id"), col("n_chars").cast("long").as("n_chars")),
            Seq("doc_id"))
          .withColumn("group_size",
            count(lit(1)).over(w.partitionBy(col("component"))))
          .withColumn("rn", row_number().over(w.partitionBy(col("component"))
            .orderBy(col("n_chars").desc, col("doc_id"))))
          .filter(col("rn") === 1)
          .select(col("component"), col("group_size"),
            col("doc_id").as("keep_id"), col("n_chars").as("keep_chars"))
      },
      Some(s"""WITH RECURSIVE $MinhashComponentsCte
              |SELECT component, group_size, doc_id AS keep_id,
              |       n_chars AS keep_chars
              |FROM (
              |  SELECT cp.component, cp.doc_id, d.n_chars::BIGINT AS n_chars,
              |         count(*) OVER (PARTITION BY cp.component) AS group_size,
              |         row_number() OVER (PARTITION BY cp.component
              |           ORDER BY d.n_chars DESC, cp.doc_id) AS rn
              |  FROM (SELECT a AS doc_id, least(a, min(b)) AS component
              |        FROM reach GROUP BY a) cp
              |  JOIN documents d USING (doc_id))
              |WHERE rn = 1""".stripMargin)),

    // Incremental dedup GROUPS (Dedup.incrementalComponents): yesterday's
    // component labels + today's delta pairs → updated labels, EXACTLY
    // equal to a full recompute — the oracle is the same full-closure
    // recursive CTE as d_dedup_groups, so any contraction slip (a wrong
    // supernode min, a dropped fresh node, an old component leaking a
    // stale label) hash-mismatches row-level. The corpus splits by
    // doc_id % 8 = 0 (the "appended" eighth); pair(i,j) is a pure
    // signature predicate, so the old↔old subset of the full verified
    // pair set IS yesterday's pair set. Yesterday's labels and the delta
    // pairs are materialized once (Scratch), so the timed path prices
    // exactly the daily fold: two node-sized label joins + label
    // propagation on the contracted, delta-sized edge list.
    GraftQuery("d_incremental_components",
      (s, dir) => {
        val base = Scratch.dir("incr_components", dir)
        Scratch.buildOnce(base) {
          val pairs = Dedup.minhashLshPairs(Tables.documents(s, dir),
            col("doc_id"), col("text"),
            shingleSize = 3, numHashes = 8, bands = 4, threshold = 0.5)
            .select(col("i"), col("j")).localCheckpoint()
          val isNew = (c: org.apache.spark.sql.Column) => c % 8 === 0
          Dedup.connectedComponents(
            pairs.filter(!isNew(col("i")) && !isNew(col("j"))))
            .write.mode("overwrite").parquet(s"$base/prev_labels")
          pairs.filter(isNew(col("i")) || isNew(col("j")))
            .write.mode("overwrite").parquet(s"$base/new_pairs")
        }
        Dedup.incrementalComponents(
          s.read.parquet(s"$base/prev_labels"),
          s.read.parquet(s"$base/new_pairs"))
          .select(col("node").as("doc_id"), col("component"))
      },
      Some(s"""WITH RECURSIVE $MinhashComponentsCte
              |SELECT a AS doc_id, least(a, min(b)) AS component
              |FROM reach GROUP BY a""".stripMargin)),

    // The SHIPPED corpus after near-dup dedup: each group's canonical doc
    // survives, every unpaired doc passes through — the output a training
    // pipeline actually materializes.
    GraftQuery("d_dedup_corpus",
      (s, dir) => {
        val groups = Dedup.nearDupComponents(Tables.documents(s, dir),
          col("doc_id"), col("text"),
          shingleSize = 3, numHashes = 8, bands = 4, threshold = 0.5)
        Tables.documents(s, dir)
          .join(groups, col("doc_id") === col("node"), "left")
          .filter(col("component").isNull || col("component") === col("doc_id"))
          .select(col("doc_id"), col("lang"))
      },
      Some(s"""WITH RECURSIVE $MinhashComponentsCte,
              |comp AS (SELECT a AS doc_id, least(a, min(b)) AS component
              |         FROM reach GROUP BY a)
              |SELECT d.doc_id, d.lang
              |FROM documents d LEFT JOIN comp c USING (doc_id)
              |WHERE c.component IS NULL OR c.component = d.doc_id""".stripMargin)),

    // Quality-aware survivor selection: within each near-dup group keep
    // the BEST document (longest n_chars, id-tiebroken) instead of the
    // smallest-id canonical — the "keep the most complete version"
    // policy real pipelines use when duplicates differ by truncation.
    // One WindowGroupLimit argmax over the (tiny) grouped table; the
    // corpus itself never re-shuffles beyond the components pipeline.
    GraftQuery("d_best_of_group",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, dir)
        val groups = Dedup.nearDupComponents(docs,
          col("doc_id"), col("text"),
          shingleSize = 3, numHashes = 8, bands = 4, threshold = 0.5)
        docs.join(groups, col("doc_id") === col("node"), "left")
          .withColumn("rep", coalesce(col("component"), col("doc_id")))
          .withColumn("rk", row_number().over(Window.partitionBy(col("rep"))
            .orderBy(col("n_chars").desc, col("doc_id"))))
          .filter(col("rk") === 1)
          .select(col("rep").as("group_rep"),
            col("doc_id").as("kept_doc"), col("n_chars"))
      },
      Some(s"""WITH RECURSIVE $MinhashComponentsCte,
              |comp AS (SELECT a AS doc_id, least(a, min(b)) AS component
              |         FROM reach GROUP BY a),
              |r AS (SELECT d.doc_id, d.n_chars,
              |        coalesce(c.component, d.doc_id) AS rep
              |      FROM documents d LEFT JOIN comp c USING (doc_id))
              |SELECT rep AS group_rep, doc_id AS kept_doc, n_chars
              |FROM (SELECT *, row_number() OVER (PARTITION BY rep
              |        ORDER BY n_chars DESC, doc_id) AS rk FROM r)
              |WHERE rk = 1""".stripMargin)),

    // Leakage-safe splitting: train/valid/test assigned by hash of the
    // near-dup GROUP representative, so a duplicate family can never
    // straddle the eval boundary — the contamination mode of naive random
    // splits. The oracle replays components + the md5 bucket arithmetic.
    GraftQuery("d_leakage_split",
      (s, dir) => Dedup.leakageSafeSplit(Tables.documents(s, dir),
        col("doc_id"), col("text"),
        shingleSize = 3, numHashes = 8, bands = 4, threshold = 0.5),
      Some(s"""WITH RECURSIVE $MinhashComponentsCte,
              |comp AS (SELECT a AS doc_id, least(a, min(b)) AS component
              |         FROM reach GROUP BY a),
              |r AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS rep
              |      FROM documents d LEFT JOIN comp c USING (doc_id)),
              |b AS (SELECT doc_id, rep,
              |        ('0x' || substring(md5('grp:' || rep), 1, 15))::BIGINT
              |          % 100 AS bucket
              |      FROM r)
              |SELECT doc_id, rep,
              |       CASE WHEN bucket < 80 THEN 'train'
              |            WHEN bucket < 90 THEN 'valid'
              |            ELSE 'test' END AS split
              |FROM b""".stripMargin)),

    // Bounded pairwise n-gram Jaccard — the exact (quadratic) baseline the
    // LSH pipeline approximates; bounded probe set like the reference's
    // per-request citation loops.
    GraftQuery("d_ngram_jaccard",
      (s, dir) => {
        val base = Tables.documents(s, dir).filter(col("doc_id") < 200)
          .select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
        base.as("a").join(base.as("b"), col("a.doc_id") < col("b.doc_id"))
          .withColumn("jac", Dedup.jaccard(col("a.sh"), col("b.sh")))
          .filter(col("jac") >= 0.3)
          .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"), col("jac"))
      },
      Some(s"""WITH $ShingleCte,
              |f AS (SELECT doc_id, sh FROM s WHERE doc_id < 200),
              |p AS (SELECT a.doc_id AS i, b.doc_id AS j,
              |        length(list_intersect(a.sh, b.sh))::DOUBLE /
              |          length(list_distinct(a.sh || b.sh)) AS jac
              |      FROM f a JOIN f b ON a.doc_id < b.doc_id)
              |SELECT i, j, jac FROM p WHERE jac >= 0.3""".stripMargin)),

    // Directed containment (Dedup.containmentPairs): quote/subset
    // detection — every 50th doc's 40-word prefix planted as a synthetic
    // "quote" doc (id + 100000). Containment flags quote→source at ~1.0
    // where Jaccard (and so MinHash LSH) scores them near zero; the
    // df-capped inverted-index candidates keep the join linear. Oracle
    // replays the planted quotes, the df cap, and the rare-set
    // denominator exactly.
    GraftQuery("d_containment_pairs",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        val quotes = docs.filter(col("doc_id") % 50 === 0)
          .select((col("doc_id") + 100000).as("doc_id"),
            concat_ws(" ", slice(split(col("text"), " "), 1, 40)).as("text"))
        Dedup.containmentPairs(docs.unionByName(quotes),
          col("doc_id"), col("text"), n = 3, dfCap = 100L, threshold = 0.8)
      },
      Some(s"""WITH ${shingleCte(
               """SELECT doc_id, string_split(text, ' ') AS w FROM documents
                 |  UNION ALL
                 |  SELECT doc_id + 100000 AS doc_id,
                 |         (string_split(text, ' '))[1:40] AS w
                 |  FROM documents WHERE doc_id % 50 = 0""".stripMargin)},
              |r AS (SELECT doc_id, unnest(sh) AS sg FROM s),
              |rr AS (SELECT r.doc_id, r.sg FROM r
              |       JOIN (SELECT sg, count(*) AS df FROM r GROUP BY 1
              |             HAVING count(*) <= 100) f USING (sg)),
              |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_rare
              |       FROM rr GROUP BY 1),
              |p AS (SELECT a.doc_id AS i, b.doc_id AS j,
              |        CAST(count(*) AS BIGINT) AS shared
              |      FROM rr a JOIN rr b ON a.sg = b.sg
              |                         AND a.doc_id <> b.doc_id
              |      GROUP BY 1, 2)
              |SELECT i, j, shared, n_rare,
              |       CAST(shared AS DOUBLE) / CAST(n_rare AS DOUBLE)
              |         AS containment
              |FROM p JOIN sz ON sz.doc_id = p.i
              |WHERE CAST(shared AS DOUBLE) / CAST(n_rare AS DOUBLE) >= 0.8"""
        .stripMargin)),

    // Chunk-level exact-substring dedup: non-overlapping 8-word windows,
    // global first occurrence kept, docs reassembled from surviving
    // chunks. Graded value-exact including the reassembled text.
    GraftQuery("d_chunk_dedup",
      (s, dir) => Dedup.chunkDedup(
        Tables.documents(s, dir), col("doc_id"), col("text"),
        chunkWords = 8),
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
             |           FROM documents),
             |c AS (SELECT doc_id, j AS chunk_idx,
             |        array_to_string(ws[(j*8+1):(j*8+8)], ' ') AS chunk
             |      FROM w, unnest(generate_series(0,
             |        CAST(ceil(len(ws) / 8.0) AS BIGINT) - 1)) AS t(j)),
             |k AS (SELECT doc_id, chunk_idx, chunk,
             |        row_number() OVER (PARTITION BY chunk
             |          ORDER BY doc_id, chunk_idx) = 1 AS keep
             |      FROM c)
             |SELECT doc_id,
             |       CAST(count(*) AS BIGINT) AS total_chunks,
             |       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
             |         AS kept_chunks,
             |       coalesce(string_agg(CASE WHEN keep THEN chunk END, ' '
             |         ORDER BY chunk_idx), '') AS dedup_text
             |FROM k GROUP BY 1""".stripMargin)),

    // CDC (content-defined chunking) dedup, graded on a corpus with
    // PLANTED STRADDLING duplicates: a copy of each doc_id<60 doc is
    // re-inserted behind a 3-word prefix, so the duplicated span sits at
    // word offset 3 (≢ 0 mod 8) — invisible to the fixed-window chunker
    // by construction, caught here because chunk boundaries are decided
    // by word content (hash60 % 8 == 0), not position. Oracle replays the
    // boundary rule exactly: boundary flag per word, exclusive prefix sum
    // as chunk id, regroup. Graded value-exact incl. reassembled text.
    GraftQuery("d_cdc_chunk_dedup",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        val shifted = Tables.documents(s, dir).filter(col("doc_id") < 60)
          .select((col("doc_id") + 100000L).as("doc_id"),
            concat(lit("straddle offset pad "), col("text")).as("text"))
        Dedup.cdcChunkDedup(docs.unionAll(shifted),
          col("doc_id"), col("text"), divisor = 8)
      },
      Some("""WITH aug AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 100000, 'straddle offset pad ' || text
             |  FROM documents WHERE doc_id < 60),
             |w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM aug),
             |t AS (SELECT doc_id, ws[j] AS word, j AS pos,
             |        CASE WHEN (('0x' || substring(md5(ws[j]), 1, 15))::BIGINT
             |          % 8) = 0 THEN 1 ELSE 0 END AS b
             |      FROM w, unnest(generate_series(1, len(ws))) AS t(j)),
             |c AS (SELECT doc_id, word, pos,
             |        coalesce(sum(b) OVER (PARTITION BY doc_id ORDER BY pos
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |          AS chunk_idx
             |      FROM t),
             |g AS (SELECT doc_id, chunk_idx,
             |        string_agg(word, ' ' ORDER BY pos) AS chunk
             |      FROM c GROUP BY 1, 2),
             |k AS (SELECT doc_id, chunk_idx, chunk,
             |        row_number() OVER (PARTITION BY chunk
             |          ORDER BY doc_id, chunk_idx) = 1 AS keep
             |      FROM g)
             |SELECT doc_id,
             |       CAST(count(*) AS BIGINT) AS total_chunks,
             |       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
             |         AS kept_chunks,
             |       coalesce(string_agg(CASE WHEN keep THEN chunk END, ' '
             |         ORDER BY chunk_idx), '') AS dedup_text
             |FROM k GROUP BY 1""".stripMargin)),

    // Production-hash conformance gate (hashMode "prod" = xxhash64 on the
    // shingle/band/CDC paths): real duplicate signal must be hash-family-
    // invariant — LSH verification is exact Jaccard on shingle sets and
    // chunk dedup matches exact chunk text, so the hash only steers
    // candidate generation / cut placement. The row carries the ORACLE-
    // mode pair count (replayed exactly by DuckDB) plus self-judged
    // booleans: (a) Jaccard overlap of the two modes' verified LSH pair
    // sets ≥ 0.8 (a borderline-jaccard pair may be banded by one family
    // only; planted dups land in both), and (b) per-mode recall of the
    // planted straddling clones under CDC chunking ≥ 0.85 (doc-level
    // "shares a chunk" flags are NOT hash-invariant on templated text —
    // cut placement decides which incidental phrase collisions surface —
    // but a straddling clone must lose chunks under ANY cut family unless
    // the doc draws no cut word at all, measured 55/60 oracle, 60/60
    // prod at sf0.01).
    GraftQuery("d_prod_hash_parity",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val aug = docs.select(col("doc_id"), col("text")).unionAll(
          docs.filter(col("doc_id") < 60)
            .select((col("doc_id") + 100000L).as("doc_id"),
              concat(lit("straddle offset pad "), col("text")).as("text")))
        def lshPairs(mode: String) =
          Dedup.minhashLshPairs(docs, col("doc_id"), col("text"),
            shingleSize = 3, numHashes = 8, bands = 4, threshold = 0.5,
            hashMode = mode)
            .select(concat_ws("_", col("i"), col("j")).as("p"))
        def cdcCloneRecall(mode: String, out: String) =
          Dedup.cdcChunkDedup(aug,
            col("doc_id"), col("text"), divisor = 8, hashMode = mode)
            .filter(col("doc_id") >= 100000L)
            .agg((sum(when(col("kept_chunks") < col("total_chunks"), 1)
              .otherwise(0)).cast("double") / count(lit(1))).as(out))
        val lshO = lshPairs("oracle")
        val lshP = lshPairs("prod")
        val lshOv = lshO.intersect(lshP)
          .agg(count(lit(1)).as("lsh_int"))
          .crossJoin(lshO.union(lshP).distinct()
            .agg(count(lit(1)).as("lsh_uni")))
          .select((col("lsh_int").cast("double") / col("lsh_uni"))
            .as("lsh_ov"))
        lshO.agg(count(lit(1)).as("n_pairs_oracle"))
          .crossJoin(lshOv)
          .crossJoin(cdcCloneRecall("oracle", "cdc_r_o"))
          .crossJoin(cdcCloneRecall("prod", "cdc_r_p"))
          .select(col("n_pairs_oracle"),
            (col("lsh_ov") >= 0.8).as("lsh_modes_agree"),
            (col("cdc_r_o") >= 0.85 && col("cdc_r_p") >= 0.85)
              .as("cdc_modes_agree"))
      },
      Some(s"""WITH $MinhashBandsCte,
              |c AS (SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
              |      FROM bk a JOIN bk b ON a.band_key = b.band_key
              |                         AND a.doc_id < b.doc_id),
              |v AS (SELECT i, j,
              |        length(list_intersect(si.sh, sj.sh))::DOUBLE /
              |          length(list_distinct(si.sh || sj.sh)) AS jac
              |      FROM c JOIN s si ON si.doc_id = c.i
              |             JOIN s sj ON sj.doc_id = c.j)
              |SELECT CAST(count(*) AS BIGINT) AS n_pairs_oracle,
              |       TRUE AS lsh_modes_agree, TRUE AS cdc_modes_agree
              |FROM v WHERE jac >= 0.5""".stripMargin)),

    // Bench twin of d_cdc_chunk_dedup in production-hash mode: the same
    // augmented corpus, cut rule xxhash64 % 8 — BENCH_r compares the two
    // entries head-to-head to price the oracle hash (one md5 per word).
    // Output is the hash-invariant part: corpus size (exact) and "the
    // planted duplicates actually deduplicated" (true under any family).
    GraftQuery("d_cdc_prod_hash",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        val shifted = Tables.documents(s, dir).filter(col("doc_id") < 60)
          .select((col("doc_id") + 100000L).as("doc_id"),
            concat(lit("straddle offset pad "), col("text")).as("text"))
        Dedup.cdcChunkDedup(docs.unionAll(shifted),
          col("doc_id"), col("text"), divisor = 8, hashMode = "prod")
          .agg(count(lit(1)).as("n_docs"),
            (sum(col("kept_chunks")) < sum(col("total_chunks")))
              .as("dedup_effective"))
      },
      Some("""SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) +
             |       (SELECT count(*) FROM documents WHERE doc_id < 60)
             |         AS n_docs,
             |       TRUE AS dedup_effective""".stripMargin)),

    // Char-granularity CDC dedup — the class the WORD chunker cannot
    // touch: for each doc_id<40 doc, TWO space-stripped copies are
    // planted behind different-length junk prefixes. Word tokenization
    // sees each copy as a single giant token (one chunk, globally unique
    // → zero dedup); char-level content-defined cuts realign the two
    // copies after their first shared boundary, so the later copy's
    // chunks all hash-match the earlier one's. Oracle replays the
    // md5-sliding-window cut rule (hash60 of the 16-char window, % 64)
    // per character, exactly — graded value-exact incl. reassembled
    // text.
    GraftQuery("d_byte_cdc_dedup",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        val noSp = translate(col("text"), " ", "")
        val clones = (200000L, "Za") :: (300000L, "Qxxb") :: Nil
        val aug = clones.foldLeft(docs) { case (acc, (off, pfx)) =>
          acc.unionAll(Tables.documents(s, dir).filter(col("doc_id") < 40)
            .select((col("doc_id") + off).as("doc_id"),
              concat(lit(pfx), noSp).as("text")))
        }
        Dedup.byteCdcChunkDedup(aug, col("doc_id"), col("text"),
          divisor = 64, window = 16)
      },
      Some("""WITH aug AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 200000, 'Za' || replace(text, ' ', '')
             |  FROM documents WHERE doc_id < 40
             |  UNION ALL
             |  SELECT doc_id + 300000, 'Qxxb' || replace(text, ' ', '')
             |  FROM documents WHERE doc_id < 40),
             |cuts AS (SELECT doc_id, i
             |      FROM aug, unnest(generate_series(16, len(text))) AS u(i)
             |      WHERE (('0x' || substring(md5(substring(text, i - 15, 16)),
             |          1, 15))::BIGINT % 64) = 0),
             |starts AS (SELECT doc_id, 1 AS start FROM aug
             |           UNION ALL
             |           SELECT doc_id, i + 1 AS start FROM cuts),
             |g AS (SELECT s.doc_id, s.start AS chunk_idx,
             |        substring(a.text, s.start,
             |          coalesce(lead(s.start) OVER (PARTITION BY s.doc_id
             |              ORDER BY s.start),
             |            len(a.text) + 1) - s.start) AS chunk
             |      FROM starts s JOIN aug a USING (doc_id)
             |      WHERE s.start <= len(a.text)),
             |k AS (SELECT doc_id, chunk_idx, chunk,
             |        row_number() OVER (PARTITION BY chunk
             |          ORDER BY doc_id, chunk_idx) = 1 AS keep
             |      FROM g)
             |SELECT doc_id,
             |       CAST(count(*) AS BIGINT) AS total_chunks,
             |       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
             |         AS kept_chunks,
             |       coalesce(string_agg(CASE WHEN keep THEN chunk END, ''
             |         ORDER BY chunk_idx), '') AS dedup_text
             |FROM k GROUP BY 1""".stripMargin)),

    // Gear-mode twin (native FastCDC rolling hash, graft_cdc_gear_cuts):
    // the cut FAMILY differs from the oracle mode, so conformance is
    // self-judged on the planted no-space clone pairs: after the first
    // shared cut past the prefix divergence the two copies' chunk
    // streams align exactly, so the later copy keeps at most a BOUNDED
    // head — the divergent prefix chunk plus at most one resync chunk
    // (kept_chunks <= 2), for ≥ 90% of pairs. This bound is independent
    // of doc length, unlike a "loses half its chunks" ratio, which is
    // unachievable for short docs where divisor-64 cuts yield only 1-3
    // chunks and the head chunk alone is half the doc (measured: the
    // ratio criterion passes 36/33/29/29 of 40 at sf0.01/0.001/0.1/1;
    // the head bound passes 40/38/38/38). n_clones is exact. Also the
    // bench entry pricing the rolling loop against the md5-per-char
    // oracle rule.
    GraftQuery("d_byte_cdc_gear",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        val noSp = translate(col("text"), " ", "")
        val clones = (200000L, "Za") :: (300000L, "Qxxb") :: Nil
        val aug = clones.foldLeft(docs) { case (acc, (off, pfx)) =>
          acc.unionAll(Tables.documents(s, dir).filter(col("doc_id") < 40)
            .select((col("doc_id") + off).as("doc_id"),
              concat(lit(pfx), noSp).as("text")))
        }
        Dedup.byteCdcChunkDedup(aug, col("doc_id"), col("text"),
          divisor = 64, window = 16, hashMode = "prod")
          .filter(col("doc_id") >= 300000L)
          .agg(count(lit(1)).as("n_clones"),
            (sum(when(col("kept_chunks") <= 2, 1)
              .otherwise(0)).cast("double") / count(lit(1)) >= 0.9)
              .as("clone_recall_ok"))
      },
      Some("""SELECT (SELECT count(*) FROM documents WHERE doc_id < 40)
             |         AS n_clones,
             |       TRUE AS clone_recall_ok""".stripMargin)),

    // Incremental BYTE-grain near-dup groups (Dedup.byteCdcIncremental):
    // the r9 stretch item — shared-CDC-chunk connectivity folded daily.
    // Day 1 = documents + a no-space "Za"-prefixed clone of each
    // doc_id<40; day 2 plants cross-day byte-offset clones ("Qxxb" copies
    // of the same docs → new↔old merges) plus TWO fresh copies of docs
    // 40..59 ("Mmm"/"Kzz" → brand-new components among new docs only).
    // Only day-2 docs are chunked in the timed path: their chunks probe
    // day 1's chunk registry (new↔old star pairs) and their own day's
    // hubs (new↔new), and incrementalComponents folds the delta-sized
    // pair list into day 1's labels. The oracle is a FULL recompute —
    // per-char md5-window chunking of the whole two-day corpus, shared-
    // chunk star pairs (chunks >= 16 chars), recursive-CTE closure — so
    // hub-choice independence, registry probing, and every merge class
    // are graded row-exact. Historical docs are never re-chunked and
    // historical pairs never re-read: the 100 TB daily shape.
    GraftQuery("d_byte_incremental",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        val noSp = translate(col("text"), " ", "")
        def clones(off: Long, pfx: String, lo: Long, hi: Long) =
          Tables.documents(s, dir)
            .filter(col("doc_id") >= lo && col("doc_id") < hi)
            .select((col("doc_id") + off).as("doc_id"),
              concat(lit(pfx), noSp).as("text"))
        val oldDocs = docs.unionAll(clones(200000L, "Za", 0L, 40L))
        val newDocs = clones(300000L, "Qxxb", 0L, 40L)
          .unionAll(clones(400000L, "Mmm", 40L, 60L))
          .unionAll(clones(500000L, "Kzz", 40L, 60L))
        val base = Scratch.dir("byte_incr", dir)
        Scratch.buildOnce(base) {
          Dedup.byteCdcRegistry(
            Dedup.byteCdcChunks(oldDocs, col("doc_id"), col("text"),
              divisor = 64), minChunkLen = 16)
            .write.mode("overwrite").parquet(s"$base/registry")
          Dedup.byteCdcComponents(oldDocs, col("doc_id"), col("text"),
            divisor = 64)
            .write.mode("overwrite").parquet(s"$base/prev_labels")
        }
        val (labels, _) = Dedup.byteCdcIncremental(
          s.read.parquet(s"$base/prev_labels"),
          s.read.parquet(s"$base/registry"),
          Dedup.byteCdcChunks(newDocs, col("doc_id"), col("text"),
            divisor = 64))
        labels.select(col("node").as("doc_id"), col("component"))
      },
      Some("""WITH RECURSIVE aug AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 200000, 'Za' || replace(text, ' ', '')
             |  FROM documents WHERE doc_id < 40
             |  UNION ALL
             |  SELECT doc_id + 300000, 'Qxxb' || replace(text, ' ', '')
             |  FROM documents WHERE doc_id < 40
             |  UNION ALL
             |  SELECT doc_id + 400000, 'Mmm' || replace(text, ' ', '')
             |  FROM documents WHERE doc_id >= 40 AND doc_id < 60
             |  UNION ALL
             |  SELECT doc_id + 500000, 'Kzz' || replace(text, ' ', '')
             |  FROM documents WHERE doc_id >= 40 AND doc_id < 60),
             |cuts AS (SELECT doc_id, i
             |      FROM aug, unnest(generate_series(16, len(text))) AS u(i)
             |      WHERE (('0x' || substring(md5(substring(text, i - 15, 16)),
             |          1, 15))::BIGINT % 64) = 0),
             |starts AS (SELECT doc_id, 1 AS start FROM aug
             |           UNION ALL
             |           SELECT doc_id, i + 1 AS start FROM cuts),
             |g AS (SELECT s.doc_id,
             |        substring(a.text, s.start,
             |          coalesce(lead(s.start) OVER (PARTITION BY s.doc_id
             |              ORDER BY s.start),
             |            len(a.text) + 1) - s.start) AS chunk
             |      FROM starts s JOIN aug a USING (doc_id)
             |      WHERE s.start <= len(a.text)),
             |q AS (SELECT doc_id, chunk FROM g WHERE len(chunk) >= 16),
             |reg AS (SELECT chunk, min(doc_id) AS rep FROM q GROUP BY 1),
             |p AS (SELECT DISTINCT q.doc_id AS i, reg.rep AS j
             |      FROM q JOIN reg USING (chunk)
             |      WHERE q.doc_id <> reg.rep),
             |und AS (SELECT i AS a, j AS b FROM p
             |        UNION SELECT j AS a, i AS b FROM p),
             |reach AS (
             |  SELECT a, b FROM und
             |  UNION
             |  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a)
             |SELECT a AS doc_id, least(a, min(b)) AS component
             |FROM reach GROUP BY a""".stripMargin)),

    // Winnowing candidate pairs (MOSS, SIGMOD'03 §5): doc pairs sharing
    // >= 3 selected fingerprints after dropping fingerprints present in
    // > 20 docs (the blockedFuzzyPairs stopword-cap discipline, replayed
    // by the oracle) — char-grain positional overlap detection, the
    // query the fingerprint battery exists to feed. The native-expr
    // fingerprints, the cap filter, the fp self-join fanout and the
    // share counts are all graded row-exact.
    GraftQuery("d_winnow_pairs",
      (s, dir) => Dedup.winnowCandidatePairs(Tables.documents(s, dir),
        col("doc_id"), col("text"), k = 8, w = 4,
        maxDocsPerFp = 20L, minShared = 3L),
      Some("""WITH h AS (
             |  SELECT doc_id,
             |    list_transform(generate_series(1, greatest(length(text) - 7, 1)),
             |      i -> ('0x' || substring(md5(substring(text, i, 8)), 1, 15))::BIGINT)
             |      AS hs
             |  FROM documents),
             |f AS (SELECT doc_id, unnest(list_distinct(list_transform(
             |        generate_series(1, greatest(length(hs) - 3, 1)),
             |        j -> list_min(hs[j:j+3])))) AS fp
             |      FROM h),
             |keep AS (SELECT fp FROM f GROUP BY fp HAVING count(*) <= 20),
             |fk AS (SELECT f.doc_id, f.fp FROM f JOIN keep USING (fp)),
             |p AS (SELECT a.doc_id AS i, b.doc_id AS j,
             |        count(*) AS n_shared
             |      FROM fk a JOIN fk b ON a.fp = b.fp
             |                         AND a.doc_id < b.doc_id
             |      GROUP BY 1, 2)
             |SELECT i, j, CAST(n_shared AS BIGINT) AS n_shared
             |FROM p WHERE n_shared >= 3""".stripMargin)),

    // INCREMENTAL winnowing pairs (r14 VERDICT #8, the stretch: the
    // last fingerprint family without an incremental fold — the batch
    // operator rebuilt its inverted index per run). State = mergeable
    // fingerprint registry (cap-bounded posting lists; a fingerprint
    // past maxDocsPerFp drops its list forever) + exact pair support;
    // the fold fingerprints ONLY the delta, probes the registry, adds
    // cross/within pairs for still-under-cap fps and RETRACTS the
    // stored pairs of fps the delta pushes past the cap (batch
    // semantics exclude capped fps entirely). Delta: full clones of
    // the <40 docs (pushing their fps' counts up — clone-family fps
    // near the cap cross it) plus 120-char prefix clones of the %61
    // docs (positional-overlap adds, the winnow specialty). Oracle:
    // the full d_winnow_pairs recompute over frozen ∪ delta —
    // bit-equality IS the graded contract.
    GraftQuery("d_winnow_incremental",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), col("text"))
        val delta = docs.filter(col("doc_id") < 40)
          .select((col("doc_id") + 900000L).as("doc_id"), col("text"))
          .unionByName(docs.filter(col("doc_id") % 61 === 0)
            .select((col("doc_id") + 950000L).as("doc_id"),
              expr("substring(text, 1, 120)").as("text")))
        val base = Scratch.dir("winnow_incr", dir)
        Scratch.buildOnce(base) {
          val (d0, r0, p0) = Dedup.winnowPairState(docs,
            col("doc_id"), col("text"), k = 8, w = 4,
            maxDocsPerFp = 20L)
          d0.write.mode("overwrite").parquet(s"$base/docs")
          r0.write.mode("overwrite").parquet(s"$base/fpreg")
          p0.write.mode("overwrite").parquet(s"$base/pairs")
        }
        val (_, _, p1) = Dedup.winnowIncremental(
          s.read.parquet(s"$base/docs"),
          s.read.parquet(s"$base/fpreg"),
          s.read.parquet(s"$base/pairs"),
          delta, col("doc_id"), col("text"), k = 8, w = 4,
          maxDocsPerFp = 20L)
        Dedup.winnowPairsFromState(p1, minShared = 3L)
      },
      Some("""WITH corpus AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 900000, text FROM documents
             |  WHERE doc_id < 40
             |  UNION ALL
             |  SELECT doc_id + 950000, substring(text, 1, 120)
             |  FROM documents WHERE doc_id % 61 = 0),
             |h AS (
             |  SELECT doc_id,
             |    list_transform(generate_series(1, greatest(length(text) - 7, 1)),
             |      i -> ('0x' || substring(md5(substring(text, i, 8)), 1, 15))::BIGINT)
             |      AS hs
             |  FROM corpus),
             |f AS (SELECT doc_id, unnest(list_distinct(list_transform(
             |        generate_series(1, greatest(length(hs) - 3, 1)),
             |        j -> list_min(hs[j:j+3])))) AS fp
             |      FROM h),
             |keep AS (SELECT fp FROM f GROUP BY fp HAVING count(*) <= 20),
             |fk AS (SELECT f.doc_id, f.fp FROM f JOIN keep USING (fp)),
             |p AS (SELECT a.doc_id AS i, b.doc_id AS j,
             |        count(*) AS n_shared
             |      FROM fk a JOIN fk b ON a.fp = b.fp
             |                         AND a.doc_id < b.doc_id
             |      GROUP BY 1, 2)
             |SELECT i, j, CAST(n_shared AS BIGINT) AS n_shared
             |FROM p WHERE n_shared >= 3""".stripMargin)),

    // Prod-hash twin of d_winnow_pairs (the d_cdc_prod_hash pricing
    // discipline at char grain): same selection kernel, hash family
    // xxhash64 instead of the oracle's 60-bit md5 — BENCH_r compares
    // the two entries head-to-head to price the oracle hash, which at
    // char grain runs per SHINGLE position. Output is the
    // hash-invariant part: the planted exact clones (40 duplicated
    // docs) must surface as candidate pairs under ANY hash family —
    // identical texts share every fingerprint, so only the stopword
    // cap can suppress a pair; >= 90% recall is the same bound
    // d_byte_cdc_gear carries. The corpus is first canonicalized to ONE
    // representative per distinct text (the production order: exact
    // dedup BEFORE near-dup candidate generation) — the r13 sf1 gate
    // caught the alternative: sf1's 10-clone families pushed every
    // cross-family fingerprint past the maxDocsPerFp cap and the
    // planted-pair recall assertion broke on testdata multiplicity, not
    // on the kernel.
    GraftQuery("t_winnow_prod_hash",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
          .select(col("doc_id"), col("text"))
        val aug = docs.unionAll(docs.filter(col("doc_id") < 40)
          .select((col("doc_id") + 900000L).as("doc_id"), col("text")))
        val nClones = docs.filter(col("doc_id") < 40)
          .groupBy().agg(count(lit(1)).as("n_clones"))
        Dedup.winnowCandidatePairs(aug, col("doc_id"), col("text"),
            k = 8, w = 4, maxDocsPerFp = 20L, minShared = 3L,
            hashMode = "prod")
          .filter(col("j") === col("i") + 900000L)
          .agg(count(lit(1)).as("nd"))
          .crossJoin(broadcast(nClones))
          .select(col("n_clones"),
            (col("nd").cast("double") / col("n_clones") >= 0.9)
              .as("clone_recall_ok"))
      },
      Some("""WITH reps AS (SELECT min(doc_id) AS doc_id
             |              FROM documents GROUP BY text)
             |SELECT (SELECT CAST(count(*) AS BIGINT) FROM reps
             |        WHERE doc_id < 40) AS n_clones,
             |       TRUE AS clone_recall_ok""".stripMargin)),

    // STREAMING byte-CDC chunk registry (the r11 stretch #3, §2.9 × the
    // byte-dedup family): the d_byte_incremental state table maintained
    // as a streaming-folded gold — the augmented corpus (documents + a
    // no-space "Za" clone of each doc_id<40) replayed as JSONL in
    // interleaved thirds (doc_id % 3, so clone and source land in
    // DIFFERENT micro-batches), each batch chunked alone and folded into
    // the chunk→min-doc registry by a lossless min-merge. Because min of
    // per-batch minima IS the min of the union, the final gold must be
    // bit-identical to chunking everything at once — which is exactly
    // what the oracle replays (the per-char md5-window cut rule, chunks
    // >= 16 chars, min doc per chunk). Exactly-once under foreachBatch
    // replay rides on streamFoldGold's committed-version adoption
    // (spec-pinned on this fold in StreamingSpec).
    GraftQuery("w_stream_cdc_gold",
      (s, dir) => {
        val base = Scratch.dir("stream_cdc_gold", dir)
        val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        val aug = docs.unionAll(Tables.documents(s, dir)
          .filter(col("doc_id") < 40)
          .select((col("doc_id") + 200000L).as("doc_id"),
            concat(lit("Za"), translate(col("text"), " ", "")).as("text")))
        val fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
        Scratch.buildOnce(base) {
          for ((pfx, m) <- Seq(("aa_", 0), ("bb_", 1), ("cc_", 2)))
            Scratch.dumpJsonl(aug.filter(col("doc_id") % 3 === m),
              s"$base/stage$m", s"$base/src", pfx, fmt)
          val gold = graft.streaming.StreamDedup.streamCdcRegistryGold(
            s, s"$base/src", aug, s"$base/gold", s"$base/cp", divisor = 64)
          s.read.parquet(gold)
            .write.mode("overwrite").parquet(s"$base/final")
        }
        s.read.parquet(s"$base/final").select(col("chunk"), col("rep"))
      },
      Some("""WITH aug AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 200000, 'Za' || replace(text, ' ', '')
             |  FROM documents WHERE doc_id < 40),
             |cuts AS (SELECT doc_id, i
             |      FROM aug, unnest(generate_series(16, len(text))) AS u(i)
             |      WHERE (('0x' || substring(md5(substring(text, i - 15, 16)),
             |          1, 15))::BIGINT % 64) = 0),
             |starts AS (SELECT doc_id, 1 AS start FROM aug
             |           UNION ALL
             |           SELECT doc_id, i + 1 AS start FROM cuts),
             |g AS (SELECT s.doc_id,
             |        substring(a.text, s.start,
             |          coalesce(lead(s.start) OVER (PARTITION BY s.doc_id
             |              ORDER BY s.start),
             |            len(a.text) + 1) - s.start) AS chunk
             |      FROM starts s JOIN aug a USING (doc_id)
             |      WHERE s.start <= len(a.text)),
             |q AS (SELECT doc_id, chunk FROM g WHERE len(chunk) >= 16)
             |SELECT chunk, min(doc_id) AS rep FROM q GROUP BY 1""".stripMargin)),

    // Streaming ExactSubstr registry gold (r15 VERDICT #5: the gram
    // registry was the last mergeable incremental family without a
    // streaming serve). The SAME frozen ∪ delta corpus as
    // d_exact_substr_incremental — originals, %97 planted clones, two
    // reversed-word copies of each %113 doc — split across THREE feed
    // files by doc_id % 3 (a clone's +1e9/+1.2e9/+1.3e9 offset shifts
    // its residue, so clone and original genuinely land in different
    // micro-batches) and folded through streamFoldGold with the
    // retro-mark merge: counts add per gram, and a side that held a
    // gram's only occurrence marks it the moment the merged count
    // reaches 2. Graded against the batch every-offset replay over the
    // whole corpus — bit-equality with the one-batch build IS the
    // contract, exactly like the other streaming golds.
    GraftQuery("w_stream_exactsubstr_gold",
      (s, dir) => {
        val (finalPath, _) = streamExactSubstrBase(s, dir)
        val g = s.read.parquet(finalPath)
        Dedup.exactSubstrCoverageFromMarks(
          g.filter(col("kind") === "doc")
            .select(col("doc_id"), col("n_tokens"), col("quarantined")),
          g.filter(col("kind") === "mark")
            .select(col("doc_id"), col("pos")),
          minLen = 25)
      },
      Some(s"""WITH $IncrCorpusCte,
             |d AS (SELECT doc_id, string_split(text, ' ') AS w
             |      FROM corpus),
             |t AS (SELECT doc_id, length(w)::BIGINT AS n_tokens, w FROM d),
             |el AS (SELECT * FROM t WHERE n_tokens < 1048576),
             |occ AS (SELECT doc_id, n_tokens, i::BIGINT AS pos,
             |          md5(array_to_string(w[i:i+24], ' ')) AS h
             |        FROM el, unnest(generate_series(1,
             |          greatest(length(w) - 24, 0))) AS u(i)),
             |dup AS (SELECT h FROM occ GROUP BY h HAVING count(*) >= 2),
             |spans AS (
             |  SELECT doc_id, pos,
             |    greatest(0, pos + 25 - greatest(coalesce(
             |      max(pos + 25) OVER (PARTITION BY doc_id ORDER BY pos
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |      0), pos)) AS adds
             |  FROM occ JOIN dup USING (h)),
             |pd AS (SELECT doc_id, count(*) AS n_dup_starts,
             |         sum(adds) AS covered
             |       FROM spans GROUP BY doc_id)
             |SELECT t.doc_id, t.n_tokens,
             |       CASE WHEN t.n_tokens >= 1048576 THEN NULL
             |            ELSE coalesce(pd.n_dup_starts, 0) END::BIGINT
             |         AS n_dup_starts,
             |       CASE WHEN t.n_tokens >= 1048576 THEN NULL
             |            ELSE coalesce(pd.covered, 0) END::BIGINT
             |         AS covered_tokens,
             |       CASE WHEN t.n_tokens >= 1048576 THEN NULL
             |            ELSE coalesce(pd.covered, 0) * 1000000 // t.n_tokens
             |            END::BIGINT AS dup_frac_micro,
             |       (t.n_tokens >= 1048576) AS quarantined
             |FROM t LEFT JOIN pd USING (doc_id)""".stripMargin)),

    // TRIM serve from the STREAMING gold (the fold symmetry: coverage
    // AND trimmed text both servable from the streamed state, like the
    // incremental pair). Shares the stream build with
    // w_stream_exactsubstr_gold (same Scratch base — buildOnce
    // amortizes the 3-batch fold once per JVM); serves
    // exactSubstrTrimFromMarks over the gold's marks. Bit-equal to the
    // batch trim over the whole corpus, the d_exact_substr_incr_trim
    // oracle on the same corpus.
    GraftQuery("w_stream_exactsubstr_trim",
      (s, dir) => {
        val (finalPath, corpus) = streamExactSubstrBase(s, dir)
        val g = s.read.parquet(finalPath)
        Dedup.exactSubstrTrimFromMarks(corpus, col("doc_id"),
          col("text"),
          g.filter(col("kind") === "mark")
            .select(col("doc_id"), col("pos")),
          minLen = 25)
      },
      Some(s"""WITH $IncrCorpusCte,
             |d AS (SELECT doc_id, string_split(text, ' ') AS w
             |      FROM corpus),
             |t AS (SELECT doc_id, length(w)::BIGINT AS n_tokens, w FROM d),
             |el AS (SELECT * FROM t WHERE n_tokens < 1048576),
             |occ AS (SELECT doc_id, i::BIGINT AS pos,
             |          md5(array_to_string(w[i:i+24], ' ')) AS h
             |        FROM el, unnest(generate_series(1,
             |          greatest(length(w) - 24, 0))) AS u(i)),
             |dup AS (SELECT h FROM occ GROUP BY h HAVING count(*) >= 2),
             |cov AS (SELECT DISTINCT o.doc_id, u.t::BIGINT AS t
             |        FROM occ o JOIN dup USING (h),
             |             unnest(generate_series(o.pos, o.pos + 24)) AS u(t)),
             |tok AS (SELECT doc_id, i::BIGINT AS t, w[i] AS tok
             |        FROM el, unnest(generate_series(1, length(w))) AS u(i)),
             |kept AS (SELECT k.doc_id, count(*) AS n_kept,
             |           string_agg(k.tok, ' ' ORDER BY k.t) AS txt
             |         FROM (SELECT tok.* FROM tok LEFT JOIN cov
             |                 ON cov.doc_id = tok.doc_id AND cov.t = tok.t
             |               WHERE cov.doc_id IS NULL) k
             |         GROUP BY k.doc_id)
             |SELECT t.doc_id, t.n_tokens,
             |       CASE WHEN t.n_tokens >= 1048576 THEN NULL
             |            ELSE t.n_tokens - coalesce(k.n_kept, 0) END::BIGINT
             |         AS n_removed,
             |       CASE WHEN t.n_tokens >= 1048576 THEN NULL
             |            ELSE coalesce(k.txt, '') END AS trimmed_text,
             |       (t.n_tokens >= 1048576) AS quarantined
             |FROM t LEFT JOIN kept k ON k.doc_id = t.doc_id""".stripMargin)),

    // Streaming exact dedup (§2.9 × the dedup family): the events feed
    // replayed as JSONL with every event_id ≡ 0 (mod 7) row duplicated
    // into a SECOND feed file, streamed through
    // `dropDuplicatesWithinWatermark(event_id)` with `maxFilesPerTrigger
    // 1` — the duplicate provably arrives in a LATER micro-batch, so
    // suppression happens in the state store across batches, not inside
    // one batch's local distinct. The watermark delay (100 years here)
    // spans the whole bounded feed; production picks the upstream
    // replay/retry horizon instead, which is what bounds state. Oracle:
    // the events table itself — event_id is unique at the source, so
    // first-arrival dedup must reproduce it exactly.
    GraftQuery("d_stream_dedup",
      (s, dir) => {
        val base = Scratch.dir("stream_dedup", dir)
        val ev = Tables.events(s, dir)
        val fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
        Scratch.buildOnce(base) {
          Scratch.dumpJsonl(ev, s"$base/stage1", s"$base/src", "ev_", fmt)
          Scratch.dumpJsonl(ev.filter(col("event_id") % 7 === 0),
            s"$base/stage2", s"$base/src", "zz_dup_", fmt)
          graft.streaming.StreamDedup.streamDedupToParquet(
            s, s"$base/src", ev, s"$base/out", s"$base/cp",
            Seq("event_id"), watermarkDelay = "36500 days",
            readOptions = Map("timestampFormat" -> fmt))
        }
        s.read.parquet(s"$base/out")
          .select(col("event_id"), col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("ts_us"))
      },
      Some("""SELECT event_id, user_id, event_type,
             |       epoch_us(ts) AS ts_us
             |FROM events""".stripMargin)),

    // CHAINED stateful streaming (§2.9): dedup → tumbling-day histogram in
    // ONE streaming query (multiple stateful operators, append mode) —
    // the full ingest shape: redelivered events suppressed by the first
    // state store, the surviving rows rolled into the reference's
    // date-histogram by the second, no intermediate table between them.
    // Feed: all events, then every event_id ≡ 0 (mod 7) replayed in a
    // LATER micro-batch (cross-batch dedup state), then a far-future
    // sentinel that advances the watermark past every real window end so
    // append mode flushes them all. The 60-day delay keeps the replay
    // batch inside the watermark (events span one month) while letting
    // the sentinel finalize; the sentinel's own window is filtered out.
    // Oracle: event_id is unique at the source, so the whole pipeline
    // must reproduce the plain per-day histogram exactly.
    GraftQuery("w_stream_dedup_agg",
      (s, dir) => {
        val base = Scratch.dir("stream_dedup_agg", dir)
        val ev = Tables.events(s, dir)
        val fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
        Scratch.buildOnce(base) {
          Scratch.dumpJsonl(ev, s"$base/stage1", s"$base/src", "ev_", fmt)
          Scratch.dumpJsonl(ev.filter(col("event_id") % 7 === 0),
            s"$base/stage2", s"$base/src", "mm_dup_", fmt)
          val sentinel = s.sql(
            """SELECT CAST(-1 AS BIGINT) AS event_id,
              |       TIMESTAMP '2024-12-31 00:00:00' AS ts,
              |       CAST(-1 AS BIGINT) AS user_id,
              |       'sentinel' AS event_type,
              |       CAST(0.0 AS DOUBLE) AS value, '' AS props""".stripMargin)
            .select(ev.columns.map(col).toSeq: _*)
          Scratch.dumpJsonl(sentinel, s"$base/stage3", s"$base/src", "zz_", fmt)
          graft.streaming.StreamDedup.streamDedupAggToParquet(
            s, s"$base/src", ev, s"$base/out", s"$base/cp",
            Seq("event_id"), watermarkDelay = "60 days",
            windowLength = "1 day",
            readOptions = Map("timestampFormat" -> fmt))
        }
        s.read.parquet(s"$base/out")
          .filter(col("event_type") =!= "sentinel")
          .select(unix_micros(col("window_start")).as("window_start_us"),
            col("event_type"), col("n_events"))
      },
      Some("""SELECT epoch_us(date_trunc('day', ts)) AS window_start_us,
             |       event_type, count(*) AS n_events
             |FROM events GROUP BY 1, 2""".stripMargin)),
  )
}
