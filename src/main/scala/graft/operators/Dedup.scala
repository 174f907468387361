package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-scale training-data deduplication operators: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard. These extend the reference's surface (its
  * only dedup is id-equality anti-joins, `metricsdatabase.py:1264-1319`) to
  * what a 100 TB corpus pipeline needs.
  *
  * Hashing discipline: every hash is derived from md5 so the DuckDB oracle
  * can reproduce values bit-for-bit (`conv(substring(md5(x),1,15),16,10)` =
  * 60-bit positive long). Swap `hash60` for `xxhash64` in production — same
  * plan shape, ~10× cheaper per shingle.
  *
  * Scale notes: every operator is a pure column pipeline until the one
  * shuffle it genuinely needs — exact dedup shuffles on the content hash,
  * LSH shuffles on band keys (candidates only; never the full n² cross
  * join), SimHash emits one 64-bit value per doc. The pairwise Jaccard
  * verifier runs only on LSH candidates.
  */
object Dedup {

  /** 60-bit positive hash reproducible in ANSI SQL: md5 → 15 hex chars → long. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Distinct word n-gram shingles of a whitespace-tokenized text column.
    * Guarded for short docs (Spark's `sequence(1,0)` counts *down*). */
  def shingles(text: Column, n: Int): Column = {
    val w = split(text, " ")
    when(size(w) >= n,
      array_distinct(transform(sequence(lit(1), size(w) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(w, i + k)): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact dedup: group by content hash, keep the smallest id as canonical.
    * One shuffle on the (high-cardinality, skew-free) hash. */
  def exactDedup(df: DataFrame, id: Column, content: Column): DataFrame =
    df.groupBy(md5(content).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min(id).as("keep_id"))

  /** MinHash signature: `numHashes` minima over salted shingle hashes,
    * as one array column. */
  def minhashSignature(shinglesCol: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      j => array_min(transform(shinglesCol,
        s => hash60(concat(s, lit("|"), j)))))

  /** LSH banding: band keys from a minhash signature (`bands` bands of
    * `rowsPerBand` rows). Docs sharing any band key become candidates. */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => concat_ws(":", b +:
        (1 to rowsPerBand).map(r => element_at(sig, b * rowsPerBand + r)): _*))

  /** Full MinHash+LSH near-dup pipeline over (id, text): candidate pairs via
    * band-key self-join, then exact Jaccard verification on shingle sets,
    * keeping pairs with jaccard >= threshold.
    *
    * Plan: shingle+signature projection (codegen, no shuffle) → explode
    * bands → self-join shuffled on band_key (candidates only) → distinct →
    * two broadcast-or-shuffle joins to fetch shingle sets → verify filter.
    */
  def minhashLshPairs(df: DataFrame, id: Column, text: Column,
                      shingleSize: Int = 3, numHashes: Int = 8,
                      bands: Int = 4, threshold: Double = 0.5): DataFrame = {
    val base = df.select(id.as("doc_id"),
      shingles(text, shingleSize).as("sh"))
    val withBands = base
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
      .select(col("doc_id"),
        explode(bandKeys(col("sig"), bands, numHashes / bands)).as("band_key"))
    val cands = withBands.as("a")
      .join(withBands.as("b"), col("a.band_key") === col("b.band_key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .distinct()
    val si = base.select(col("doc_id").as("i"), col("sh").as("sh_i"))
    val sj = base.select(col("doc_id").as("j"), col("sh").as("sh_j"))
    cands.join(si, "i").join(sj, "j")
      .withColumn("jac", jaccard(col("sh_i"), col("sh_j")))
      .filter(col("jac") >= threshold)
      .select(col("i"), col("j"), col("jac"))
  }

  /** Exact Jaccard similarity of two set-valued (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_distinct(concat(a, b))).cast("double")

  /** SimHash (60-bit, md5-derived): per bit position, sum +1/-1 over token
    * hashes; the bit is set when the sum is positive. One value per doc, no
    * shuffle — near-dup candidates then cluster by hamming distance.
    * Written as a SQL expression because `>>`/`&` accept column shift
    * amounts in SQL where the Scala functions API takes only Int literals.
    * Input: a tokens array column named `toksField`; returns BIGINT. */
  def simhashExpr(toksField: String): Column = expr(
    s"""aggregate(
       |  transform(sequence(0, 59), j ->
       |    IF(aggregate(transform($toksField,
       |          t -> conv(substring(md5(t), 1, 15), 16, 10)),
       |        0L,
       |        (acc, h) -> acc + IF(((cast(h AS BIGINT) >> j) & 1) = 1, 1L, -1L)) > 0,
       |      shiftleft(1L, j), 0L)),
       |  0L, (acc, x) -> acc + x)""".stripMargin)
}
