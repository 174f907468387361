package graft.queries

import graft.Tables
import graft.operators.Vectors
import org.apache.spark.sql.functions._

/** Embedding similarity-search suite over the `embeddings` table (64-dim
  * float vectors). The oracle SQL reproduces the exact left-to-right double
  * accumulation of [[Vectors.dot]], so cosine values match bit-for-bit.
  */
object VectorQueries {

  /** Oracle fragment: dot(a, b) with strict left-to-right double folding.
    * (Deliberately NOT list_dot_product — its accumulation order is
    * unspecified.) */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(generate_series(1, 64), " +
      s"i -> $a[i]::DOUBLE * $b[i]::DOUBLE), (x, y) -> x + y)"

  val entries: Seq[GraftQuery] = Seq(

    // Brute-force exact cosine top-k: the ANN baseline. Probe side broadcast,
    // corpus scanned once, per-probe heap via window row_number.
    GraftQuery("v_ann_topk",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        Vectors.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
      },
      Some(s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe,
              |             sqrt(${dotSql("embedding", "embedding")}) AS qn
              |           FROM embeddings WHERE vec_id < 10),
              |c AS (SELECT vec_id AS neighbor_id, embedding AS ne,
              |        sqrt(${dotSql("embedding", "embedding")}) AS nn
              |      FROM embeddings),
              |p AS (SELECT query_id, neighbor_id,
              |        ${dotSql("qe", "ne")} / (qn * nn) AS cos
              |      FROM q, c WHERE query_id <> neighbor_id),
              |r AS (SELECT query_id, neighbor_id, cos,
              |        row_number() OVER (PARTITION BY query_id
              |                           ORDER BY cos DESC, neighbor_id) AS rank
              |      FROM p)
              |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id,
              |       round(cos, 6) AS cos
              |FROM r WHERE rank <= 5""".stripMargin)),

    // Exact cosine near-dup pairs (bounded probe set) — the verification
    // baseline for embedding-space dedup.
    GraftQuery("v_embed_neardup",
      (s, dir) => {
        graft.plans.GraftFunctions.register(s)
        val e = Tables.embeddings(s, dir).filter(col("vec_id") < 400)
          .select(col("vec_id"), col("embedding"),
            sqrt(Vectors.dotNative(col("embedding"), col("embedding"))).as("nrm"))
        e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
          .withColumn("cos", Vectors.dotNative(col("a.embedding"), col("b.embedding"))
            / (col("a.nrm") * col("b.nrm")))
          .filter(col("cos") >= 0.35)
          .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"),
            round(col("cos"), 6).as("cos"))
      },
      Some(s"""WITH e AS (SELECT vec_id, embedding,
              |             sqrt(${dotSql("embedding", "embedding")}) AS nrm
              |           FROM embeddings WHERE vec_id < 400),
              |p AS (SELECT a.vec_id AS i, b.vec_id AS j,
              |        ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cos
              |      FROM e a JOIN e b ON a.vec_id < b.vec_id)
              |SELECT i, j, round(cos, 6) AS cos FROM p WHERE cos >= 0.35""".stripMargin)),

    // IVF approximate top-k (rows-only: the centroid refinement isn't
    // ANSI-SQL-expressible; recall vs brute force is spec-tested).
    GraftQuery("v_ivf_topk",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        Vectors.ivfTopK(emb, emb.filter(col("vec_id") < 10), k = 5,
          numClusters = 16, nprobe = 4, dim = 64)
      },
      None),

    // Approximate distinct counting — the ES `cardinality` (HLL) parity
    // path (`metricsreader.py:196-201`). Rows-only: HLL++ sketch values are
    // implementation-defined; the relative-error bound is spec-tested.
    GraftQuery("a1_composite_agg_approx",
      (s, dir) => graft.operators.MetricsKernel.compositeAgg(
        Tables.events(s, dir), col("ts"), "month", Seq(col("event_type")),
        col("event_id"), approx = true),
      None),

    // Product-quantization ADC top-k (rows-only: the Lloyd-refined codebook
    // isn't ANSI-SQL-expressible; recall vs brute force is spec-tested).
    // Codes compress 64 floats → 8 ids; probe-side distance tables make the
    // corpus pass lookup-only.
    GraftQuery("v_pq_topk",
      (s, dir) => {
        graft.plans.GraftFunctions.register(s)
        val emb = Tables.embeddings(s, dir)
        val cents = Vectors.pqCentroids(emb, m = 8, k = 16, dim = 64)
        Vectors.pqAdcTopK(Vectors.pqCodes(emb, cents, dim = 64),
          emb.filter(col("vec_id") < 10), cents, k = 5, dim = 64)
      },
      None),

    // Random-hyperplane LSH bucketing — the scale path: bucket assignment is
    // a pure codegen'd projection (planes constant-folded as literals), so
    // the only shuffle in an LSH near-dup job is on the bucket id.
    GraftQuery("v_lsh_buckets",
      (s, dir) => {
        graft.plans.GraftFunctions.register(s)
        Tables.embeddings(s, dir)
          .select(Vectors.lshBucket(col("embedding"), dim = 64, numPlanes = 8)
            .as("bucket"))
          .groupBy(col("bucket")).agg(count(lit(1)).as("n_vecs"))
      },
      Some("""WITH b AS (
             |  SELECT vec_id,
             |    list_reduce(list_transform(generate_series(0, 7), p ->
             |      CASE WHEN list_reduce(list_transform(generate_series(1, 64), i ->
             |                  embedding[i]::DOUBLE *
             |                    (('0x' || substring(md5(p || ':' || (i-1)), 1, 15))::BIGINT
             |                     / 576460752303423488.0 - 1.0)),
             |                (x, y) -> x + y) > 0
             |           THEN (1::BIGINT << p) ELSE 0::BIGINT END),
             |      (x, y) -> x + y) AS bucket
             |  FROM embeddings)
             |SELECT bucket, count(*) AS n_vecs FROM b GROUP BY 1""".stripMargin)),
  )
}
