package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant aggregation (SURVEY.md §7.2 step 10: "salting for skew").
  *
  * A plain `groupBy(key).agg(countDistinct(v))` expands to a two-shuffle
  * plan keyed by (key, v) then (key) — correct, but a single hot key still
  * lands every one of its distinct values' partial rows on one reducer in
  * phase 2's expand. Salting by `hash(v) % buckets` splits a hot key's work
  * across `buckets` reducers and stays EXACT: distinct values partition
  * cleanly by their own hash, so per-bucket distinct counts sum to the true
  * distinct count.
  *
  * AQE's skew-join handling (on by default) covers joins; this covers the
  * aggregation side, where AQE cannot split a group.
  */
object Skew {

  /** Exact count-distinct + count per key, salted across `buckets`.
    * Output: (key columns..., unique_count, total_count). */
  def saltedDistinctAgg(df: DataFrame, keys: Seq[Column], valueCol: Column,
                        buckets: Int): DataFrame = {
    val salted = df.groupBy(keys :+ pmod(hash(valueCol), lit(buckets)).as("_salt"): _*)
      .agg(countDistinct(valueCol).as("_pu"), count(lit(1)).as("_pc"))
    val keyNames = salted.columns.dropRight(3) // keys keep their output names
    salted.groupBy(keyNames.map(col): _*)
      .agg(sum(col("_pu")).as("unique_count"),
        sum(col("_pc")).as("total_count"))
  }

  /** Exact skew-resistant equi-join: the large side gets a random-free
    * DETERMINISTIC salt (hash of a high-cardinality discriminator column),
    * the small side is replicated `buckets` times, and the join key becomes
    * (key, salt) — a hot key's rows spread across `buckets` reducers
    * instead of one. Use when AQE's runtime skew split can't apply (e.g.
    * the skewed side feeds a co-partitioned downstream op, or the join is
    * inside a checkpointed iteration AQE can't replan).
    *
    * @param discriminator high-cardinality column on `large` that decides
    *   the salt — deterministic, so retries/speculation stay consistent.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 discriminator: Column, buckets: Int): DataFrame = {
    val saltedLarge = large.withColumn("_salt",
      pmod(hash(discriminator), lit(buckets)))
    val saltedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedLarge.join(saltedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
