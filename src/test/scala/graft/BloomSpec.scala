package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Bloom-prefiltered decontamination: Spark's runtime-filter kernel
  * (BloomFilterAggregate build + might_contain probe) wrapped as the
  * benchmark-too-big-to-broadcast hygiene pass. The confirm join must make
  * the output bit-identical to the exact path for ANY sketch size.
  */
class BloomSpec extends SparkSpec {

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "n_shared_ngrams", "contaminated")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .sortBy(_._1).toSeq

  test("bloom path is bit-identical to the exact path") {
    val docs = Tables.documents(spark, testDataDir)
    val corpus = docs.filter(col("doc_id") % 7 =!= 0)
    val bench = docs.filter(col("doc_id") % 7 === 0)
    val exact = canon(Dedup.decontaminationFlags(
      corpus, bench, col("doc_id"), col("text"), n = 8))
    val bloom = canon(Dedup.bloomDecontaminationFlags(
      corpus, bench, col("doc_id"), col("text"), n = 8))
    assert(bloom == exact)
    // the planted duplicate structure must actually exercise the hit path
    assert(exact.exists(_._3), "no contaminated doc — test corpus too clean")
  }

  test("a deliberately undersized sketch still yields exact output") {
    // tiny sketch → high FP rate → the confirm join does real work
    val docs = Tables.documents(spark, testDataDir)
    val corpus = docs.filter(col("doc_id") % 7 =!= 0)
    val bench = docs.filter(col("doc_id") % 7 === 0)
    val exact = canon(Dedup.decontaminationFlags(
      corpus, bench, col("doc_id"), col("text"), n = 8))
    val bloom = canon(Dedup.bloomDecontaminationFlags(
      corpus, bench, col("doc_id"), col("text"), n = 8, numBits = 64))
    assert(bloom == exact)
  }

  test("empty benchmark flags nothing") {
    val docs = Tables.documents(spark, testDataDir)
    val out = canon(Dedup.bloomDecontaminationFlags(
      docs, docs.filter(lit(false)), col("doc_id"), col("text"), n = 8))
    assert(out.nonEmpty)
    assert(out.forall(r => r._2 == 0L && !r._3))
  }

  test("leakage-safe split never separates a near-dup family") {
    val docs = Tables.documents(spark, testDataDir)
    val split = Dedup.leakageSafeSplit(docs, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(split.length == docs.count())
    // every member of a rep-group carries the same split
    val byRep = split.groupBy(_._2)
    assert(byRep.forall { case (_, ms) => ms.map(_._3).distinct.length == 1 })
    // and the planted dup families actually exercise the invariant
    assert(byRep.exists(_._2.length > 1), "no multi-doc group in corpus")
    // all three slices exist and train dominates
    val frac = split.groupBy(_._3).view.mapValues(_.length.toDouble / split.length)
    assert(frac.keySet == Set("train", "valid", "test"), frac.toString)
    assert(frac("train") > 0.6 && frac("train") < 0.95, frac.toString)
  }

  test("probe is a codegen'd filter below the first exchange") {
    val docs = Tables.documents(spark, testDataDir)
    val corpus = docs.filter(col("doc_id") % 7 =!= 0)
    val bench = docs.filter(col("doc_id") % 7 === 0)
    graft.plans.GraftFunctions.register(spark)
    val benchSet = bench.select(explode(Dedup.shingles(col("text"), 8)).as("s")).distinct()
    val sketch = benchSet
      .agg(call_function("graft_bloom_agg", xxhash64(col("s")),
        lit(1000L), lit(10000L)).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val probed = corpus
      .select(col("doc_id"), explode(Dedup.shingles(col("text"), 8)).as("s"))
      .where(call_function("graft_bloom_contains", lit(sketch), xxhash64(col("s"))))
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(2000))
    // narrow pipeline: scan → explode → probe, no exchange at all
    assert(!plan.contains("Exchange"), plan.take(2000))
    // and the probe actually passes every true benchmark shingle
    val trueHits = corpus
      .select(col("doc_id"), explode(Dedup.shingles(col("text"), 8)).as("s"))
      .join(benchSet, Seq("s"), "left_semi")
    assert(probed.join(benchSet, Seq("s"), "left_semi").count() == trueHits.count())
  }
}
