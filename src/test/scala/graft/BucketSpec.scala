package graft

import org.apache.spark.sql.functions._

/** Co-located joins via bucketing (SCALE.md): pre-bucketing both fact
  * tables on the join key removes the per-query shuffle entirely — the
  * 100 TB answer for the recurring orders⋈lineitem join shape. */
class BucketSpec extends SparkSpec {

  test("bucketed fact-fact join plans without an exchange") {
    // (warehouse dir is set statically in SparkSpec)
    // AQE would coalesce/broadcast at this tiny SF and hide the effect
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    Tables.orders(spark, testDataDir)
      .write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("orders_b")
    Tables.lineitem(spark, testDataDir)
      .write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("lineitem_b")

    val joined = spark.table("orders_b")
      .join(spark.table("lineitem_b"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_quantity")).as("qty"))

    val plan = joined.queryExecution.executedPlan.toString
    // join reads co-located buckets: no Exchange below the join
    val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
    assert(!joinPart.contains("Exchange hashpartitioning(o_orderkey"))
    assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey"))
    assert(plan.contains("SelectedBucketsCount"))

    // and it still computes the right thing
    val viaBuckets = joined.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val direct = Tables.orders(spark, testDataDir)
      .join(Tables.lineitem(spark, testDataDir),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_quantity")).as("qty"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(viaBuckets.keySet == direct.keySet)
    assert(viaBuckets.forall { case (k, v) => math.abs(v - direct(k)) < 1e-6 })

    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
  }
}
