package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Catalyst-Expression bridge for the engine's native
  * expressions (`graft.plans.*`). Spark 4's Column wraps a ColumnNode and
  * the conversion helpers (`classic.ExpressionUtils`) are `private[sql]`,
  * so pure Column→Column operators (e.g. `Dedup.hash60`, which has no
  * SparkSession in scope to register a function against) need this
  * one-file shim in the sql package — the same pattern Delta Lake and
  * Frameless use for their native expressions. Everything else in the
  * engine lives under `graft.*`; keep this file to conversions only.
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** EAGER local checkpoint that PRESERVES hash partitioning and sort
    * order on `key` (r17). `Dataset.localCheckpoint` captures the
    * physical plan's outputPartitioning into its LogicalRDD, but under
    * AQE the adaptive plan's partitioning is not final at capture time
    * and comes back unknown — measured: a pre-repartitioned, pre-sorted
    * edge checkpoint still re-exchanged AND re-sorted on EVERY round of
    * an iterative join (plans/r17/pagerank_round_huge.txt, first dump).
    * This shim repartitions to the session's shuffle-partition count
    * with an EXPLICIT numPartitions (REPARTITION_BY_NUM — AQE never
    * coalesces it, so the claimed layout is exact), sorts within
    * partitions, materializes the RDD via localCheckpoint, and wraps it
    * in a LogicalRDD that DECLARES hashpartitioning(key, n) + ascending
    * order — the claim EnsureRequirements needs to skip the per-round
    * exchange and sort on this side of a sort-merge join. The claim is
    * true by construction: `toRdd` executes exactly the
    * repartition+sort plan, and `map(_.copy())` preserves partition
    * boundaries and row order. Release with the same RDD-level
    * unpersist as any localCheckpoint (the plan root is a LogicalRDD).
    */
  def localCheckpointPartitioned(df: Dataset[Row], key: String): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    val n = spark.sessionState.conf.numShufflePartitions
    val pre = df.repartition(n, df(key)).sortWithinPartitions(key)
      .asInstanceOf[classic.DataFrame]
    val qe = pre.queryExecution
    val rdd = qe.toRdd.map(_.copy())
    rdd.localCheckpoint()
    rdd.count()
    val output = qe.analyzed.output
    val attr = output.find(_.name == key).getOrElse(
      throw new IllegalArgumentException(s"no column $key in ${output}"))
    val plan = execution.LogicalRDD(
      output, rdd,
      catalyst.plans.physical.HashPartitioning(Seq(attr), rdd.getNumPartitions),
      Seq(catalyst.expressions.SortOrder(attr,
        catalyst.expressions.Ascending)),
      isStreaming = false)(spark)
    classic.Dataset.ofRows(spark, plan)
  }
}
