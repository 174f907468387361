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

  test("z-ordered layout narrows per-file min/max on BOTH clustered columns") {
    import graft.sources.Layout
    val ev = Tables.events(spark, testDataDir)
      .select("event_id", "user_id", "value")
    val out = java.nio.file.Files
      .createTempDirectory("graft_zorder").toString + "/z"
    Layout.writeZOrdered(ev, out, Seq("user_id", "value"), numFiles = 8)

    val back = spark.read.parquet(out)
    // data parity: clustering is a layout change, never a data change
    assert(back.count() == ev.count())
    assert(back.agg(sum("event_id")).head().getLong(0) ==
      ev.agg(sum("event_id")).head().getLong(0))

    // per-file spread of each clustered column vs its global spread: a
    // z-ordered file covers a compact Morton range, so BOTH columns'
    // footer ranges must be materially narrower than the whole table's —
    // that narrowing is exactly what row-group/file skipping prunes on
    def spreads(df: org.apache.spark.sql.DataFrame, c: String): Seq[Double] =
      df.groupBy(input_file_name())
        .agg((max(col(c)).cast("double") - min(col(c)).cast("double"))
          .as("spread"))
        .collect().map(_.getDouble(1)).toSeq
    val global = ev.agg(
      (max(col("user_id")) - min(col("user_id"))).cast("double"),
      (max(col("value")) - min(col("value"))).cast("double")).head()
    val uSpread = spreads(back, "user_id").sum / 8 / global.getDouble(0)
    val vSpread = spreads(back, "value").sum / 8 / global.getDouble(1)
    assert(uSpread < 0.8, s"user_id avg file spread $uSpread of global")
    assert(vSpread < 0.8, s"value avg file spread $vSpread of global")
    // and a single-column sort can NOT deliver that: sorting by user_id
    // alone leaves value's per-file spread at ~the full range
    val sortedOut = out + "_sorted"
    ev.repartitionByRange(8, col("user_id"))
      .sortWithinPartitions("user_id")
      .write.mode("overwrite").parquet(sortedOut)
    val sortedBack = spark.read.parquet(sortedOut)
    val vSortedSpread = spreads(sortedBack, "value").sum / 8 / global.getDouble(1)
    assert(vSpread < vSortedSpread,
      s"z-order value spread $vSpread !< single-sort $vSortedSpread")
  }

  test("graded z-order slice pushes both filters and can skip files") {
    // run the graded query once — builds the 16-file z-ordered layout
    val df = SparkEntry.queries("s2_zorder_slice")(spark, testDataDir)
    assert(df.count() > 0)
    // both range predicates must reach the parquet reader, where footer
    // min/max stats turn them into row-group/file skips (read from the
    // scan node's metadata — the rendered plan truncates the filter list)
    // (sparkPlan, not executedPlan: AQE's adaptive root hides its inner
    // tree from collect; pushdown is identical in both)
    val pushed = df.queryExecution.sparkPlan.collect {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec =>
        sc.metadata("PushedFilters")
    }.mkString
    assert(pushed.contains("GreaterThanOrEqual(user_id,3)") &&
      pushed.contains("LessThanOrEqual(user_id,7)"),
      s"user_id range not pushed: $pushed")
    assert(pushed.contains("GreaterThanOrEqual(value,50.0)") &&
      pushed.contains("LessThanOrEqual(value,200.0)"),
      s"value range not pushed: $pushed")
    // and the layout makes those stats selective: fewer files overlap the
    // two-column slice than were written — the reader skips the rest
    // entirely (their min/max ranges exclude the predicate box)
    val path = graft.queries.Scratch.dir("zorder", testDataDir)
    val perFile = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min(col("user_id")).as("ulo"), max(col("user_id")).as("uhi"),
        min(col("value")).as("vlo"), max(col("value")).as("vhi"))
      .collect()
    assert(perFile.length == 16, s"expected 16 files, got ${perFile.length}")
    val overlapping = perFile.count(r =>
      r.getLong(1) <= 7 && r.getLong(2) >= 3 &&
        r.getDouble(3) <= 200.0 && r.getDouble(4) >= 50.0)
    assert(overlapping < perFile.length,
      s"slice overlaps all $overlapping/${perFile.length} files — no skip possible")
    assert(overlapping <= perFile.length / 2,
      s"slice overlaps $overlapping/${perFile.length} files — clustering too loose")
  }

  test("compaction plan matches a sequential fold, any id-range width") {
    import graft.sources.Layout
    val docs = Tables.documents(spark, testDataDir)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    // reference: one sequential pass
    val target = 2000L
    var cum = 0L
    val want = docs.map { case (id, sz) =>
      val bin = cum / target; cum += sz; (id, bin)
    }.toMap
    // the distributed plan must agree for ANY range width (the two-level
    // decomposition is an implementation detail, not a semantic knob)
    for (rng <- Seq(1L, 7L, 64L, 100000L)) {
      val got = Layout.compactionPlan(
        Tables.documents(spark, testDataDir), col("doc_id"), col("n_chars"),
        targetBytes = target, idRange = rng)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      assert(got == want, s"idRange=$rng diverges from sequential fold")
    }
    // bins are contiguous and only ever overflow by one straddling file
    val sizes = docs.map { case (id, sz) => (want(id), sz) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
    val maxFile = docs.map(_._2).max
    assert(sizes.values.forall(_ < target + maxFile))
    assert(sizes.keys.max.toInt + 1 == sizes.size) // no empty bin
  }
}
