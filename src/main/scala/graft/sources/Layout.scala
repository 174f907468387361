package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout optimization: Z-order (Morton) clustering, so parquet
  * row-group min/max statistics stay selective on EVERY clustered column —
  * not just the leading sort key. The 100 TB payoff: a point/range filter
  * on any clustered column skips most files and row groups at scan time,
  * the same mechanism behind Delta/Iceberg `OPTIMIZE ZORDER BY`.
  *
  * All pure column arithmetic (the same interleaved-bit discipline as
  * `Enrich.geohash`): min/max normalization to `bits`-bit integers, then
  * bit interleaving — no UDF, fully codegen'd. The min/max stats come from
  * ONE tiny one-row aggregate (broadcast), the standard pre-pass any
  * layout optimizer runs.
  */
object Layout {

  /** Morton key of `cols` (numeric): each column normalized to
    * [0, 2^bits) by its [lo, hi] bound columns, then bit j of column i
    * interleaved into position `j * n + i`. `n * bits` must fit a long. */
  private[sources] def mortonKey(cols: Seq[(Column, Column, Column)],
                                 bits: Int): Column = {
    val n = cols.size
    require(n * bits <= 62, s"$n cols × $bits bits overflows a long")
    val scaled = cols.map { case (c, lo, hi) =>
      // degenerate range → 0; else scale into [0, 2^bits - 1]
      when(hi === lo, lit(0L)).otherwise(
        least(greatest(
          floor((c.cast("double") - lo) / (hi - lo) * ((1L << bits) - 1)),
          lit(0.0)), lit(((1L << bits) - 1).toDouble)).cast("long"))
    }
    (0 until bits).flatMap { j =>
      scaled.zipWithIndex.map { case (v, i) =>
        shiftleft(shiftright(v, j).bitwiseAND(1L), j * n + i).cast("long")
      }
    }.reduce(_ + _)
  }

  /** Hilbert key of two numeric columns, normalized to [0, 2^bits) by
    * their [lo, hi] bounds exactly like [[mortonKey]], then mapped
    * through the native [[graft.plans.HilbertIndexExpr]]. Same
    * clustered-write contract as the Morton key with strictly better
    * locality (consecutive keys are grid-adjacent — see the expression
    * scaladoc); 2-D only, which is the shipped layouts' shape.
    * Callers must have [[graft.plans.GraftFunctions.register]] applied. */
  private[sources] def hilbertKey(xc: (Column, Column, Column),
                                  yc: (Column, Column, Column),
                                  bits: Int): Column = {
    require(bits >= 1 && bits <= 31)
    def scale(t: (Column, Column, Column)): Column = t match {
      case (c, lo, hi) =>
        when(hi === lo, lit(0L)).otherwise(
          least(greatest(
            floor((c.cast("double") - lo) / (hi - lo) * ((1L << bits) - 1)),
            lit(0.0)), lit(((1L << bits) - 1).toDouble)).cast("long"))
    }
    call_function("graft_hilbert", scale(xc), scale(yc), lit(bits))
  }

  /** Small-file compaction planning — the recurring lakehouse maintenance
    * job (Delta/Iceberg OPTIMIZE bin-packing): assign each input object a
    * compaction bin of ~`targetBytes` by deterministic sequential packing
    * in id order (bin = exclusive running size ÷ target; the file that
    * straddles a boundary spills into the earlier bin, as streaming
    * packers do). The running sum is the two-level distributed prefix sum
    * from `Sampling.budgetSelect` — per-id-range totals become exclusive
    * offsets via a window over the TINY range domain, then each range
    * cumulates internally in parallel — so no corpus-sized single-
    * partition sort exists at any inventory size. All-integer arithmetic;
    * the oracle replays it with one window.
    *
    * @return (file_id, bytes, bin).
    */
  def compactionPlan(files: DataFrame, id: Column, bytes: Column,
                     targetBytes: Long, idRange: Long = 1024): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(targetBytes > 0 && idRange > 0,
      "compactionPlan: target and id range must be positive")
    val base = files.select(id.cast("long").as("file_id"),
      bytes.cast("long").as("bytes"))
    val ranged = base.withColumn("rng", expr(s"file_id div ${idRange}L"))
    val offW = Window.orderBy(col("rng").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy(col("rng"))
      .agg(sum(col("bytes")).as("rtot"))
      .withColumn("roffset", coalesce(sum(col("rtot")).over(offW), lit(0L)))
      .select(col("rng"), col("roffset"))
    val inW = Window.partitionBy(col("rng"))
      .orderBy(col("file_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged.join(broadcast(offsets), Seq("rng"))
      .withColumn("cum_before",
        col("roffset") + coalesce(sum(col("bytes")).over(inW), lit(0L)))
      .select(col("file_id"), col("bytes"),
        expr(s"cum_before div ${targetBytes}L").as("bin"))
  }

  /** Write `df` clustered by the Z-order of `clusterCols` into `numFiles`
    * range-partitioned, internally sorted files. Each output file covers a
    * compact Morton range, so its footer min/max on every clustered column
    * is narrow — filters on any of them prune files AND row groups. */
  def writeZOrdered(df: DataFrame, outPath: String, clusterCols: Seq[String],
                    numFiles: Int, bits: Int = 16): Unit = {
    val statExprs = clusterCols.flatMap(c => Seq(
      min(col(c)).cast("double").as(s"${c}_min"),
      max(col(c)).cast("double").as(s"${c}_max")))
    val statsRow = df.agg(statExprs.head, statExprs.tail: _*)
    val key = mortonKey(clusterCols.map(c =>
      (col(c), col(s"${c}_min"), col(s"${c}_max"))), bits)
    df.crossJoin(broadcast(statsRow))
      .withColumn("_zkey", key)
      .repartitionByRange(numFiles, col("_zkey"))
      .sortWithinPartitions(col("_zkey"))
      .select(df.columns.map(col): _*)
      .write.mode("overwrite").parquet(outPath)
  }

  /** Rendezvous (highest-random-weight) shard assignment: the key goes to
    * the shard whose `hash(key:shard)` scores highest. The property that
    * makes this THE serving-layout hash (vs `key % N`): growing N → N+1
    * moves only the keys the NEW shard wins — expected 1/(N+1) of them —
    * where modulo reshuffles nearly everything. That is the index-shard /
    * cache-node assignment every serving tier in front of this engine
    * needs (the reference spreads load with fixed HTTP fan-out widths;
    * rendezvous is the principled version).
    *
    * Pure constant-folded column arithmetic — N hashes + an array_max per
    * row, zero shuffles, codegen'd via the native [[graft.operators.Dedup.hash60]].
    * md5-derived so an ANSI-SQL oracle replays the exact assignment.
    * Ties are md5 collisions — ignored by construction. */
  def rendezvousShard(id: Column, numShards: Int): Column = {
    require(numShards >= 1)
    val scored = array((0 until numShards).map(sh =>
      struct(graft.operators.Dedup.hash60(
        concat(id.cast("string"), lit(":"), lit(sh))).as("h"),
        lit(sh).as("shard"))): _*)
    array_max(scored).getField("shard")
  }

  /** Range-partition PLAN from exact order statistics: boundaries at the
    * exact i/numBuckets quantiles of an integral sort column (computed
    * by [[graft.operators.Sketches.orderStatistics]]' distributed
    * quickselect — a few narrow partial-agg passes, never a global
    * sort), then the per-bucket audit: row count, value bounds and the
    * exact fill ratio vs the balanced target. This is the deterministic
    * replacement for `repartitionByRange`'s reservoir sampling when a
    * sorted layout is a CONTRACT, not a hint: Spark's sampled
    * boundaries drift run-to-run (and with partition layout), so two
    * daily writes of the same data can split at different keys —
    * deadly for incremental range-clustered tables (Z-order's
    * [[writeZOrdered]] sidesteps keys entirely; this is the
    * single-dimension sibling where range predicates must prune
    * file-level min/max exactly). At 100 TB: boundaries cost ≤ 6
    * passes of bounded-state aggregation on the sort column only,
    * assignment is a broadcast-free constant-folded comparison chain,
    * the audit one partial-agged exchange. Rows equal to a boundary
    * value close the LOWER bucket (`v > b` comparisons), so duplicate
    * heavy keys surface as over-full buckets in `fill_micro` instead
    * of silently splitting a key across files.
    *
    * @param value integral sort column (cast to long; callers floor
    *              doubles explicitly so both engines truncate alike).
    * @return one row per non-empty bucket: (bucket, n_rows, lo, hi,
    *         fill_micro = n_rows·numBuckets·10⁶ div N).
    */
  def rangePartitionPlan(df: DataFrame, value: Column,
                         numBuckets: Int): DataFrame = {
    require(numBuckets >= 2)
    val vv = df.select(value.cast("long").as("v"))
      .filter(col("v").isNotNull)
      .localCheckpoint(false) // the count job materializes it; the
    // quickselect passes and the final bucket agg reuse the blocks
    val n = vv.count()
    require(n >= numBuckets, s"need at least $numBuckets rows, got $n")
    val ranks = (1 until numBuckets)
      .map(i => math.ceil(i.toDouble / numBuckets * n).toLong.max(1L))
    val bounds = graft.operators.Sketches.orderStatistics(vv, col("v"), ranks)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bucket = ranks.map(bounds)
      .foldLeft(lit(0L)) { (acc, b) =>
        acc + when(col("v") > lit(b), lit(1L)).otherwise(lit(0L))
      }
    vv.groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n_rows"), min(col("v")).as("lo"),
        max(col("v")).as("hi"))
      // DECIMAL(38,0) intermediates: n_rows·numBuckets·10⁶ overflows
      // Long once n_rows·numBuckets passes ~9.2e12 — a skewed bucket on
      // a multi-trillion-row table, inside this operator's claimed
      // scale — and would silently go negative (r10 ADVICE). The `div`
      // result is re-cast to BIGINT so the output schema is unchanged.
      .withColumn("fill_micro",
        expr(s"cast(cast(n_rows as decimal(38,0)) * $numBuckets" +
          s" * 1000000 div ${n}L as bigint)"))
  }
}
