package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-size frequency sketches. The reference's aggregation surface is
  * exact (ES terms/cardinality aggs with `MAX_AGGREGATIONS` cranked to
  * "get them all", `metricselasticsearch.py:30`); at 100 TB a "which keys
  * are frequent" question over a billion-key domain needs a sketch phase
  * first so the exact phase only ever touches candidates.
  */
object Sketches {

  /** Heavy hitters via a count-min sketch prefilter with EXACT
    * verification — output is exactly the items whose true count is >=
    * `threshold`, with their true counts (so the result is graded against
    * a plain GROUP BY/HAVING oracle; the sketch changes the cost shape,
    * never the answer).
    *
    * Three phases:
    *  1. Sketch build: one partial-agg shuffle over at most depth*width
    *     cell keys (map-side combine collapses each partition to <=
    *     depth*width rows regardless of input size), collected to the
    *     driver — a bounded model artifact (default 32k longs), same
    *     policy as the k-means centroid collects in Vectors.
    *  2. Candidate filter: every occurrence probes the sketch as a
    *     broadcast literal array — pure codegen'd arithmetic, NO join, NO
    *     shuffle. CMS only ever over-estimates, so the filter keeps a
    *     superset of true heavy-hitter occurrences; with billions of
    *     distinct keys this is the phase that turns "shuffle every
    *     distinct key" into "shuffle only near-threshold keys".
    *  3. Exact count of surviving occurrences (a shuffle bounded by
    *     candidate volume) + re-filter, which removes collision false
    *     positives.
    *
    * @return (item, cnt) for every item with true count >= threshold.
    */
  def heavyHitters(items: DataFrame, item: Column, threshold: Long,
                   depth: Int = 4, width: Int = 8192): DataFrame = {
    require(depth >= 1 && width >= 1 && depth.toLong * width <= (1 << 20),
      s"sketch of $depth x $width cells exceeds the driver-artifact budget")
    val it = items.select(item.as("item"))
    def bucket(d: Int): Column = pmod(hash(col("item"), lit(d)), lit(width))
    val cells = it
      .select(explode(array((0 until depth).map(d =>
        struct(lit(d).as("d"), bucket(d).as("b"))): _*)).as("c"))
      .groupBy(col("c.d").as("d"), col("c.b").as("b"))
      .agg(count(lit(1)).as("cnt"))
      .collect()
    val flat = Array.fill[Long](depth * width)(0L)
    cells.foreach(r =>
      flat(r.getAs[Int]("d") * width + r.getAs[Int]("b")) = r.getAs[Long]("cnt"))
    val sk = typedLit(flat.toSeq)
    val est = least((0 until depth).map(d =>
      element_at(sk, lit(d * width + 1) + bucket(d))): _*)
    it.filter(est >= threshold)
      .groupBy(col("item")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
  }

  /** EXACT order statistics without a global sort — distributed
    * quickselect by iterative histogram refinement. The oracle's natural
    * formulation (`row_number() OVER (ORDER BY v)`) funnels 100 TB
    * through one sort partition; `approx_percentile` avoids that but is
    * approximate. This is the third point: exact values, and every pass
    * is ONE narrow aggregation — per row, at most one (rank, bin) struct,
    * partially aggregated map-side to ≤ ranks × `bins` cells, collected
    * to the driver (bounded model artifact, same policy as the CMS cells
    * above). Each pass shrinks every rank's candidate value range by
    * ×`bins`, so a full 2^62 span pins down in ≤ ceil(62/log2 bins) = 6
    * passes (data-dependent spans finish sooner); the input column is
    * re-scanned per pass — at scale that is a single-column parquet scan,
    * the standard trade against materializing a sorted copy.
    *
    * The production use is threshold computation: quality-score cutoffs,
    * RFM-style segment boundaries, budget knees — computed EXACTLY over
    * the full corpus, then broadcast back as plain compares.
    *
    * @param ranks 1-based order statistics to return (1 = min, n = max).
    * @param bins  histogram resolution per pass (driver holds
    *              ranks × bins cells).
    * @return (rank, value) — `value` is the rank-th smallest, duplicates
    *         counted; input values must be integral (cast upstream;
    *         decimals scale to long, doubles need an order-preserving
    *         long mapping).
    */
  def orderStatistics(df: DataFrame, value: Column, ranks: Seq[Long],
                      bins: Int = 4096): DataFrame = {
    require(ranks.nonEmpty, "no ranks requested")
    require(bins >= 2 && ranks.distinct.size.toLong * bins <= (1 << 22),
      "ranks × bins exceeds the driver-artifact budget")
    val spark = df.sparkSession
    val v = df.select(value.cast("long").as("v"))
      .filter(col("v").isNotNull)
    val head = v.agg(count(lit(1)).as("n"), min(col("v")).as("lo"),
      max(col("v")).as("hi")).head()
    val n = head.getLong(0)
    require(n > 0, "orderStatistics over an empty input")
    ranks.foreach(r => require(r >= 1 && r <= n,
      s"rank $r outside [1, $n]"))
    val (lo0, hi0) = (head.getLong(1), head.getLong(2))
    require(BigInt(hi0) - BigInt(lo0) <= (BigInt(1) << 62),
      "value span exceeds 2^62 — pre-scale the column")
    // per-rank state: candidate range [lo, hi] and the count of rows
    // strictly below lo (already accounted for)
    val distinctRanks = ranks.distinct.sorted
    var state = distinctRanks.map(r => r -> ((lo0, hi0, 0L))).toMap
    // every pass shrinks a span by ×bins, so a 2^62 span needs at most
    // ceil(62 / log2 bins) passes; +2 slack for the ceil'd widths
    val maxPasses = math.ceil(62.0 / (math.log(bins) / math.log(2.0)))
      .toInt + 2
    var guard = 0
    while (state.values.exists { case (lo, hi, _) => lo < hi }) {
      guard += 1
      require(guard <= maxPasses, "orderStatistics failed to converge")
      val active = state.toSeq.filter { case (_, (lo, hi, _)) => lo < hi }
        .sortBy(_._1)
      val widths = active.map { case (_, (lo, hi, _)) =>
        (hi - lo) / bins + 1 } // ceil((hi-lo+1)/bins), span ≤ 2^62 safe
      // one struct per row per COVERING active range (ranges can overlap
      // for nearby ranks); explode + count = one partial-agg shuffle
      // `div` (integral) — Column./ is DOUBLE division, which silently
      // loses exactness past 2^53; lo/width are driver longs, safe to
      // inline as SQL literals
      val cells = v.select(explode(array(active.zipWithIndex.map {
          case ((_, (lo, hi, _)), idx) =>
            expr(s"CASE WHEN v >= $lo AND v <= $hi THEN " +
              s"named_struct('rid', $idx, " +
              s"'bin', (v - ${lo}L) div ${widths(idx)}L) END")
        }: _*)).as("c"))
        .filter(col("c").isNotNull)
        .groupBy(col("c.rid").as("rid"), col("c.bin").as("bin"))
        .agg(count(lit(1)).as("cnt"))
        .collect()
      val hist = cells.groupBy(_.getAs[Int]("rid"))
      state = state ++ active.zipWithIndex.map { case ((r, (lo, hi, below)), idx) =>
        val w = widths(idx)
        val byBin = hist.getOrElse(idx, Array.empty)
          .map(c => c.getAs[Long]("bin") -> c.getAs[Long]("cnt"))
          .sortBy(_._1)
        var cum = below
        val (bin, before) = byBin.iterator.map { case (b, cnt) =>
          val pre = cum; cum += cnt; (b, pre, cum)
        }.collectFirst { case (b, pre, c) if c >= r => (b, pre) }
          .getOrElse(throw new IllegalStateException(
            s"rank $r not found in histogram — non-deterministic input?"))
        val nlo = lo + bin * w
        r -> ((nlo, math.min(hi, nlo + w - 1), before))
      }.toMap
    }
    import spark.implicits._
    ranks.map(r => (r, state(r)._1)).toDF("rank", "value")
  }

  /** Per-GROUP exact discrete quantiles — the grouped sibling of
    * [[orderStatistics]], for "p50/p90 quality threshold PER LANGUAGE /
    * per source" computed exactly over the full corpus. Same iterative
    * histogram refinement, but the active (group, q) candidate ranges
    * live in a small broadcast ranges table joined on the group key, so
    * one pass serves EVERY group simultaneously: per row, one equi-join
    * probe + one (group, q, bin) cell, partially aggregated map-side.
    * Driver state is groups × qs cells per pass — a bounded model
    * artifact (enforced), same policy as the CMS sketch above. Rank rule
    * is ceil(q × n_g) per group (`PERCENTILE_DISC` semantics; n_g = the
    * group's non-null count).
    *
    * @return (group, q, value) for every group × q.
    */
  def groupedQuantilesDisc(df: DataFrame, group: Column, value: Column,
                           qs: Seq[Double], bins: Int = 1024): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0))
    require(bins >= 2)
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.select(group.cast("string").as("g"), value.cast("long").as("v"))
      .filter(col("v").isNotNull && col("g").isNotNull)
    // group-cardinality guard BEFORE any driver collect: countDistinct is
    // one cheap distributed agg returning a single row, so an unbounded
    // group key trips the budget here instead of OOMing the driver on
    // heads.collect() (r9 advice). Budget 2^22 cells, matching
    // orderStatistics' driver-artifact policy.
    val nGroups = v.agg(countDistinct(col("g"))).first().getLong(0)
    require(nGroups * qs.size * bins <= (1L << 22),
      s"groups($nGroups) × qs(${qs.size}) × bins($bins) exceeds the " +
        "driver-artifact budget (2^22 cells) — reduce bins or pre-bucket " +
        "the group key")
    val heads = v.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), min(col("v")).as("lo"), max(col("v")).as("hi"))
      .collect()
    heads.foreach { h =>
      require(BigInt(h.getLong(3)) - BigInt(h.getLong(2)) <= (BigInt(1) << 62),
        s"value span of group ${h.getString(0)} exceeds 2^62 — pre-scale")
    }
    // state: (g, qIdx) -> (rank, lo, hi, below)
    var state: Map[(String, Int), (Long, Long, Long, Long)] = heads.flatMap { h =>
      val (g, n, lo, hi) = (h.getString(0), h.getLong(1), h.getLong(2), h.getLong(3))
      qs.zipWithIndex.map { case (q, qi) =>
        (g, qi) -> ((math.ceil(q * n).toLong.max(1L), lo, hi, 0L))
      }
    }.toMap
    val maxPasses = math.ceil(62.0 / (math.log(bins) / math.log(2.0))).toInt + 2
    var guard = 0
    while (state.values.exists { case (_, lo, hi, _) => lo < hi }) {
      guard += 1
      require(guard <= maxPasses, "groupedQuantilesDisc failed to converge")
      val active = state.toSeq
        .filter { case (_, (_, lo, hi, _)) => lo < hi }
      val ranges = active.map { case ((g, qi), (_, lo, hi, _)) =>
        (g, qi, lo, hi, (hi - lo) / bins + 1) // ceil width, span ≤ 2^62
      }.toDF("g", "qi", "rlo", "rhi", "w")
      // broadcast ranges ⋈ values on the group key; `div` keeps the bin
      // arithmetic integral (Column./ is double division)
      val cells = v.join(broadcast(ranges), "g")
        .filter(col("v") >= col("rlo") && col("v") <= col("rhi"))
        .select(col("g"), col("qi"), expr("(v - rlo) div w").as("bin"))
        .groupBy(col("g"), col("qi"), col("bin"))
        .agg(count(lit(1)).as("cnt"))
        .collect()
      val hist = cells.groupBy(r => (r.getString(0), r.getInt(1)))
      state = state ++ active.map { case (key @ (g, qi), (rank, lo, hi, below)) =>
        val w = (hi - lo) / bins + 1
        val byBin = hist.getOrElse(key, Array.empty)
          .map(c => c.getAs[Long]("bin") -> c.getAs[Long]("cnt"))
          .sortBy(_._1)
        var cum = below
        val (bin, before) = byBin.iterator.map { case (b, cnt) =>
          val pre = cum; cum += cnt; (b, pre, cum)
        }.collectFirst { case (b, pre, c) if c >= rank => (b, pre) }
          .getOrElse(throw new IllegalStateException(
            s"rank $rank of group $g not found in histogram"))
        val nlo = lo + bin * w
        key -> ((rank, nlo, math.min(hi, nlo + w - 1), before))
      }.toMap
    }
    state.toSeq.map { case ((g, qi), (_, lo, _, _)) => (g, qs(qi), lo) }
      .toDF("group", "q", "value")
  }

  /** Per-GROUP exact WEIGHTED discrete quantiles — the weighted sibling
    * of [[groupedQuantilesDisc]]: per-group rank rule ceil(q × W_g)
    * over cumulative WEIGHT (W_g = the group's positive-weight total),
    * for "the token-budget p90 length PER LANGUAGE" computed exactly.
    * Same broadcast ranges-table refinement — one pass serves every
    * group, per row one equi-join probe + one weighted cell, map-side
    * partial sums — and the same 2^22-cell driver budget with the
    * group-cardinality guard BEFORE any collect. Positive-long weight
    * contract as [[orderStatisticsWeighted]].
    *
    * @return (group, q, value) for every group × q.
    */
  def groupedWeightedQuantilesDisc(df: DataFrame, group: Column,
                                   value: Column, weight: Column,
                                   qs: Seq[Double],
                                   bins: Int = 1024): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0))
    require(bins >= 2)
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.select(group.cast("string").as("g"),
        value.cast("long").as("v"), weight.cast("long").as("w"))
      .filter(col("v").isNotNull && col("g").isNotNull &&
        col("w").isNotNull && col("w") > 0)
    val nGroups = v.agg(countDistinct(col("g"))).first().getLong(0)
    require(nGroups * qs.size * bins <= (1L << 22),
      s"groups($nGroups) × qs(${qs.size}) × bins($bins) exceeds the " +
        "driver-artifact budget (2^22 cells) — reduce bins or pre-bucket " +
        "the group key")
    val heads = v.groupBy(col("g"))
      .agg(sum(col("w")).as("tw"), min(col("v")).as("lo"),
        max(col("v")).as("hi"))
      .collect()
    heads.foreach { h =>
      require(BigInt(h.getLong(3)) - BigInt(h.getLong(2)) <= (BigInt(1) << 62),
        s"value span of group ${h.getString(0)} exceeds 2^62 — pre-scale")
    }
    // state: (g, qIdx) -> (weightedRank, lo, hi, belowWeight)
    var state: Map[(String, Int), (Long, Long, Long, Long)] = heads.flatMap { h =>
      val (g, tw, lo, hi) = (h.getString(0), h.getLong(1), h.getLong(2), h.getLong(3))
      qs.zipWithIndex.map { case (q, qi) =>
        (g, qi) -> ((math.ceil(q * tw).toLong.max(1L), lo, hi, 0L))
      }
    }.toMap
    val maxPasses = math.ceil(62.0 / (math.log(bins) / math.log(2.0))).toInt + 2
    var guard = 0
    while (state.values.exists { case (_, lo, hi, _) => lo < hi }) {
      guard += 1
      require(guard <= maxPasses,
        "groupedWeightedQuantilesDisc failed to converge")
      val active = state.toSeq
        .filter { case (_, (_, lo, hi, _)) => lo < hi }
      val ranges = active.map { case ((g, qi), (_, lo, hi, _)) =>
        (g, qi, lo, hi, (hi - lo) / bins + 1) // ceil width, span ≤ 2^62
      }.toDF("g", "qi", "rlo", "rhi", "rw")
      val cells = v.join(broadcast(ranges), "g")
        .filter(col("v") >= col("rlo") && col("v") <= col("rhi"))
        .select(col("g"), col("qi"), expr("(v - rlo) div rw").as("bin"),
          col("w"))
        .groupBy(col("g"), col("qi"), col("bin"))
        .agg(sum(col("w")).as("cnt"))
        .collect()
      val hist = cells.groupBy(r => (r.getString(0), r.getInt(1)))
      state = state ++ active.map { case (key @ (g, qi), (rank, lo, hi, below)) =>
        val w = (hi - lo) / bins + 1
        val byBin = hist.getOrElse(key, Array.empty)
          .map(c => c.getAs[Long]("bin") -> c.getAs[Long]("cnt"))
          .sortBy(_._1)
        var cum = below
        val (bin, before) = byBin.iterator.map { case (b, cnt) =>
          val pre = cum; cum += cnt; (b, pre, cum)
        }.collectFirst { case (b, pre, c) if c >= rank => (b, pre) }
          .getOrElse(throw new IllegalStateException(
            s"weighted rank $rank of group $g not found in histogram"))
        val nlo = lo + bin * w
        key -> ((rank, nlo, math.min(hi, nlo + w - 1), before))
      }.toMap
    }
    state.toSeq.map { case ((g, qi), (_, lo, _, _)) => (g, qs(qi), lo) }
      .toDF("group", "q", "value")
  }

  /** Discrete quantiles on top of [[orderStatistics]] — rank =
    * ceil(q × n), DuckDB `quantile_disc` / SQL `PERCENTILE_DISC`
    * semantics. Returns (q, value). */
  def quantilesDisc(df: DataFrame, value: Column,
                    qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0))
    val spark = df.sparkSession
    val n = df.select(value.cast("long").as("v"))
      .filter(col("v").isNotNull).count()
    val ranks = qs.map(q => math.ceil(q * n).toLong.max(1L))
    val got = orderStatistics(df, value, ranks)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    import spark.implicits._
    qs.zip(ranks).map { case (q, r) => (q, got(r)) }.toDF("q", "value")
  }

  /** EXACT weighted order statistics — the weighted sibling of
    * [[orderStatistics]]: the smallest value whose cumulative WEIGHT
    * reaches each target (weighted rank r = smallest v with
    * Σ weight(rows ≤ v) ≥ r). Same distributed quickselect by iterative
    * histogram refinement, with each pass summing weight per bin
    * instead of counting rows — still one narrow partial-agg shuffle
    * per pass, driver state capped at ranks × bins cells. The
    * production question is weighted thresholds over a training
    * corpus: "the doc length at the token-budget median", where a
    * 10×-longer doc must count 10× ([[histSummariesWeightedBy]] gives
    * the width-bounded version of the same answer; this pins the exact
    * value). Weights are POSITIVE longs by contract; rows with null or
    * non-positive weight contribute nothing (a zero weight cannot move
    * a weighted rank).
    *
    * @param ranks 1-based weighted ranks in [1, Σ weights].
    * @return (rank, value).
    */
  def orderStatisticsWeighted(df: DataFrame, value: Column, weight: Column,
                              ranks: Seq[Long], bins: Int = 4096): DataFrame = {
    require(ranks.nonEmpty, "no ranks requested")
    require(bins >= 2 && ranks.distinct.size.toLong * bins <= (1 << 22),
      "ranks × bins exceeds the driver-artifact budget")
    val spark = df.sparkSession
    val v = df.select(value.cast("long").as("v"), weight.cast("long").as("w"))
      .filter(col("v").isNotNull && col("w").isNotNull && col("w") > 0)
    val head = v.agg(sum(col("w")).as("tw"), min(col("v")).as("lo"),
      max(col("v")).as("hi")).head()
    require(!head.isNullAt(0), "orderStatisticsWeighted over an empty input")
    val totalW = head.getLong(0)
    ranks.foreach(r => require(r >= 1 && r <= totalW,
      s"weighted rank $r outside [1, $totalW]"))
    val (lo0, hi0) = (head.getLong(1), head.getLong(2))
    require(BigInt(hi0) - BigInt(lo0) <= (BigInt(1) << 62),
      "value span exceeds 2^62 — pre-scale the column")
    val distinctRanks = ranks.distinct.sorted
    var state = distinctRanks.map(r => r -> ((lo0, hi0, 0L))).toMap
    val maxPasses = math.ceil(62.0 / (math.log(bins) / math.log(2.0)))
      .toInt + 2
    var guard = 0
    while (state.values.exists { case (lo, hi, _) => lo < hi }) {
      guard += 1
      require(guard <= maxPasses, "orderStatisticsWeighted failed to converge")
      val active = state.toSeq.filter { case (_, (lo, hi, _)) => lo < hi }
        .sortBy(_._1)
      val widths = active.map { case (_, (lo, hi, _)) =>
        (hi - lo) / bins + 1 } // ceil((hi-lo+1)/bins), span ≤ 2^62 safe
      // `div` (integral) — Column./ is DOUBLE division; lo/width are
      // driver longs, inlined as SQL literals (same as orderStatistics)
      val cells = v.select(col("w"), explode(array(active.zipWithIndex.map {
          case ((_, (lo, hi, _)), idx) =>
            expr(s"CASE WHEN v >= $lo AND v <= $hi THEN " +
              s"named_struct('rid', $idx, " +
              s"'bin', (v - ${lo}L) div ${widths(idx)}L) END")
        }: _*)).as("c"))
        .filter(col("c").isNotNull)
        .groupBy(col("c.rid").as("rid"), col("c.bin").as("bin"))
        .agg(sum(col("w")).as("cnt"))
        .collect()
      val hist = cells.groupBy(_.getAs[Int]("rid"))
      state = state ++ active.zipWithIndex.map { case ((r, (lo, hi, below)), idx) =>
        val w = widths(idx)
        val byBin = hist.getOrElse(idx, Array.empty)
          .map(c => c.getAs[Long]("bin") -> c.getAs[Long]("cnt"))
          .sortBy(_._1)
        var cum = below
        val (bin, before) = byBin.iterator.map { case (b, cnt) =>
          val pre = cum; cum += cnt; (b, pre, cum)
        }.collectFirst { case (b, pre, c) if c >= r => (b, pre) }
          .getOrElse(throw new IllegalStateException(
            s"weighted rank $r not found in histogram"))
        val nlo = lo + bin * w
        r -> ((nlo, math.min(hi, nlo + w - 1), before))
      }.toMap
    }
    import spark.implicits._
    ranks.map(r => (r, state(r)._1)).toDF("rank", "value")
  }

  /** Weighted discrete quantiles on top of [[orderStatisticsWeighted]]
    * — weighted rank = ceil(q × Σ weights), the weighted
    * `PERCENTILE_DISC`: the exact value below which q of the total
    * weight sits. Returns (q, value). */
  def weightedQuantilesDisc(df: DataFrame, value: Column, weight: Column,
                            qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0))
    val spark = df.sparkSession
    val tw = df.select(weight.cast("long").as("w"))
      .filter(col("w").isNotNull && col("w") > 0)
      .agg(sum(col("w"))).head().getLong(0)
    val ranks = qs.map(q => math.ceil(q * tw).toLong.max(1L))
    val got = orderStatisticsWeighted(df, value, weight, ranks)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    import spark.implicits._
    qs.zip(ranks).map { case (q, r) => (q, got(r)) }.toDF("q", "value")
  }

  // ---- KMV distinct sketches (set-operation-capable, unlike HLL) ----
  //
  // The aggregate itself is [[graft.plans.KmvSketchAgg]] (bounded
  // mergeable partial state: at most k longs per group per map task);
  // everything below is plain column arithmetic over the emitted sorted
  // array, so estimates stay deterministic and SQL-replayable. Hash
  // domain is [[graft.plans.Hash60]]'s [0, 2^60): exact below saturation,
  // (k-1)·2^60/θ at it (θ = the k-th minimum).

  /** 2^60 as a double — exactly representable, so Spark and any SQL
    * oracle computing `(k-1)*2^60/θ` agree bit-for-bit. */
  private val Hash60Range = 1152921504606846976.0

  /** KMV sketch aggregate over a pre-hashed long column: the k smallest
    * distinct values, sorted ascending. Compose with `Dedup.hash60` /
    * `graft_hash60` for oracle-replayable sketches. */
  def kmvSketch(hashed: Column, k: Int): Column =
    org.apache.spark.sql.GraftShims.column(
      graft.plans.KmvSketchAgg(
        org.apache.spark.sql.GraftShims.expression(hashed), k)
        .toAggregateExpression())

  /** Distinct-count estimate from a KMV sketch: exact cardinality below
    * saturation (the sketch IS the distinct set), `(k-1)·2^60/θ` at it,
    * floored to a long. */
  def kmvEstimate(sketch: Column, k: Int): Column =
    when(size(sketch) < k, size(sketch).cast("long"))
      .otherwise(floor(lit((k - 1).toDouble * Hash60Range) /
        element_at(sketch, k).cast("double")).cast("long"))

  /** KMV sketch of the UNION of two sketched sets: the k smallest of the
    * merged distinct values — closed over the sketch family, so it feeds
    * [[kmvEstimate]] directly. */
  def kmvUnion(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_union(a, b)), 1, k)

  /** Re-aggregate stored KMV sketches to a coarser grouping WITHOUT
    * touching raw data — the gold-table rollup shape (daily sketch table
    * → monthly/annual uniques), sibling of the HLL partial-merge path
    * (`a_hll_partial_merge`). LOSSLESS: the k-min of a union of per-group
    * k-min sets equals the k-min of the underlying union (every global
    * k-smallest hash is among its own day's k smallest), so the rolled
    * sketch is bit-identical to sketching the raw corpus directly — a
    * pinned spec property, not an approximation on top of an
    * approximation. Implementation is explode + re-sketch: input rows
    * carry ≤ k hashes each, so the explode is sketch-sized (days × k),
    * never corpus-sized.
    *
    * @param sketches one row per fine-grained group, `sketchCol` holding
    *                 a [[kmvSketch]] array built with the same k.
    * @param dims     coarser target dims (named columns).
    * @return dims…, sk — the rolled-up sketch, feeding [[kmvEstimate]] /
    *         [[kmvUnion]] / [[kmvIntersectEstimate]] unchanged.
    */
  def kmvRollup(sketches: DataFrame, dims: Seq[Column], sketchCol: Column,
                k: Int): DataFrame = {
    val exploded = sketches.select(dims :+ explode(sketchCol).as("__h"): _*)
    val dimNames = exploded.columns.filterNot(_ == "__h").toSeq
    exploded.groupBy(dimNames.map(col): _*)
      .agg(kmvSketch(col("__h"), k).as("sk"))
  }

  // ---- Mergeable top-k summaries (SpaceSaving-style gold tables) ----
  //
  // The rollup story for HEAVY HITTERS: [[heavyHitters]] answers one
  // corpus in one pass, but a gold table of per-period summaries must
  // merge WITHOUT re-reading raw history. Per-period state is the top-k
  // terms with exact counts plus epsilon = the (k+1)-th count (the max
  // count any dropped term can have); merged bounds follow Agarwal et
  // al., "Mergeable Summaries" (PODS'12): lo = Σ tracked counts ≤ true
  // ≤ lo + Σ epsilon of periods where the term went untracked = hi.
  // Deterministic (ties broken by term), so a SQL oracle replays the
  // whole pipeline hash-exact.

  /** Per-period top-k term summary: `(period, term, cnt, eps)` — the k
    * highest-count terms per period (ties broken by term) with the
    * period's epsilon on every row. One partial-agg exchange for the
    * counts + a per-period (partitioned, never global) rank window.
    * ~k rows per period: this is the table a gold layer stores. */
  def topkSummaries(df: DataFrame, period: Column, term: Column,
                    k: Int): DataFrame =
    topkSummariesWeighted(df, period, term, lit(1L), k)

  /** WEIGHTED variant of [[topkSummaries]]: terms rank by summed LONG
    * weight instead of row count — "top sources by TOKEN mass per
    * language", the mixture question a training corpus asks (a source
    * of few huge docs outweighs one of many tiny docs). Epsilon becomes
    * the (k+1)-th weight sum — the max weight any dropped term can
    * carry — so [[topkMerge]]'s bound arithmetic holds unchanged over
    * weighted summaries. Rows with a null weight contribute nothing. */
  def topkSummariesWeighted(df: DataFrame, period: Column, term: Column,
                            weight: Column, k: Int): DataFrame = {
    require(k >= 1)
    val c = df.filter(weight.isNotNull)
      .groupBy(period.as("period"), term.as("term"))
      .agg(sum(weight.cast("long")).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("period")).orderBy(col("cnt").desc, col("term"))
    val r = c.withColumn("rk", row_number().over(w))
    val eps = r.groupBy(col("period"))
      .agg(coalesce(max(when(col("rk") === k + 1, col("cnt"))), lit(0L))
        .as("eps"))
    r.filter(col("rk") <= k).join(eps, Seq("period"))
      .select(col("period"), col("term"), col("cnt"), col("eps"))
  }

  /** Merge stored [[topkSummaries]] to the global top-k with
    * deterministic error bounds: `(term, lo, hi)`, ranked by upper
    * bound. `lo ≤ true count ≤ hi` always; `lo == hi` exactly when the
    * term was tracked in every period (in particular whenever no period
    * truncated, eps = 0, the merge is EXACT). Cost is summary-sized —
    * periods × k rows — raw history is never re-read; the one-row
    * total-epsilon frame broadcasts. */
  def topkMerge(summaries: DataFrame, k: Int): DataFrame = {
    require(k >= 1)
    val tot = summaries.select(col("period"), col("eps")).distinct()
      .agg(coalesce(sum(col("eps")), lit(0L)).as("total_eps"))
    summaries.groupBy(col("term"))
      .agg(sum(col("cnt")).as("lo"), sum(col("eps")).as("tracked_eps"))
      .crossJoin(broadcast(tot))
      .select(col("term"), col("lo"),
        (col("lo") + col("total_eps") - col("tracked_eps")).as("hi"))
      .orderBy(col("hi").desc, col("term")).limit(k)
  }

  /** Rolling-window top-k from STORED per-day [[topkSummaries]] — the
    * "trending terms, 7-day window, every day" gold question answered
    * without ever re-reading raw history: each stored (day, term, cnt,
    * eps) row feeds the ≤ `windowDays` window-ends it belongs to (a
    * summary-sized explode — periods × k × w rows, never corpus-sized),
    * then each window runs [[topkMerge]]'s deferred-merge arithmetic
    * (Agarwal et al., PODS'12): lo = Σ tracked cnt, hi = lo + (window
    * total-eps − Σ tracked eps), ranked by hi with term tie-break —
    * `lo ≤ true windowed count ≤ hi` always, exact when the term was
    * tracked every window day. The per-window totals frame is
    * windows-sized (broadcast); the rank window partitions by
    * window_end, never global. Window ends past the max stored day are
    * dropped (no partial future windows). `period` must cast to long
    * (a day number).
    *
    * @return (window_end, term, lo, hi) — top `k` per window by hi.
    */
  def topkSliding(summaries: DataFrame, k: Int, windowDays: Int): DataFrame = {
    require(k >= 1 && windowDays >= 1)
    // materialize the summaries ONCE (they are gold-sized: days × k
    // rows) — the merge references them three ways (max-day, per-day
    // eps totals, per-term sums), and without this a caller composing
    // the daily build inline re-runs that corpus-sized pipeline per
    // reference (same discipline as connectedComponents' input
    // materialization)
    val s = summaries.localCheckpoint()
    val maxDay = s.agg(max(col("period").cast("long")))
      .first().getLong(0)
    val spread = s.select(
      col("period").cast("long").as("day"), col("term"), col("cnt"),
      col("eps"),
      explode(sequence(col("period").cast("long"),
        least(col("period").cast("long") + lit(windowDays - 1),
          lit(maxDay)))).as("window_end"))
    val tot = spread.select(col("window_end"), col("day"), col("eps"))
      .distinct()
      .groupBy(col("window_end"))
      .agg(coalesce(sum(col("eps")), lit(0L)).as("total_eps"))
    val merged = spread.groupBy(col("window_end"), col("term"))
      .agg(sum(col("cnt")).as("lo"), sum(col("eps")).as("tracked_eps"))
      .join(broadcast(tot), Seq("window_end"))
      .select(col("window_end"), col("term"), col("lo"),
        (col("lo") + col("total_eps") - col("tracked_eps")).as("hi"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("window_end")).orderBy(col("hi").desc, col("term"))
    merged.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k).drop("rk")
  }

  /** Intersection-cardinality estimate from two KMV sketches (Beyer et
    * al., SIGMOD'07): members of the union sketch present in BOTH input
    * sketches estimate the Jaccard numerator; scaled by the union
    * estimate. Exact when the union sketch is unsaturated (both sketches
    * then hold their full distinct sets). Floored to a long. */
  def kmvIntersectEstimate(a: Column, b: Column, k: Int): Column = {
    val u = kmvUnion(a, b, k)
    val common = size(array_intersect(array_intersect(a, b), u))
    when(size(u) < k, common.cast("long"))
      .otherwise(floor(common.cast("double") / lit(k.toDouble) *
        (lit((k - 1).toDouble * Hash60Range) /
          element_at(u, k).cast("double"))).cast("long"))
  }

  /** Set-DIFFERENCE cardinality estimate |A \ B| from two KMV sketches —
    * the retention/churn primitive (churned users = |prev \ cur|, new
    * users = |cur \ prev|) that completes the sketch set algebra next to
    * [[kmvUnion]] and [[kmvIntersectEstimate]]. Same Beyer et al.
    * construction: members of the union sketch that fall in A but not B
    * estimate the difference fraction, scaled by the union estimate.
    * Exact when the union sketch is unsaturated (both sketches then hold
    * their full distinct sets). Floored to a long. */
  def kmvDiffEstimate(a: Column, b: Column, k: Int): Column = {
    val u = kmvUnion(a, b, k)
    val only = size(array_except(array_intersect(u, a), b))
    when(size(u) < k, only.cast("long"))
      .otherwise(floor(only.cast("double") / lit(k.toDouble) *
        (lit((k - 1).toDouble * Hash60Range) /
          element_at(u, k).cast("double"))).cast("long"))
  }

  /** Rolling-window uniques from a STORED daily sketch table — the
    * dashboard question ("7-day unique users, every day") answered
    * without ever re-reading raw history: each stored (dims, day)
    * sketch feeds the `windowDays` window-ends it belongs to (a
    * sketch-sized explode of at most `windowDays` offsets per row, never
    * corpus-sized), then [[kmvRollup]]'s lossless re-cut merges each
    * window — so every window's sketch is bit-identical to sketching its
    * raw span directly. Window ends past the observed global max day are
    * dropped (no partial future windows); a (dims, end) row appears only
    * if the dims had ≥ 1 active day in the window, matching the
    * activity-join shape of the daily table itself.
    *
    * @param daily one row per (dims…, dayCol) with `sketchCol` built by
    *              [[kmvSketch]] with the same k.
    * @return dims…, window_end, sk — feed [[kmvEstimate]] for counts.
    */
  def kmvSlidingUniques(daily: DataFrame, dims: Seq[Column], dayCol: Column,
                        sketchCol: Column, k: Int,
                        windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val maxDay = daily.agg(max(dayCol.cast("long"))).first().getLong(0)
    val spread = daily.select(
      dims ++ Seq(sketchCol.as("__sk"),
        explode(sequence(dayCol.cast("long"),
          least(dayCol.cast("long") + lit(windowDays - 1), lit(maxDay))))
          .as("window_end")): _*)
    val dimNames = spread.columns.filterNot(Set("__sk", "window_end")).toSeq
    kmvRollup(spread, dimNames.map(col) :+ col("window_end"), col("__sk"), k)
  }

  // ---- Weighted KMV pair sketches (tuple-sketch-style summaries) ----

  /** Weighted KMV sketch aggregate: the k smallest distinct member
    * hashes, each carrying the SUM of that member's LONG weights
    * (cents, tokens, counts) — see [[graft.plans.KmvPairSketchAgg]] for
    * the eviction-safety argument. Emitted sorted ascending by hash as
    * `array<struct<h, v>>`. */
  def kmvPairSketch(hashed: Column, weight: Column, k: Int): Column =
    org.apache.spark.sql.GraftShims.column(
      graft.plans.KmvPairSketchAgg(
        org.apache.spark.sql.GraftShims.expression(hashed),
        org.apache.spark.sql.GraftShims.expression(weight), k)
        .toAggregateExpression())

  /** Total weight over DISTINCT members from a pair sketch: exact sum
    * below saturation; at it, the k-1 members below θ are a uniform
    * sample of the member set, so `Σ sampled weights × 2^60/θ`, floored
    * to a long. */
  def kmvWeightEstimate(sketch: Column, k: Int): Column = {
    val total = aggregate(sketch, lit(0L), (acc, x) => acc + x.getField("v"))
    val below = aggregate(slice(sketch, 1, k - 1), lit(0L),
      (acc, x) => acc + x.getField("v"))
    when(size(sketch) < k, total)
      .otherwise(floor(below.cast("double") * lit(Hash60Range) /
        element_at(sketch, k).getField("h").cast("double")).cast("long"))
  }

  /** Re-aggregate stored pair sketches to a coarser grouping — the
    * weighted sibling of [[kmvRollup]]: explode the ≤ k members per
    * row, SUM weights per member (the same member active in several
    * fine-grained periods merges its sums), re-sketch to the k
    * smallest. LOSSLESS by the same eviction-safety argument: a member
    * of the rolled-up k-min was in its own period's k-min (its hash is
    * below every θ involved), so its weight arrived complete. */
  def kmvPairRollup(sketches: DataFrame, dims: Seq[Column],
                    sketchCol: Column, k: Int): DataFrame = {
    val exploded = sketches.select(dims :+ explode(sketchCol).as("__m"): _*)
      .select(col("*"), col("__m.h").as("__h"), col("__m.v").as("__v"))
      .drop("__m")
    val dimNames = exploded.columns.filterNot(Set("__h", "__v")).toSeq
    // one aggregation: the pair aggregate itself sums weights when the
    // same member arrives from several fine-grained rows
    exploded.groupBy(dimNames.map(col): _*)
      .agg(kmvPairSketch(col("__h"), col("__v"), k).as("sk"))
  }

  /** Weight of the INTERSECTION from two pair sketches — "total cents
    * spent (across both cohorts) by members active in BOTH": shared
    * members below the union's θ are a uniform sample of the
    * intersection, their combined weights scale by 2^60/θ_union. Exact
    * when the union sketch is unsaturated. */
  def kmvPairIntersectWeight(a: Column, b: Column, k: Int): Column = {
    val ah = transform(a, _.getField("h"))
    val bh = transform(b, _.getField("h"))
    val u = slice(array_sort(array_union(ah, bh)), 1, k)
    val shared = array_intersect(array_intersect(ah, bh), u)
    def sumIn(sk: Column) = aggregate(
      filter(sk, x => array_contains(shared, x.getField("h"))),
      lit(0L), (acc, x) => acc + x.getField("v"))
    val s = sumIn(a) + sumIn(b)
    when(size(u) < k, s)
      .otherwise(floor(s.cast("double") * lit(Hash60Range) /
        element_at(u, k).cast("double")).cast("long"))
  }

  /** Weight of the DIFFERENCE from two pair sketches — "cents spent (in
    * period A) by members who then CHURNED (absent from B)": A-members
    * below the union's θ and not in B are a uniform sample of A∖B;
    * their A-side weights scale by 2^60/θ_union. Exact when the union
    * is unsaturated. Below saturation the three weighted estimates
    * partition exactly: `kmvWeightEstimate(a) + kmvWeightEstimate(b) =
    * diff(a,b) + diff(b,a) + intersect(a,b)` — the weighted sibling of
    * [[kmvDiffEstimate]]'s count partition. */
  def kmvPairDiffWeight(a: Column, b: Column, k: Int): Column = {
    val ah = transform(a, _.getField("h"))
    val bh = transform(b, _.getField("h"))
    val u = slice(array_sort(array_union(ah, bh)), 1, k)
    val only = array_except(array_intersect(u, ah), bh)
    val s = aggregate(
      filter(a, x => array_contains(only, x.getField("h"))),
      lit(0L), (acc, x) => acc + x.getField("v"))
    when(size(u) < k, s)
      .otherwise(floor(s.cast("double") * lit(Hash60Range) /
        element_at(u, k).cast("double")).cast("long"))
  }

  // ---- Mergeable histogram quantile summaries (gold-table quantiles) --
  //
  // The rollup story for QUANTILES, completing the sketch-gold family
  // next to uniques (KMV/HLL partials) and heavy hitters (top-k
  // summaries): [[orderStatistics]] answers one corpus exactly in ≤ 6
  // passes, but a gold layer of per-period summaries must merge WITHOUT
  // re-reading raw history. Per-period state is a fixed-boundary
  // histogram — (bin, cnt) rows, ≤ `bins` per period — and histograms
  // with SHARED boundaries merge by adding counts, so the merge is
  // summary-sized and the result carries a deterministic bound: the true
  // q-quantile lies in the returned bin's [value_lo, value_hi) (interior
  // bins; the clamp bins are half-open at the corpus edge). Pure integer
  // bin arithmetic end to end, so a SQL oracle replays it hash-exact.

  /** Per-period fixed-boundary histogram summary: `(period, bin, cnt)`
    * with `bin = clamp(floor((value - lo) / width), 0, bins-1)` over
    * non-null values. One partial-agg exchange; ≤ `bins` rows per
    * period — the table a gold layer stores. Boundaries (lo, width,
    * bins) are part of the summary's identity: only summaries built with
    * the same three merge meaningfully. */
  def histSummaries(df: DataFrame, period: Column, value: Column,
                    lo: Long, width: Long, bins: Int): DataFrame =
    histSummariesBy(df, Seq(period.as("period")), value, lo, width, bins)

  /** Multi-dimension variant of [[histSummaries]]: one histogram per
    * `dims` combination (e.g. a gold table keyed by (event_type, day) —
    * roll up days per type by summing counts, then quantile any slice
    * with [[histQuantilesBy]]). Alias the dims — names carry to the
    * output. */
  def histSummariesBy(df: DataFrame, dims: Seq[Column], value: Column,
                      lo: Long, width: Long, bins: Int): DataFrame =
    histSummariesWeightedBy(df, dims, value, lit(1L), lo, width, bins)

  /** WEIGHTED variant of [[histSummariesBy]]: each row contributes its
    * nonnegative LONG `weight` to its bin instead of 1, so
    * [[histQuantilesBy]] over the result answers WEIGHTED quantiles —
    * "the document length below which q of the total TOKENS sit", the
    * question a training-data budget asks (a 10×-longer doc matters 10×
    * as much). Same fixed boundaries, same lossless count-addition
    * merge, same bounds guarantee — the rank rule just runs over summed
    * weight instead of row count. Rows with a null value or null weight
    * contribute nothing. */
  def histSummariesWeightedBy(df: DataFrame, dims: Seq[Column],
                              value: Column, weight: Column, lo: Long,
                              width: Long, bins: Int): DataFrame = {
    require(width >= 1 && bins >= 1, s"need width/bins >= 1: $width/$bins")
    // double arithmetic, not a long cast: Spark truncates double→long
    // while SQL engines round, so the bin must come from floor() on the
    // IEEE-deterministic double expression both sides replay identically
    val bin = least(greatest(
      floor((value.cast("double") - lit(lo.toDouble)) / lit(width.toDouble)),
      lit(0L)), lit(bins - 1L))
    df.filter(value.isNotNull && weight.isNotNull)
      .groupBy(dims :+ bin.cast("long").as("bin"): _*)
      .agg(sum(weight.cast("long")).as("cnt"))
  }

  /** Merge stored [[histSummaries]] (any subset of periods) into
    * quantile BOUNDS at each q: `(q, value_lo, value_hi)` where the bin
    * holding rank `ceil(q·n)` spans `[lo + bin·width, lo + (bin+1)·width)`
    * — so `value_hi - value_lo = width` is the guaranteed error. The
    * merged histogram is ≤ `bins` rows, so the rank scan is a
    * bins²-sized self-join over a broadcast-sized frame — raw history is
    * never re-read and nothing needs a global sort or an unpartitioned
    * window. */
  def histQuantiles(summaries: DataFrame, qs: Seq[Double], lo: Long,
                    width: Long): DataFrame =
    histQuantilesBy(summaries, Nil, qs, lo, width)
      .drop("__all")

  /** Per-GROUP variant of [[histQuantiles]]: merge stored summaries to
    * quantile bounds for every `dims` combination in one pass (e.g.
    * per-event-type p50/p95 from the same gold rows). Identical rank
    * rule and guarantees; the cumulative self-join and rank scan key on
    * the group, so each group's frame stays ≤ bins rows and the whole
    * merge is one summary-sized shuffle. `dims = Nil` collapses to the
    * global quantiles. */
  def histQuantilesBy(summaries: DataFrame, dims: Seq[Column],
                      qs: Seq[Double], lo: Long, width: Long): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), s"bad qs: $qs")
    val withG = summaries.select(
      (if (dims.isEmpty) Seq(lit(0).as("__all")) else dims) ++
        Seq(col("bin"), col("cnt")): _*)
    val gNames = withG.columns.filterNot(Set("bin", "cnt")).toSeq
    val merged = withG.groupBy((gNames :+ "bin").map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))
    val cum = merged.as("a")
      .join(broadcast(merged.as("b")),
        gNames.map(g => col(s"a.$g") === col(s"b.$g"))
          .reduce(_ && _) && col("b.bin") <= col("a.bin"))
      .groupBy(gNames.map(g => col(s"a.$g").as(g)) :+
        col("a.bin").as("bin"): _*)
      .agg(sum(col("b.cnt")).as("cum"))
    val n = broadcast(merged.groupBy(gNames.map(col): _*)
      .agg(sum(col("cnt")).as("n")))
    val qdf = summaries.sparkSession.createDataFrame(
      qs.map(Tuple1(_))).toDF("q")
    n.crossJoin(broadcast(qdf))
      .join(cum, gNames)
      .filter(col("cum") >= ceil(col("q") * col("n")))
      .groupBy((gNames :+ "q").map(col): _*)
      .agg(min(col("bin")).as("bin"))
      .select(gNames.map(col) ++ Seq(col("q"),
        (lit(lo) + col("bin") * lit(width)).as("value_lo"),
        (lit(lo) + (col("bin") + 1) * lit(width)).as("value_hi")): _*)
  }

  /** Rolling-window quantile bounds from STORED per-day
    * [[histSummaries]] — the quantile sibling of [[topkSliding]] and
    * [[kmvSlidingUniques]], completing the sliding re-cut story for the
    * whole sketch-gold family: each stored (period, bin, cnt) row feeds
    * the ≤ `windowDays` window-ends it belongs to (a summary-sized
    * explode — periods × bins × w rows), then [[histQuantilesBy]] keyed
    * on window_end merges every window at once — shared-boundary
    * histogram counts ADD, so each window's bounds are bit-identical to
    * summarizing its raw span directly, and raw history is read ZERO
    * times. Window ends past the max stored period are dropped. `period`
    * must cast to long.
    *
    * @return (window_end, q, value_lo, value_hi) for every window × q.
    */
  def histQuantilesSliding(daily: DataFrame, qs: Seq[Double], lo: Long,
                           width: Long, windowDays: Int): DataFrame = {
    require(windowDays >= 1)
    // materialize once — summary-sized (periods × bins rows); the
    // quantile merge references the spread three ways (cumulative self-
    // join both sides + totals), see topkSliding
    val d = daily.localCheckpoint()
    val maxDay = d.agg(max(col("period").cast("long")))
      .first().getLong(0)
    val spread = d.select(
      explode(sequence(col("period").cast("long"),
        least(col("period").cast("long") + lit(windowDays - 1),
          lit(maxDay)))).as("window_end"),
      col("bin"), col("cnt"))
    histQuantilesBy(spread, Seq(col("window_end")), qs, lo, width)
  }

  /** Robust per-group outlier flags via the median absolute deviation —
    * the screen [[graft.queries]] `a_anomaly_zscore` cannot give when
    * the series itself contains the anomalies: mean and stddev are
    * dragged by the very spikes being hunted (one 100× day shifts the
    * mean and explodes σ, hiding itself), while the median and MAD have
    * a 50% breakdown point. All integer-exact: the group median is the
    * value at rank ⌈n/2⌉ of the sorted multiset, MAD the same rank
    * statistic over |v − med|, and the flag is `|v − med| > k·MAD` —
    * no 1.4826 normal-consistency scaling (that constant is irrational
    * and only relabels k; callers pick k directly).
    *
    * Shape: two ranking passes over each group (rank-of-value, then
    * rank-of-deviation), one exchange on the group key shared by all
    * four windows. This runs on AGGREGATED series (daily counts per
    * key — gold-table-sized), where per-group windows are exactly
    * right; raw-corpus quantiles go through [[orderStatistics]]'
    * histogram quickselect instead. A group with MAD = 0 (over half
    * the days identical) flags ANY deviation — the strictest reading,
    * documented rather than special-cased.
    *
    * @return one row per input row: (g, id, v, med, mad, is_outlier).
    */
  /** Integer EWMA smoothing of a per-group ordered series — trend
    * extraction over daily gold metrics (`s₁ = v₁;
    * sₜ = (α·vₜ + (1000−α)·sₜ₋₁) div 1000`, α in milli-units). The
    * rational recurrence is the load-bearing choice: a float
    * `α·(1−α)ᵏ` replay diverges between engines at the pow() ULP,
    * while the integer fold is bit-replayable by a recursive-CTE
    * oracle. EWMA is inherently sequential per group, so the fold runs
    * as an `aggregate()` lambda over the collected per-group series —
    * per-group state is bounded by the series HORIZON (days in the
    * window, gold-table-sized), never by corpus rows; the single
    * exchange is the collect_list's group shuffle. Raw-event smoothing
    * first aggregates to the per-period series (that aggregation is
    * the corpus-sized pass, with map-side combine).
    *
    * @param alphaMilli smoothing weight α·1000 (700 = fast follow).
    * @return one row per input row: (g, p, v, ewma).
    */
  def ewmaSmooth(df: DataFrame, group: Column, period: Column,
                 value: Column, alphaMilli: Long = 700L): DataFrame = {
    require(alphaMilli >= 0 && alphaMilli <= 1000)
    val a = alphaMilli
    df.select(group.as("g"), period.as("p"), value.cast("long").as("v"))
      .groupBy(col("g"))
      .agg(expr(
        s"""aggregate(
           |  array_sort(collect_list(struct(p, v))),
           |  struct(CAST(array() AS ARRAY<STRUCT<p: STRING, v: BIGINT,
           |           s: BIGINT>>) AS rows),
           |  (acc, x) -> struct(concat(acc.rows,
           |    CAST(array(named_struct('p', x.p, 'v', x.v, 's',
           |      CASE WHEN size(acc.rows) = 0 THEN x.v
           |           ELSE ($a * x.v + ${1000 - a} *
           |             element_at(acc.rows, -1).s) div 1000 END))
           |      AS ARRAY<STRUCT<p: STRING, v: BIGINT, s: BIGINT>>))),
           |  acc -> acc.rows)""".stripMargin).as("rows"))
      .select(col("g"), explode(col("rows")).as("r"))
      .select(col("g"), col("r.p").as("p"), col("r.v").as("v"),
        col("r.s").as("ewma"))
  }

  /** Holt linear-trend smoothing (double exponential) of a per-group
    * ordered series — the [[ewmaSmooth]] upgrade that tracks a moving
    * LEVEL and a per-step TREND, so ramping metrics are followed
    * without the single-EWMA lag. Integer milli-weight recurrence
    * (`l₁ = v₁, b₁ = 0;
    * lₜ = (α·vₜ + (1000−α)·(lₜ₋₁+bₜ₋₁)) div 1000;
    * bₜ = (β·(lₜ−lₜ₋₁) + (1000−β)·bₜ₋₁) div 1000`), all plain integer
    * `div` — Spark's div and DuckDB's `//` BOTH truncate toward zero
    * (verified on negatives, which the trend term produces on any
    * decline), so the fold replays bit-exactly in a recursive-CTE
    * oracle. Same shape as [[ewmaSmooth]]: one group exchange, the
    * sequential fold runs as an `aggregate()` lambda over each group's
    * collected series — state bounded by the series horizon (days per
    * key, gold-table-sized), never corpus rows.
    *
    * @return one row per input row: (g, p, v, level, trend,
    *         forecast_next = level + trend).
    */
  def holtSmooth(df: DataFrame, group: Column, period: Column,
                 value: Column, alphaMilli: Long = 500L,
                 betaMilli: Long = 300L): DataFrame = {
    require(alphaMilli >= 0 && alphaMilli <= 1000 &&
      betaMilli >= 0 && betaMilli <= 1000)
    val a = alphaMilli; val b = betaMilli
    // lt is needed twice (level col + inside the trend update); SQL
    // lambdas cannot bind a local, so the expression is inlined twice —
    // both copies are the same deterministic integer arithmetic
    val lt = s"CASE WHEN size(acc.rows) = 0 THEN x.v ELSE " +
      s"($a * x.v + ${1000 - a} * (element_at(acc.rows, -1).l + " +
      s"element_at(acc.rows, -1).b)) div 1000 END"
    df.select(group.as("g"), period.as("p"), value.cast("long").as("v"))
      .groupBy(col("g"))
      .agg(expr(
        s"""aggregate(
           |  array_sort(collect_list(struct(p, v))),
           |  struct(CAST(array() AS ARRAY<STRUCT<p: STRING, v: BIGINT,
           |           l: BIGINT, b: BIGINT>>) AS rows),
           |  (acc, x) -> struct(concat(acc.rows,
           |    CAST(array(named_struct('p', x.p, 'v', x.v,
           |      'l', $lt,
           |      'b', CASE WHEN size(acc.rows) = 0 THEN 0L
           |           ELSE ($b * (($lt) - element_at(acc.rows, -1).l) +
           |             ${1000 - b} * element_at(acc.rows, -1).b) div 1000
           |           END))
           |      AS ARRAY<STRUCT<p: STRING, v: BIGINT, l: BIGINT,
           |           b: BIGINT>>))),
           |  acc -> acc.rows)""".stripMargin).as("rows"))
      .select(col("g"), explode(col("rows")).as("r"))
      .select(col("g"), col("r.p").as("p"), col("r.v").as("v"),
        col("r.l").as("level"), col("r.b").as("trend"),
        (col("r.l") + col("r.b")).as("forecast_next"))
  }

  def madOutliers(df: DataFrame, group: Column, id: Column, value: Column,
                  k: Long = 3L): DataFrame = {
    require(k >= 1)
    import org.apache.spark.sql.expressions.Window
    val base = df.select(group.as("g"), id.as("id"),
      value.cast("long").as("v"))
    val wg = Window.partitionBy(col("g"))
    val wv = Window.partitionBy(col("g")).orderBy(col("v"))
    val withMed = base
      .withColumn("rn", row_number().over(wv))
      .withColumn("c", count(lit(1)).over(wg))
      .withColumn("med",
        max(when(col("rn") === expr("(c + 1) div 2"), col("v"))).over(wg))
      .withColumn("dev", abs(col("v") - col("med")))
    val wd = Window.partitionBy(col("g")).orderBy(col("dev"))
    withMed
      .withColumn("rd", row_number().over(wd))
      .withColumn("mad",
        max(when(col("rd") === expr("(c + 1) div 2"), col("dev"))).over(wg))
      .select(col("g"), col("id"), col("v"), col("med"), col("mad"),
        (col("dev") > lit(k) * col("mad")).as("is_outlier"))
  }
}
