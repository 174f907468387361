package graft

import graft.operators.{MetricsKernel, Vectors}
import org.apache.spark.sql.functions._

class AnnSpec extends SparkSpec {

  private def topkSet(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.map(_.getLong(1)).toSet
      }

  test("IVF top-k recall vs brute force") {
    val emb = Tables.embeddings(spark, testDataDir)
    val probes = emb.filter(col("vec_id") < 20)
    val exact = topkSet(Vectors.bruteForceTopK(emb, probes, k = 5))
    val approx = topkSet(Vectors.ivfTopK(emb, probes, k = 5,
      numClusters = 16, nprobe = 6, dim = 64))
    val recalls = exact.map { case (q, ex) =>
      approx.get(q).map(ap => (ap & ex).size.toDouble / ex.size).getOrElse(0.0)
    }
    val meanRecall = recalls.sum / recalls.size
    // random-ish corpus at nprobe=6/16: expect moderate recall, never zero
    assert(meanRecall > 0.3, s"mean recall $meanRecall")
    assert(approx.size == exact.size) // every probe answered
  }

  test("PQ-ADC top-k recall vs brute force, and codes stay in range") {
    graft.plans.GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, testDataDir)
    val probes = emb.filter(col("vec_id") < 20)
    val cents = Vectors.pqCentroids(emb, m = 8, k = 16, dim = 64)
    val codes = Vectors.pqCodes(emb, cents, dim = 64)
    // every code is a valid sub-centroid id, 8 per vector
    val flat = codes.select(explode(col("codes")).as("c")).collect().map(_.getLong(0))
    assert(flat.forall(c => c >= 0 && c < 16))
    assert(codes.head().getSeq[Long](1).size == 8)
    val exact = topkSet(Vectors.bruteForceTopK(emb, probes, k = 5))
    val approx = topkSet(Vectors.pqAdcTopK(codes, probes, cents, k = 5, dim = 64))
    val recalls = exact.map { case (q, ex) =>
      approx.get(q).map(ap => (ap & ex).size.toDouble / ex.size).getOrElse(0.0)
    }
    val meanRecall = recalls.sum / recalls.size
    // 8×16 codebook on a random-ish 64-dim corpus: coarse but never useless
    assert(meanRecall > 0.2, s"mean recall $meanRecall")
    assert(approx.size == exact.size)
  }

  test("IVF scans a bounded fraction of the corpus per probe") {
    val emb = Tables.embeddings(spark, testDataDir)
    val cents = Vectors.ivfCentroids(emb, numClusters = 16, dim = 64)
    val sizes = emb.select(
      Vectors.assignCluster(col("embedding"), cents).as("c"))
      .groupBy("c").count().collect().map(_.getLong(1))
    assert(sizes.length > 1) // corpus actually partitions into lists
    assert(sizes.sum == emb.count())
  }

  test("materialized IVF index prunes partitions and matches in-memory IVF") {
    val emb = Tables.embeddings(spark, testDataDir)
    val probes = emb.filter(col("vec_id") < 10)
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivf").toString + "/index"
    val cents = Vectors.ivfWriteIndex(emb, path, numClusters = 16, dim = 64)
    val fromIndex = Vectors.ivfTopKFromIndex(spark, path, probes, cents,
      k = 5, nprobe = 4)
    // the cluster filter reaches the scan as a partition filter — only
    // nprobe lists' files are read
    val plan = fromIndex.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cluster"))
    // same centroids, same nprobe → identical result set as in-memory IVF
    val inMem = Vectors.ivfTopK(emb, probes, k = 5,
      numClusters = 16, nprobe = 4, dim = 64)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val onDisk = fromIndex
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(onDisk == inMem)
  }

  test("approx_count_distinct stays within HLL++ error bounds") {
    val exact = MetricsKernel.compositeAgg(Tables.events(spark, testDataDir),
      col("ts"), "month", Seq(col("event_type")), col("event_id"))
      .select("event_type", "unique_count").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = MetricsKernel.compositeAgg(Tables.events(spark, testDataDir),
      col("ts"), "month", Seq(col("event_type")), col("event_id"),
      approx = true)
      .select("event_type", "unique_count").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      val ap = approx(k)
      assert(math.abs(ap - ex).toDouble / ex < 0.1,
        s"$k: exact=$ex approx=$ap")
    }
  }

  test("multi-probe LSH recall dominates single-bucket LSH, subset of exact pairs") {
    val emb = Tables.embeddings(spark, testDataDir)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = pairs(Vectors.lshNearDupPairs(emb, dim = 64,
      numPlanes = 8, threshold = 0.95))
    val multi = pairs(Vectors.lshMultiProbeNearDupPairs(emb, dim = 64,
      numPlanes = 8, threshold = 0.95))
    // same-bucket pairs are a subset of the multi-probe candidates
    assert(single.subsetOf(multi),
      s"multi-probe lost ${(single -- multi).size} single-bucket pairs")
    // and every emitted pair is a true near-dup (the verify pass is exact):
    // recompute cosine brute-force for each claimed pair
    val vecs = emb.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    multi.foreach { case (i, j) =>
      val (a, b) = (vecs(i), vecs(j))
      def dot(x: Array[Float], y: Array[Float]) =
        x.indices.map(k => x(k).toDouble * y(k).toDouble).sum
      val cos = dot(a, b) / math.sqrt(dot(a, a) * dot(b, b))
      assert(cos >= 0.95 - 1e-9, s"pair ($i,$j) cos $cos below threshold")
    }
  }

  test("IVF index append under frozen centroids equals a one-shot write") {
    val emb = Tables.embeddings(spark, testDataDir)
    val probes = emb.filter(col("vec_id") < 10)
    val base = java.nio.file.Files.createTempDirectory("graft_ivf_app").toString
    // index built from the first half; the second half appended later
    // under the SAME frozen centroids
    val firstHalf = emb.filter(col("vec_id") % 2 === 0)
    val cents = Vectors.ivfWriteIndex(firstHalf, s"$base/grown",
      numClusters = 16, dim = 64)
    Vectors.ivfAppendToIndex(emb.filter(col("vec_id") % 2 === 1),
      s"$base/grown", cents)
    // reference: the full corpus written in one shot with those centroids
    Vectors.ivfAppendToIndex(emb, s"$base/oneshot", cents)
    val grown = Vectors.ivfTopKFromIndex(spark, s"$base/grown", probes,
      cents, k = 5, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val oneshot = Vectors.ivfTopKFromIndex(spark, s"$base/oneshot", probes,
      cents, k = 5, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(grown == oneshot)
    // every corpus vector is present exactly once after the append
    assert(spark.read.parquet(s"$base/grown").count() == emb.count())
  }

  test("IVF-PQ index append under a frozen model equals a one-shot write") {
    graft.plans.GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, testDataDir)
    val probes = emb.filter(col("vec_id") < 10)
    val base = java.nio.file.Files.createTempDirectory("graft_ivfpq_app").toString
    // model trained on the first half, then FROZEN — the append batch is
    // coded with it, exactly the daily-delta production shape
    val firstHalf = emb.filter(col("vec_id") % 2 === 0)
    val (coarse, books) = Vectors.ivfPqModel(firstHalf,
      numClusters = 16, m = 8, pqK = 16, dim = 64)
    Vectors.ivfPqWriteIndex(firstHalf, s"$base/grown", coarse, books, dim = 64)
    Vectors.ivfPqAppendToIndex(emb.filter(col("vec_id") % 2 === 1),
      s"$base/grown", coarse, books, dim = 64)
    Vectors.ivfPqWriteIndex(emb, s"$base/oneshot", coarse, books, dim = 64)
    def serve(p: String) = Vectors.ivfPqTopKFromIndex(spark, p, probes,
      coarse, books, k = 5, nprobe = 4, dim = 64)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(serve(s"$base/grown") == serve(s"$base/oneshot"))
    assert(spark.read.parquet(s"$base/grown").count() == emb.count())
  }

  test("IVF-PQ equals plain PQ-ADC when pruning is disabled, keeps recall when on") {
    val emb = Tables.embeddings(spark, testDataDir)
    val probes = emb.filter(col("vec_id") < 10)
    // nprobe = numClusters ⇒ every cluster probed ⇒ candidate set identical
    // to unpruned PQ-ADC ⇒ results must match EXACTLY
    val unpruned = Vectors.ivfPqTopK(emb, probes, k = 5,
      numClusters = 16, nprobe = 16, m = 8, pqK = 16, dim = 64)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val cents = Vectors.pqCentroids(emb, m = 8, k = 16, dim = 64)
    val plain = Vectors.pqAdcTopK(Vectors.pqCodes(emb, cents, dim = 64),
      probes, cents, k = 5, dim = 64)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(unpruned == plain)
    // doubly-approximate path still finds a meaningful share of true
    // neighbours and answers every probe
    val exact = topkSet(Vectors.bruteForceTopK(emb, probes, k = 5))
    val pruned = topkSet(Vectors.ivfPqTopK(emb, probes, k = 5,
      numClusters = 16, nprobe = 4, m = 8, pqK = 16, dim = 64))
    val recalls = exact.map { case (q, ex) =>
      pruned.get(q).map(ap => (ap & ex).size.toDouble / ex.size).getOrElse(0.0)
    }
    assert(recalls.sum / recalls.size > 0.2,
      s"mean recall ${recalls.sum / recalls.size}")
    assert(pruned.size == exact.size)
    // the materialized index serves the SAME answers, with the cluster
    // filter reaching the scan as partition pruning
    val (coarse, books) = Vectors.ivfPqModel(emb, numClusters = 16,
      m = 8, pqK = 16, dim = 64)
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivfpq").toString + "/index"
    Vectors.ivfPqWriteIndex(emb, path, coarse, books, dim = 64)
    val fromIndex = Vectors.ivfPqTopKFromIndex(spark, path, probes,
      coarse, books, k = 5, nprobe = 4, dim = 64)
    assert(fromIndex.queryExecution.executedPlan.toString
      .contains("PartitionFilters: [cluster"))
    assert(topkSet(fromIndex) == pruned)
  }

  test("hard negatives: labels always differ, scores dominated by unrestricted top-k") {
    val emb = Tables.embeddings(spark, testDataDir)
    val probes = emb.filter(col("vec_id") < 10)
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val hard = Vectors.hardNegatives(emb, probes, k = 5).collect()
    assert(hard.nonEmpty)
    hard.foreach { r =>
      val (q, n) = (r.getLong(0), r.getLong(2))
      assert(labels(q) != labels(n), s"probe $q got same-label negative $n")
    }
    // a label-restricted top-k can never beat the unrestricted best cosine
    val best = Vectors.bruteForceTopK(emb, probes, k = 1).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    hard.foreach { r =>
      assert(r.getDouble(3) <= best(r.getLong(0)) + 1e-9)
    }
  }

  test("random projection matches a driver-side replay and stays shuffle-free") {
    val proj = Vectors.randomProjection(
      Tables.embeddings(spark, testDataDir), dim = 64, outDims = 8)
    assert(!proj.queryExecution.executedPlan.toString.contains("Exchange"))
    val row = proj.orderBy("vec_id").limit(1).collect()(0)
    val emb = Tables.embeddings(spark, testDataDir).orderBy("vec_id")
      .limit(1).select("embedding").collect()(0).getSeq[Float](0)
    (0 until 8).foreach { p =>
      val expect = emb.indices.map(d =>
        emb(d).toDouble * Vectors.planeWeight(p, d)).sum
      assert(math.abs(row.getDouble(1 + p) - expect) < 1e-6,
        s"plane $p: got ${row.getDouble(1 + p)}, expected $expect")
    }
  }

  test("mmrRerank: diversity pick beats the redundant runner-up") {
    import spark.implicits._
    // query +x; a at +30deg (rel cos30), its near-clone at +31deg
    // (sim to a ~ cos1 ~ 1), b at -32deg (rel cos32, sim to a only
    // cos62). At lambda = 0.7: clone scores .7*cos31 - .3*cos1 ~ .30,
    // b scores .7*cos32 - .3*cos62 ~ .45 -> MMR round 2 takes the
    // mirror-side b over the higher-relevance clone; round 3 takes
    // the clone (only candidate left). Plain top-3 order would be
    // 10, 11, 12 - the diversity penalty flips it.
    val corpus = Seq(
      (10L, Array(0.8660f, 0.5f)),
      (11L, Array(0.8572f, 0.5150f)),
      (12L, Array(0.8480f, -0.5299f))
    ).toDF("vec_id", "embedding")
    val probes = Seq((1L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val got = graft.operators.Vectors.mmrRerank(
      corpus, probes, n = 3, m = 3, lambdaMilli = 700L)
      .orderBy("sel_round").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._2).toSeq == Seq(10L, 12L, 11L), s"${got.toSeq}")
    // round-1 score is exactly 700 * rel_u of the top candidate
    assert(got(0)._3 % 700L == 0L, s"${got.toSeq}")
    // the clone's final score is heavily sim-penalized (maxsim ~ 1)
    assert(got(2)._3 < got(1)._3, s"${got.toSeq}")
  }

  test("kCenterGreedy: farthest-point order on a planted geometry") {
    import spark.implicits._
    // unit-ish 2-D directions: seed is min id (1, pointing +x); the
    // farthest by cosine distance is -x (id 3, d = 2); then +y (id 2,
    // d = 1 to both chosen); the near-duplicate of the seed (id 5)
    // comes last with d ~ 0. Ties and order are fully deterministic.
    val emb = Seq(
      (1L, Array(1f, 0f)),
      (2L, Array(0f, 1f)),
      (3L, Array(-1f, 0f)),
      (5L, Array(1f, 0.01f))
    ).toDF("vec_id", "embedding")
    val got = graft.operators.Vectors.kCenterGreedy(emb, k = 4)
      .orderBy("sel_round").collect()
      .map(r => (r.getInt(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
    assert(got.map(_._2).toSeq == Seq(1L, 3L, 2L, 5L), s"${got.toSeq}")
    assert(got(0)._3.isEmpty)
    assert(math.abs(got(1)._3.get - 2.0) < 1e-9, s"${got.toSeq}")
    assert(math.abs(got(2)._3.get - 1.0) < 1e-9, s"${got.toSeq}")
    assert(got(3)._3.get < 1e-3, s"${got.toSeq}")
  }

  test("kCenterGreedy: executor storage holds O(1) distance frames, not O(k)") {
    import spark.implicits._
    // every superseded round's localCheckpoint must be unpersisted once
    // the next one materializes (r10 VERDICT): after a k=6 run only the
    // corpus checkpoint and the final distance frame may remain cached
    val emb = (0L until 40L).map(i =>
      (i, Array(math.cos(i * 0.37).toFloat, math.sin(i * 0.37).toFloat)))
      .toDF("vec_id", "embedding")
    val before = spark.sparkContext.getPersistentRDDs.size
    val got = graft.operators.Vectors.kCenterGreedy(emb, k = 6)
    assert(got.count() == 6L)
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after - before <= 2,
      s"kCenterGreedy leaked cached frames: $before -> $after")
  }

  test("int8 quantization: codes in range, error bounded by half a step, zero vectors safe") {
    import spark.implicits._
    val edge = Seq(
      (9000L, Array(0f, 0f, 0f, 0f)),             // zero vector: scale 0, no NaN
      (9001L, Array(1f, -1f, 0.5f, -0.25f)),
      (9002L, Array(1e-4f, -1e-4f, 1e-4f, 0f))    // tiny but nonzero scale
    ).toDF("vec_id", "embedding")
    val q = Vectors.int8Quantize(edge).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(q(9000L).getDouble(1) == 0.0 &&
      q(9000L).getString(2) == "0,0,0,0" &&
      q(9000L).getDouble(3) == 0.0)
    // exact codes for the hand-computable vector
    assert(q(9001L).getString(2) == "127,-127,64,-32")
    val real = Vectors.int8Quantize(Tables.embeddings(spark, testDataDir))
    val rows = real.select("scale", "codes_csv", "max_abs_err").collect()
    rows.foreach { r =>
      val codes = r.getString(1).split(",").map(_.toInt)
      assert(codes.forall(c => c >= -127 && c <= 127))
      // quantization error never exceeds half a step (scale/127/2), + round-off
      assert(r.getDouble(2) <= r.getDouble(0) / 127.0 / 2.0 + 1e-6,
        s"err ${r.getDouble(2)} vs step ${r.getDouble(0) / 127.0}")
    }
  }

  private def keepSet(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.filter(col("keep")).select("vec_id").collect().map(_.getLong(0)).toSet

  test("semantic dedup sub-split: keep-set invariant when no pair straddles") {
    import spark.implicits._
    // EXACT duplicates co-assign at every level (identical cosine to every
    // seed + deterministic tie-break), so no duplicate pair can straddle a
    // sub-cluster boundary — the keep decision must then be IDENTICAL with
    // and without splitting, whatever the split does to the fillers.
    // Seeded corpus: 60 distinct 16-dim vectors, each duplicated 1-5×;
    // distinct random vectors stay far below the 0.95 threshold.
    val rnd = new scala.util.Random(7)
    val rows = (0 until 60).flatMap { g =>
      val v = Array.fill(16)(rnd.nextFloat() * 2f - 1f)
      (0 to g % 5).map(_ => v)
    }.zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val emb = rows.toDF("vec_id", "embedding")
    val unsplit = keepSet(Vectors.semanticDedup(emb, numClusters = 4,
      dim = 16, threshold = 0.95, maxClusterSize = Long.MaxValue, maxLevels = 0))
    val split = keepSet(Vectors.semanticDedup(emb, numClusters = 4,
      dim = 16, threshold = 0.95, maxClusterSize = 12, maxLevels = 4))
    assert(split == unsplit)
    // sanity: the corpus actually contains drops, and a split happened
    assert(unsplit.size < rows.size)
    val paths = Vectors.semanticClusterPaths(emb, 4, 16, 12, 4)
      .select("cid").distinct().collect().map(_.getString(0))
    assert(paths.exists(_.contains(".")), "no split occurred")
  }

  test("semantic dedup sub-split: recursion bounds populations, freeze stops identical blobs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // two far-apart dense blobs + one blob of 40 IDENTICAL vectors: the
    // identical blob can never separate (every member ties to the same
    // sub-seed), so the operator must FREEZE it instead of recursing
    // forever; the separable blobs must come out under the cap
    def around(center: Array[Float], n: Int, spread: Float) =
      (0 until n).map(_ => center.zipWithIndex.map { case (c, _) =>
        c + (rnd.nextFloat() * 2f - 1f) * spread })
    val c1 = Array.fill(8)(10f)
    val c2 = Array.tabulate(8)(i => if (i % 2 == 0) -10f else 10f)
    // orthogonal to BOTH blob centers, so no cross-blob near-dups at 0.99
    val identical = Array.tabulate(8)(i => if (i < 4) 5f else -5f)
    val vecs = around(c1, 30, 0.5f) ++ around(c2, 30, 0.5f) ++
      Seq.fill(40)(identical)
    val emb = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val paths = Vectors.semanticClusterPaths(emb, numClusters = 2, dim = 8,
      maxClusterSize = 15, maxLevels = 8) // levels >> needed: must terminate
    val pops = paths.groupBy("cid").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every over-cap residual must be the frozen identical-vector blob
    // (possibly with a straggler it stalled with), never an unsplit
    // separable cluster
    val over = pops.filter(_._2 > 15)
    assert(over.nonEmpty, "expected the identical blob to stay over-cap")
    assert(over.size == 1 && over.head._2 >= 40 && over.head._2 <= 45,
      s"unexpected residuals: $over")
    val frozenPath = over.head._1
    val frozenIds = paths.filter(col("cid") === frozenPath)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert((60L until 100L).forall(frozenIds), "identical blob not intact")
    // and dedup over the frozen blob still keeps exactly its lowest id
    val keep = keepSet(Vectors.semanticDedup(emb, 2, 8, 0.99, 15, 8))
    val idsOfIdentical = (60L until 100L)
    assert(keep.intersect(idsOfIdentical.toSet) == Set(60L))
  }

  test("sub-split with 40 simultaneously-hot clusters: plan size stays O(1) in hot count") {
    import spark.implicits._
    // 40 one-hot directions × 20 members each, ids interleaved so the 40
    // coarse seeds land one per direction; cap 10 makes ALL 40 clusters hot
    // in the same level. The former per-hot-path when-chain would fold
    // 40 × 2 × 64 float literals into the plan; the broadcast-join form
    // must keep the reassignment expression constant-size.
    val rows = for (m <- 0 until 20; g <- 0 until 40) yield {
      val v = Array.fill(64)(0f)
      v(g) = 10f + m * 0.01f      // same direction, distinct magnitudes
      v((g + 1) % 64) += m * 0.001f // tiny off-axis spread (keeps members distinct)
      ((m * 40 + g).toLong, v)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val paths = Vectors.semanticClusterPaths(emb, numClusters = 40, dim = 64,
      maxClusterSize = 10, maxLevels = 1)
    val cids = paths.select("cid").distinct().collect().map(_.getString(0))
    val splitParents = cids.filter(_.contains(".")).map(_.takeWhile(_ != '.')).toSet
    assert(splitParents.size >= 32,
      s"expected >=32 simultaneously-hot clusters split, got ${splitParents.size}")
    val p = paths.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"sub-assignment not a broadcast join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    // the reassignment is ONE case-branch per level, not one per hot path:
    // plan text must not grow with hot-cluster count
    val caseCount = "CASE WHEN".r.findAllIn(
      paths.queryExecution.optimizedPlan.toString).size
    assert(caseCount <= 2, s"per-hot-path branch growth: $caseCount CASE WHENs")
  }

  test("persistLevels caches each level and leaves results identical") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // dense blob that needs >=2 split levels under cap 12
    def around(center: Array[Float], n: Int, spread: Float) =
      (0 until n).map(_ => center.map(c => c + (rnd.nextFloat() * 2f - 1f) * spread))
    val vecs = around(Array.fill(8)(10f), 80, 0.5f) ++
      around(Array.tabulate(8)(i => if (i % 2 == 0) -10f else 10f), 20, 0.5f)
    val emb = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "cid").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val plain = Vectors.semanticClusterPaths(emb, 2, 8, 12, 4)
    val cached = Vectors.semanticClusterPaths(emb, 2, 8, 12, 4, persistLevels = true)
    assert(snap(cached) == snap(plain))
    // the knob actually cut the lineage: the final frame reads a cached level
    assert(cached.queryExecution.optimizedPlan.toString.contains("InMemoryRelation"),
      "persistLevels did not cache a level")
    cached.unpersist()
  }
}
