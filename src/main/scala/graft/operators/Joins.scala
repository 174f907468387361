package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join-shaped operators from SURVEY.md §2.3 that go beyond a single Spark
  * `join` call: iterative identifier-graph traversals (J2/J3) and the
  * substring-containment theta join (J1).
  *
  * The reference does all of these as client-side Python loops over dict
  * lookups (`pid_resolution.py:207-416`); here they are distributed joins.
  */
object Joins {

  /** J2: resolve every node of a parent-pointer forest to its root — the
    * obsolescence-chain head walk (`pid_resolution.py:207-282`, depth cap 20
    * at `:236`).
    *
    * Uses pointer jumping (path doubling): each iteration joins the current
    * node→ancestor mapping with itself, squaring the distance covered, so a
    * depth-D chain resolves in ceil(log2 D) shuffles instead of D. At 100 TB
    * the self-join shuffles on the ancestor key both sides — hash-partitioned
    * equi-join, AQE handles skew; `localCheckpoint` truncates the exploding
    * lineage each round.
    *
    * `maxDepth` is a LOWER BOUND on resolvable chain depth, not a cap: the
    * round count covers depth 2^ceil(log2 maxDepth)·2 (e.g. 64 for the
    * reference's 20, `pid_resolution.py:236`). If the fixpoint is still not
    * reached after the final round — a chain deeper than that bound — the
    * method THROWS rather than silently resolving nodes to a mid-chain
    * ancestor.
    *
    * @param edges (child, parent) pairs; roots appear only as parents.
    * @return (node, root) for every node incl. roots themselves.
    */
  def resolveRoots(edges: DataFrame, maxDepth: Int = 20): DataFrame = {
    // edges is consumed three times below (two node scans + the seed join);
    // materialize once so an expensive upstream (e.g. a window over the
    // fact table) doesn't run per consumer
    val e = edges.localCheckpoint()
    val nodes = e.select(col("child").as("node"))
      .union(e.select(col("parent").as("node")))
      .filter(col("node").isNotNull).distinct()
    // anc = current known ancestor (root once fixpoint is reached)
    var m = nodes.join(e, nodes("node") === e("child"), "left")
      .select(col("node"), coalesce(col("parent"), col("node")).as("anc"))
    val rounds = math.max(1, math.ceil(math.log(maxDepth.max(2)) / math.log(2)).toInt + 1)
    var converged = false
    for (_ <- 1 to rounds if !converged) {
      val jump = m.select(col("node").as("j_node"), col("anc").as("j_anc"))
      val next = m.join(jump, m("anc") === jump("j_node"), "left")
        .select(col("node"), coalesce(col("j_anc"), col("anc")).as("anc"),
          (col("j_anc").isNotNull && col("j_anc") =!= m("anc")).as("moved"))
        .localCheckpoint() // truncate lineage; also the per-round barrier
      // early exit at fixpoint (cheap: scans the checkpointed blocks)
      converged = next.filter(col("moved")).isEmpty
      m = next.drop("moved")
    }
    // (measured: composing twice per barrier — distance ×4 — is net slower
    // here; the extra exchanges cost more than the saved checkpoints)
    if (!converged) {
      // the final round still moved pointers; verify whether it happened to
      // finish the job (cheap: one join over the checkpointed mapping), and
      // refuse to return mid-chain ancestors as roots otherwise
      val jump = m.select(col("node").as("j_node"), col("anc").as("j_anc"))
      val stillMoving = m.join(jump, m("anc") === jump("j_node"), "left")
        .filter(col("j_anc").isNotNull && col("j_anc") =!= m("anc"))
      if (!stillMoving.isEmpty)
        throw new IllegalStateException(
          s"resolveRoots did not converge: chain deeper than covered bound " +
            s"for maxDepth=$maxDepth (rounds=$rounds); raise maxDepth")
    }
    m.withColumnRenamed("anc", "root")
  }

  /** J3: bounded transitive closure — the identifier-family expansion
    * (`pid_resolution.py:285-416`): emit (node, ancestor, depth) for every
    * ancestor reachable in 1..maxDepth parent steps.
    *
    * BFS by levels: level k+1 = level k ⋈ edges. Each level is one shuffle
    * on the join key; output size is bounded by maxDepth × |edges|.
    */
  def closurePairs(edges: DataFrame, maxDepth: Int): DataFrame = {
    val edgesM = edges.localCheckpoint() // consumed once per level
    var level = edgesM.select(col("child").as("node"),
      col("parent").as("ancestor"), lit(1).as("depth"))
      .filter(col("ancestor").isNotNull)
    var acc = level
    for (d <- 2 to maxDepth) {
      val e = edgesM.select(col("child").as("e_child"), col("parent").as("e_parent"))
      level = level.join(e, level("ancestor") === e("e_child"), "inner")
        .filter(col("e_parent").isNotNull)
        .select(col("node"), col("e_parent").as("ancestor"), lit(d).as("depth"))
        .localCheckpoint()
      acc = acc.union(level)
    }
    acc
  }

  /** J1: substring-containment theta join (`metricsreader.py:423-468`): each
    * probe row matches when its (lower-cased) `targetExpr` is contained in
    * the fact's `haystackExpr`. Executed as a broadcast-nested-loop join —
    * only valid because the probe side is a small dimension (citations per
    * request in the reference). At 100 TB the right fix is ID normalization
    * to an equi-join (SURVEY.md §7.4.3); this is the exact-parity fallback.
    */
  def thetaContainsJoin(facts: DataFrame, probes: DataFrame,
                        haystackExpr: Column, targetExpr: Column): DataFrame =
    facts.join(broadcast(probes), contains(lower(haystackExpr), lower(targetExpr)))
}
