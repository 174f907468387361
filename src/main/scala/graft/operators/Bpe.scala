package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative byte-pair-encoding tokenizer training — the full merge loop
  * (`t_bpe_pairs` is one round of its counting step).
  *
  * Classic BPE formulation: each distinct word becomes a space-separated
  * symbol sequence; every round counts adjacent symbol pairs weighted by
  * word frequency, picks the most frequent pair (ties: lexicographic), and
  * fuses it everywhere, greedily left-to-right. The distributed discipline
  * mirrors the other iterative operators (Joins.resolveRoots): per-round
  * work runs on the DISTINCT-word table (vocab-sized, not corpus-sized),
  * the winning pair is a one-row aggregate collected to the driver
  * (O(rounds) driver state, the same budget as IVF centroids), and each
  * merge applies as one regexp_replace projection — the only shuffle per
  * round is the pair-count aggregation.
  */
object Bpe {

  /** Internal pair separator — never occurs in document text. */
  private val Sep = "\u0001"

  /** Learn `rounds` merges from a (word, freq) table. Returns the ordered
    * merge list, each as (left symbol, right symbol, weighted count).
    * Stops early when no adjacent pair remains. Words containing the
    * internal separator byte (hostile/binary corpus text) are dropped up
    * front — they would corrupt the pair encoding — so untrusted input
    * degrades gracefully instead of crashing the driver loop. */
  def learnMerges(wordFreq: DataFrame, rounds: Int): Seq[(String, String, Long)] = {
    var seqs = wordFreq.filter(!col("word").contains(Sep)).select(
      concat_ws(" ", expr(
        "transform(sequence(1, length(word)), i -> substr(word, i, 1))"))
        .as("syms"),
      col("freq"))
      .localCheckpoint() // vocab-sized; truncate lineage between rounds
    val merges = Seq.newBuilder[(String, String, Long)]
    for (_ <- 1 to rounds) {
      val toks = split(col("syms"), " ")
      val best = seqs
        .filter(size(toks) >= 2)
        .select(col("freq"), explode(zip_with(
          slice(toks, lit(1), size(toks) - 1),
          slice(toks, lit(2), size(toks) - 1),
          (a, b) => concat(a, lit(Sep), b))).as("pair"))
        .groupBy(col("pair")).agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("pair").asc).limit(1)
        .collect() // exactly one row per round — driver state is O(rounds)
      if (best.isEmpty) return merges.result()
      val Array(l, r) = best(0).getString(0).split(Sep)
      merges += ((l, r, best(0).getLong(1)))
      // fuse every "l r" symbol-boundary occurrence into "lr", greedily
      // left-to-right (the reference BPE semantics)
      val pat = "(?<=^| )" + java.util.regex.Pattern.quote(l + " " + r) +
        "(?=$| )"
      seqs = seqs.select(
        regexp_replace(col("syms"), pat,
          java.util.regex.Matcher.quoteReplacement(l + r)).as("syms"),
        col("freq"))
        .localCheckpoint()
    }
    merges.result()
  }

  /** Tokenize words with a learned merge list: replay the merges in order.
    * Pure projection — merge literals constant-fold into the plan. PARITY
    * PATH ONLY: one regexp_replace per merge nests the expression tree
    * linearly in the rule count, which blows past codegen/JVM method
    * limits long before a production tokenizer's 32k–50k rules. The scale
    * path is [[applyMergesScalable]]; OperatorsSpec proves them equal. */
  def applyMerges(wordFreq: DataFrame,
                  merges: Seq[(String, String, Long)]): DataFrame = {
    val start = concat_ws(" ", expr(
      "transform(sequence(1, length(word)), i -> substr(word, i, 1))"))
    val toked = merges.foldLeft(start) { case (acc, (l, r, _)) =>
      regexp_replace(acc,
        "(?<=^| )" + java.util.regex.Pattern.quote(l + " " + r) + "(?=$| )",
        java.util.regex.Matcher.quoteReplacement(l + r))
    }
    wordFreq.select(col("word"), col("freq"), toked.as("tokens"))
  }

  /** Tokenize words with a learned merge list in ONE per-partition pass —
    * the scale path for production-sized rule lists. The rank table is a
    * plain JVM map in the task closure (≤ a few MB at 50k rules, the same
    * broadcast budget as the ANN codebooks); per word the pass repeatedly
    * fuses the lowest-RANKED adjacent pair present, left-to-right — the
    * standard BPE tokenizer loop. Cost is independent of the rule count
    * (O(len²) worst case per word), where the replay path pays O(rules)
    * expression nodes per row.
    *
    * Equal to [[applyMerges]]'s in-order replay by the training
    * invariant: a learned rule can only reference symbols created by
    * EARLIER rules, so when rule k's pair is present no rule before k is
    * applicable, and fusing by minimum rank reproduces the replay order
    * exactly (proved against the replay path at 64 rounds on the real
    * corpus by OperatorsSpec). Words containing no rule's pair pass
    * through as character tokens.
    */
  def applyMergesScalable(wordFreq: DataFrame,
                          merges: Seq[(String, String, Long)]): DataFrame = {
    val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.map { case ((l, r, _), i) => (l, r) -> i }.toMap
    val spark = wordFreq.sparkSession
    import spark.implicits._
    wordFreq.select(col("word").cast("string"), col("freq").cast("long"))
      .as[(String, Long)]
      .mapPartitions(_.map { case (word, freq) =>
        (word, freq, tokenizeWord(word, ranks))
      })
      .toDF("word", "freq", "tokens")
  }

  /** One word through the rank-priority merge loop; returns the
    * space-joined symbol sequence ([[applyMerges]]'s `tokens` format). */
  private[operators] def tokenizeWord(
      word: String, ranks: Map[(String, String), Int]): String = {
    var syms: Array[String] = word.map(_.toString).toArray
    var exhausted = syms.length < 2
    while (!exhausted) {
      // lowest-ranked adjacent pair present in the word
      var best = Int.MaxValue
      var bi = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) { best = r; bi = i }
        i += 1
      }
      if (bi < 0) exhausted = true
      else {
        // fuse every occurrence of that pair, greedily left-to-right —
        // exactly the replay path's regexp_replace semantics
        val (l, r) = (syms(bi), syms(bi + 1))
        val out = Array.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j + 1 < syms.length && syms(j) == l && syms(j + 1) == r) {
            out += l + r; j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.result()
        if (syms.length < 2) exhausted = true
      }
    }
    syms.mkString(" ")
  }
}
