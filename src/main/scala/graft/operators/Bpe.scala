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
    * Pure projection — merge literals constant-fold into the plan. */
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
}
