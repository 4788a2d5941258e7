package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Byte-pair-encoding merge-table induction (Sennrich et al., "Neural
  * Machine Translation of Rare Words with Subword Units", ACL 2016) —
  * the tokenizer-TRAINING step a training-data pipeline ultimately
  * feeds: q67 counts BPE-ish tokens and q116 induces a frequency
  * vocab; this learns the merge table itself.
  *
  * Distributed shape (the part that matters at 100 TB):
  *  - the corpus is tokenized and reduced to the WORD-FREQUENCY basis
  *    once (the q116 hash-agg shape) and persisted — vocab-sized, not
  *    corpus-sized; the corpus text is never touched again.
  *  - each merge round is ONE hash aggregate of adjacent symbol pairs
  *    over that basis (domain ≤ Σ|word| over the vocab, map-side
  *    combined — pairs only, no corpus shuffle) + a 1-row driver
  *    argmax (TakeOrderedAndProject with k = 1; ties break on
  *    (pair count desc, lhs, rhs) so training is a pure function of
  *    the corpus in any engine) + a stateless native merge-kernel map
  *    (`BpeMergeExpr`) over the basis.
  *  - rounds chain kernels on the persisted basis; at tokenizer-scale
  *    merge counts (30k+) re-persist the basis every few hundred
  *    rounds to keep lineage flat — at the q125 scale (8 rounds) the
  *    chain is the cheaper choice.
  */
object Bpe {

  final case class Merge(round: Int, lhs: String, rhs: String, pairCount: Long)

  /** Learn the first `nMerges` BPE merges from whitespace-tokenized
    * `textCol`. Initial symbols are characters; each round merges the
    * globally most frequent adjacent pair (frequency = Σ word freq
    * over occurrences, counted greedily non-overlapping via the
    * previous rounds' applications).
    */
  def trainMerges(docs: DataFrame, textCol: String, nMerges: Int): Seq[Merge] = {
    require(nMerges >= 1, "nMerges must be positive")
    val words = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .select(expr("filter(split(token, ''), x -> x <> '')").as("syms"),
        col("freq"))
      .persist()
    try {
      var cur: DataFrame = words
      val out = Seq.newBuilder[Merge]
      for (k <- 1 to nMerges) {
        val best = cur.filter(size(col("syms")) >= 2)
          .select(col("freq"), explode(expr(
            "zip_with(slice(syms, 1, size(syms)-1), slice(syms, 2, size(syms)-1), (l, r) -> struct(l, r))"))
            .as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum("freq").as("cnt"))
          .orderBy(col("cnt").desc, col("l"), col("r"))
          .limit(1).collect()
        require(best.nonEmpty,
          s"corpus exhausted after ${k - 1} merges — every word is one symbol")
        val (l, r, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        out += Merge(k, l, r, c)
        cur = cur.select(
          graft.plans.BpeMergeExpr.bpe_merge(col("syms"), l, r).as("syms"),
          col("freq"))
      }
      out.result()
    } finally { words.unpersist(); () }
  }

  /** Apply a learned merge table to a symbol array column in training
    * order — the ENCODE side of the tokenizer (chained stateless
    * kernel maps; per-row, zero shuffles).
    */
  def applyMerges(syms: Column, merges: Seq[Merge]): Column =
    merges.sortBy(_.round).foldLeft(syms) { (c, m) =>
      graft.plans.BpeMergeExpr.bpe_merge(c, m.lhs, m.rhs)
    }

  /** Corpus-encode statistics under a learned merge table: per doc,
    * (n_tokens, n_chars, n_subwords) — the tokenizer-apply step that
    * turns a merge table into corpus token budgets (q95's fill, q79's
    * packing, and any "how many tokens is this corpus" answer).
    *
    * Scale shape: encoding a word depends only on the word, so the
    * merge chain runs ONCE PER DISTINCT WORD on the vocab basis (the
    * [[trainMerges]] hash-agg shape, vocab-sized) and rides back to
    * the corpus as a BROADCAST join on the exploded tokens — the
    * corpus-sized side is never shuffled; the per-doc rollup is one
    * partial-aggregated groupBy. Encoding per occurrence (a plain
    * kernel map) would be shuffle-free too but repeats Σ|word|·nMerges
    * work per DUPLICATE occurrence — the vocab basis is ~100× smaller
    * than the corpus at web scale.
    */
  def encodeStats(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val chars = expr("filter(split(token, ''), x -> x <> '')")
    val vocabEnc = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("token"))
      .distinct()
      .select(col("token"),
        size(applyMerges(chars, merges)).cast("long").as("__n_sub"))
    docs
      .select(col(idCol), explode_outer(TextFunctions.tokens(col(textCol))).as("token"))
      .join(broadcast(vocabEnc), Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(count(col("token")).as("n_tokens"),
        coalesce(sum(length(col("token"))), lit(0L)).as("n_chars"),
        coalesce(sum(col("__n_sub")), lit(0L)).as("n_subwords"))
  }
}
