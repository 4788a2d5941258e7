package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Unigram-LM vocabulary induction (the deterministic integer core of
  * Kudo, "Subword Regularization: ... Multiple Subword Candidates",
  * ACL 2018 — the SentencePiece unigram model): seed a candidate
  * piece inventory from frequent substrings, segment every word by
  * greedy longest match, and keep the pieces that earn their place
  * (utility = frequency-weighted usage under the segmentation). This
  * completes the tokenizer lifecycle next to BPE (q125 trains merges,
  * q129 applies them): BPE grows a vocab bottom-up by merging; the
  * unigram model starts big and PRUNES — the two families production
  * tokenizers come from.
  *
  * Everything is exact integer arithmetic over deterministic
  * tie-free choices (the longest match at a position is unique
  * because a candidate piece IS the substring it matches), so q148
  * replays training end-to-end in DuckDB — the q125 unrolled-CTE
  * pattern applied to segmentation steps instead of merge rounds.
  *
  * Distributed shape (the 100 TB posture):
  *  - the corpus reduces ONCE to the word-frequency basis (the q116/
  *    q125 hash-agg shape); training never touches corpus text again;
  *  - candidate counting is one explode of per-word substring lists
  *    over that basis + a map-side-combined sum with a count floor —
  *    the candidate space is bounded by the floor (|cand| ≤ weighted
  *    substring mass / minPieceCount), which is what licenses
  *    collecting it: the set is baked into a native kernel
  *    ([[graft.plans.GreedyPiecesExpr]]) and segmentation is ONE
  *    codegen'd pass over the vocab-sized basis — no joins, no
  *    per-step jobs. (A 16-step lockstep-join formulation was built
  *    first and measured 19.4 s at the 10× corpus on pure fixed
  *    overhead — checkpoint + 3 broadcast builds per step; the
  *    kernel form is a single job.)
  */
object Unigram {

  /** Train the pruned piece vocabulary. Returns (piece, cp, utility):
    * the candidate's raw frequency-weighted substring count and its
    * usage under greedy segmentation; only pieces with
    * `utility >= minUtility` survive.
    *
    * Words longer than `maxWordLen` are dropped from the basis (the
    * unrolled replay bound — raise it for morpheme-rich corpora).
    * `maxCandidates` is the driver-collect guard (the limit+require
    * overflow pattern): a corpus whose floor admits more candidates
    * than this should raise the floor, not the cap.
    */
  def pruneVocab(docs: DataFrame, textCol: String,
      minPieceCount: Long = 50L, minUtility: Long = 50L,
      maxPieceLen: Int = 4, maxWordLen: Int = 16,
      maxCandidates: Int = 1 << 20): DataFrame = {
    require(maxPieceLen >= 2 && maxWordLen >= maxPieceLen,
      "need maxPieceLen >= 2 and maxWordLen >= maxPieceLen")
    val words = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .filter(length(col("word")) <= maxWordLen)
      .persist()
    try {
      val subs = (2 to maxPieceLen).map { l =>
        words.filter(length(col("word")) >= l)
          .select(explode(expr(
            s"transform(sequence(0, length(word) - $l), i -> substring(word, i + 1, $l))"))
            .as("piece"), col("freq"))
      }.reduce(_ unionByName _)
      // not persisted: the collect below and the final cp join each
      // re-run one vocab-sized aggregate over the CACHED word basis
      val cand = subs.groupBy("piece").agg(sum("freq").as("cp"))
        .filter(col("cp") >= minPieceCount)
      val collected = cand.select("piece").limit(maxCandidates + 1)
        .collect().map(_.getString(0))
      require(collected.length <= maxCandidates,
        s"candidate set exceeds maxCandidates=$maxCandidates — raise minPieceCount")
      val usage = words
        .select(explode(graft.plans.GreedyPiecesExpr.greedyPieces(
          col("word"), collected.toSeq, maxPieceLen)).as("piece"), col("freq"))
        .groupBy("piece").agg(sum("freq").as("utility"))
        .filter(col("utility") >= minUtility)
      cand.join(usage, "piece")
        .select(col("piece"), col("cp"), col("utility"))
    } finally { words.unpersist(); () }
  }
}
