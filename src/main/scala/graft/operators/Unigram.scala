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
  *    candidate space is bounded by the floor, not by the corpus;
  *  - segmentation advances ALL words one piece per step: `maxWordLen`
  *    steps, each a few broadcast equi-joins (candidate set is
  *    floor-bounded, so it broadcasts) against the vocab-sized state,
  *    checkpointed per step to keep lineage flat. No shuffle of
  *    anything corpus-sized anywhere.
  */
object Unigram {

  /** Train the pruned piece vocabulary. Returns (piece, cp, utility):
    * the candidate's raw frequency-weighted substring count and its
    * usage under greedy segmentation; only pieces with
    * `utility >= minUtility` survive.
    *
    * Words longer than `maxWordLen` are dropped from the basis (the
    * unrolled replay bound — raise it for morpheme-rich corpora; each
    * extra step is one more cheap vocab-sized round).
    */
  def pruneVocab(docs: DataFrame, textCol: String,
      minPieceCount: Long = 50L, minUtility: Long = 50L,
      maxPieceLen: Int = 4, maxWordLen: Int = 16): DataFrame = {
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
      // not persisted: every use re-aggregates from the CACHED word
      // basis — a vocab-sized hash agg inlined into each step's job,
      // cheaper than managing another cache epoch
      val cand = subs.groupBy("piece").agg(sum("freq").as("cp"))
        .filter(col("cp") >= minPieceCount)
      // greedy longest-match segmentation, all words in lockstep: one
      // step consumes one piece (or one uncovered char) per word
      var state = words.select(col("word"), col("freq"),
        lit(0).cast("int").as("pos"))
      var usage = words.sparkSession.emptyDataFrame
        .select(lit("").as("piece"), lit(0L).as("freq")).limit(0)
      for (_ <- 1 to maxWordLen) {
        var m = state.filter(col("pos") < length(col("word")))
        for (l <- maxPieceLen to 2 by -1)
          m = m.withColumn(s"__k$l", expr(s"substring(word, pos + 1, $l)"))
            .join(broadcast(cand.filter(length(col("piece")) === l)
              .select(col("piece").as(s"__p$l"))),
              col(s"__k$l") === col(s"__p$l"), "left")
        val picked = m.withColumn("__pick",
            coalesce((maxPieceLen to 2 by -1).map(l => col(s"__p$l")): _*))
          .withColumn("__adv",
            coalesce(when(col("__pick").isNotNull, length(col("__pick"))),
              lit(1)))
        usage = usage.unionByName(picked.filter(col("__pick").isNotNull)
          .select(col("__pick").as("piece"), col("freq")))
        state = picked
          .select(col("word"), col("freq"),
            (col("pos") + col("__adv")).cast("int").as("pos"))
          .localCheckpoint()
      }
      cand.join(usage.groupBy("piece").agg(sum("freq").as("utility")), "piece")
        .filter(col("utility") >= minUtility)
        .select(col("piece"), col("cp"), col("utility"))
    } finally {
      // states are checkpointed, so dropping the caches here only costs
      // one recompute of the tiny candidate aggregate in the final plan
      words.unpersist(); ()
    }
  }
}
