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
    *
    * `batchSize` > 1 learns up to that many SYMBOL-DISJOINT merges per
    * counting round (the fastBPE batching idea): candidates are taken
    * in (cnt DESC, l, r) order, skipping any pair sharing a symbol
    * with one already accepted this round — including the NEW symbol
    * l+r an accepted merge creates, so no batch member is ever applied
    * to symbols another member just built. Merging a pair only changes
    * the counts of pairs that CONTAIN one of its symbols, so the
    * accepted pairs' counts are exactly their sequential values and
    * their kernel applications commute. The one divergence from
    * batchSize = 1: a pair CREATED by an earlier accepted merge (it
    * contains the new symbol) can in principle outrank a later batch
    * member, which strict sequential training would honor — so B = 1
    * remains the exact-sequential default (q125) and the batched form
    * is the measured scale path (driver rounds cut ~B×; q161 pins
    * batched ≡ sequential on a conflict-free corpus). Each round is
    * still ONE count job over the vocab-sized word basis.
    */
  /** Vocab-size ceiling for driver-LOCAL training (see
    * [[collectBasisIfSmall]]): at or below it the word basis collects
    * once and the merge rounds run in driver memory; above it the
    * distributed round loop runs unchanged. Conf-overridable
    * (`spark.graft.bpe.localTrainMaxVocab`; 0 forces distributed —
    * how the differential spec pins local ≡ distributed).
    */
  private val LocalTrainMaxVocabDefault = 1000000L

  private def localTrainMaxVocab(df: DataFrame): Long =
    df.sparkSession.conf
      .getOption("spark.graft.bpe.localTrainMaxVocab")
      .map(_.toLong).getOrElse(LocalTrainMaxVocabDefault)

  /** The word-frequency basis, collected when it fits the local-train
    * ceiling (`head(max+1)` — one job, bounded result), else None.
    * The basis is vocab-bounded BY CONSTRUCTION (distinct words), the
    * same bound every per-round `collect` of the distributed loop
    * already relies on.
    */
  private def collectBasisIfSmall(words: DataFrame,
      maxVocab: Long): Option[Array[(Array[String], Long)]] = {
    if (maxVocab <= 0) return None
    val lim = math.min(maxVocab, (Int.MaxValue - 2).toLong).toInt
    val rows = words.head(lim + 1)
    if (rows.length > lim) None
    else Some(rows.map(r =>
      (r.getSeq[String](0).toArray, r.getLong(1))))
  }

  /** Unsigned UTF-8 byte comparison — Spark's StringType ordering
    * (java.lang.String.compareTo is UTF-16-unit order and diverges on
    * supplementary characters, so the local tie-breaks must not use
    * it). */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = org.apache.spark.unsafe.types.UTF8String.fromString(a)
    val y = org.apache.spark.unsafe.types.UTF8String.fromString(b)
    x.compareTo(y) < 0
  }

  /** Driver-local mirror of [[graft.plans.BpeMergeExpr]]'s greedy
    * leftmost non-overlapping merge (differential-spec'd against the
    * kernel via the local-≡-distributed training pin). */
  private def mergeLocal(syms: Array[String], l: String, r: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** The adjacent-pair frequency table of a local basis — one entry
    * per (l, r) with Σ word freq over every adjacent occurrence,
    * identical to the distributed zip_with/groupBy round. */
  private def localPairCounts(basis: Array[(Array[String], Long)])
      : scala.collection.mutable.HashMap[(String, String), Long] = {
    val m = scala.collection.mutable.HashMap.empty[(String, String), Long]
    basis.foreach { case (syms, freq) =>
      var i = 0
      while (i + 1 < syms.length) {
        val k = (syms(i), syms(i + 1))
        m.update(k, m.getOrElse(k, 0L) + freq)
        i += 1
      }
    }
    m
  }

  /** Driver-local BPE training rounds — bit-identical decisions to the
    * distributed loop (same candidate window `4B+16`, same
    * (cnt DESC, l, r) order with UTF-8-byte string comparison, same
    * conflict rule, same greedy merge application), minus the 2–3
    * Spark jobs per round: with an 8-merge table that was ~16 jobs of
    * pure scheduling overhead per training call at sf0.1, and the
    * round-R re-application of R−1 chained kernels over the persisted
    * basis. Runs only when the basis fits the local ceiling.
    */
  private def trainMergesLocal(basis0: Array[(Array[String], Long)],
      nMerges: Int, batchSize: Int): Seq[Merge] = {
    var basis = basis0
    val out = scala.collection.mutable.ArrayBuffer.empty[Merge]
    while (out.size < nMerges) {
      val want = math.min(batchSize, nMerges - out.size)
      val top = localPairCounts(basis).toArray
        .sortWith { case (((l1, r1), c1), ((l2, r2), c2)) =>
          if (c1 != c2) c1 > c2
          else if (l1 != l2) utf8Lt(l1, l2)
          else utf8Lt(r1, r2)
        }
        .take(want * 4 + 16)
      require(top.nonEmpty,
        s"corpus exhausted after ${out.size} merges — every word is one symbol")
      val used = scala.collection.mutable.HashSet.empty[String]
      val it = top.iterator
      var accepted = 0
      while (accepted < want && it.hasNext) {
        val ((l, r), cnt) = it.next()
        if (!used(l) && !used(r)) {
          out += Merge(out.size + 1, l, r, cnt)
          used += l; used += r; used += (l + r)
          basis = basis.map { case (s, f) => (mergeLocal(s, l, r), f) }
          accepted += 1
        }
      }
    }
    out.toSeq
  }

  def trainMerges(docs: DataFrame, textCol: String, nMerges: Int,
      batchSize: Int = 1): Seq[Merge] = {
    require(nMerges >= 1, "nMerges must be positive")
    require(batchSize >= 1, "batchSize must be positive")
    val wordsPlan = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .select(expr("filter(split(token, ''), x -> x <> '')").as("syms"),
        col("freq"))
    collectBasisIfSmall(wordsPlan, localTrainMaxVocab(docs)) match {
      case Some(basis) => return trainMergesLocal(basis, nMerges, batchSize)
      case None => ()
    }
    val words = wordsPlan.persist()
    try {
      var cur: DataFrame = words
      val out = scala.collection.mutable.ArrayBuffer.empty[Merge]
      while (out.size < nMerges) {
        val want = math.min(batchSize, nMerges - out.size)
        // window of 4B+16 candidates: enough to fill a disjoint batch
        // past skips without collecting the whole pair table; a window
        // that still can't fill the batch just costs one more round
        val top = cur.filter(size(col("syms")) >= 2)
          .select(col("freq"), explode(expr(
            "zip_with(slice(syms, 1, size(syms)-1), slice(syms, 2, size(syms)-1), (l, r) -> struct(l, r))"))
            .as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum("freq").as("cnt"))
          .orderBy(col("cnt").desc, col("l"), col("r"))
          .limit(want * 4 + 16).collect()
        require(top.nonEmpty,
          s"corpus exhausted after ${out.size} merges — every word is one symbol")
        val used = scala.collection.mutable.HashSet.empty[String]
        val it = top.iterator
        var accepted = 0
        while (accepted < want && it.hasNext) {
          val row = it.next()
          val (l, r) = (row.getString(0), row.getString(1))
          if (!used(l) && !used(r)) {
            out += Merge(out.size + 1, l, r, row.getLong(2))
            // the merged symbol joins the conflict set too: a candidate
            // containing l+r (possible when the vocab already held that
            // concatenation from earlier overlap-limited rounds) would
            // otherwise be applied to symbols THIS merge just created,
            // making its counted pairCount stale vs sequential
            used += l; used += r; used += (l + r)
            cur = cur.select(
              graft.plans.BpeMergeExpr.bpe_merge(col("syms"), l, r).as("syms"),
              col("freq"))
            accepted += 1
          }
        }
      }
      out.toSeq
    } finally { words.unpersist(); () }
  }

  final case class WpMerge(round: Int, lhs: String, rhs: String,
      pairCount: Long, scoreE12: Long)

  /** WordPiece merge induction (Schuster & Nakajima 2012 as practised
    * by modern tokenizer libraries): identical round structure to
    * [[trainMerges]] but each round's winner maximizes the
    * LIKELIHOOD-GAIN score count(l,r) / (count(l) · count(r)) instead
    * of the raw pair count — a pair of individually-rare symbols that
    * almost always co-occur beats a pair of ubiquitous ones, which is
    * why WordPiece vocabularies pick up affixes BPE's frequency argmax
    * skips. The score is held exact as the ⌊·10¹²⌋ integer quotient
    * (numerator ≤ min(cl, cr) · 10¹² so the e12 score fits a long;
    * the products ride decimal(38,0)) with ties broken on
    * (score DESC, cnt DESC, l, r) — training stays a pure function of
    * the corpus replayable by any engine, the house determinism rule.
    *
    * Scale shape: per round, ONE pair aggregate + ONE symbol aggregate
    * over the persisted word-frequency basis (both vocab-sized,
    * map-side combined), a broadcast-joined scoring of the pair table,
    * a 1-row driver argmax, and the stateless merge kernel — the
    * corpus text is touched once, at basis construction, exactly as in
    * BPE training.
    *
    * `batchSize` > 1 accepts up to that many SYMBOL-DISJOINT merges per
    * scoring round under [[trainMerges]]'s conflict rule (the accepted
    * l, r, AND the new l+r all poison later candidates). The argument
    * carries over WITH the scores: merging (l, r) only changes pair
    * counts of pairs containing l/r/l+r and symbol counts of l, r, and
    * l+r — a disjoint later candidate's cnt, lcnt, and rcnt are all
    * exactly their sequential values, so its e12 score is too. The one
    * divergence stays the same as BPE's: a pair CREATED this round
    * (it contains the new symbol) could outrank a later batch member
    * under strict sequential replay — so B = 1 remains the
    * exact-sequential default (q190) and the batched form is the
    * measured scale path (a 30k-vocab training runs ~B× fewer of the
    * three-job rounds).
    */
  /** Driver-local WordPiece rounds — the [[trainMergesLocal]]
    * treatment with the likelihood-gain argmax: identical integer e12
    * score (BigInt products, floor quotient — positives, so BigInt
    * `/` truncation equals the distributed `div`), identical
    * (score DESC, cnt DESC, l, r) order with UTF-8-byte tie-breaks,
    * identical window and conflict rule.
    */
  private def trainWordPieceLocal(basis0: Array[(Array[String], Long)],
      nMerges: Int, batchSize: Int): Seq[WpMerge] = {
    val E12 = BigInt(1000000000000L)
    var basis = basis0
    val out = scala.collection.mutable.ArrayBuffer.empty[WpMerge]
    while (out.size < nMerges) {
      val want = math.min(batchSize, nMerges - out.size)
      val symCnt = scala.collection.mutable.HashMap.empty[String, Long]
      basis.foreach { case (syms, freq) =>
        syms.foreach(s => symCnt.update(s, symCnt.getOrElse(s, 0L) + freq))
      }
      val top = localPairCounts(basis).toArray
        .map { case ((l, r), cnt) =>
          val score = (BigInt(cnt) * E12 /
            (BigInt(symCnt(l)) * BigInt(symCnt(r)))).toLong
          (l, r, cnt, score)
        }
        .sortWith { case ((l1, r1, c1, s1), (l2, r2, c2, s2)) =>
          if (s1 != s2) s1 > s2
          else if (c1 != c2) c1 > c2
          else if (l1 != l2) utf8Lt(l1, l2)
          else utf8Lt(r1, r2)
        }
        .take(want * 4 + 16)
      require(top.nonEmpty,
        s"corpus exhausted after ${out.size} merges — every word is one symbol")
      val used = scala.collection.mutable.HashSet.empty[String]
      val it = top.iterator
      var accepted = 0
      while (accepted < want && it.hasNext) {
        val (l, r, cnt, score) = it.next()
        if (!used(l) && !used(r)) {
          out += WpMerge(out.size + 1, l, r, cnt, score)
          used += l; used += r; used += (l + r)
          basis = basis.map { case (s, f) => (mergeLocal(s, l, r), f) }
          accepted += 1
        }
      }
    }
    out.toSeq
  }

  def trainWordPiece(docs: DataFrame, textCol: String,
      nMerges: Int, batchSize: Int = 1): Seq[WpMerge] = {
    require(nMerges >= 1, "nMerges must be positive")
    require(batchSize >= 1, "batchSize must be positive")
    val wordsPlan = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .select(expr("filter(split(token, ''), x -> x <> '')").as("syms"),
        col("freq"))
    collectBasisIfSmall(wordsPlan, localTrainMaxVocab(docs)) match {
      case Some(basis) => return trainWordPieceLocal(basis, nMerges, batchSize)
      case None => ()
    }
    val words = wordsPlan.persist()
    try {
      var cur: DataFrame = words
      val out = scala.collection.mutable.ArrayBuffer.empty[WpMerge]
      while (out.size < nMerges) {
        val want = math.min(batchSize, nMerges - out.size)
        val pairs = cur.filter(size(col("syms")) >= 2)
          .select(col("freq"), explode(expr(
            "zip_with(slice(syms, 1, size(syms)-1), slice(syms, 2, size(syms)-1), (l, r) -> struct(l, r))"))
            .as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum("freq").as("cnt"))
        val symCnt = cur
          .select(explode(col("syms")).as("s"), col("freq"))
          .groupBy("s").agg(sum("freq").as("scnt"))
        // window of 4B+16 candidates: enough to fill a disjoint batch
        // past skips without collecting the whole pair table (the
        // trainMerges sizing; a short round just costs one more round)
        val top = pairs
          .join(broadcast(symCnt.select(col("s").as("l"), col("scnt").as("lcnt"))), "l")
          .join(broadcast(symCnt.select(col("s").as("r"), col("scnt").as("rcnt"))), "r")
          .select(col("l"), col("r"), col("cnt"),
            expr("CAST((CAST(cnt AS DECIMAL(38,0)) * 1000000000000) div " +
              "(CAST(lcnt AS DECIMAL(38,0)) * rcnt) AS BIGINT)").as("score_e12"))
          .orderBy(col("score_e12").desc, col("cnt").desc, col("l"), col("r"))
          .limit(want * 4 + 16).collect()
        require(top.nonEmpty,
          s"corpus exhausted after ${out.size} merges — every word is one symbol")
        val used = scala.collection.mutable.HashSet.empty[String]
        val it = top.iterator
        var accepted = 0
        while (accepted < want && it.hasNext) {
          val row = it.next()
          val (l, r) = (row.getString(0), row.getString(1))
          if (!used(l) && !used(r)) {
            out += WpMerge(out.size + 1, l, r, row.getLong(2), row.getLong(3))
            used += l; used += r; used += (l + r)
            cur = cur.select(
              graft.plans.BpeMergeExpr.bpe_merge(col("syms"), l, r).as("syms"),
              col("freq"))
            accepted += 1
          }
        }
      }
      out.toSeq
    } finally { words.unpersist(); () }
  }

  /** A WordPiece merge table viewed as apply-order merges — WordPiece
    * and BPE share the greedy non-overlapping merge kernel, so the
    * ENCODE side ([[applyMerges]], [[encodeStats]], [[saveMerges]])
    * is format-agnostic; only the training argmax differs.
    */
  def wpAsMerges(wp: Seq[WpMerge]): Seq[Merge] =
    wp.map(m => Merge(m.round, m.lhs, m.rhs, m.pairCount))

  /** Apply a learned merge table to a symbol array column in training
    * order — the ENCODE side of the tokenizer (chained stateless
    * kernel maps; per-row, zero shuffles).
    */
  def applyMerges(syms: Column, merges: Seq[Merge]): Column =
    merges.sortBy(_.round).foldLeft(syms) { (c, m) =>
      graft.plans.BpeMergeExpr.bpe_merge(c, m.lhs, m.rhs)
    }

  /** Persist a learned merge table — the tokenizer ARTIFACT a training
    * run ships to every downstream encode job (the lifecycle step
    * between train-once and encode-everywhere). Plain parquet of
    * (round, lhs, rhs, pairCount); round order IS the apply order.
    */
  def saveMerges(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[Merge], path: String): Unit = {
    import spark.implicits._
    merges.toDF("round", "lhs", "rhs", "pairCount")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a [[saveMerges]] artifact, round-ordered — `applyMerges`
    * over the result is bit-identical to the in-memory table's. */
  def loadMerges(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[Merge] = {
    import spark.implicits._
    spark.read.parquet(path)
      .select("round", "lhs", "rhs", "pairCount")
      .as[Merge].collect().toSeq.sortBy(_.round)
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
