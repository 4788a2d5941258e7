package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Corpus-level text operators (beyond the per-row functions in
  * TextFunctions): TF-IDF scoring, top-terms extraction, and
  * gaps-and-islands sessionization. These are the library forms of the
  * oracle-checked catalog queries q39/q31 — a user composes them over
  * any DataFrame with the right columns.
  */
object TextOps {

  /** (id, term, tf, df, score) for every term occurrence.
    * One explode + two aggregations. The document-frequency side is
    * deliberately NOT broadcast-hinted: the vocabulary is usually tiny
    * relative to the corpus, but at web scale a distinct-token table
    * can exceed broadcast limits — AQE sees the df aggregate's real
    * shuffle size at runtime and picks broadcast when it fits, sort-
    * merge when it doesn't (the size guard a static hint cannot give).
    */
  def tfidf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      explode(TextFunctions.tokens(col(textCol))).as("term"))
    val tf = toks.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    // df from the already-distinct tf rows, not the raw token stream —
    // a plain count, and one less O(tokens) shuffle
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .select(col("id"), col("term"), col("tf"), col("df"),
        (col("tf") * log(col("n_docs") / col("df"))).as("score"))
  }

  /** Top-k highest-TF-IDF terms per document (deterministic term
    * tiebreak).
    */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col("id")).orderBy(col("score").desc, col("term"))
    tfidf(docs, idCol, textCol)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }

  /** Token-set (1-gram) Jaccard near-dup pairs within blocking
    * buckets — the library form of catalog query q38. Explode distinct
    * tokens, self-join on token within the blocking columns, count
    * intersections, derive |A∪B| = |A|+|B|−|A∩B|: the token join
    * shuffles on the token key and never materializes the O(n²) pair
    * space outside the blocks.
    *
    * `maxDfFraction` is the skew guard: tokens whose document
    * frequency exceeds this fraction of the corpus are dropped BEFORE
    * the self-join (from both the intersection counts and the set
    * sizes, so the Jaccard is consistently over the pruned
    * vocabulary). Without it a corpus-wide stopword forms one join
    * group of ~all documents in its block, and hot-token groups grow
    * quadratically with corpus size even though blocking bounds the
    * total; high-df tokens carry ~no Jaccard signal, so the standard
    * fix is to prune them, which bounds every join group at
    * `maxDfFraction × docs`. Returns (id1, id2, jaccard), id1 < id2,
    * for pairs sharing at least one surviving token.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      blockCols: Seq[String] = Nil, maxDfFraction: Double = 0.5): DataFrame = {
    val blocks = blockCols.map(col)
    val allToks = docs.select(col(idCol).as("id") +: blocks :+
      explode(TextFunctions.tokenSet(col(textCol))).as("tok"): _*)
    // document frequency from the distinct (doc, tok) stream; the
    // vocabulary-sized df side is AQE-broadcast into the pruning join
    val dfreq = allToks.groupBy("tok").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val toks = allToks.join(dfreq, "tok").crossJoin(broadcast(nDocs))
      .filter(col("df") <= col("n_docs") * maxDfFraction)
      .select(col("id") +: blocks :+ col("tok"): _*)
    val sizes = toks.groupBy("id").agg(count(lit(1)).as("n"))
    val a = toks.alias("a")
    val b = toks.alias("b")
    val cond = blockCols.foldLeft(
      col("a.tok") === col("b.tok") && col("a.id") < col("b.id")) {
      (acc, c) => acc && col(s"a.$c") === col(s"b.$c")
    }
    a.join(b, cond)
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
      .agg(count(lit(1)).as("n_both"))
      .join(sizes.select(col("id").as("id1"), col("n").as("na")), "id1")
      .join(sizes.select(col("id").as("id2"), col("n").as("nb")), "id2")
      .select(col("id1"), col("id2"),
        (col("n_both").cast("double") / (col("na") + col("nb") - col("n_both")))
          .as("jaccard"))
  }

  /** Fixed-size token chunking for training-data preparation: each
    * document becomes ceil(n_tokens / chunkSize) chunks of up to
    * `chunkSize` tokens, id'd 0-based in token order. Fully relational
    * — explode tokens with position, group by (doc, pos / chunkSize) —
    * so a 100 TB corpus chunks in one shuffle with no per-document
    * driver logic; chunk text is reassembled order-stable via
    * array_sort over (pos, token) structs. Empty documents yield no
    * chunks.
    */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int): DataFrame = {
    val tok = docs.select(col(idCol).as("id"),
      posexplode(TextFunctions.tokens(col(textCol))).as(Seq("pos", "tok")))
    tok.groupBy(col("id"), floor(col("pos") / chunkSize).cast("long").as("chunk_id"))
      .agg(
        array_join(transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
          _.getField("tok")), " ").as("chunk_text"),
        count(lit(1)).as("n_tokens"))
  }

  /** Gaps-and-islands sessionization over any keyed, timestamped
    * DataFrame: a new session starts after `gapSeconds` of inactivity.
    * Returns the input plus a per-key `session_id` (1-based).
    * Batch twin of `EventStreams.sessionAgg` (session_window).
    */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
      gapSeconds: Long, tiebreak: Seq[String] = Nil): DataFrame = {
    val order = (col(tsCol) +: tiebreak.map(col)).toSeq
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__prev_us", lag(unix_micros(col(tsCol)), 1).over(w))
      .withColumn("__is_new",
        when(col("__prev_us").isNull
          || unix_micros(col(tsCol)) - col("__prev_us") > gapSeconds * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum("__is_new").over(wCum))
      .drop("__prev_us", "__is_new")
  }
}
