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
