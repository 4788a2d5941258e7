package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Inverted-index build and conjunctive keyword search — the exact-
  * match retrieval tier next to BM25 ranking (q84) and the ANN family
  * (q40/q42/q43/q102/q128): a corpus platform answers "every document
  * containing ALL of these terms" from a posting-list table, never by
  * rescanning text.
  */
object Search {

  /** Posting lists: one row per (term, id, tf). The corpus tokenizes
    * once; the groupBy shuffles (term, id) pairs — digest-free because
    * the term IS the key users query by.
    */
  def buildPostings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy("term", "id").agg(count(lit(1)).as("tf"))

  /** Persist postings bucketed AND sorted by term — the q96/q98/q124
    * store treatment: a term-probe never exchanges or sorts the store
    * side, and co-bucketed maintenance joins stay exchange-free. The
    * pre-write repartition gives one sorted file per bucket.
    */
  def writePostingsStore(postings: DataFrame, table: String, path: String,
      buckets: Int = 8): Unit =
    postings.repartition(buckets, col("term"))
      .write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, "term")
      .sortBy("term", "id")
      .saveAsTable(table)

  def postingsStore(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Incremental index maintenance under document UPDATES and inserts:
    * postings of every id present in `deltaDocs` are replaced by the
    * delta's freshly-built postings (an updated document must not leave
    * stale terms behind), ids absent from the delta pass through.
    *
    * Scale shape: the replaced-id set is DELTA-sized and broadcasts,
    * so the index side — the corpus-scale input — is a stateless
    * anti-join probe with NO shuffle (the q98/q124 store-maintenance
    * law, applied to postings). The union appends the delta postings,
    * whose build cost is delta-sized. Equivalence contract: result ≡
    * `buildPostings` of the post-update corpus (q143 pins it by full
    * replay).
    */
  def upsertPostings(index: DataFrame, deltaDocs: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val deltaPostings = buildPostings(deltaDocs, idCol, textCol)
    val replaced = deltaDocs.select(col(idCol).as("id")).distinct()
    index.join(broadcast(replaced), Seq("id"), "left_anti")
      .unionByName(deltaPostings)
  }

  /** Conjunctive (AND) search: ids whose posting rows cover EVERY query
    * term, scored by summed tf. The term filter pushes into the scan
    * (partition-pruned on a bucketed store), so the aggregate sees only
    * |query terms| posting lists — query cost is posting-sized, corpus-
    * independent. Terms are deduplicated so a repeated query term
    * cannot double-count the coverage test.
    */
  def conjunctive(postings: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    val qs = terms.distinct
    postings.filter(col("term").isin(qs: _*))
      .groupBy("id")
      .agg(count(lit(1)).as("n_terms"), sum("tf").as("score"))
      .filter(col("n_terms") === qs.size)
      .select(col("id"), col("score"))
  }
}
