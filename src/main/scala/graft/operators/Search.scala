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

  /** Positional posting lists: one row per (term, id) with the SORTED
    * token-position array — the layout phrase and proximity queries
    * need, built like [[buildPostings]] (corpus tokenizes once, one
    * (term, id)-keyed shuffle). Persist with [[writePostingsStore]]'s
    * treatment when the index is long-lived.
    */
  def positionalPostings(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
        posexplode(TextFunctions.tokens(col(textCol))).as(Seq("pos", "term")))
      .groupBy("term", "id")
      .agg(sort_array(collect_list(col("pos"))).as("positions"))

  /** Exact phrase search: documents containing the token sequence
    * `phrase` contiguously, with the occurrence count. A phrase starts
    * at position p iff EVERY k-th phrase term has a posting at p + k,
    * so the match is the intersection of the k-SHIFTED position lists
    * — pure array arithmetic per candidate document, the classic
    * positional-index algorithm (Manning/Raghavan/Schütze IR ch. 2)
    * done relationally.
    *
    * Scale shape: the term filter lands during tokenization (before
    * any shuffle — and as a pushed scan filter when probing a
    * persisted positional store), so everything downstream is sized by
    * the QUERY TERMS' postings, not the corpus: one (id, term)
    * position-list aggregate, one id-keyed map assembly, a per-row
    * intersection. No self-joins — a j-term phrase is j−1 shifted
    * intersections inside one projection, not j−1 join stages.
    * Repeated phrase terms are handled by construction (the same
    * posting list intersects itself under different shifts).
    */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.size >= 2, "a phrase needs at least two terms")
    val pos = docs.select(col(idCol).as("id"),
        posexplode(TextFunctions.tokens(col(textCol))).as(Seq("pos", "term")))
      .filter(col("term").isin(phrase.distinct: _*))
      .groupBy("id", "term")
      .agg(collect_list(col("pos")).as("positions"))
    phraseSearchFromPostings(pos, phrase)
  }

  /** [[phraseSearch]] against a prebuilt positional index — the
    * production probe: over a [[writePostingsStore]]-persisted
    * [[positionalPostings]] table the term filter is a PUSHED scan
    * predicate (bucket-pruned on term), so the query reads only the
    * phrase terms' posting rows from a corpus-sized index.
    */
  def phraseSearchFromPostings(positional: DataFrame,
      phrase: Seq[String]): DataFrame = {
    require(phrase.size >= 2, "a phrase needs at least two terms")
    val byId = positional
      .filter(col("term").isin(phrase.distinct: _*))
      .groupBy("id")
      .agg(map_from_entries(collect_list(struct(col("term"), col("positions"))))
        .as("m"))
    val empty = typedlit(Seq.empty[Int])
    val shifted = phrase.zipWithIndex.map { case (t, k) =>
      transform(coalesce(element_at(col("m"), lit(t)), empty), p => p - lit(k))
    }
    byId
      .select(col("id"),
        size(shifted.reduce((a, b) => array_intersect(a, b)))
          .cast("long").as("n_occurrences"))
      .filter(col("n_occurrences") > 0)
  }
}
