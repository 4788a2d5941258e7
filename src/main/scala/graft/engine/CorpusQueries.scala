package graft.engine

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Sampling, Similarity, TextOps}

/** Round-6 corpus-curation batch two: span-level exact dedup, BM25
  * ad-hoc retrieval, DSIR importance weights, derandomized weighted
  * sampling, and SemDeDup semantic near-dup removal. All five carry
  * full DuckDB oracles.
  *
  * Scale shapes (details in each operator's Scaladoc):
  *  - q83: spans reduced to md5 digests before either shuffle.
  *  - q84: one scan + ONE broadcast scalar aggregate — no wide shuffle.
  *  - q85: 256-bucket weight table broadcast; integer-exact scoring.
  *  - q86: TakeOrderedAndProject top-k — k rows per partition on the
  *    wire, no global sort.
  *  - q87: cluster-bounded pair space (equi-join on list_id).
  */
object CorpusQueries {
  import QueryDef._
  import Tables._

  val all: Seq[QueryDef] = Seq(

    // Span-level exact dedup (16-token chunks): keeper = min doc id
    // per span digest; per-doc distinct/owned span counts.
    sql("q83_chunk_dedup",
      """WITH t AS (SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks FROM documents),
        |ch AS (SELECT doc_id, unnest(list_distinct([md5(array_to_string(list_slice(toks, i, i+15), ' ')) FOR i IN range(1, len(toks)+1, 16)])) AS chunk FROM t WHERE len(toks) > 0),
        |k AS (SELECT chunk, min(doc_id) AS keeper FROM ch GROUP BY chunk)
        |SELECT ch.doc_id AS doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
        |       CAST(sum(CASE WHEN k.keeper = ch.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_owned
        |FROM ch JOIN k USING (chunk) GROUP BY doc_id ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        Dedup.chunkDedupStats(documents(s, d), "doc_id", "text", chunkLen = 16)
          .orderBy("doc_id")
    },

    // Okapi BM25 for the fixed query {table, query, stream}; docs
    // matching no term drop out. Score floored to 1e-4 units.
    sql("q84_bm25_rank",
      """WITH t AS (SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks FROM documents),
        |s AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
        |        CAST(len(list_filter(toks, x -> x = 'table')) AS DOUBLE) AS tf1,
        |        CAST(len(list_filter(toks, x -> x = 'query')) AS DOUBLE) AS tf2,
        |        CAST(len(list_filter(toks, x -> x = 'stream')) AS DOUBLE) AS tf3 FROM t),
        |g AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl,
        |        CAST(sum(CASE WHEN tf1>0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
        |        CAST(sum(CASE WHEN tf2>0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2,
        |        CAST(sum(CASE WHEN tf3>0 THEN 1 ELSE 0 END) AS DOUBLE) AS df3 FROM s)
        |SELECT doc_id,
        | CAST(tf1 AS BIGINT) AS tf_table, CAST(tf2 AS BIGINT) AS tf_query, CAST(tf3 AS BIGINT) AS tf_stream,
        | CAST(floor((
        |   CASE WHEN tf1>0 THEN ln(1.0+(n-df1+0.5)/(df1+0.5)) * tf1*2.2/(tf1 + 1.2*(0.25+0.75*dl/avgdl)) ELSE 0.0 END +
        |   CASE WHEN tf2>0 THEN ln(1.0+(n-df2+0.5)/(df2+0.5)) * tf2*2.2/(tf2 + 1.2*(0.25+0.75*dl/avgdl)) ELSE 0.0 END +
        |   CASE WHEN tf3>0 THEN ln(1.0+(n-df3+0.5)/(df3+0.5)) * tf3*2.2/(tf3 + 1.2*(0.25+0.75*dl/avgdl)) ELSE 0.0 END
        | ) * 10000.0) AS BIGINT) AS bm25_e4
        |FROM s CROSS JOIN g WHERE tf1>0 OR tf2>0 OR tf3>0 ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        TextOps.bm25(documents(s, d), "doc_id", "text",
          terms = Seq("table", "query", "stream"), k1 = 1.2, b = 0.75)
          .select(col("id").as("doc_id"), col("tf_table"), col("tf_query"),
            col("tf_stream"), floor(col("score") * lit(10000.0)).cast("long").as("bm25_e4"))
          .orderBy("doc_id")
    },

    // DSIR importance weights: target slice = lang 'en'; 256 md5
    // feature buckets; per-bucket log-ratio pre-floored to micro-units
    // so document scores are exact integers.
    sql("q85_dsir_importance",
      """WITH tok AS (SELECT doc_id, lang, unnest(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS token FROM documents),
        |b AS (SELECT doc_id, lang, substr(md5(token),1,2) AS bucket FROM tok),
        |cnt AS (SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY doc_id, bucket),
        |gl  AS (SELECT bucket,
        |          CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE) AS tb,
        |          CAST(count(*) AS DOUBLE) AS cb
        |        FROM b GROUP BY bucket),
        |w AS (SELECT bucket, CAST(floor(ln((tb+0.5)/(cb+0.5)) * 1000000.0) AS BIGINT) AS w_e6 FROM gl)
        |SELECT cnt.doc_id AS doc_id, CAST(sum(cnt.n) AS BIGINT) AS n_toks,
        |       CAST(sum(cnt.n * w.w_e6) AS BIGINT) AS imp_e6
        |FROM cnt JOIN w USING (bucket) GROUP BY doc_id ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        TextOps.dsirWeights(documents(s, d), "doc_id", "text",
          isTarget = col("lang") === "en")
          .select(col("id").as("doc_id"), col("n_toks"), col("imp_e6"))
          .orderBy("doc_id")
    },

    // Derandomized Efraimidis–Spirakis weighted sample: 100 docs
    // weighted by n_chars, key = ln(u)/w from the LCG hash of doc_id.
    sql("q86_weighted_sample",
      """WITH h AS (SELECT doc_id, CAST(n_chars AS DOUBLE) AS w,
        |      (CAST(((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648 AS DOUBLE) + 0.5) / 2147483648.0 AS u
        |    FROM documents WHERE n_chars > 0),
        |k AS (SELECT doc_id, w, CAST(floor(ln(u) / w * 1000000000.0) AS BIGINT) AS sample_key_e9 FROM h),
        |r AS (SELECT doc_id, w, sample_key_e9, row_number() OVER (ORDER BY sample_key_e9 DESC, doc_id) AS rn FROM k)
        |SELECT doc_id, CAST(w AS BIGINT) AS weight, sample_key_e9
        |FROM r WHERE rn <= 100 ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        Sampling.weightedSample(documents(s, d), "doc_id", "n_chars", k = 100)
          .select(col("doc_id"), col("n_chars").cast("long").as("weight"),
            col("sample_key_e9"))
          .orderBy("doc_id")
    },

    // SemDeDup: nearest-centroid clustering (per-label means as the
    // codebook — the q82 seeding) then within-cluster cosine > 0.3
    // drops the larger id. The oracle replays assignment as the q82
    // row_number argmax and the drop rule as a within-cluster
    // self-join.
    sql("q87_semdedup",
      """WITH cent AS (
        | SELECT label AS list_id, list(m ORDER BY pos) AS centroid FROM (
        |  SELECT label, pos, avg(x) AS m FROM (
        |   SELECT label, unnest(embedding::DOUBLE[]) AS x, unnest(range(1, len(embedding)+1)) AS pos
        |   FROM embeddings) u GROUP BY label, pos) g GROUP BY label),
        |asg AS (
        | SELECT vec_id, list_id, embedding FROM (
        |  SELECT e.vec_id, c.list_id, e.embedding,
        |   row_number() OVER (PARTITION BY e.vec_id
        |     ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.centroid) DESC, c.list_id) AS rn
        |  FROM embeddings e, cent c) x WHERE rn = 1),
        |drop0 AS (SELECT DISTINCT b.vec_id FROM asg a JOIN asg b
        |  ON a.list_id = b.list_id AND a.vec_id < b.vec_id
        |  WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) > 0.3)
        |SELECT asg.vec_id AS vec_id, CAST(asg.list_id AS BIGINT) AS list_id,
        |       (drop0.vec_id IS NULL) AS keep
        |FROM asg LEFT JOIN drop0 ON asg.vec_id = drop0.vec_id ORDER BY vec_id""".stripMargin) {
      (s, d) =>
        val emb = embeddings(s, d)
        val cents = Similarity.labelCentroids(emb)
          .select(col("list_id").cast("long"), col("centroid"))
          .collect()
          .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
          .sortBy((p: (Long, Array[Double])) => p._1)
        Similarity.semDedupFlags(emb, cents, tau = 0.3)
          .select(col("vec_id"), col("list_id").cast("long").as("list_id"), col("keep"))
          .orderBy("vec_id")
    }
  )
}
