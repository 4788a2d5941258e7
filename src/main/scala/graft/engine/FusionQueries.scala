package graft.engine

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Retrieval, Sampling, Similarity, TextOps}

/** Round-6 batch three (q90–q97): rank fusion, probe-classifier
  * scoring, per-group threshold calibration, cross-source overlap,
  * duplicate clustering, token-budget epoch fill, containment dedup,
  * and MMR reranking — the composition layer over the retrieval/dedup
  * primitives. All eight carry full DuckDB oracles.
  *
  * Scale shapes (details in each operator's Scaladoc):
  *  - q90: two shortlists (TakeOrdered) fused — the corpus never
  *    shuffles, ranks are the only cross-modality signal.
  *  - q91: one aggregation pass learns 64 weights; scoring is a
  *    stateless scan over int8-quantized vectors, exact integers.
  *  - q92: per-language cutoffs = tiny aggregate broadcast back.
  *  - q93: digest-deduped shingle sets; join groups bounded by the
  *    number of sources, matrix output is sources².
  *  - q94: edges from span digests, components in O(log diameter)
  *    pointer-jumping rounds over the (small) pair graph.
  *  - q95: per-source running token offset as the Packing two-level
  *    prefix scan — no per-group global window.
  *  - q96: q38's blocked join over shingle digests with the df cap
  *    bounded ABSOLUTELY (fraction alone loosens with corpus growth).
  *  - q97: distributed pool selection; the greedy loop is
  *    shortlist-sized by design, replayed by a recursive-CTE oracle.
  */
object FusionQueries {
  import QueryDef._
  import Tables._

  private val Bm25Terms = Seq("table", "query", "stream")

  /** The q84 BM25 scoring CTE prefix (floored e4 score, k1=1.2 b=0.75),
    * shared verbatim so q90's lexical ranks replay the oracled scorer.
    */
  private val Bm25Cte =
    """WITH t AS (SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks FROM documents),
      |s AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
      |        CAST(len(list_filter(toks, x -> x = 'table')) AS DOUBLE) AS tf1,
      |        CAST(len(list_filter(toks, x -> x = 'query')) AS DOUBLE) AS tf2,
      |        CAST(len(list_filter(toks, x -> x = 'stream')) AS DOUBLE) AS tf3 FROM t),
      |g AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl,
      |        CAST(sum(CASE WHEN tf1>0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
      |        CAST(sum(CASE WHEN tf2>0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2,
      |        CAST(sum(CASE WHEN tf3>0 THEN 1 ELSE 0 END) AS DOUBLE) AS df3 FROM s),
      |bm AS (SELECT doc_id, CAST(floor((
      |   CASE WHEN tf1>0 THEN ln(1.0+(n-df1+0.5)/(df1+0.5)) * tf1*2.2/(tf1 + 1.2*(0.25+0.75*dl/avgdl)) ELSE 0.0 END +
      |   CASE WHEN tf2>0 THEN ln(1.0+(n-df2+0.5)/(df2+0.5)) * tf2*2.2/(tf2 + 1.2*(0.25+0.75*dl/avgdl)) ELSE 0.0 END +
      |   CASE WHEN tf3>0 THEN ln(1.0+(n-df3+0.5)/(df3+0.5)) * tf3*2.2/(tf3 + 1.2*(0.25+0.75*dl/avgdl)) ELSE 0.0 END
      | ) * 10000.0) AS BIGINT) AS s_e4
      | FROM s CROSS JOIN g WHERE tf1>0 OR tf2>0 OR tf3>0)""".stripMargin

  val all: Seq[QueryDef] = Seq(

    // Hybrid retrieval: BM25 top-100 (lexical) + cosine-to-query-0
    // top-100 (dense), fused by reciprocal ranks, final top-20. Both
    // rank lists are integer-keyed (floored-e4 BM25, exact-double
    // cosine with id tiebreaks), so ranks — and therefore every RRF
    // term — are engine-identical.
    sql("q90_hybrid_rrf",
      Bm25Cte +
      """,
        |bmr AS (SELECT doc_id, rank_bm25 FROM (
        |  SELECT doc_id, row_number() OVER (ORDER BY s_e4 DESC, doc_id) AS rank_bm25 FROM bm) x
        |  WHERE rank_bm25 <= 100),
        |q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
        |cs AS (SELECT doc_id, rank_cos FROM (
        |  SELECT e.vec_id AS doc_id,
        |    row_number() OVER (ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qv) DESC, e.vec_id) AS rank_cos
        |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0) x
        |  WHERE rank_cos <= 100),
        |f AS (SELECT COALESCE(bmr.doc_id, cs.doc_id) AS doc_id,
        |  COALESCE(rank_bm25, 0) AS rank_bm25, COALESCE(rank_cos, 0) AS rank_cos,
        |  (CASE WHEN rank_bm25 IS NOT NULL THEN 1.0/(60.0 + rank_bm25) ELSE 0.0 END
        |   + CASE WHEN rank_cos IS NOT NULL THEN 1.0/(60.0 + rank_cos) ELSE 0.0 END) AS rrf
        | FROM bmr FULL OUTER JOIN cs ON bmr.doc_id = cs.doc_id),
        |top AS (SELECT doc_id, rank_bm25, rank_cos,
        |  CAST(floor(rrf*1000000000.0) AS BIGINT) AS rrf_e9
        | FROM f ORDER BY rrf DESC, doc_id LIMIT 20)
        |SELECT doc_id, rank_bm25, rank_cos, rrf_e9 FROM top ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        val bm = TextOps.bm25(documents(s, d), "doc_id", "text", Bm25Terms)
          .select(col("id").as("doc_id"),
            floor(col("score") * 10000.0).cast("long").as("s_e4"))
        val bmTop = Retrieval.shortlist(bm, "doc_id", "s_e4", 100)
          .select(col("doc_id"), col("rank"))
        val emb = embeddings(s, d)
        val cosTop = Similarity.cosineTopK(emb, emb.filter(col("vec_id") === 0), k = 100)
          .select(col("cid").as("doc_id"), col("rn").as("rank"))
        Retrieval.rrfFuse(Seq("bm25" -> bmTop, "cos" -> cosTop),
            "doc_id", "rank", rrfK = 60, topK = 20)
          .orderBy("doc_id")
    },

    // Class-mean linear probe: w = mean(x | label=0) − mean(x) floored
    // to e6 micro-units, scored over int8-quantized vectors — from the
    // single weight floor on, everything is exact integer arithmetic.
    sql("q91_linear_probe",
      """WITH ex AS (SELECT vec_id, label, unnest(embedding::DOUBLE[]) AS x,
        |        unnest(range(1, len(embedding)+1)) AS pos FROM embeddings),
        |w AS (SELECT pos, CAST(floor((avg(CASE WHEN label = 0 THEN x END) - avg(x)) * 1000000.0) AS BIGINT) AS w_e6
        |      FROM ex GROUP BY pos),
        |qa AS (SELECT vec_id, label, embedding,
        |        list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS amax FROM embeddings),
        |qe AS (SELECT vec_id, label, unnest(range(1, len(embedding)+1)) AS pos,
        |        unnest(CASE WHEN amax = 0 THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
        |               ELSE list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*127.0/amax + 0.5) AS BIGINT)) END) AS q
        |       FROM qa)
        |SELECT qe.vec_id AS vec_id, qe.label AS label,
        |  CAST(sum(qe.q * w.w_e6) AS BIGINT) AS score_q,
        |  (sum(qe.q * w.w_e6) > 0) AS predicted
        |FROM qe JOIN w USING (pos) GROUP BY qe.vec_id, qe.label
        |ORDER BY vec_id""".stripMargin) {
      (s, d) =>
        val emb = embeddings(s, d)
        val w = Similarity.classMeanDirectionE6(emb, col("label") === 0)
        Similarity.linearScoreInt8(emb.select(col("vec_id"), col("label"), col("embedding")), w)
          .select(col("vec_id"), col("label"), col("score_q"), col("predicted"))
          .orderBy("vec_id")
    },

    // Per-language p75 calibration: quality score = stopword hits per
    // million words (integer division), cutoff learned per language,
    // keep strictly-above docs. Quarter-unit cutoff column is exact.
    sql("q92_quality_calibrate",
      """WITH t AS (SELECT doc_id, lang,
        |    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks FROM documents),
        |sc AS (SELECT doc_id, lang,
        |    len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is'))) * 1000000 // len(toks) AS score_e6
        |  FROM t WHERE len(toks) > 0),
        |cut AS (SELECT lang, CAST(floor(quantile_cont(score_e6, 0.75) * 4.0) AS BIGINT) AS cutoff_q4
        |  FROM sc GROUP BY lang)
        |SELECT doc_id, sc.lang AS lang, score_e6, cutoff_q4
        |FROM sc JOIN cut ON sc.lang = cut.lang
        |WHERE score_e6 * 4 > cutoff_q4 ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        import graft.functions.TextFunctions
        val base = documents(s, d)
          .select(col("doc_id"), col("lang"),
            TextFunctions.stopwordHits(col("text")).as("stop_hits"),
            TextFunctions.tokenCount(col("text")).as("n_words"))
        // coalesce makes the score provably non-nullable: a nullable
        // `div` makes the downstream join infer isnotnull(score) and
        // push the WHOLE text-kernel expression into the scan's row
        // filter — tokenizing every document twice more (measured 2×
        // at 100×). The fallback 0 is unreachable (n_words > 0 here).
        val scored = base.filter(col("n_words") > 0)
          .select(col("doc_id"), col("lang"),
            coalesce(expr("stop_hits * 1000000 div n_words"), lit(0L)).as("score_e6"))
        Sampling.quantileGate(scored, "lang", "score_e6", 0.75)
          .select(col("doc_id"), col("lang"), col("score_e6"), col("cutoff_q4"))
          .orderBy("doc_id")
    },

    // Cross-source 3-gram overlap matrix: distinct shingle-digest sets
    // per source, pairwise |∩| / |∪| in micro-units; zero-overlap
    // pairs kept so the matrix is complete.
    sql("q93_source_overlap",
      """WITH t AS (SELECT source, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks FROM documents),
        |sh AS (SELECT DISTINCT source, unnest(list_distinct(
        |    CASE WHEN len(toks) < 3 THEN [md5(array_to_string(toks, ' '))]
        |    ELSE [md5(array_to_string(list_slice(toks, i, i+2), ' ')) FOR i IN range(1, len(toks)-1)] END)) AS d
        |  FROM t),
        |sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY source),
        |iv AS (SELECT a.source AS src1, b.source AS src2, CAST(count(*) AS BIGINT) AS n_inter
        |  FROM sh a JOIN sh b ON a.d = b.d AND a.source < b.source GROUP BY 1, 2)
        |SELECT s1.source AS src1, s2.source AS src2,
        |  COALESCE(iv.n_inter, 0) AS n_inter,
        |  s1.n + s2.n - COALESCE(iv.n_inter, 0) AS n_union,
        |  COALESCE(iv.n_inter, 0) * 1000000 // (s1.n + s2.n - COALESCE(iv.n_inter, 0)) AS jaccard_e6
        |FROM sz s1 JOIN sz s2 ON s1.source < s2.source
        |LEFT JOIN iv ON iv.src1 = s1.source AND iv.src2 = s2.source
        |ORDER BY src1, src2""".stripMargin) {
      (s, d) =>
        TextOps.sourceOverlap(documents(s, d), "source", "text", n = 3)
          .orderBy("src1", "src2")
    },

    // Duplicate clusters: connected components over the shared-span
    // pair graph (16-token chunks), component label = min doc id,
    // plus the component's size. The oracle replays the closure as a
    // recursive CTE — exponential pointer jumping and naive transitive
    // closure agree on the fixpoint.
    sql("q94_dup_clusters",
      """WITH RECURSIVE t AS (SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks FROM documents),
        |ch AS (SELECT doc_id, unnest(list_distinct([md5(array_to_string(list_slice(toks, i, i+15), ' ')) FOR i IN range(1, len(toks)+1, 16)])) AS chunk FROM t WHERE len(toks) > 0),
        |e AS (SELECT DISTINCT a.doc_id AS s, b.doc_id AS t2 FROM ch a JOIN ch b ON a.chunk = b.chunk AND a.doc_id <> b.doc_id),
        |reach AS (SELECT s, t2 FROM e UNION SELECT r.s, e.t2 FROM reach r JOIN e ON r.t2 = e.s),
        |comp AS (SELECT s AS doc_id, least(s, min(t2)) AS component FROM reach GROUP BY s)
        |SELECT doc_id, component, CAST(count(*) OVER (PARTITION BY component) AS BIGINT) AS cluster_size
        |FROM comp ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        val pairs = Dedup.chunkSharePairs(documents(s, d), "doc_id", "text", chunkLen = 16)
        val labels = Dedup.nearDupKeeperLabels(pairs)
          .select(col("id").as("doc_id"), col("lab").as("component"))
        val sizes = labels.groupBy("component").agg(count(lit(1)).as("cluster_size"))
        labels.join(broadcast(sizes), "component")
          .select(col("doc_id"), col("component"), col("cluster_size"))
          .orderBy("doc_id")
    },

    // Per-source token-budget fill (epoch planning): documents drawn
    // in derandomized-LCG order until each source's 2000-token budget
    // is reached. The oracle replays the naive per-source running
    // window; the operator computes it as a two-level prefix scan.
    sql("q95_token_budget",
      """WITH t AS (SELECT doc_id, source,
        |   CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS BIGINT) AS n_toks,
        |   (CAST(((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648 AS DOUBLE) + 0.5) / 2147483648.0 AS u
        | FROM documents),
        |c AS (SELECT doc_id, source, n_toks,
        |   CAST(COALESCE(sum(n_toks) OVER (PARTITION BY source ORDER BY u, doc_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_toks
        | FROM t)
        |SELECT doc_id, source, n_toks, start_toks
        |FROM c WHERE start_toks < 2000 ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        Sampling.tokenBudgetFill(documents(s, d), "doc_id", "text",
            "source", budget = 2000L)
          .orderBy("doc_id")
    },

    // Near-containment pairs (Broder's C(A,B) over 3-gram shingles,
    // lang-blocked, df-pruned): the quote-expansion near-dups that
    // symmetric Jaccard (q38) misses. Both directions in exact
    // integer micro-units; pair kept when either reaches 0.8.
    sql("q96_containment_pairs",
      """WITH t AS (SELECT doc_id, lang, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks FROM documents),
        |sh AS (SELECT DISTINCT doc_id, lang, unnest(CASE WHEN len(toks) < 3 THEN [md5(array_to_string(toks, ' '))]
        |    ELSE [md5(array_to_string(list_slice(toks, i, i+2), ' ')) FOR i IN range(1, len(toks)-1)] END) AS d FROM t),
        |dfq AS (SELECT d, count(*) AS df FROM sh GROUP BY d),
        |n AS (SELECT count(*) AS nd FROM t),
        |pr AS (SELECT sh.doc_id, sh.lang, sh.d FROM sh JOIN dfq USING (d) CROSS JOIN n WHERE dfq.df <= least(0.5 * n.nd, 2500.0)),
        |sz AS (SELECT doc_id, count(*) AS ns FROM pr GROUP BY doc_id),
        |iv AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS nb
        |  FROM pr a JOIN pr b ON a.d = b.d AND a.lang = b.lang AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT id1, id2,
        |  CAST(nb * 1000000 // sa.ns AS BIGINT) AS c1_e6,
        |  CAST(nb * 1000000 // sb.ns AS BIGINT) AS c2_e6
        |FROM iv JOIN sz sa ON sa.doc_id = id1 JOIN sz sb ON sb.doc_id = id2
        |WHERE greatest(nb * 1000000 // sa.ns, nb * 1000000 // sb.ns) >= 800000
        |ORDER BY id1, id2""".stripMargin) {
      (s, d) =>
        TextOps.containmentPairs(documents(s, d), "doc_id", "text",
            n = 3, blockCols = Seq("lang"), maxDfFraction = 0.5,
            maxDf = 2500, minContainment = 0.8)
          .orderBy("id1", "id2")
    },

    // MMR diversified rerank (λ=0.7, pool 50, k=10) for query vector
    // 0: greedy relevance-vs-redundancy selection, replayed by the
    // oracle as a recursive CTE. The redundancy weight is written
    // (1.0 - 0.7) on BOTH sides so the engines compute the identical
    // IEEE complement.
    sql("q97_mmr_rerank",
      """WITH RECURSIVE
        |q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
        |pool AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |         list_cosine_similarity(embedding::DOUBLE[], q.qv) AS simq
        |  FROM embeddings, q WHERE vec_id <> 0
        |    AND len(list_filter(embedding, x -> CAST(x AS DOUBLE) <> 0)) > 0
        |  ORDER BY simq DESC, vec_id LIMIT 50),
        |ps AS (SELECT a.vec_id AS ai, b.vec_id AS bi, list_cosine_similarity(a.v, b.v) AS s
        |       FROM pool a JOIN pool b ON a.vec_id <> b.vec_id),
        |sel AS (
        |  SELECT 1 AS step,
        |    (SELECT vec_id FROM pool ORDER BY simq DESC, vec_id LIMIT 1) AS vid,
        |    (SELECT CAST(floor(0.7 * max(simq) * 1000000.0) AS BIGINT) FROM pool) AS mmr_e6,
        |    [(SELECT vec_id FROM pool ORDER BY simq DESC, vec_id LIMIT 1)] AS picked
        |  UNION ALL
        |  SELECT step + 1,
        |    (SELECT d.vec_id FROM pool d WHERE NOT list_contains(sel.picked, d.vec_id)
        |     ORDER BY 0.7*d.simq - (1.0 - 0.7)*(SELECT max(p.s) FROM ps p WHERE p.ai = d.vec_id AND list_contains(sel.picked, p.bi)) DESC, d.vec_id
        |     LIMIT 1),
        |    (SELECT CAST(floor((0.7*d.simq - (1.0 - 0.7)*(SELECT max(p.s) FROM ps p WHERE p.ai = d.vec_id AND list_contains(sel.picked, p.bi))) * 1000000.0) AS BIGINT)
        |     FROM pool d WHERE NOT list_contains(sel.picked, d.vec_id)
        |     ORDER BY 0.7*d.simq - (1.0 - 0.7)*(SELECT max(p.s) FROM ps p WHERE p.ai = d.vec_id AND list_contains(sel.picked, p.bi)) DESC, d.vec_id
        |     LIMIT 1),
        |    list_append(sel.picked, (SELECT d.vec_id FROM pool d WHERE NOT list_contains(sel.picked, d.vec_id)
        |     ORDER BY 0.7*d.simq - (1.0 - 0.7)*(SELECT max(p.s) FROM ps p WHERE p.ai = d.vec_id AND list_contains(sel.picked, p.bi)) DESC, d.vec_id
        |     LIMIT 1))
        |  FROM sel WHERE step < 10
        |)
        |SELECT step, vid AS vec_id, mmr_e6 FROM sel ORDER BY step""".stripMargin) {
      (s, d) =>
        val emb = embeddings(s, d)
        val qv = emb.filter(col("vec_id") === 0)
          .select(col("embedding")).head().getSeq[Float](0).toArray
        Retrieval.mmrRerank(emb.filter(col("vec_id") =!= 0), qv,
            k = 10, poolSize = 50, lambda = 0.7)
          .orderBy("step")
    }
  )
}
