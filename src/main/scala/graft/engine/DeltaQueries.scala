package graft.engine

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Sampling, Similarity, TextOps}

/** Round-7 batch (q98–q109): delta-oriented corpus maintenance plus
  * relational-surface completion. A growing corpus is never
  * re-deduplicated from scratch — new data is admitted against
  * persisted digest stores (q98 exact, q99 shingle novelty), diffed
  * across releases (q105), profiled at the drop gate (q104), capped
  * per domain (q101), temperature-rebalanced (q106), epoch-shuffled
  * for training (q103), and served from quantized storage (q102);
  * q107 pins the approx (HLL++, no-Expand) profiling path to the q61
  * error-bound contract; q108 deduplicates with a keeper priority
  * (prefer the curated source); q109 is the robust MAD length gate.
  * All twelve carry full DuckDB oracles.
  *
  * The delta split is `doc_id % 10 < 7` (catalog) vs `>= 7` (delta) —
  * a deterministic partition that scales with the corpus, standing in
  * for "yesterday's corpus" vs "today's crawl".
  *
  * Scale shapes (details in each operator's Scaladoc):
  *  - q98: three digest-keyed hash ops; catalog text read once to
  *    build the digest store (persisted in production), no sort.
  *  - q99: delta shingles probe the catalog's distinct-digest store;
  *    all exchanges bounded by delta shingle volume.
  *  - q100: pivot with an EXPLICIT value list (no distinct-scan job)
  *    then unpivot back — one aggregate, a stack, zero extra jobs.
  *  - q101: bounded heap aggregate — the corpus is never sorted; the
  *    shuffle carries ≤ k pairs per (group × partition).
  *  - q102: fused-kernel scan of the corpus vs a broadcast literal,
  *    TakeOrderedAndProject; no intermediate arrays.
  *  - q103: hash exchange on shard + partition-local sort of
  *    corpus/nShards rows — the epoch-shuffle write pattern.
  *  - q104: one scan; N exact distincts share it via Expand.
  *  - q105: digest projections full-outer joined on id — text never
  *    crosses the exchange.
  *  - q106: tiny counts aggregate broadcast back; map-side filter.
  */
object DeltaQueries {
  import QueryDef._
  import Tables._

  private val Langs = Seq("de", "en", "es", "fr", "zh")

  /** Shared DuckDB CTE: distinct 3-token shingle digests per document,
    * identical to the q96 shingle construction (md5 over
    * space-rejoined token slices; whole text when < 3 tokens).
    */
  private val ShingleCte =
    """WITH t AS (SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(toks) < 3 THEN [md5(array_to_string(toks, ' '))]
      |    ELSE [md5(array_to_string(list_slice(toks, i, i+2), ' ')) FOR i IN range(1, len(toks)-1)] END)) AS d FROM t)""".stripMargin

  val all: Seq[QueryDef] = Seq(

    // Incremental exact dedup: delta docs whose md5 digest is new to
    // both the catalog and the earlier (min-id) delta itself.
    sql("q98_incremental_dedup",
      """WITH cat AS (SELECT DISTINCT md5(text) AS dg FROM documents WHERE doc_id % 10 < 7),
        |d AS (SELECT doc_id, lang, source, md5(text) AS dg FROM documents WHERE doc_id % 10 >= 7),
        |k AS (SELECT dg, min(doc_id) AS keep FROM d GROUP BY dg)
        |SELECT d.doc_id, d.lang, d.source FROM d
        |JOIN k ON d.dg = k.dg AND d.doc_id = k.keep
        |WHERE NOT EXISTS (SELECT 1 FROM cat WHERE cat.dg = d.dg)
        |ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        val docs = documents(s, d)
        Dedup.incrementalExact(
            docs.filter(col("doc_id") % 10 < 7),
            docs.filter(col("doc_id") % 10 >= 7),
            "doc_id", "text")
          .select(col("doc_id"), col("lang"), col("source"))
          .orderBy("doc_id")
    },

    // Shingle novelty of each delta doc vs the catalog digest store —
    // integer-exact counts and e4 fraction.
    sql("q99_delta_novelty",
      ShingleCte +
      """,
        |cat AS (SELECT DISTINCT d FROM sh WHERE doc_id % 10 < 7),
        |del AS (SELECT doc_id, d FROM sh WHERE doc_id % 10 >= 7)
        |SELECT del.doc_id AS doc_id, count(*) AS n_shingles,
        |  CAST(sum(CASE WHEN cat.d IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
        |  CAST(CAST(sum(CASE WHEN cat.d IS NULL THEN 1 ELSE 0 END) AS BIGINT) * 10000 // count(*) AS BIGINT) AS novelty_e4
        |FROM del LEFT JOIN cat ON del.d = cat.d
        |GROUP BY del.doc_id ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        val docs = documents(s, d)
        TextOps.noveltyVsCatalog(
            docs.filter(col("doc_id") % 10 < 7),
            docs.filter(col("doc_id") % 10 >= 7),
            "doc_id", "text", n = 3)
          .orderBy("doc_id")
    },

    // Pivot (explicit value list — no distinct-scan pre-job) to a wide
    // per-source lang-count matrix, then unpivot back to long form
    // with zero-fill: the round-trip exercises BOTH relational ops and
    // the zero rows make absent (source, lang) combinations explicit.
    sql("q100_pivot_unpivot",
      """WITH s AS (SELECT DISTINCT source FROM documents),
        |l AS (SELECT unnest(['de','en','es','fr','zh']) AS lang),
        |c AS (SELECT source, lang, count(*) AS cnt FROM documents GROUP BY 1, 2)
        |SELECT s.source AS source, l.lang AS lang, COALESCE(c.cnt, 0) AS doc_count
        |FROM s CROSS JOIN l LEFT JOIN c ON c.source = s.source AND c.lang = l.lang
        |ORDER BY s.source, l.lang""".stripMargin) {
      (s, d) =>
        val wide = documents(s, d).groupBy("source")
          .pivot("lang", Langs).agg(count(lit(1)))
        wide.unpivot(Array(col("source")), Langs.map(col).toArray, "lang", "__cnt")
          .select(col("source"), col("lang"),
            coalesce(col("__cnt"), lit(0L)).as("doc_count"))
          .orderBy("source", "lang")
    },

    // Per-source cap (k = 5) by the derandomized LCG rank — bounded
    // heap aggregate, no window, no sort (plan-asserted in the spec).
    sql("q101_group_cap",
      """WITH h AS (SELECT source, doc_id,
        |  ((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648 AS h_lcg FROM documents),
        |r AS (SELECT source, doc_id, h_lcg,
        |  row_number() OVER (PARTITION BY source ORDER BY h_lcg, doc_id) AS rn FROM h)
        |SELECT source, doc_id, h_lcg FROM r WHERE rn <= 5
        |ORDER BY source, doc_id""".stripMargin) {
      (s, d) =>
        Sampling.groupCap(documents(s, d), "source", "doc_id", k = 5)
          .select(col("source"), col("doc_id"), col("h_lcg"))
          .orderBy("source", "doc_id")
    },

    // ADC retrieval: query vector 0 at full precision (e6 weights) vs
    // the int8-quantized corpus; exact integer scores, top-20.
    sql("q102_ann_int8_adc",
      """WITH q AS (SELECT list_transform(embedding::DOUBLE[], x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS qw
        |  FROM embeddings WHERE vec_id = 0),
        |c AS (SELECT vec_id, embedding,
        |  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS amax
        |  FROM embeddings WHERE vec_id <> 0),
        |sc AS (SELECT vec_id,
        |  CAST(floor(amax * 10000.0) AS BIGINT) *
        |  CAST(list_sum([(CASE WHEN amax = 0 THEN 0
        |      ELSE CAST(floor(CAST(embedding[i] AS DOUBLE) * 127.0 / amax + 0.5) AS BIGINT) END) * qw[i]
        |    FOR i IN range(1, len(embedding)+1)]) AS BIGINT) AS score_q
        | FROM c CROSS JOIN q),
        |top AS (SELECT vec_id, score_q FROM sc ORDER BY score_q DESC, vec_id LIMIT 20)
        |SELECT vec_id, score_q FROM top ORDER BY vec_id""".stripMargin) {
      (s, d) =>
        val emb = embeddings(s, d)
        Similarity.annInt8Adc(emb.filter(col("vec_id") =!= 0),
            emb.filter(col("vec_id") === 0), k = 20)
          .orderBy("vec_id")
    },

    // Key-skew audit over the order fact's customer key: the heaviest
    // 16 keys with exact e6 shares and running share, next to the
    // key-space totals — the pre-flight table that decides salting /
    // AQE-skew / broadcast BEFORE a join ships. TakeOrderedAndProject
    // top-k; the ranking window runs over 16 rows, never the key space.
    sql("q168_skew_audit",
      """WITH c AS (SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS cnt FROM orders GROUP BY o_custkey),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total_rows, CAST(count(*) AS BIGINT) AS n_keys FROM c),
        |r AS (SELECT k, cnt, row_number() OVER (ORDER BY cnt DESC, k) AS rank,
        |        sum(cnt) OVER (ORDER BY cnt DESC, k
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM c QUALIFY rank <= 16)
        |SELECT CAST(rank AS BIGINT) AS rank, CAST(k AS VARCHAR) AS key, cnt,
        |  CAST((cnt * 1000000) // total_rows AS BIGINT) AS share_e6,
        |  CAST((cum * 1000000) // total_rows AS BIGINT) AS cum_share_e6,
        |  total_rows, n_keys
        |FROM r CROSS JOIN t ORDER BY rank""".stripMargin) { (s, d) =>
      graft.operators.Profiling.skewAudit(orders(s, d), "o_custkey", topK = 16)
        .orderBy("rank")
    },

    // One-pass column profiling of the 4 numeric lineitem measures —
    // the per-table QA drop gate (stack unpivots the single agg row).
    sql("q104_table_profile",
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax").map { c =>
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           | CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           | count(DISTINCT $c) AS n_distinct,
           | CAST(floor(min($c) * 100) AS BIGINT) AS min_e2,
           | CAST(floor(max($c) * 100) AS BIGINT) AS max_e2 FROM lineitem""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")) {
      (s, d) =>
        graft.operators.Profiling.numericProfile(lineitem(s, d),
            Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
          .orderBy("col_name")
    },

    // The routine-run (approx) profile under the q61 bound contract:
    // exact distincts from the audit profile, a TRUE bound column the
    // oracle asserts, single-pass HLL++ plan with no Expand.
    sql("q107_profile_approx",
      Seq("l_partkey", "l_quantity", "l_discount", "l_tax").map { c =>
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           | CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           | count(DISTINCT $c) AS n_distinct, TRUE AS acd_within_bound
           |FROM lineitem""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")) {
      (s, d) =>
        val cols9 = Seq("l_partkey", "l_quantity", "l_discount", "l_tax")
        val exact = graft.operators.Profiling.numericProfile(lineitem(s, d), cols9)
          .select(col("col_name"), col("n_rows"), col("n_null"), col("n_distinct"))
        val approx = graft.operators.Profiling
          .numericProfileApprox(lineitem(s, d), cols9, rsd = 0.05)
          .select(col("col_name"), col("n_distinct_approx"))
        exact.join(approx, "col_name")
          .select(col("col_name"), col("n_rows"), col("n_null"), col("n_distinct"),
            (abs(col("n_distinct_approx") - col("n_distinct")) <=
              col("n_distinct") * 0.15).as("acd_within_bound"))
          .orderBy("col_name")
    },

    // Corpus-release diff: v1 = ids % 10 < 8 (original text), v2 =
    // ids % 10 >= 1 with every 7th doc's text changed — added /
    // removed / changed / unchanged by digest. The change transform is
    // concat(text, '!') — byte-identical in any engine — rather than
    // upper(), whose Java full-Unicode case mapping (ß→SS) and
    // DuckDB's simple mapping agree only on ASCII corpora (r7 ADVICE).
    sql("q105_corpus_diff",
      """WITH v1 AS (SELECT doc_id, md5(text) AS dg FROM documents WHERE doc_id % 10 < 8),
        |v2 AS (SELECT doc_id, md5(CASE WHEN doc_id % 7 = 0 THEN text || '!' ELSE text END) AS dg
        |       FROM documents WHERE doc_id % 10 >= 1)
        |SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
        |  CASE WHEN v1.dg IS NULL THEN 'added' WHEN v2.dg IS NULL THEN 'removed'
        |       WHEN v1.dg <> v2.dg THEN 'changed' ELSE 'unchanged' END AS status
        |FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
        |ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        val docs = documents(s, d)
        Dedup.corpusDiff(
            docs.filter(col("doc_id") % 10 < 8),
            docs.filter(col("doc_id") % 10 >= 1)
              .withColumn("text", when(col("doc_id") % 7 === 0,
                concat(col("text"), lit("!"))).otherwise(col("text"))),
            "doc_id", "text")
          .orderBy("doc_id")
    },

    // Temperature (α = ½) mixture resampling over languages: final
    // shares ∝ √n_lang; smallest language kept whole. √ is IEEE-exact,
    // so the 16-bit Bernoulli thresholds are engine-identical.
    sql("q106_temperature_mix",
      """WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
        |m AS (SELECT min(cnt) AS mn FROM c)
        |SELECT d.doc_id AS doc_id, d.lang AS lang
        |FROM documents d JOIN c ON d.lang = c.lang CROSS JOIN m
        |WHERE c.cnt = m.mn
        |   OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) <
        |      printf('%04x', least(CAST(floor(65536.0 * sqrt(m.mn) / sqrt(c.cnt)) AS BIGINT), 65535))
        |ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        graft.operators.Mixing.temperatureSample(documents(s, d), "lang", "doc_id")
          .orderBy("doc_id")
    },

    // General dyadic-α temperature resampling at α = ¾: acceptance
    // probability (min/cnt)^(3/4) built from TWO chained sqrts (the
    // 4th root) times itself thrice — every step IEEE-correctly
    // rounded, so the floor'd threshold is bit-identical in DuckDB
    // (the hash-stability argument that bars libm pow; see
    // Mixing.temperatureSampleAlpha).
    sql("q114_temperature_alpha",
      """WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
        |m AS (SELECT min(cnt) AS mn FROM c),
        |p AS (SELECT lang, cnt,
        |  sqrt(sqrt(CAST(mn AS DOUBLE) / CAST(cnt AS DOUBLE))) AS rt
        |  FROM c CROSS JOIN m)
        |SELECT d.doc_id AS doc_id, d.lang AS lang
        |FROM documents d JOIN p ON d.lang = p.lang CROSS JOIN m
        |WHERE p.cnt = m.mn
        |   OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) <
        |      printf('%04x', least(CAST(floor(65536.0 * (p.rt * p.rt * p.rt)) AS BIGINT), 65535))
        |ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        graft.operators.Mixing.temperatureSampleAlpha(documents(s, d), "lang",
            "doc_id", alphaNum = 3, alphaLog2Den = 2)
          .orderBy("doc_id")
    },

    // Priority-aware exact dedup: among content duplicates keep the
    // smallest (priority, id) — prefer-the-curated-source policy
    // (priority classes derived deterministically from the source id).
    sql("q108_priority_dedup",
      """WITH d AS (SELECT doc_id, source, md5(text) AS dg,
        |  CAST(substr(source, 4, 10) AS INT) % 3 AS priority FROM documents)
        |SELECT doc_id, source, priority FROM (
        |  SELECT doc_id, source, priority,
        |    row_number() OVER (PARTITION BY dg ORDER BY priority, doc_id) AS rn FROM d) x
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        val docs = documents(s, d).withColumn("priority",
          substring(col("source"), 4, 10).cast("int") % 3)
        Dedup.exactByContentPriority(docs, "doc_id", "text", "priority")
          .select(col("doc_id"), col("source"), col("priority"))
          .orderBy("doc_id")
    },

    // Robust per-language length gate: keep docs within 2 MADs of
    // their language's median n_chars — quarter-unit-exact both ways.
    sql("q109_mad_outlier_gate",
      """WITH m AS (SELECT lang, CAST(floor(quantile_cont(n_chars, 0.5) * 4) AS BIGINT) AS med4
        |  FROM documents GROUP BY lang),
        |v AS (SELECT d.lang, CAST(floor(quantile_cont(abs(d.n_chars * 4 - m.med4), 0.5)) AS BIGINT) AS mad4
        |  FROM documents d JOIN m USING (lang) GROUP BY d.lang)
        |SELECT d.doc_id AS doc_id, d.lang AS lang, d.n_chars AS n_chars
        |FROM documents d JOIN m USING (lang) JOIN v USING (lang)
        |WHERE abs(d.n_chars * 4 - m.med4) <= v.mad4 * 2
        |ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        graft.operators.Sampling.madOutlierGate(documents(s, d), "lang", "n_chars", k = 2)
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .orderBy("doc_id")
    },

    // Incremental NEAR-dup (the q98 store pattern on MinHash bands):
    // the delta's new candidate pairs from the band-key probe. Two
    // Spark-side booleans + one DuckDB-exact count, the q44 contract
    // shape: matches_full_recompute pins the headline property (probe
    // output == the delta-touching subset of a from-scratch
    // minHashCandidates over catalog ∪ delta, both directions);
    // dup_recall_ok pins that every planted exact-dup pair with a
    // delta member is found; n_new_dup_pairs is replayed exactly by
    // the oracle from text equality. Delta ids are NEGATIVE (orig −
    // 1000000) so they are disjoint from corpus ids at EVERY scale —
    // a positive offset collided with ScaleGen's 10M id stride at 10×
    // and silently reclassified copy-copy pairs as delta-touching —
    // and a delta-touching pair is then exactly `id1 < 0` (delta ids
    // sort below all corpus ids, and id1 ≤ id2).
    sql("q124_incremental_neardup",
      """WITH delta AS (SELECT doc_id - 1000000 AS doc_id, text FROM documents WHERE doc_id < 40),
        |corpus AS (SELECT doc_id, text FROM documents UNION ALL SELECT doc_id, text FROM delta),
        |g AS (SELECT text, count(*) AS n FROM corpus GROUP BY text),
        |m AS (SELECT c.doc_id, c.text FROM corpus c JOIN g ON c.text = g.text WHERE g.n BETWEEN 2 AND 8),
        |p AS (SELECT x.doc_id AS id1, y.doc_id AS id2 FROM m x JOIN m y ON x.text = y.text AND x.doc_id < y.doc_id)
        |SELECT CAST(count(*) AS BIGINT) AS n_new_dup_pairs, TRUE AS dup_recall_ok,
        |       TRUE AS matches_full_recompute
        |FROM p WHERE id1 < 0""".stripMargin) {
      (s, d) =>
        val docs = documents(s, d).select(col("doc_id"), col("text"))
        val delta = docs.filter(col("doc_id") < 40)
          .select((col("doc_id") - 1000000L).as("doc_id"), col("text"))
        // inc/full/dupPairs each feed two downstream consumers; an
        // r15 experiment materialized each with localCheckpoint and
        // measured 3.07 s vs 2.42 s WITHOUT (A/B/A/B, same box): the
        // checkpoint of a plan with exchanges materializes its AQE
        // stages serially at construction, and on a 32-core local
        // bench the duplicated subtrees recompute in parallel for
        // free — the barriers cost more than the recompute saves. The
        // MinHash kernel itself is materialized once inside
        // minHashCandidates/bandKeysOf (lazy, exchange-free), which
        // is where the per-reference recompute actually lived.
        val inc = Dedup.incrementalNearDupCandidates(docs, delta,
            "doc_id", "text", bands = 8, rowsPerBand = 4)
        val full = Dedup.minHashCandidates(docs.unionByName(delta),
            "doc_id", "text", bands = 8, rowsPerBand = 4)
          .filter(col("id1") < 0L)
        // multiset equality via ONE signed-union aggregate (r15): the
        // symmetric exceptAll pair planned four aggregate/replicate
        // passes over inc and full; summing +1/−1 tags per distinct
        // row and requiring every sum = 0 is the same predicate
        // (A ≡ B as multisets ⟺ all signed counts cancel) in a single
        // exchange over both sides
        val matches = inc
          .select(col("id1"), col("id2"), col("n_shared_bands"), lit(1L).as("__s"))
          .unionByName(full
            .select(col("id1"), col("id2"), col("n_shared_bands"), lit(-1L).as("__s")))
          .groupBy("id1", "id2", "n_shared_bands").agg(sum("__s").as("__d"))
          .agg((count(when(col("__d") =!= 0L, 1)) === 0).as("matches_full_recompute"))
        val corpus = docs.unionByName(delta)
        val smallGroups = corpus.groupBy(col("text"))
          .agg(count(lit(1)).as("n")).filter(col("n").between(2, 8))
        val members = corpus.join(smallGroups.select(col("text")), Seq("text"))
        val dupPairs = members.alias("x")
          .join(members.alias("y"),
            col("x.text") === col("y.text") && col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"))
          .filter(col("id1") < 0L)
        val nDup = dupPairs.agg(count(lit(1)).as("n_new_dup_pairs"))
        val recall = dupPairs
          .join(inc.select(col("id1"), col("id2")), Seq("id1", "id2"), "left_anti")
          .agg((count(lit(1)) === 0).as("dup_recall_ok"))
        nDup.crossJoin(recall).crossJoin(matches)
    },

    // Deterministic epoch shuffle into 8 shards with dense in-shard
    // positions — the reproducible global-permutation layout.
    sql("q103_epoch_shuffle",
      """WITH h AS (SELECT doc_id,
        |  ((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648 AS h_lcg FROM documents),
        |s AS (SELECT doc_id, h_lcg, CAST(h_lcg % 8 AS INT) AS shard FROM h)
        |SELECT doc_id, h_lcg, shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY h_lcg, doc_id) AS BIGINT) AS pos
        |FROM s ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        Sampling.epochShards(documents(s, d), "doc_id", nShards = 8)
          .select(col("doc_id"), col("h_lcg"), col("shard"), col("pos"))
          .orderBy("doc_id")
    },

    // Contrastive negative sampling over the q103 permutation ring:
    // each anchor's 4 negatives are its next ring neighbors in-shard
    // (wrap), dropping self and byte-identical twins — deterministic,
    // replayed end to end (LCG, shard, window, modular target, digest
    // skip). Planted +1M duplicate copies exercise the skip arm.
    sql("q172_contrastive_negatives",
      """WITH base AS (SELECT doc_id, text FROM documents),
        |corpus AS (SELECT doc_id, text FROM base
        |  UNION ALL SELECT doc_id + 1000000, text FROM base WHERE doc_id < 30),
        |h AS (SELECT doc_id, text,
        |  ((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648 AS h_lcg FROM corpus),
        |p AS (SELECT doc_id, md5(text) AS dg, h_lcg, CAST(h_lcg % 8 AS INT) AS shard,
        |        CAST(row_number() OVER (PARTITION BY CAST(h_lcg % 8 AS INT) ORDER BY h_lcg, doc_id) AS BIGINT) AS pos
        |      FROM h),
        |n AS (SELECT shard, CAST(count(*) AS BIGINT) AS sn FROM p GROUP BY shard),
        |a AS (SELECT p.shard, p.doc_id AS anchor_id, p.pos, p.dg AS adg, n.sn,
        |        unnest(range(1, 5)) AS neg_rank
        |      FROM p JOIN n USING (shard)),
        |t AS (SELECT shard, anchor_id, adg, CAST(neg_rank AS BIGINT) AS neg_rank,
        |        (pos - 1 + neg_rank) % sn + 1 AS tpos FROM a)
        |SELECT anchor_id, neg_rank, c.doc_id AS neg_id
        |FROM t JOIN p c ON c.shard = t.shard AND c.pos = t.tpos
        |WHERE c.doc_id <> anchor_id AND c.dg <> adg
        |ORDER BY anchor_id, neg_rank""".stripMargin) {
      (s, d) =>
        val base = documents(s, d).select(col("doc_id"), col("text"))
        val corpus = base.unionByName(base.filter(col("doc_id") < 30)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
        Sampling.contrastiveNegatives(corpus, "doc_id", "text", k = 4, nShards = 8)
          .orderBy("anchor_id", "neg_rank")
    }
  )
}
