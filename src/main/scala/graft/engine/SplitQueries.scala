package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.Dedup

/** Round-8 batch (q115–q122): the split/tokenizer-prep and corpus-
  * diagnostic family a training-data pipeline needs between curation
  * and tokenization — holdout assignment, vocabulary induction, an
  * information-density gate, the split-leakage audit, per-language
  * OOV fairness, the duplicate-cluster spectrum, and per-source
  * boilerplate spans. The reference's design commits to QA + dedup +
  * reporting stages over ingested records
  * (/root/reference/docs/system-plan.md:23-32); these extend that
  * contract to the split/tokenizer-prep steps. All carry full DuckDB
  * oracles.
  *
  * Scale shapes:
  *  - q115: split assignment is a stateless per-row hash — no RNG
  *    state, no shuffle, reproducible on any engine and any retry
  *    (the q69 property); the report aggregate is map-side combined
  *    to |source × lang × split| rows.
  *  - q116: one explode feeding a hash aggregate that partial-
  *    aggregates down to vocabulary size; the ranking is the
  *    two-level banded scheme ([[rankVocab]]) — no single-partition
  *    sort anywhere, even when the raw vocabulary is itself
  *    corpus-like (the web-scale typo/number/URL tail).
  *  - q117: entropy is computed inside each row (sorted-run-length
  *    histogram, `TextFunctions.tokenRunCounts`) — zero exchange;
  *    the relational explode+groupBy(doc, token) alternative shuffles
  *    one row per token occurrence, which at 100 TB is the dominant
  *    cost of the whole job. The oracle keeps the relational form;
  *    both floor each c·ln(c) term to micro-nats before integer-
  *    summing, so the results are bit-equal.
  *  - q118: the test split's distinct shingle set is eval-sized by
  *    construction, so it broadcasts (the q68 decontamination shape):
  *    the train side streams once with no shuffle of corpus shingles.
  *  - q119: the top-K vocab is K rows by construction — it broadcasts
  *    against the token stream; the aggregate is |langs| rows.
  *  - q120: two hash aggregates, the first map-side combined to the
  *    distinct-digest count, the second to the spectrum's support
  *    (≤ max cluster size) — text never crosses an exchange, only
  *    16-byte digests.
  *  - q121: distinct (doc, span) pairs flow into a (source, span)
  *    hash aggregate; the ranking window is partitioned by source
  *    over the df-filtered aggregate (the q70 per-group-topk shape).
  *  - q122: the flagged-span set is bounded (top-k per source), so it
  *    collects driver-side and bakes into a native expression — the
  *    strip itself is a per-row hash-probe scan, zero joins, zero
  *    shuffles; at 100 TB it runs at tokenize speed.
  */
object SplitQueries {
  import QueryDef._
  import Tables._

  /** Deterministic 3-way holdout from the first two hex digits of
    * md5(doc_id): 256 buckets, '00'..'0c' → test (13/256 ≈ 5.1%),
    * '0d'..'19' → valid (next 13), rest → train. String comparison on
    * the hex prefix is identical in every engine; no RNG, no state,
    * stable under retries and across corpus growth (a doc's split
    * never changes when other docs arrive — the property that keeps
    * eval sets frozen while the corpus is re-crawled).
    */
  private def splitOf(id: Column): Column = {
    val h = substring(md5(id.cast("string")), 1, 2)
    when(h < "0d", "test").when(h < "1a", "valid").otherwise("train")
  }

  /** The same assignment as ANSI SQL, inlined into the oracles. */
  private val splitSql =
    """CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)),1,2) < '0d' THEN 'test'
      |     WHEN substr(md5(CAST(doc_id AS VARCHAR)),1,2) < '1a' THEN 'valid'
      |     ELSE 'train' END""".stripMargin

  /** Two-level top-K frequency ranking over a (token, tf) aggregate:
    * rank + running tf sum under the total order (tf DESC, token),
    * without EVER sorting the whole vocabulary in one partition.
    * At web scale the raw unigram vocabulary (typos, numbers, URLs)
    * is itself corpus-like — a bare `Window.orderBy(tf desc)` puts
    * all of it through one task. Instead (the `Packing.packCounts`
    * two-level-scan shape, applied to ranking):
    *
    *  1. tokens are banded by floor(log2(tf)) — monotone in tf, so
    *     band DESC refines the global order and bands are disjoint
    *     tf ranges;
    *  2. per-band (count, Σtf) aggregates to ≤ 64 rows (tf < 2⁶⁴);
    *     the prefix offsets across bands are a window over THAT
    *     relation — bounded by construction, like the bucket-offset
    *     window in `Packing.packCounts`;
    *  3. bands whose count-offset ≥ K are pruned BEFORE the ranking
    *     window (an inner broadcast join) — in particular the tf=1
    *     band, which holds most of a web vocabulary, never reaches a
    *     sort — and rank-within-band (a window PARTITIONED BY band)
    *     plus the band's offset is the exact global rank.
    *
    * Bit-identical to the naive global window (same total order), so
    * the q116/q119 oracle hashes are unchanged; `SplitPlanSpec`
    * asserts no corpus-sized unpartitioned WindowExec survives.
    * Returns (token, tf, rank, cum) for rank ≤ k.
    */
  private[graft] def rankVocab(vc: org.apache.spark.sql.DataFrame, k: Int)
      : org.apache.spark.sql.DataFrame = {
    val banded = vc.withColumn("band",
      floor(log2(col("tf").cast("double"))).cast("long"))
    val wb = Window.orderBy(col("band").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = banded.groupBy("band")
      .agg(count(lit(1)).as("bn"), sum("tf").as("bs"))
      .withColumn("cnt_off", coalesce(sum("bn").over(wb), lit(0L)))
      .withColumn("sum_off", coalesce(sum("bs").over(wb), lit(0L)))
      .filter(col("cnt_off") < k)
      .select("band", "cnt_off", "sum_off")
    val w = Window.partitionBy("band").orderBy(col("tf").desc, col("token"))
    banded.join(broadcast(offsets), "band")
      .withColumn("rank", (row_number().over(w) + col("cnt_off")).cast("long"))
      .withColumn("cum",
        sum("tf").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) +
          col("sum_off"))
      .filter(col("rank") <= k)
      .select(col("token"), col("tf"), col("rank"), col("cum"))
  }

  val all: Seq[QueryDef] = Seq(

    // Stratified split report: doc/char counts per (source, lang,
    // split) — the audit table a split step must emit so skew between
    // holdouts and strata is visible before training.
    sql("q115_stratified_split",
      s"""WITH s AS (SELECT source, lang, n_chars, $splitSql AS split FROM documents)
        |SELECT source, lang, split, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM s GROUP BY source, lang, split ORDER BY source, lang, split""".stripMargin) {
      (s, d) =>
        documents(s, d)
          .select(col("source"), col("lang"), col("n_chars"), splitOf(col("doc_id")).as("split"))
          .groupBy("source", "lang", "split")
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
          .orderBy("source", "lang", "split")
    },

    // Leakage-SAFE split — the prevention counterpart of q118's
    // leakage measure: assignment hashes the CONTENT, so byte-identical
    // duplicates (planted here as +1,000,000-id copies of the first 30
    // docs, the q124 convention) land in the same split by
    // construction. The output rolls up per split AND carries the
    // global cross-split leak count, which the oracle pins to the
    // planted truth: zero texts straddle splits under the content key,
    // where q118 shows an id-keyed split of the same corpus leaks.
    sql("q165_content_split",
      """WITH planted AS (SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id < 30),
        |corpus AS (SELECT doc_id, text FROM documents UNION ALL SELECT doc_id, text FROM planted),
        |s AS (SELECT doc_id, text,
        |        CASE WHEN substr(md5(text),1,2) < '0d' THEN 'test'
        |             WHEN substr(md5(text),1,2) < '1a' THEN 'valid'
        |             ELSE 'train' END AS split FROM corpus),
        |leak AS (SELECT CAST(count(*) FILTER (n > 1) AS BIGINT) AS cross_split_leaks
        |         FROM (SELECT text, count(DISTINCT split) AS n FROM s GROUP BY text))
        |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(count(DISTINCT text) AS BIGINT) AS n_texts, cross_split_leaks
        |FROM s CROSS JOIN leak GROUP BY split, cross_split_leaks
        |ORDER BY split""".stripMargin) {
      (s, d) =>
        val docs = documents(s, d).select(col("doc_id"), col("text"))
        val corpus = docs.unionByName(docs.filter(col("doc_id") < 30)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
        val split = graft.operators.Mixing.contentSplit(corpus, "text")
        val leaks = split.groupBy("text")
          .agg(countDistinct("split").as("__n"))
          .agg(sum(when(col("__n") > 1, 1L).otherwise(0L)).as("cross_split_leaks"))
        split.groupBy("split")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct("text").as("n_texts"))
          .crossJoin(broadcast(leaks))
          .orderBy("split")
    },

    // NEAR-dup-cluster-safe split: the q165 content key lifted to the
    // cluster tier — planted noisy copies (+1M, and +2M CHAINED via a
    // copy-to-copy pair, exercising the transitive CC) must land in
    // their original's split. The pair graph is the caller's detector
    // output (planted here, so the oracle knows every cluster exactly:
    // keeper = planted id minus its offset — NOT a blanket mod, which
    // the 10× sweep caught mis-clustering ScaleGen's 10⁷-strided
    // organic ids); split counts, cluster counts, and the straddle
    // count (pinned 0) replay in SQL.
    sql("q171_cluster_split",
      """WITH base AS (SELECT doc_id, text FROM documents),
        |corpus AS (SELECT doc_id, text FROM base
        |  UNION ALL SELECT doc_id + 1000000, text || ' x' FROM base WHERE doc_id < 30
        |  UNION ALL SELECT doc_id + 2000000, text || ' x y' FROM base WHERE doc_id < 10),
        |cl AS (SELECT doc_id,
        |  CASE WHEN doc_id BETWEEN 1000000 AND 1000029 THEN doc_id - 1000000
        |       WHEN doc_id BETWEEN 2000000 AND 2000009 THEN doc_id - 2000000
        |       ELSE doc_id END AS cluster FROM corpus),
        |s AS (SELECT doc_id, cluster,
        |        CASE WHEN substr(md5(CAST(cluster AS VARCHAR)),1,2) < '0d' THEN 'test'
        |             WHEN substr(md5(CAST(cluster AS VARCHAR)),1,2) < '1a' THEN 'valid'
        |             ELSE 'train' END AS split FROM cl),
        |leak AS (SELECT CAST(count(*) FILTER (n > 1) AS BIGINT) AS straddling_clusters
        |         FROM (SELECT cluster, count(DISTINCT split) AS n FROM s GROUP BY cluster))
        |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(count(DISTINCT cluster) AS BIGINT) AS n_clusters, straddling_clusters
        |FROM s CROSS JOIN leak GROUP BY split, straddling_clusters
        |ORDER BY split""".stripMargin) {
      (s, d) =>
        val base = documents(s, d).select(col("doc_id"), col("text"))
        val corpus = base
          .unionByName(base.filter(col("doc_id") < 30)
            .select((col("doc_id") + 1000000L).as("doc_id"),
              concat(col("text"), lit(" x")).as("text")))
          .unionByName(base.filter(col("doc_id") < 10)
            .select((col("doc_id") + 2000000L).as("doc_id"),
              concat(col("text"), lit(" x y")).as("text")))
        // the detector's pair output, planted: original↔copy for 30,
        // copy↔second-copy for 10 (keeper only reachable transitively)
        val pairs = base.filter(col("doc_id") < 30)
          .select(col("doc_id").as("id1"), (col("doc_id") + 1000000L).as("id2"))
          .unionByName(base.filter(col("doc_id") < 10)
            .select((col("doc_id") + 1000000L).as("id1"),
              (col("doc_id") + 2000000L).as("id2")))
        val split = graft.operators.Mixing.clusterSafeSplit(corpus, "doc_id", pairs)
        val leaks = split.groupBy("cluster")
          .agg(countDistinct("split").as("__n"))
          .agg(sum(when(col("__n") > 1, 1L).otherwise(0L)).as("straddling_clusters"))
        split.groupBy("split")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct("cluster").as("n_clusters"))
          .crossJoin(broadcast(leaks))
          .orderBy("split")
    },

    // Vocabulary induction: top-K tokens by corpus frequency with
    // cumulative-coverage basis points — the table a tokenizer-prep
    // step reads to pick a vocab size (coverage knee) and that OOV
    // analyses join against. Ties break on the token so the ranking
    // is total; coverage is integer math (cum·10⁴ DIV total), exact
    // in both engines.
    sql("q116_vocab_coverage",
      """WITH tok AS (SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS token FROM documents),
        |vc AS (SELECT token, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY token),
        |tot AS (SELECT sum(tf) AS t FROM vc),
        |r AS (SELECT token, tf, row_number() OVER (ORDER BY tf DESC, token) AS rank,
        |             sum(tf) OVER (ORDER BY tf DESC, token ROWS UNBOUNDED PRECEDING) AS cum FROM vc)
        |SELECT CAST(rank AS BIGINT) AS rank, token, tf, CAST(cum * 10000 // t AS BIGINT) AS cov_bp
        |FROM r CROSS JOIN tot WHERE rank <= 16 ORDER BY rank""".stripMargin) {
      (s, d) =>
        val vc = documents(s, d)
          .select(explode(TextFunctions.tokens(col("text"))).as("token"))
          .groupBy("token").agg(count(lit(1)).as("tf"))
        val tot = vc.agg(sum("tf").as("t"))
        // two-level banded ranking: no whole-vocab single-partition
        // sort — see rankVocab above
        rankVocab(vc, 16)
          .crossJoin(broadcast(tot))
          .select(col("rank"), col("token"), col("tf"),
            expr("cum * 10000 DIV t").as("cov_bp"))
          .orderBy("rank")
    },

    // Information-density gate: per-document unigram entropy in
    // floored micro-nats, keeping docs above 3.0 nats — the cheap
    // "is there any signal here" filter (low-entropy docs are
    // keyword-stuffed or generator loops). ent = ln N − (Σ c·ln c)/N
    // with every transcendental term floored to an integer before any
    // sum/division, so Spark's per-row HOF form and the oracle's
    // relational form agree bit-for-bit.
    sql("q117_entropy_gate",
      """WITH tok AS (SELECT doc_id, unnest(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS token FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY doc_id, token),
        |e AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_toks,
        |        CAST(sum(CAST(floor(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) * 1000000.0) AS BIGINT)) AS BIGINT) AS clogc_e6
        |      FROM tf GROUP BY doc_id),
        |f AS (SELECT doc_id, n_toks,
        |        CAST(floor(ln(CAST(n_toks AS DOUBLE)) * 1000000.0) AS BIGINT) - (clogc_e6 // n_toks) AS ent_e6 FROM e)
        |SELECT doc_id, n_toks, ent_e6 FROM f WHERE ent_e6 >= 3000000 ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        documents(s, d)
          .select(col("doc_id"),
            size(TextFunctions.tokens(col("text"))).cast("long").as("n_toks"),
            TextFunctions.unigramClogcE6(col("text")).as("clogc_e6"))
          .filter(col("n_toks") > 0)
          .select(col("doc_id"), col("n_toks"),
            (floor(log(col("n_toks").cast("double")) * 1000000.0).cast("long") -
              expr("clogc_e6 DIV n_toks")).as("ent_e6"))
          .filter(col("ent_e6") >= 3000000L)
          .orderBy("doc_id")
    },

    // Split-leakage audit: train-split documents sharing any token
    // 4-gram with the test split — the check that MUST run after any
    // split step, because hash-holdouts freeze doc membership but not
    // content overlap (near-dups of a test doc leak into train). The
    // test side is holdout-sized, so its distinct shingle set
    // broadcasts; pairs are unique by construction (array_distinct per
    // doc × distinct test set), so count(*) equals the oracle's
    // COUNT(DISTINCT) without the extra exchange (the q68 argument).
    sql("q118_split_leakage",
      s"""WITH t AS (SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS toks FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(toks) < 4 THEN [array_to_string(toks, ' ')]
        |   ELSE [array_to_string(list_slice(toks, i, i+3), ' ') FOR i IN range(1, len(toks)-2)] END)) AS shingle FROM t),
        |ss AS (SELECT doc_id, $splitSql AS split, shingle FROM sh JOIN documents USING (doc_id) WHERE shingle <> ''),
        |tst AS (SELECT DISTINCT shingle FROM ss WHERE split = 'test')
        |SELECT ss.doc_id AS doc_id, CAST(count(DISTINCT ss.shingle) AS BIGINT) AS n_leak
        |FROM ss JOIN tst ON ss.shingle = tst.shingle
        |WHERE ss.split = 'train' GROUP BY ss.doc_id ORDER BY ss.doc_id""".stripMargin) {
      (s, d) =>
        // split derives from doc_id alone, so it rides the shingle
        // explosion — no join back to documents
        val ss = documents(s, d)
          .select(col("doc_id"), splitOf(col("doc_id")).as("split"),
            explode(array_distinct(Dedup.shingles(col("text"), 4))).as("shingle"))
          .filter(col("shingle") =!= "")
        val tst = ss.filter(col("split") === "test").select("shingle").distinct()
        ss.filter(col("split") === "train")
          .join(broadcast(tst), "shingle")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_leak"))
          .orderBy("doc_id")
    },

    // Per-language OOV fairness: the fraction of each language's token
    // occurrences NOT covered by the global top-K vocabulary (q116's
    // ranking, same tiebreak) — the readout that shows a
    // frequency-built vocab starving low-resource languages. The K-row
    // vocab broadcasts; integer basis points (the q116 convention).
    sql("q119_oov_rate",
      """WITH tok AS (SELECT lang, unnest(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS token FROM documents),
        |vc AS (SELECT token FROM (SELECT token, row_number() OVER (ORDER BY count(*) DESC, token) AS rank FROM tok GROUP BY token) x WHERE rank <= 16)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_toks,
        |       CAST(count(*) FILTER (token NOT IN (SELECT token FROM vc)) AS BIGINT) AS n_oov,
        |       CAST(count(*) FILTER (token NOT IN (SELECT token FROM vc)) * 10000 // count(*) AS BIGINT) AS oov_bp
        |FROM tok GROUP BY lang ORDER BY lang""".stripMargin) {
      (s, d) =>
        val tok = documents(s, d)
          .select(col("lang"), explode(TextFunctions.tokens(col("text"))).as("token"))
        // banded two-level ranking (rankVocab): the tf=1 long tail —
        // most of a web vocabulary — never reaches a sort
        val vc = rankVocab(tok.groupBy("token").agg(count(lit(1)).as("tf")), 16)
          .select(col("token"), lit(1).as("iv"))
        tok.join(broadcast(vc), Seq("token"), "left")
          .groupBy("lang")
          .agg(count(lit(1)).as("n_toks"),
            sum(when(col("iv").isNull, 1L).otherwise(0L)).as("n_oov"))
          .select(col("lang"), col("n_toks"), col("n_oov"),
            expr("n_oov * 10000 DIV n_toks").as("oov_bp"))
          .orderBy("lang")
    },

    // Duplicate-cluster size spectrum: how many content-identical
    // clusters exist at each multiplicity (k=1 singletons, k=2 pairs,
    // …) — the one-table diagnostic that says whether dedup is worth
    // a pass over this corpus and how much it would remove
    // (Σ (k−1)·n_clusters over k ≥ 2). Only digests shuffle.
    sql("q120_dup_spectrum",
      """WITH g AS (SELECT md5(lower(text)) AS fp, CAST(count(*) AS BIGINT) AS k FROM documents GROUP BY fp)
        |SELECT k AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters, CAST(sum(k) AS BIGINT) AS n_docs
        |FROM g GROUP BY k ORDER BY k""".stripMargin) {
      (s, d) =>
        documents(s, d)
          .groupBy(TextFunctions.fingerprint(col("text")).as("fp"))
          .agg(count(lit(1)).as("k"))
          .groupBy(col("k").as("cluster_size"))
          .agg(count(lit(1)).as("n_clusters"), sum("k").as("n_docs"))
          .orderBy("cluster_size")
    },

    // Per-source boilerplate spans: token 4-grams appearing in ≥ 2
    // DISTINCT documents of the same source (distinct by the q68
    // array_distinct-per-doc construction), top-3 per source by
    // document frequency — the table a boilerplate-stripping stage is
    // driven by (headers, footers, navigation chrome repeat within a
    // source, not across sources).
    sql("q121_boilerplate_spans",
      """WITH t AS (SELECT doc_id, source, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks FROM documents),
        |sh AS (SELECT doc_id, source, unnest(list_distinct(CASE WHEN len(toks) < 4 THEN [array_to_string(toks, ' ')]
        |   ELSE [array_to_string(list_slice(toks, i, i+3), ' ') FOR i IN range(1, len(toks)-2)] END)) AS span FROM t),
        |c AS (SELECT source, span, CAST(count(*) AS BIGINT) AS df FROM sh WHERE span <> '' GROUP BY source, span),
        |r AS (SELECT source, span, df, row_number() OVER (PARTITION BY source ORDER BY df DESC, span) AS rn FROM c WHERE df >= 2)
        |SELECT source, span, df, CAST(rn AS BIGINT) AS rn FROM r WHERE rn <= 3 ORDER BY source, rn""".stripMargin) {
      (s, d) =>
        val c = documents(s, d)
          .select(col("doc_id"), col("source"),
            explode(array_distinct(Dedup.shingles(col("text"), 4))).as("span"))
          .filter(col("span") =!= "")
          .groupBy("source", "span")
          .agg(count(lit(1)).as("df"))
        val w = Window.partitionBy("source").orderBy(col("df").desc, col("span"))
        c.filter(col("df") >= 2)
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .orderBy("source", "rn")
    },

    // Boilerplate STRIP — the stage q121's table drives: greedy
    // single-pass removal of the flagged spans from every document
    // (native kernel; single-pass is the production semantic — removal
    // can form new flagged adjacencies and those survive, see the
    // kernel's Scaladoc). The flagged set is bounded by construction
    // (top-3 per source), so it is collected driver-side and baked
    // into the expression as a static set (the q97 driver-sized
    // precedent) — a per-row hash probe, no join, no shuffle. The
    // oracle replays the exact greedy walk with a recursive CTE over
    // token positions, so Spark's kernel is hash-checked against an
    // independent implementation of the same procedure.
    sql("q122_boilerplate_strip",
      """WITH t AS (SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks FROM documents),
        |sh AS (SELECT doc_id, source, unnest(list_distinct(CASE WHEN len(toks) < 4 THEN [array_to_string(toks, ' ')]
        |   ELSE [array_to_string(list_slice(toks, i, i+3), ' ') FOR i IN range(1, len(toks)-2)] END)) AS span
        |   FROM (SELECT doc_id, source, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks FROM documents)),
        |c AS (SELECT source, span, count(*) AS df FROM sh WHERE span <> '' GROUP BY 1, 2),
        |flagged AS (SELECT DISTINCT span FROM (
        |  SELECT source, span, df, row_number() OVER (PARTITION BY source ORDER BY df DESC, span) AS rn
        |  FROM c WHERE df >= 2) x WHERE rn <= 3),
        |walk AS (
        |  WITH RECURSIVE w(doc_id, pos, kept) AS (
        |    SELECT doc_id, 1, CAST([] AS VARCHAR[]) FROM t
        |    UNION ALL
        |    SELECT w.doc_id,
        |      CASE WHEN w.pos + 3 <= len(t.toks)
        |             AND array_to_string(list_slice(t.toks, w.pos, w.pos+3), ' ') IN (SELECT span FROM flagged)
        |           THEN w.pos + 4 ELSE w.pos + 1 END,
        |      CASE WHEN w.pos + 3 <= len(t.toks)
        |             AND array_to_string(list_slice(t.toks, w.pos, w.pos+3), ' ') IN (SELECT span FROM flagged)
        |           THEN w.kept ELSE list_append(w.kept, t.toks[w.pos]) END
        |    FROM w JOIN t USING (doc_id)
        |    WHERE w.pos <= len(t.toks))
        |  SELECT w.doc_id, array_to_string(w.kept, ' ') AS cleaned,
        |         CAST(len(t.toks) - len(w.kept) AS BIGINT) AS n_removed
        |  FROM w JOIN t USING (doc_id) WHERE w.pos = len(t.toks) + 1)
        |SELECT doc_id, cleaned, n_removed FROM walk ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        val docs = documents(s, d)
        // same flagged set as q121, deduped across sources; ≤ 3·|sources|
        // strings by construction — safe to collect
        val c = docs
          .select(col("source"),
            explode(array_distinct(Dedup.shingles(col("text"), 4))).as("span"))
          .filter(col("span") =!= "")
          .groupBy("source", "span")
          .agg(count(lit(1)).as("df"))
        val w = Window.partitionBy("source").orderBy(col("df").desc, col("span"))
        val spans = c.filter(col("df") >= 2)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("span").distinct()
          .collect().map(_.getString(0)).toSeq
        val cleaned = graft.plans.BoilerplateStripExpr.boilerplate_strip(col("text"), spans, 4)
        docs.select(col("doc_id"), cleaned.as("cleaned"),
          (TextFunctions.tokenCount(col("text")) - TextFunctions.tokenCount(cleaned)).as("n_removed"))
          .orderBy("doc_id")
    }
  )
}
