package graft.engine

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.Dedup

/** Training-data curation operators beyond dedup/similarity: benchmark
  * decontamination, deterministic stratified sampling (data mixing),
  * and n-gram frequency statistics. All three are ANSI-SQL-expressible
  * and carry full DuckDB oracles.
  *
  * Scale shapes:
  *  - Decontamination joins the corpus's shingle explosion against the
  *    benchmark shingle set — the benchmark side is tiny by definition
  *    (an eval set), so it is `broadcast()`: the corpus is scanned once
  *    with no shuffle of corpus shingles. At 100 TB this is the only
  *    viable formulation; shuffling the corpus's exploded shingles
  *    (O(tokens) rows) would dwarf the data itself.
  *  - Sampling is a stateless per-row filter on a cryptographic hash of
  *    the id — deterministic across engines and retries (no RNG state),
  *    trivially parallel, and stratified by routing the per-stratum
  *    rate through the threshold expression.
  *  - N-gram stats are one explode + partial-aggregated count, then a
  *    top-k window over the (small) per-language aggregate.
  */
object TrainingQueries {
  import QueryDef._
  import Tables._

  val all: Seq[QueryDef] = Seq(

    // Benchmark decontamination: corpus documents sharing any token
    // 4-gram with the held-out eval slice (doc_id % 50 == 0 stands in
    // for the benchmark set). Output: contaminated doc -> how many of
    // its distinct shingles hit the benchmark.
    sql("q68_decontaminate",
      """WITH t AS (SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(toks) < 4 THEN [array_to_string(toks, ' ')]
        |   ELSE [array_to_string(list_slice(toks, i, i+3), ' ') FOR i IN range(1, len(toks)-2)] END)) AS shingle FROM t),
        |ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0 AND shingle <> ''),
        |corp AS (SELECT * FROM sh WHERE doc_id % 50 <> 0 AND shingle <> '')
        |SELECT corp.doc_id AS doc_id, count(DISTINCT corp.shingle) AS n_overlap
        |FROM corp JOIN ev ON corp.shingle = ev.shingle
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        // empty docs produce one "" shingle — dropped on both sides so
        // an empty eval doc can never flag every empty corpus doc
        val sh = documents(s, d).select(col("doc_id"),
          explode(array_distinct(Dedup.shingles(col("text"), 4))).as("shingle"))
          .filter(col("shingle") =!= "")
        val ev = sh.filter(col("doc_id") % 50 === 0).select("shingle").distinct()
        // count(1), not countDistinct: (doc, shingle) pairs are unique
        // by construction (array_distinct per doc × distinct eval set),
        // and countDistinct plans an extra full exchange of the joined
        // stream on (doc, shingle) before aggregating (same argument as
        // Decontaminate.contaminatedDocs; oracle keeps COUNT(DISTINCT),
        // which is equal on unique pairs)
        sh.filter(col("doc_id") % 50 =!= 0)
          .join(broadcast(ev), "shingle")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_overlap"))
          .orderBy("doc_id")
    },

    // Deterministic stratified sampling for data mixing: md5(id) is a
    // uniform hash, its first hex digit a 16-bucket stratifier; the
    // per-language threshold encodes the mixing weights (en at 8/16,
    // everything else at 2/16). Reproducible on any engine, any retry.
    sql("q69_hash_sample",
      """SELECT doc_id, lang FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < CASE WHEN lang = 'en' THEN '8' ELSE '2' END
        |ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        documents(s, d)
          .filter(substring(md5(col("doc_id").cast("string")), 1, 1) <
            when(col("lang") === "en", lit("8")).otherwise(lit("2")))
          .select(col("doc_id"), col("lang"))
          .orderBy("doc_id")
    },

    // PII handling: mask digit runs in a name field and derive a
    // stable pseudonym key (md5 prefix) — masking scrubs, the
    // pseudonym keeps records joinable after scrubbing. Stateless
    // per-row expressions; identical semantics in any engine.
    sql("q71_pii_mask",
      """SELECT c_custkey, regexp_replace(c_name, '[0-9]', '#', 'g') AS name_masked,
        |       substr(md5(c_name), 1, 12) AS pseudonym
        |FROM customer ORDER BY c_custkey""".stripMargin) {
      (s, d) =>
        customer(s, d)
          .select(col("c_custkey"),
            regexp_replace(col("c_name"), "[0-9]", "#").as("name_masked"),
            substring(md5(col("c_name")), 1, 12).as("pseudonym"))
          .orderBy("c_custkey")
    },

    // Fixed-size token chunking (50-token chunks): the one-shuffle
    // relational shape — explode tokens with position, group by
    // (doc, pos / 50), reassemble order-stable.
    sql("q72_chunk_tokens",
      """WITH t AS (SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks FROM documents),
        |tok AS (SELECT doc_id, unnest([{'p': p, 'tok': toks[p]} FOR p IN range(1, len(toks)+1)], recursive := true) FROM t)
        |SELECT doc_id, (p-1)//50 AS chunk_id, string_agg(tok, ' ' ORDER BY p) AS chunk_text, count(*) AS n_tokens
        |FROM tok GROUP BY doc_id, chunk_id ORDER BY doc_id, chunk_id""".stripMargin) {
      (s, d) =>
        graft.operators.TextOps.chunkTokens(documents(s, d), "doc_id", "text", 50)
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id", "chunk_id")
    },

    // Intra-document repetition filter (the Gopher-rules shape): the
    // fraction of a document's token trigrams that are duplicates of
    // an earlier trigram in the SAME document. High-repetition docs
    // (boilerplate, listicles, generator loops) get filtered before
    // training. Stateless per row — shingle, distinct, ratio.
    // dup_frac is reported integer-scaled (basis points, floored):
    // round(double, n) on a row-level ratio is the known Spark-HALF_UP
    // vs DuckDB-binary-round divergence (oracle-parity rule #1); the
    // floor of x·10⁴ is computed identically on identical doubles.
    sql("q75_repetition_filter",
      """WITH t AS (SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |   ELSE [array_to_string(list_slice(toks, i, i+2), ' ') FOR i IN range(1, len(toks)-1)] END AS grams FROM t)
        |SELECT doc_id, len(grams) AS n_grams,
        |       CAST(floor((1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams)) * 10000.0) AS BIGINT) AS dup_bp,
        |       (1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams)) <= 0.2 AS keep
        |FROM sh ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        val grams = Dedup.shingles(col("text"), 3)
        val dupFrac = lit(1.0) -
          size(array_distinct(grams)).cast("double") / size(grams).cast("double")
        documents(s, d).select(
          col("doc_id"),
          size(grams).cast("long").as("n_grams"),
          floor(dupFrac * 10000.0).cast("long").as("dup_bp"),
          (dupFrac <= 0.2).as("keep"))
          .orderBy("doc_id")
    },

    // Corpus n-gram statistics: top-5 token bigrams per language.
    sql("q70_ngram_topk",
      """WITH t AS (SELECT lang, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks FROM documents),
        |bg AS (SELECT lang, unnest(CASE WHEN len(toks) < 2 THEN [array_to_string(toks, ' ')]
        |   ELSE [array_to_string(list_slice(toks, i, i+1), ' ') FOR i IN range(1, len(toks))] END) AS bigram FROM t),
        |c AS (SELECT lang, bigram, count(*) AS n FROM bg GROUP BY 1, 2)
        |SELECT lang, bigram, n, rn FROM (
        |  SELECT lang, bigram, n, row_number() OVER (PARTITION BY lang ORDER BY n DESC, bigram) AS rn FROM c) x
        |WHERE rn <= 5 ORDER BY lang, rn""".stripMargin) {
      (s, d) =>
        val bg = documents(s, d).select(col("lang"),
          explode(Dedup.shingles(col("text"), 2)).as("bigram"))
        val c = bg.groupBy("lang", "bigram").agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("lang").orderBy(col("n").desc, col("bigram"))
        c.withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 5)
          .orderBy("lang", "rn")
    },

    // ASCII-tier text normalization: controls → spaces, whitespace
    // collapse, trim, ASCII lowercase — the canonical form dedup keys
    // on. Planted %9 suffix carries tabs, a control byte, mixed case,
    // and a space run, so every rule fires; unplanted docs pin the
    // changed=false arm (the corpus is already single-spaced).
    sql("q173_normalize_text",
      """WITH corpus AS (SELECT doc_id,
        |  CASE WHEN doc_id % 9 = 0
        |       THEN text || chr(9) || chr(9) || ' MiXeD   CASE ' || chr(1)
        |       ELSE text END AS text FROM documents),
        |n AS (SELECT doc_id, text,
        |  lower(trim(regexp_replace(regexp_replace(text, '[\x00-\x1F\x7F]', ' ', 'g'), '\s+', ' ', 'g'))) AS norm
        |  FROM corpus)
        |SELECT doc_id, norm, norm <> text AS changed,
        |  CAST(length(text) - length(norm) AS BIGINT) AS n_chars_removed
        |FROM n ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        val corpus = documents(s, d).select(col("doc_id"),
          when(col("doc_id") % 9 === 0,
            concat(col("text"), lit("\t\t MiXeD   CASE ")))
            .otherwise(col("text")).as("text"))
        corpus.select(col("doc_id"),
            TextFunctions.normalizeAscii(col("text")).as("norm"),
            (TextFunctions.normalizeAscii(col("text")) =!= col("text")).as("changed"),
            (length(col("text")) - length(TextFunctions.normalizeAscii(col("text"))))
              .cast("long").as("n_chars_removed"))
          .orderBy("doc_id")
    },

    // Luhn-checked card-number scan — the precision tier above q71's
    // shape masks: 13–19 digit tokens are candidates, the mod-10
    // checksum separates real card shapes from arbitrary digit runs.
    // Planted: %19 docs carry TWO valid test numbers, %23 docs one
    // checksum-failing twin — counted apart.
    sql("q174_card_scan",
      """WITH corpus AS (SELECT doc_id,
        |  CASE WHEN doc_id % 19 = 0 THEN text || ' 4111111111111111 4111111111111111'
        |       WHEN doc_id % 23 = 0 THEN text || ' 4111111111111112'
        |       ELSE text END AS text FROM documents),
        |tok AS (SELECT doc_id, unnest(l) AS t, unnest(range(1, len(l)+1)) AS i FROM (
        |          SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS l FROM corpus)),
        |c AS (SELECT doc_id, t, i FROM tok WHERE regexp_matches(t, '^[0-9]{13,19}$')),
        |kd AS (SELECT doc_id, t, i, k,
        |         CAST(substr(t, length(t) - CAST(k AS INT), 1) AS INT) AS dig
        |       FROM (SELECT doc_id, t, i, unnest(range(0, length(t))) AS k FROM c)),
        |ds AS (SELECT doc_id, t, i,
        |         sum(CASE WHEN k % 2 = 1
        |               THEN CASE WHEN dig * 2 > 9 THEN dig * 2 - 9 ELSE dig * 2 END
        |               ELSE dig END) AS s
        |       FROM kd GROUP BY doc_id, t, i)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_candidates,
        |  CAST(sum(CASE WHEN s % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_luhn_valid
        |FROM ds GROUP BY doc_id ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        val corpus = documents(s, d).select(col("doc_id"),
          when(col("doc_id") % 19 === 0,
            concat(col("text"), lit(" 4111111111111111 4111111111111111")))
            .when(col("doc_id") % 23 === 0,
              concat(col("text"), lit(" 4111111111111112")))
            .otherwise(col("text")).as("text"))
        corpus.select(col("doc_id"),
            explode(TextFunctions.tokens(col("text"))).as("tok"))
          .filter(col("tok").rlike("^[0-9]{13,19}$"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_candidates"),
            sum(when(TextFunctions.luhnValid(col("tok")), 1L).otherwise(0L))
              .as("n_luhn_valid"))
          .orderBy("doc_id")
    }
  )
}
