package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for a large-scale training-data pipeline:
  * tokenization, token/char counting, quality scoring, stopword-marker
  * language ID, and document fingerprinting.
  *
  * Everything here is composed from `org.apache.spark.sql.functions`
  * (including higher-order array functions), so the whole family stays
  * inside whole-stage codegen — no Scala UDF boundary, no per-row
  * serialization. That is the property that matters at 100 TB: these
  * run at parquet-scan speed and pipeline into downstream joins and
  * aggregations without an exchange.
  *
  * Reference scope: the reference's design docs commit to QA/dedup/
  * report stages over ingested records
  * (/root/reference/docs/system-plan.md:23-27); these functions realize
  * that contract plus the LLM-pipeline text operators.
  */
object TextFunctions {

  /** Whitespace tokenizer: any run of spaces/tabs/newlines delimits,
    * and empty tokens are dropped (so an empty or all-whitespace
    * document tokenizes to [] — not [""], which would inflate
    * tokenCount and skew every downstream ratio, shingle, and MinHash
    * signature on real-world corpora). Runs in the native `TokensExpr`
    * kernel — deterministic and codegen'd, so repeated references in
    * one projection (quality score, language ID) tokenize once via
    * subexpression elimination.
    */
  def tokens(text: Column): Column =
    graft.plans.TokensExpr.ws_tokens(text)

  /** Higher-order-function tokenizer — the differential oracle for the
    * native kernel (see FunctionsSpec).
    */
  def tokensHof(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => t =!= lit(""))

  /** Distinct token set, for Jaccard/shingling. */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  def charCount(text: Column): Column = length(text).cast("long")

  /** Divide with NULL on a zero denominator — an empty document must
    * yield NULL ratios (DuckDB's x/0 semantics), not an ANSI-mode
    * DIVIDE_BY_ZERO error that kills the whole stage at scale.
    */
  private def safeDiv(num: Column, den: Column): Column =
    when(den === 0, lit(null)).otherwise(num / den)

  /** Mean token length (characters of non-whitespace text / token count). */
  def avgWordLen(text: Column): Column =
    safeDiv(length(regexp_replace(text, "\\s", "")).cast("double"), tokenCount(text))

  /** Ratio of punctuation characters to total characters. */
  def punctRatio(text: Column): Column =
    safeDiv((length(text) - length(regexp_replace(text, "[.,!?;:]", ""))).cast("double"),
      length(text))

  /** English-ish stopwords present in the synthetic corpus. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  private def hitCount(text: Column, words: Seq[String]): Column =
    graft.plans.TokenSetHitsExpr.token_set_hits(text, Seq(words)).getItem(0)

  /** Higher-order-function hit count — the differential oracle for
    * `TokenSetHitsExpr` (see FunctionsSpec).
    */
  private[graft] def hitCountHof(text: Column, words: Seq[String]): Column =
    size(filter(tokensHof(text), t => t.isInCollection(words))).cast("long")

  /** Fraction of tokens that are stopwords. */
  def stopwordRatio(text: Column): Column =
    safeDiv(hitCount(text, Stopwords).cast("double"), tokenCount(text))

  /** Non-whitespace character count — total token characters without
    * re-tokenizing (the tokens partition the non-whitespace text).
    */
  def nonWsChars(text: Column): Column =
    length(regexp_replace(text, "\\s", "")).cast("long")

  /** Stopword occurrence count (with multiplicity) — public form of
    * the marker-hit kernel over [[Stopwords]].
    */
  def stopwordHits(text: Column): Column = hitCount(text, Stopwords)

  /** Gopher-style quality GATE (Rae et al. 2021's rule family, the
    * thresholds parameterized): word count inside [minWords, maxWords],
    * mean word length inside [minAvgLen, maxAvgLen], and at least
    * `minStopHits` stopword occurrences. The mean-word-length rule is
    * evaluated as INTEGER cross-multiplication
    * (`minAvgLen·words ≤ chars ≤ maxAvgLen·words`) — no division, no
    * float rounding, so the gate is bit-identical in any engine (the
    * q78 oracle property). Composes with the repetition rule (q75) and
    * the composite score ([[qualityScore]]) for a full curation gate.
    */
  def gopherKeep(text: Column,
      minWords: Int = 5, maxWords: Int = 100000,
      minAvgLen: Int = 2, maxAvgLen: Int = 12,
      minStopHits: Int = 1): Column = {
    val w = tokenCount(text)
    val c = nonWsChars(text)
    w >= minWords && w <= maxWords &&
      c >= w * minAvgLen && c <= w * maxAvgLen &&
      stopwordHits(text) >= minStopHits
  }

  /** Composite document quality score in [0, 1]: rewards length (up to
    * 100 tokens), non-stopword density, and word length (up to 8 chars).
    * Deterministic and SQL-expressible for oracle parity.
    */
  def qualityScore(text: Column): Column =
    round(
      least(lit(1.0), tokenCount(text).cast("double") / 100) * 0.4 +
        (lit(1.0) - stopwordRatio(text)) * 0.3 +
        least(lit(1.0), avgWordLen(text) / 8) * 0.3,
      4)

  /** Marker-stopword sets per language for the lightweight lang-ID
    * heuristic.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "los", "que", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est"))

  /** Language ID by marker-word scoring: the language with the highest
    * marker hit count wins; ties break alphabetically (declaration
    * order); zero hits overall → "und". Deterministic, SQL-mirrorable.
    * All four marker sets are counted in ONE kernel pass
    * (`TokenSetHitsExpr`), then the argmax is plain codegen'd
    * arithmetic over the counts array.
    */
  def langIdMarkers(text: Column): Column = {
    val hits = graft.plans.TokenSetHitsExpr.token_set_hits(
      text, LangMarkers.map(_._2))
    val scores = LangMarkers.zipWithIndex.map { case ((l, _), i) =>
      l -> hits.getItem(i)
    }
    val total = scores.map(_._2).reduce(_ + _)
    val top = scores.map(_._2).reduce(greatest(_, _))
    val pick = scores.foldRight(lit("und")) { case ((l, sc), els) =>
      when(sc === top, lit(l)).otherwise(els)
    }
    when(total === 0, lit("und")).otherwise(pick)
  }

  /** BPE-style pre-tokenization pattern (the GPT-2 family's shape,
    * without lookaheads so it runs identically under Java regex and
    * RE2-based engines): common contractions, letter runs, digit runs,
    * and non-alphanumeric punctuation runs. LLM token-count estimation
    * splits on this before byte-pair merging; the pre-token count is
    * the standard cheap proxy for BPE token count at corpus scale.
    */
  val BpePattern: String = "'(?:t|s|re|ve|m|ll|d)|[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s']+|'"

  /** BPE-ish pre-tokens as an array column (regexp_extract_all — stays
    * in codegen, no UDF).
    */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpePattern), lit(0))

  /** Pre-token count — the cheap LLM-token-count proxy. */
  def bpeTokenCount(text: Column): Column = size(bpeTokens(text)).cast("long")

  /** Stable content fingerprint (md5 of lowercased text) for exact
    * dedup; reproducible in any engine with md5.
    */
  def fingerprint(text: Column): Column = md5(lower(text))

  /** Run-length counts of the document's sorted token array — the
    * per-row unigram histogram values, with the token identities
    * dropped (entropy and diversity need only the multiset of counts).
    *
    * SPEC-ORACLE FORM, not a production path: the lambdas capture the
    * sorted array, and Catalyst inlines captured expression trees into
    * each lambda body — the array is re-sorted per ELEMENT, so this
    * evaluates in O(L² log L) per row (measured: 142 s for q117 at the
    * 10× corpus). The production entropy path is the native
    * `UnigramClogcE6Expr` kernel; this form exists as its readable
    * differential oracle (the tokens/tokensHof convention).
    *
    * Empty/whitespace-only docs yield [] (`sequence(0, n-1)` would
    * count DOWN for n=0 — the guard is load-bearing, and CaseWhen
    * only evaluates the taken branch).
    */
  def tokenRunCounts(text: Column): Column = {
    val sorted = array_sort(tokens(text))
    val n = size(sorted)
    // 0-based start positions of runs: position 0, plus every i where
    // sorted[i] differs from sorted[i-1] (element_at is 1-based).
    val starts = filter(sequence(lit(0), n - 1), i =>
      i === 0 || element_at(sorted, i + 1) =!= element_at(sorted, i))
    val nexts = concat(slice(starts, lit(2), greatest(size(starts) - 1, lit(0))), array(n))
    when(n === 0, array().cast("array<int>"))
      .otherwise(zip_with(starts, nexts, (a, b) => b - a))
  }

  /** Σ c·ln(c) over the per-document unigram counts, each term floored
    * to integer micro-nats BEFORE summing (the q88 determinism
    * pattern: floor(x·10⁶) of identical doubles is identical in any
    * engine, and integer addition is order-independent — a float sum
    * would be sensitive to run order). Unigram entropy in micro-nats
    * is then `floor(ln(N)·10⁶) − (this DIV N)`: exact integer ops all
    * the way from the floored terms. NULL for empty documents.
    *
    * Runs in the native `UnigramClogcE6Expr` kernel (one tokenize +
    * sort + linear pass per row, codegen- and CSE-eligible); see
    * [[unigramClogcE6Hof]] for the differential-oracle form and the
    * kernel's Scaladoc for why the HOF form is quadratic.
    */
  def unigramClogcE6(text: Column): Column =
    when(size(tokens(text)) === 0, lit(null))
      .otherwise(graft.plans.UnigramClogcE6Expr.unigram_clogc_e6(text))

  /** Higher-order-function Σ floor(c·ln c·10⁶) — the differential
    * oracle for `UnigramClogcE6Expr` (see SplitOpsSpec). Quadratic
    * per row (lambda-capture inlining) — spec scale only.
    */
  private[graft] def unigramClogcE6Hof(text: Column): Column =
    when(size(tokens(text)) === 0, lit(null))
      .otherwise(aggregate(tokenRunCounts(text), lit(0L), (acc, c) =>
        acc + floor(c.cast("double") * log(c.cast("double")) * 1000000.0).cast("long")))

  /** Polynomial rolling hash over tokens (base-257 Horner form over
    * each token's xxhash64, mod 2^31−1 so every intermediate stays
    * overflow-safe under Spark's ANSI mode). Engine-internal (not
    * oracle-mirrorable); used for shingle hashing and cheap near-dup
    * pre-buckets.
    */
  def rollingTokenHash(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, tok) =>
      pmod(acc * lit(257L) + pmod(xxhash64(tok), lit(2147483647L)), lit(2147483647L)))

  /** Higher-order-function BPE merge round — the differential oracle
    * for the native `BpeMergeExpr` kernel (see BpeSpec). A left fold
    * that merges `x` into the accumulator's last element when the two
    * form the (lhs, rhs) pair; because a merge replaces the last
    * element with lhs+rhs (≠ lhs — symbols are non-empty), a merge
    * product can never immediately re-merge, which is exactly the
    * greedy leftmost non-overlapping scan of the kernel. O(|word|²)
    * accumulator copies per row — oracle only, not a production path.
    */
  private[graft] def bpeMergeHof(syms: Column, lhs: String, rhs: String): Column =
    aggregate(syms,
      expr("CAST(array() AS ARRAY<STRING>)"),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(lhs) && x === lit(rhs),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(lhs + rhs))))
          .otherwise(concat(acc, array(x))))

  /** Luhn checksum validity of an all-digit token (the mod-10 check
    * every payment-card number passes) — the high-precision tier of
    * PII detection above q71's shape regexes: a 16-digit token that
    * ALSO passes Luhn is a card number with ~10× fewer false positives
    * than the shape alone. Pure integer HOF arithmetic (digits
    * right-to-left, every second doubled, >9 folds by −9), identical
    * in any engine.
    */
  def luhnValid(tok: Column): Column = {
    val rev = reverse(filter(split(tok, ""), c => c =!= lit("")))
    val total = aggregate(
      zip_with(rev, sequence(lit(0), size(rev) - 1), (c, k) => {
        val d = c.cast("int")
        val dd = when(k % 2 === 1, d * 2).otherwise(d)
        when(dd > 9, dd - 9).otherwise(dd)
      }),
      lit(0), (a, x) => a + x)
    total % 10 === 0
  }

  /** ASCII-tier deterministic text normalization: control characters
    * become spaces, whitespace runs collapse, ends trim, ASCII
    * lowercase — the canonical form digest/dedup layers key on when
    * crawls disagree about formatting. Deliberately NOT full-Unicode
    * case folding (Java's ß→ss / Turkish İ rules diverge from simple
    * SQL lower(), the r7 upper() lesson); on ASCII the two agree
    * byte-for-byte, which is what keeps this cross-engine exact.
    */
  def normalizeAscii(text: Column): Column =
    lower(trim(regexp_replace(
      regexp_replace(text, "[\\x00-\\x1F\\x7F]", " "), "\\s+", " ")))
}
