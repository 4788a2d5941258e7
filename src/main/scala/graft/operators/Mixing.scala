package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-mixing rebalance: downsample over-represented strata toward a
  * target distribution with a DETERMINISTIC hash gate — no RNG state,
  * so the sample is identical on any engine, any partitioning, any
  * retry (the property that makes it DuckDB-oracle-checkable, q80, and
  * reproducible across pipeline re-runs, which training-data lineage
  * requires).
  *
  * Mechanics: each stratum's keep-fraction is
  * `f = target_share · total / count(stratum)` (capped at 1 — this
  * operator only downsamples; upsampling is a repeat-join concern).
  * A document survives iff the first 4 hex chars of `md5(id)` — a
  * uniform 16-bit value — fall below `f · 16^4`. The threshold is
  * computed in INTEGER arithmetic and compared lexically against the
  * zero-padded hex (`%04x`) rendering, so there is no float rounding
  * to diverge between engines. 16-bit gate resolution means the
  * realized fraction is exact to 1/65536 — ample for mixing (and
  * strata needing >65536× downsampling are out of scope for a gate);
  * the integer products stay within long for corpora past 10^11 rows
  * (uniform: 10^14), i.e. beyond 100 TB of documents.
  *
  * Scale shape: two tiny aggregates (stratum counts; their sum), both
  * broadcast back, then a stateless per-row filter — no window, no
  * sort, one pass over the corpus. The same shape as the q69 mixing
  * gate, but with the per-stratum rates DERIVED from the measured
  * distribution instead of fixed in config.
  */
object Mixing {

  /** Rebalance toward UNIFORM shares across strata: every stratum's
    * target share is `1/n_strata`. Over-represented strata are
    * hash-downsampled to it; strata at or under their share keep all
    * rows. Returns (idCol, strataCol) of surviving rows (unsorted —
    * ordering is presentation, added by the catalog query).
    */
  def rebalanceUniform(docs: DataFrame, strataCol: String,
      idCol: String = "doc_id"): DataFrame = {
    val counts = docs.groupBy(strataCol).agg(count(lit(1)).as("__cnt"))
    val totals = counts.agg(sum("__cnt").as("__total"),
      count(lit(1)).as("__nstrata"))
    docs.join(broadcast(counts), strataCol)
      .crossJoin(broadcast(totals))
      .filter(
        // f >= 1: the stratum is at/under its share — keep everything
        col("__cnt") * col("__nstrata") <= col("__total") ||
          substring(md5(col(idCol).cast("string")), 1, 4) <
            format_string("%04x",
              expr("(65536 * __total) div (__nstrata * __cnt)")))
      .select(col(idCol), col(strataCol))
  }

  /** Rebalance toward explicit per-stratum target shares, in
    * per-mille (`shareMille` values in [0, 1000]; strata absent from
    * the map keep all rows). `f = share/1000 · total / count`.
    */
  def rebalanceWeighted(docs: DataFrame, strataCol: String,
      shareMille: Map[String, Int], idCol: String = "doc_id"): DataFrame = {
    require(shareMille.values.forall(s => s >= 0 && s <= 1000),
      "shares are per-mille in [0, 1000]")
    val counts = docs.groupBy(strataCol).agg(count(lit(1)).as("__cnt"))
    val totals = counts.agg(sum("__cnt").as("__total"))
    val share = shareMille.foldLeft(lit(null).cast("long")) {
      case (acc, (k, v)) => when(col(strataCol) === k, lit(v.toLong)).otherwise(acc)
    }
    docs.join(broadcast(counts), strataCol)
      .crossJoin(broadcast(totals))
      .withColumn("__share", share)
      .filter(col("__share").isNull ||
        col("__cnt") * lit(1000L) <= col("__share") * col("__total") ||
        substring(md5(col(idCol).cast("string")), 1, 4) <
          format_string("%04x",
            expr("(65536 * __share * __total) div (1000 * __cnt)")))
      .select(col(idCol), col(strataCol))
  }

  /** Temperature-scaled mixture resampling at α = ½ (the mT5/XLM-R
    * rebalance family, p_s ∝ n_s^α): downsample each stratum to
    * n_s·√(min_n/n_s) = √(n_s·min_n) rows, so final shares are
    * proportional to √n_s — flattening the head without q80's full
    * uniformity. The smallest stratum keeps every row; each other
    * stratum keeps a document when its derandomized md5 16-bit prefix
    * clears the stratum's rate threshold (the [[rebalanceUniform]]
    * Bernoulli gate).
    *
    * α is pinned to ½ BECAUSE of the cross-engine exactness contract:
    * √ is IEEE-754 correctly rounded (like + × ÷), so
    * ⌊65536·√min_n/√n_s⌋ is bit-identical in any engine, where a
    * general n^α needs `pow` — whose last-ulp behavior is libm-
    * specific and could flip a floor boundary.
    *
    * Scale shape: one tiny counts aggregate broadcast back; the corpus
    * is scanned and filtered map-side, never shuffled.
    */
  def temperatureSample(docs: DataFrame, strataCol: String,
      idCol: String = "doc_id"): DataFrame = {
    val counts = docs.groupBy(strataCol).agg(count(lit(1)).as("__cnt"))
    val minc = counts.agg(min("__cnt").as("__minc"))
    docs.join(broadcast(counts), strataCol)
      .crossJoin(broadcast(minc))
      // clamp to 65535: a ratio that floors to exactly 65536 (cnt just
      // above minc at astronomical counts) would render as the 5-char
      // "10000" and lexically INVERT the 4-char prefix comparison,
      // dropping the stratum instead of keeping it
      .filter(col("__cnt") === col("__minc") ||
        substring(md5(col(idCol).cast("string")), 1, 4) <
          format_string("%04x", least(
            floor(lit(65536.0) * sqrt(col("__minc")) / sqrt(col("__cnt"))).cast("long"),
            lit(65535L))))
      .select(col(idCol), col(strataCol))
  }

  /** [[temperatureSample]] for GENERAL dyadic α = num / 2^log2den —
    * covering the practically-used 0.3–0.7 band (¼, ⅜, ½, ⅝, ¾, …)
    * without surrendering the hash-stable oracle: the acceptance
    * probability (minc/cnt)^α is computed as n chained `sqrt`s (the
    * 2^log2den-th root) followed by num−1 multiplications. Every step
    * (÷, √, ×) is IEEE-754 correctly rounded, so the SAME expression
    * DAG yields BIT-IDENTICAL doubles in any compliant engine and the
    * floor'd 16-bit threshold cannot flip — where a general libm
    * `pow` differs in the last ulp across implementations (the
    * documented reason plain α was restricted to ½).
    */
  def temperatureSampleAlpha(docs: DataFrame, strataCol: String,
      idCol: String = "doc_id", alphaNum: Int = 1, alphaLog2Den: Int = 1): DataFrame = {
    require(alphaNum >= 1, "alpha numerator must be >= 1")
    require(alphaLog2Den >= 0 && alphaLog2Den <= 8, "alpha denominator 2^n, n in [0,8]")
    require(alphaNum <= (1 << alphaLog2Den),
      "alpha must be <= 1 (num <= 2^log2den): supersampling is rebalance(), not temperature")
    val counts = docs.groupBy(strataCol).agg(count(lit(1)).as("__cnt"))
    val minc = counts.agg(min("__cnt").as("__minc"))
    val ratio = col("__minc").cast("double") / col("__cnt").cast("double")
    val root = (1 to alphaLog2Den).foldLeft(ratio)((c, _) => sqrt(c))
    val p = (2 to alphaNum).foldLeft(root)((acc, _) => acc * root)
    docs.join(broadcast(counts), strataCol)
      .crossJoin(broadcast(minc))
      // same 65535 clamp as temperatureSample: p rounding to exactly
      // 1.0 for a non-min stratum must keep it, not render "10000"
      .filter(col("__cnt") === col("__minc") ||
        substring(md5(col(idCol).cast("string")), 1, 4) <
          format_string("%04x",
            least(floor(lit(65536.0) * p).cast("long"), lit(65535L))))
      .select(col(idCol), col(strataCol))
  }

  /** Score-proportional domain reweighting — the deterministic core of
    * loss-aware mixing (the DoReMi idea: upweight domains the model
    * finds hard, Xie et al. 2023, reduced to its exact-arithmetic
    * skeleton): given one non-negative integer SCORE per group
    * (typically a micro-nat LM surprisal aggregate — q135's output —
    * but any difficulty/importance signal works), emit integer e6
    * weights proportional to score and a budget allocation
    *
    *   alloc_g = budget · score_g div Σ score   (+1 to the first
    *   `budget mod Σ` groups in (score desc, group) order)
    *
    * so Σ alloc = budget exactly and everything replays in SQL. The
    * remainder r = budget − Σ base is strictly less than the number of
    * positive-score groups (zero-score groups contribute no
    * fractional part), and the (score desc, group) order ranks
    * positive scores first, so every +1 lands on a positive-score
    * group. Zero-score groups get exactly zero. An all-zero score
    * vector yields NULL weights/allocs (no silent uniform fallback —
    * the caller decides).
    *
    * Scale shape: runs on the |groups|-sized score table (the q145
    * convention — corpus work happens upstream in whatever produced
    * the scores); windows are group-bounded.
    */
  def scoreReweight(scores: DataFrame, groupCol: String, scoreCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, "budget must be >= 0")
    import org.apache.spark.sql.expressions.Window
    val s = scores.select(col(groupCol), col(scoreCol).cast("long").as("__s"))
    val tot = s.agg(sum("__s").as("__t"))
    val ranked = s.crossJoin(broadcast(tot))
      .withColumn("__i", row_number().over(
        Window.orderBy(col("__s").desc, col(groupCol))).cast("long"))
      .withColumn("__base",
        expr(s"CASE WHEN __t > 0 THEN ($budget * __s) div __t END"))
    val rem = ranked.agg((lit(budget) - sum("__base")).as("__r"))
    ranked.crossJoin(broadcast(rem))
      .select(col(groupCol), col("__s").as("score"),
        expr("CASE WHEN __t > 0 THEN __s * 1000000 div __t END").as("weight_e6"),
        (col("__base") +
          when(col("__i") <= col("__r"), lit(1L)).otherwise(lit(0L))).as("alloc"))
  }

  /** Waterfilling budget allocation: split a total document budget
    * across sources so under-represented sources keep everything and
    * over-represented ones are capped at a common water level L —
    * the max-min-fair allocation (the classic waterfilling solution;
    * same law as link-capacity fair sharing), and the principled form
    * of "cap every source at N docs" mixing rules.
    *
    * Exact integer semantics, deterministic and SQL-replayable:
    * sources sort by (count asc, source asc) with prefix sums; the
    * split point j is the largest index whose sources can all keep
    * everything while the rest take at least c_j each:
    * `P_j + (k−j)·c_j ≤ budget`. Then `L = (budget−P_j) div (k−j)`
    * and the remainder `r` goes +1 to the FIRST r capped sources in
    * sort order, so `Σ alloc = budget` exactly (when total ≥ budget;
    * otherwise alloc = count and the budget is slack).
    *
    * Scale shape: runs on the (source, count) aggregate — a
    * |sources|-sized table — so the unpartitioned windows are bounded
    * by the source dimension, never the corpus (the q25 convention).
    * Returns (source, n_docs, alloc).
    */
  def waterfill(counts: DataFrame, groupCol: String, countCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, "budget must be >= 0")
    import org.apache.spark.sql.expressions.Window
    val ord = Window.orderBy(col("__c"), col(groupCol))
    val o = counts.select(col(groupCol), col(countCol).cast("long").as("__c"))
      .withColumn("__i", row_number().over(ord).cast("long"))
      .withColumn("__p", sum("__c").over(ord.rowsBetween(Long.MinValue, 0)))
    val tot = o.agg(count(lit(1)).as("__k"), sum("__c").as("__t"))
    val j = o.crossJoin(broadcast(tot))
      .filter(col("__p") + (col("__k") - col("__i")) * col("__c") <= budget)
      .agg(coalesce(max("__i"), lit(0L)).as("__j"))
    val pj = o.select(col("__i"), col("__p").as("__pj"))
      .join(broadcast(j), col("__i") === col("__j"), "right")
      .select(col("__j"), coalesce(col("__pj"), lit(0L)).as("__pj"))
    // the CASE guards matter under ANSI mode: when the budget covers
    // the total, j = k and the level expression would divide by zero
    val lvl = pj.crossJoin(broadcast(tot))
      .select(col("__j"), col("__k"), col("__t"),
        expr(s"CASE WHEN __k > __j THEN ($budget - __pj) div (__k - __j) END").as("__L"),
        expr(s"CASE WHEN __k > __j THEN ($budget - __pj) % (__k - __j) END").as("__r"))
    o.crossJoin(broadcast(lvl))
      .select(col(groupCol), col("__c").as("n_docs"),
        when(col("__t") <= budget, col("__c"))
          .when(col("__i") <= col("__j"), col("__c"))
          .otherwise(col("__L") +
            when(col("__i") - col("__j") <= col("__r"), lit(1L)).otherwise(lit(0L)))
          .as("alloc"))
  }

  /** Leakage-safe train/valid/test split: the assignment hashes the
    * CONTENT (md5 of `textCol`), not the document id, so byte-identical
    * duplicates land in the SAME split by construction — the
    * prevention counterpart of the q118 leakage MEASURE (an id-keyed
    * split scatters a duplicated page across train and test, and the
    * eval set silently memorizes). Same derandomized 2-hex-prefix gate
    * as the q115 family ('00'..'0c' → test ≈ 5%, '0d'..'19' → valid,
    * rest train): stateless per-row map, stable under retries and
    * corpus growth, no RNG. Near-dups need the cluster-id variant
    * (split on the q94 keeper label) — this is the exact-dup tier.
    */
  def contentSplit(docs: DataFrame, textCol: String): DataFrame = {
    val h = substring(md5(col(textCol)), 1, 2)
    docs.withColumn("split",
      when(h < "0d", "test").when(h < "1a", "valid").otherwise("train"))
  }

  /** NEAR-dup-safe split — the cluster tier above [[contentSplit]]:
    * the split key is the connected-component KEEPER over a supplied
    * near-dup pair graph (whatever detector produced it — MinHash
    * candidates, SemDeDup flags, embedding pairs), so every member of
    * a near-dup cluster lands in the same split and a paraphrased test
    * document cannot leak its train twin. Pairs stay the caller's
    * contract on purpose: the detector's thresholds are policy, and
    * this operator must not re-run an LSH pass a pipeline already paid
    * for. Docs untouched by any pair are their own singleton cluster.
    * Assignment is the q115 derandomized 2-hex-prefix gate on the
    * cluster id — stable under retries and corpus growth.
    *
    * Scale shape: CC runs on the PAIR graph (orders of magnitude
    * smaller than the corpus — [[Dedup.nearDupKeeperLabels]]'s pointer
    * jumping, O(log diameter) rounds); the corpus is touched by one
    * left join against the label table and a stateless projection.
    */
  def clusterSafeSplit(docs: DataFrame, idCol: String,
      pairs: DataFrame): DataFrame = {
    val labels = graft.operators.Dedup.nearDupKeeperLabels(pairs)
      .select(col("id").as("__lid"), col("lab").as("__lab"))
    val clustered = docs
      .join(labels, docs(idCol) === labels("__lid"), "left")
      .withColumn("cluster", coalesce(col("__lab"), col(idCol)))
      .drop("__lid", "__lab")
    val h = substring(md5(col("cluster").cast("string")), 1, 2)
    clustered.withColumn("split",
      when(h < "0d", "test").when(h < "1a", "valid").otherwise("train"))
  }
}
