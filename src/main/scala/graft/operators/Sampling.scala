package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators. Randomness comes from an explicit
  * integer hash of the row id — never from an RNG — so a sample is
  * reproducible run-to-run, engine-to-engine, and under any
  * repartitioning. (Reference scope: the reference commits to QA
  * sampling/metrics stages, /root/reference/docs/system-plan.md:26;
  * the weighted form is the Efraimidis–Spirakis A-ES scheme with the
  * random key derandomized.)
  */
object Sampling {

  /** Uniform variate u ∈ (0, 1) derived from a non-negative integer id
    * by one LCG step (glibc multiplier, mod 2^31) — pure 64-bit
    * integer arithmetic with no overflow for any non-negative id
    * (the id is reduced mod 2^31 first, so the product is < 2^62),
    * hence bit-identical in any engine with 64-bit integer ops.
    */
  def hashUniform(id: Column): Column =
    hashLcg(id).cast("double").plus(0.5).divide(2147483648.0)

  /** The raw integer LCG variate behind [[hashUniform]] — pure 64-bit
    * integer arithmetic (the id is reduced mod 2^31 first, so the
    * product stays < 2^62), hence bit-identical in ANY engine with
    * 64-bit integers, with no floating point anywhere. Rank keys that
    * must survive a cross-engine hash compare use this form directly.
    */
  def hashLcg(id: Column): Column =
    ((id % 2147483648L) * 1103515245L + 12345L) % 2147483648L

  /** Weighted sample without replacement of `k` rows (Efraimidis &
    * Spirakis 2006, exponential-clocks form): each row draws the
    * deterministic uniform `hashUniform(id)` and is ranked by
    * key = ln(u)/w — the largest `k` keys win, and a row's win
    * probability is proportional to its weight. The key is floored to
    * integer nano-units with (key, id) total-order tiebreak, so the
    * selected set is stable across engines.
    *
    * Scale shape: the ranking is `orderBy(...).limit(k)` — Spark plans
    * TakeOrderedAndProject, a per-partition top-k followed by a
    * k-row driver merge. No global sort, no single-partition window;
    * the shuffle carries at most k rows per partition regardless of
    * corpus size. Rows with non-positive weight are excluded (zero
    * weight = never sampled; ln(u) < 0 would rank them FIRST, not
    * last, if left in).
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val w = col(weightCol).cast("double")
    df.filter(w > 0)
      .withColumn("sample_key_e9",
        floor(log(hashUniform(col(idCol))) / w * 1000000000.0).cast("long"))
      .orderBy(col("sample_key_e9").desc, col(idCol))
      .limit(k)
  }

  /** Per-group quantile calibration gate: compute the exact `p`-th
    * percentile of `scoreCol` WITHIN each `groupCol` value (linear
    * interpolation at index p·(n−1) — Spark's `percentile`, DuckDB's
    * `quantile_cont`), then keep only rows STRICTLY above their own
    * group's cutoff. The CCNet/FineWeb calibration move: a single
    * global threshold over a quality score is dominated by the
    * highest-resource language, so the cutoff is learned per language
    * (or per source) and each document competes only against its own
    * slice.
    *
    * Returns the input plus `cutoff_q4` — the group cutoff in exact
    * quarter-units (integer scores make the interpolated percentile a
    * multiple of 0.25, and ×4 is exact in IEEE double, so the column
    * is engine-stable).
    *
    * Scale shape: the percentile aggregate produces one row per group
    * (a handful of languages) and is broadcast back — the corpus is
    * scanned, aggregated map-side, and filtered; it never shuffles on
    * its own id. Exact percentile holds each group's score multiset
    * on one aggregation task: fine for ≤ ~10⁸-row groups of longs at
    * 100 TB corpus scale (scores, not documents); beyond that swap in
    * `percentile_approx` with the q61-style ε-rank contract.
    */
  def quantileGate(df: DataFrame, groupCol: String, scoreCol: String,
      p: Double): DataFrame = {
    require(p > 0 && p < 1, "p must be in (0, 1)")
    // Column-API percentile: the score column name never enters a SQL
    // string, so quoted/dotted/backticked names can't break the parse
    val cuts = df.groupBy(col(groupCol))
      .agg(percentile(col(scoreCol), lit(p)).as("__cut"))
      .select(col(groupCol), floor(col("__cut") * 4.0).cast("long").as("cutoff_q4"))
    df.join(broadcast(cuts), groupCol)
      .filter(col(scoreCol).cast("double") * 4.0 > col("cutoff_q4"))
  }

  /** Epoch planning: fill a per-group TOKEN budget (not a row count)
    * with documents taken in deterministic pseudo-random order — the
    * "sample 1B tokens per source for this mixture" step between
    * mixing weights (q80) and sequence packing (q79). A document is
    * kept when the running token total of the documents drawn before
    * it (its `start_toks`) is still under the budget, so every
    * non-empty group fills to at least one document and overshoots by
    * at most one document's tail — the standard fill-then-cut.
    *
    * Determinism: draw order is (hashUniform(id), id) — the same
    * derandomized LCG variate as [[weightedSample]], bit-exact in any
    * engine; token counts are integers, so the running sums are exact.
    *
    * Scale shape: the running sum is the Packing two-level prefix
    * scan, never a per-group global window — documents land in
    * `nBuckets` variate ranges (`floor(u·nBuckets)` is monotone in the
    * draw order, and u is uniform so buckets balance); bucket totals
    * are one small hash aggregate, the cross-bucket offsets are a
    * window over groups×nBuckets rows (tiny), broadcast back, and the
    * within-bucket window sorts only bounded slices. Bit-identical to
    * the naive per-group window — which is what the DuckDB oracle
    * (q95) replays.
    */
  def tokenBudgetFill(docs: DataFrame, idCol: String, textCol: String,
      groupCol: String, budget: Long, nBuckets: Int = 1024): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(nBuckets >= 1, "nBuckets must be positive")
    val base = docs.select(col(groupCol), col(idCol),
      graft.functions.TextFunctions.tokenCount(col(textCol)).as("n_toks"),
      hashUniform(col(idCol)).as("__u"))
      .withColumn("__bucket", floor(col("__u") * nBuckets).cast("int"))
    val perBucket = base.groupBy(col(groupCol), col("__bucket"))
      .agg(sum("n_toks").as("__btoks"))
    val acrossBuckets = Window.partitionBy(col(groupCol)).orderBy("__bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perBucket
      .withColumn("__boff", coalesce(sum("__btoks").over(acrossBuckets), lit(0L)))
      .select(col(groupCol), col("__bucket"), col("__boff"))
    val withinBucket = Window.partitionBy(col(groupCol), col("__bucket"))
      .orderBy(col("__u"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .join(broadcast(offsets), Seq(groupCol, "__bucket"))
      .withColumn("start_toks",
        col("__boff") + coalesce(sum("n_toks").over(withinBucket), lit(0L)))
      .filter(col("start_toks") < budget)
      .select(col(idCol), col(groupCol), col("n_toks"), col("start_toks"))
  }

  /** Per-group cap: keep at most `k` rows per `groupCol` value, chosen
    * deterministically by ascending ([[hashLcg]](id), id) — the "at
    * most N documents per domain" curation gate, derandomized so the
    * kept set is identical run-to-run and engine-to-engine.
    *
    * Scale shape: NO window, NO sort. The per-group selection is the
    * bounded [[graft.functions.GroupCapAgg]] typed aggregate —
    * ObjectHashAggregate with full map-side partial aggregation, so
    * every scan task reduces its slice to ≤ k pairs per group before
    * the exchange and the shuffle carries O(groups × partitions × k)
    * longs regardless of corpus size. The windowed equivalent sorts
    * the whole corpus inside each group partition; this form never
    * materializes an ordering at all (DeltaOpsSpec asserts the plan
    * is Sort- and Window-free and exactly matches the windowed form).
    *
    * Output: (groupCol, idCol, h_lcg), one row per kept id.
    */
  def groupCap(df: DataFrame, groupCol: String, idCol: String, k: Int): DataFrame = {
    require(k >= 1, "cap must be positive")
    df.select(col(groupCol), col(idCol).cast("long").as("__id"),
        hashLcg(col(idCol)).as("__h"))
      .groupBy(col(groupCol))
      .agg(graft.functions.GroupCapAgg.cap_pairs(k)(col("__h"), col("__id")).as("__kept"))
      .select(col(groupCol), explode(col("__kept")).as("__p"))
      .select(col(groupCol), col("__p._2").as(idCol), col("__p._1").as("h_lcg"))
  }

  /** Robust per-group outlier gate: keep rows whose integer `scoreCol`
    * lies within `k` MADs of the group median — median/MAD instead of
    * mean/stddev so a heavy-tailed group (one 10 MB doc among 1 KB
    * docs) cannot drag its own gate open. The robust-z curation
    * filter over doc-length-like signals.
    *
    * Exactness: scores are integers, so the interpolated median and
    * every |score − median| are quarter-unit multiples; both are
    * carried ×4 (exact in IEEE double) and the gate compares
    * 4·|x − med| ≤ k · mad4 in integers — engine-identical (the q92
    * quarter-unit move, applied twice).
    *
    * Scale shape: two tiny per-group aggregates (median, then MAD)
    * broadcast back; the corpus is scanned and filtered map-side,
    * never shuffled on its own id. Exact percentile holds one group's
    * score multiset per task — the q92 contract; swap in
    * `percentile_approx` past ~10⁸-row groups.
    */
  def madOutlierGate(df: DataFrame, groupCol: String, scoreCol: String,
      k: Int = 5): DataFrame = {
    require(k >= 1, "k must be positive")
    val med = df.groupBy(col(groupCol))
      .agg(floor(percentile(col(scoreCol), lit(0.5)) * 4.0).cast("long").as("med4"))
    val dev = df.join(broadcast(med), groupCol)
      .groupBy(col(groupCol))
      .agg(floor(percentile(abs(col(scoreCol) * 4 - col("med4")), lit(0.5)))
        .cast("long").as("mad4"))
    df.join(broadcast(med), groupCol).join(broadcast(dev), groupCol)
      .filter(abs(col(scoreCol) * 4 - col("med4")) <= col("mad4") * k)
  }

  /** Deterministic training-epoch shuffle: assign every row a shard
    * `hashLcg(id) mod nShards` and a dense position within its shard
    * ordered by (hashLcg(id), id). Writing shard files in `pos` order
    * is the standard "globally shuffled corpus, reproducible across
    * reruns" layout a trainer streams — a global random permutation
    * without a global sort.
    *
    * Scale shape: one hash exchange on `shard` plus a PARTITION-LOCAL
    * sort of corpus/nShards rows per shard (the window partitions by
    * shard, so no single-partition bottleneck; production uses
    * nShards in the thousands, making each sort slice executor-sized).
    * This is exactly the `repartition(shard).sortWithinPartitions`
    * write pattern, with the position made explicit so the layout is
    * engine-checkable.
    */
  def epochShards(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards >= 1, "nShards must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col("h_lcg"), col(idCol))
    df.select(col(idCol), hashLcg(col(idCol)).as("h_lcg"))
      .withColumn("shard", (col("h_lcg") % nShards).cast("int"))
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** Deterministic in-batch negative sampling for contrastive
    * training: every anchor's k negatives are the NEXT k documents in
    * its [[epochShards]] permutation ring (wrapping), skipping itself
    * and any byte-identical duplicate of the anchor (a "negative" that
    * IS the anchor's text is a false negative — the standard
    * contrastive-pair hygiene rule; near-dup hygiene composes by
    * pre-filtering the corpus or joining cluster labels instead of the
    * digest). The LCG permutation already mixes ids, so ring neighbors
    * are corpus-random yet fully replayable — no RNG, stable across
    * retries, and a new epoch is a different `epoch`-salted permutation
    * upstream (the q103 contract).
    *
    * Dropped collisions are NOT redrawn: an anchor next to a duplicate
    * emits k−1 rows for that rank rather than sampling again (redraw
    * chains are where determinism dies); callers needing exactly k
    * oversample with a larger k.
    *
    * Scale shape: one permutation window per shard (the q103 shape),
    * one shard-size rollup broadcast back, one co-keyed (shard, pos)
    * equi-join — anchors explode ×k but both join sides arrive
    * partitioned by the same key.
    */
  def contrastiveNegatives(docs: DataFrame, idCol: String, textCol: String,
      k: Int, nShards: Int = 8): DataFrame = {
    require(k >= 1, "k must be positive")
    val s = epochShards(docs, idCol, nShards)
      .join(docs.select(col(idCol), md5(col(textCol)).as("__dg")), Seq(idCol))
    val sizes = s.groupBy("shard").agg(count(lit(1)).as("__n"))
    val anchors = s.join(broadcast(sizes), Seq("shard"))
      .select(col("shard"), col(idCol).as("anchor_id"), col("pos"),
        col("__n"), col("__dg").as("__adg"),
        explode(sequence(lit(1), lit(k))).as("neg_rank"))
      .withColumn("__tpos",
        (col("pos") - 1 + col("neg_rank")) % col("__n") + 1)
    val cands = s.select(col("shard"), col("pos").as("__tpos"),
      col(idCol).as("neg_id"), col("__dg").as("__cdg"))
    anchors.join(cands, Seq("shard", "__tpos"))
      .filter(col("neg_id") =!= col("anchor_id") &&
        col("__cdg") =!= col("__adg"))
      .select(col("anchor_id"), col("neg_rank").cast("long").as("neg_rank"),
        col("neg_id"))
  }
}
