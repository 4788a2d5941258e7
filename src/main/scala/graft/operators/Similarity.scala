package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`ArrayType(FloatType)`).
  *
  * Two tiers, per the scale plan:
  *  - [[cosineTopK]] — brute force: broadcast the (small) query set,
  *    score every (query, candidate) pair with a codegen'd dot
  *    product, keep top-k per query with a ranking window. Exact;
  *    O(|queries| × |corpus|) work but only one broadcast and one
  *    window shuffle of the scored pairs. The correctness baseline.
  *  - [[annSignLsh]] — hyperplane sign-LSH: bucket corpus and queries
  *    by the sign pattern of the leading dimensions and only score
  *    within matching buckets. At 100 TB the corpus is written
  *    partitioned by bucket, so a query probes one partition instead
  *    of scanning the table; recall is traded via `bits`.
  */
object Similarity {

  /** Hot-bucket cap default, shared with the probe tooling so measured
    * candidate counts can never drift from what the operators score.
    */
  val DefaultMaxBucketSize: Int = 4096

  /** (qid, cid, sim) scored pairs → exact per-query top-k
    * (qid, cid, sim, rn) under the house (sim DESC, cid ASC) total
    * order — via the [[graft.functions.TopKAgg]] keep-k aggregate,
    * NOT a ranking window: a `Window.partitionBy(qid)` form shuffles
    * and sorts the ENTIRE scored-pair relation (Q·C rows at
    * brute-force scale — the r11 Matryoshka probe measured that
    * shuffle erasing a 4× arithmetic saving outright), while the
    * udaf gets full partial aggregation and each partition reduces to
    * ≤ k rows per query BEFORE the exchange. Output values and order
    * are identical to the window form (same total order, same rn), so
    * every pinned oracle hash is unchanged. Ids must be longs (they
    * are, engine-wide); sims ride as exact doubles.
    */
  private def topKByQid(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy("qid")
      .agg(graft.functions.TopKAgg.top_scored(k)(col("sim"), col("cid")).as("__tops"))
      .select(col("qid"), posexplode(col("__tops")).as(Seq("__i", "__t")))
      .select(col("qid"), col("__t._2").as("cid"), col("__t._1").as("sim"),
        (col("__i") + 1).cast("long").as("rn"))

  /** Exact cosine top-k: for each row of `queries`, the `k` nearest
    * rows of `corpus` (excluding identical ids).
    * Output: (qid, cid, sim, rn).
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // norms are precomputed once per row — per-pair work drops to one
    // dot product instead of dot + two norms (3× fewer multiplies)
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn"))
    val c = corpus.select(col(idCol).as("cid"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("cn"))
    topKByQid(
      c.join(broadcast(q), col("cid") =!= col("qid"))
        .select(col("qid"), col("cid"),
          (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("sim")),
      k)
  }

  /** Sign-LSH bucketed ANN top-k: same output shape as [[cosineTopK]]
    * but scores only candidates whose sign bucket matches the query's,
    * cutting compared pairs by ~2^bits at the cost of recall.
    */
  def annSignLsh(corpus: DataFrame, queries: DataFrame, k: Int, bits: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn"), signBucket(col(vecCol), bits).as("bucket"))
    val c = corpus.select(col(idCol).as("cid"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("cn"), signBucket(col(vecCol), bits).as("bucket"))
    topKByQid(
      c.join(broadcast(q), Seq("bucket"))
        .filter(col("cid") =!= col("qid"))
        .select(col("qid"), col("cid"),
          (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("sim")),
      k)
  }

  /** Prefix-dimension (Matryoshka-style) retrieval audit: per query,
    * how many of the FULL-dimension exact top-k survive when retrieval
    * runs on only the first `prefixDim` dimensions — the measurement
    * that decides whether a truncated index (Kusupati et al. 2022's
    * deployment trick: store dim/4, rerank survivors at full dim) is
    * safe for THIS embedding column, before committing 4× less index
    * storage. Output (qid, n_overlap, overlap_bp): |top-k(full) ∩
    * top-k(prefix)| and its basis-point fraction of k.
    *
    * Scale shape: two [[cosineTopK]]-shaped broadcast-query scans (the
    * corpus is never self-joined or shuffled) + a k-row-per-query
    * join; slicing happens in the projection, so the prefix pass reads
    * the same column and computes on prefixDim/dim of it.
    */
  def prefixDimRetrievalAudit(corpus: DataFrame, queries: DataFrame, k: Int,
      prefixDim: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && prefixDim >= 1, "k and prefixDim must be positive")
    val full = cosineTopK(corpus, queries, k, idCol, vecCol)
      .select(col("qid"), col("cid"))
    val cut = (df: DataFrame) => df.select(col(idCol),
      slice(col(vecCol), 1, prefixDim).as(vecCol))
    val pre = cosineTopK(cut(corpus), cut(queries), k, idCol, vecCol)
      .select(col("qid"), col("cid"))
    full.join(pre, Seq("qid", "cid"))
      .groupBy("qid").agg(count(lit(1)).as("n_overlap"))
      .select(col("qid"), col("n_overlap"),
        expr(s"(n_overlap * 10000) div $k").as("overlap_bp"))
  }

  /** Two-stage Matryoshka retrieval — ACTING on what
    * [[prefixDimRetrievalAudit]] measures (Kusupati et al. 2022's
    * deployment trick, the r10 verdict's item 9): stage 1 scans only
    * the first `prefixDim` dimensions to shortlist `shortlist`
    * candidates per query (prefixDim/dim of the scan arithmetic — the
    * 4× cheaper pass a truncated index stores); stage 2 reranks ONLY
    * the shortlist at full dimension, exact. Same output shape as
    * [[cosineTopK]]; equality with the full-dim top-k holds exactly
    * when the prefix shortlist covers it (the property the audit's
    * overlap_bp predicts, and the q183 oracle pins on planted
    * separable data).
    *
    * Scale shape: stage 1 is a broadcast-query scan on sliced vectors
    * whose per-query shortlist is kept by [[graft.functions.TopKAgg]]
    * — a map-side-combining keep-k aggregate, NOT a ranking window:
    * the Q·C scored-pair relation reduces to ≤ shortlist rows per
    * query per partition BEFORE the shuffle (the window form shuffles
    * and sorts every scored pair, which erases the whole prefix saving
    * — measured 0.77× at 100×; the aggregate form is what makes the
    * two-stage plan actually win). Stage 2 joins the
    * (|queries|·shortlist)-row shortlist BACK TO THE CORPUS BY ID —
    * the corpus is scanned, never shuffled, and the shortlist side
    * broadcasts. At 100 TB stage 1 reads a prefixDim-truncated sidecar
    * index; stage 2's id join is the only touch of full-width vectors.
    */
  def prefixRerankTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      prefixDim: Int, shortlist: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && prefixDim >= 1 && shortlist >= k,
      "need k >= 1, prefixDim >= 1, shortlist >= k")
    val qp = queries.select(col(idCol).as("qid"),
      slice(col(vecCol), 1, prefixDim).as("qv"),
      norm(slice(col(vecCol), 1, prefixDim)).as("qn"))
    val cp = corpus.select(col(idCol).as("cid"),
      slice(col(vecCol), 1, prefixDim).as("cv"),
      norm(slice(col(vecCol), 1, prefixDim)).as("cn"))
    val short = cp.join(broadcast(qp), col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("sim"))
      .groupBy("qid")
      .agg(graft.functions.TopKAgg.top_scored(shortlist)(
        col("sim"), col("cid")).as("__tops"))
      .select(col("qid"), explode(col("__tops")).as("__t"))
      .select(col("qid"), col("__t._2").as("cid"))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn"))
    val c = corpus.select(col(idCol).as("cid"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("cn"))
    topKByQid(
      c.join(broadcast(short), "cid")
        .join(broadcast(q), "qid")
        .select(col("qid"), col("cid"),
          (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("sim")),
      k)
  }

  /** Multi-probe sign-LSH ANN (the Lv et al., VLDB 2007 idea applied
    * to the sign-bucket family): each query probes its OWN bucket plus
    * every Hamming-1 neighbor (one sign flip), recovering most of the
    * recall that extra hash tables would buy WITHOUT duplicating the
    * corpus index — the classic trade when the index dominates storage
    * at 100 TB. A query fans out to bits+1 probe rows; the corpus side
    * is bucketed once and joined once (probe buckets are distinct
    * values, so a candidate matches at most one probe — no dedup
    * stage). Exact cosine ranks within the probed candidates, same
    * output shape as [[annSignLsh]] (its strict superset of
    * candidates: a near-identical vector whose single boundary
    * dimension flipped sign is exactly what the single probe misses).
    */
  def annSignLshMultiProbe(corpus: DataFrame, queries: DataFrame, k: Int,
      bits: Int = 8, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && bits >= 1 && bits <= 62, "need k >= 1, bits in [1,62]")
    val probes = array(col("__b0") +:
      (0 until bits).map(i => col("__b0").bitwiseXOR(lit(1L << i))): _*)
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
        norm(col(vecCol)).as("qn"), signBucket(col(vecCol), bits).as("__b0"))
      .select(col("qid"), col("qv"), col("qn"), explode(probes).as("bucket"))
    val c = corpus.select(col(idCol).as("cid"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("cn"), signBucket(col(vecCol), bits).as("bucket"))
    topKByQid(
      c.join(broadcast(q), Seq("bucket"))
        .filter(col("cid") =!= col("qid"))
        .select(col("qid"), col("cid"),
          (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("sim")),
      k)
  }

  /** Embedding near-dup at 100-TB scale: sign-LSH bucketing generates
    * candidate pairs, exact cosine verifies them at `threshold`.
    * Output: (id1, id2, sim), id1 < id2 — the same shape as the exact
    * label-blocked formulation (q41), which stays the small-scale
    * oracle truth while this is the scale path: pair volume is
    * O(Σ bucket²) over ~2^bits buckets instead of O(n²/|labels|), and
    * the bucketed projection is forced through one repartition
    * exchange so both self-join sides reuse it (the q44 lesson).
    *
    * `maxBucketSize` drops degenerate buckets (zero vectors, repeated
    * boilerplate embeddings) that would emit m² pairs; recall for
    * near-identical vectors is governed by `bits` — antipodal-ish
    * pairs land in different buckets, which is the intended trade
    * (near-dups have cosine ≈ 1, i.e. matching sign patterns).
    */
  def nearDupesAnn(corpus: DataFrame, threshold: Double, bits: Int = 6,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxBucketSize: Int = DefaultMaxBucketSize): DataFrame =
    // exactly the bands=1 case of the banded formulation (band 0
    // slices the leading `bits` dims, which is the whole-vector sign
    // bucket; pair-dedup is a no-op with one band)
    nearDupesAnnBanded(corpus, threshold, bits, bands = 1, idCol, vecCol,
      maxBucketSize)

  /** Banded sign-LSH near-dup: `bands` INDEPENDENT bucket tables,
    * band b keyed on the sign pattern of dimensions
    * [b·bits, (b+1)·bits); a pair is a candidate if it collides in
    * ANY band, then exact cosine verifies. The recall mathematics are
    * MinHash banding's: with per-dimension sign-agreement probability
    * p = 1 − θ/π, a pair survives with 1 − (1 − p^bits)^bands instead
    * of the single-table p^bits — at cosine 0.98 and (8 bits,
    * 8 bands) that is ~99.9 % recall where a single 16-bit table
    * keeps ~35 %. The single-table [[nearDupesAnn]] trades recall
    * away as `bits` grows (the candidate-volume lever); this is the
    * formulation that scales BOTH: more bands buy recall, more bits
    * per band cut candidates, and candidate volume stays
    * O(bands × Σ bucket²).
    *
    * For `bands > 1`, requires `bits × bands ≤ dim`, enforced against
    * a sampled row — a band sliced past the vector would bucket every
    * row to one degenerate key (silently capped away or, worse, O(n²)
    * self-joined). With one band no check (and no eager job) is
    * needed: `SignBucketExpr` caps bits at the vector length.
    *
    * Two physical shapes, chosen by `bands` — they win in DIFFERENT
    * cost regimes and the wrong one is catastrophic:
    *  - `bands == 1`: vectors ride INLINE through the single
    *    co-partitioned self-join and the dot product pipelines with
    *    no post-join shuffle. (Deduping ids first and joining vectors
    *    back re-attaches a ~256-byte vector to EVERY candidate pair
    *    through sort-merge joins — measured at 312 M candidates: a
    *    disk-filling ~90 GB spill where the inline form streams.)
    *  - `bands > 1`: candidate (id1, id2) pairs are DEDUPLICATED
    *    before verification and vectors joined back once per side
    *    (the `Dedup.verifiedPairs` shape) — a pair colliding in k
    *    bands must not shuffle vectors or pay the dot product k
    *    times, and the deduped pair set is what the join-back
    *    shuffles.
    */
  def nearDupesAnnBanded(corpus: DataFrame, threshold: Double, bits: Int = 8,
      bands: Int = 4, idCol: String = "vec_id", vecCol: String = "embedding",
      maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    require(bits >= 1 && bands >= 1, "bits and bands must be positive")
    if (bands > 1) {
      // the slice path degenerates when a band lies past the vector;
      // fail fast against a sampled non-null row (mixed-dimension
      // corpora remain the caller's responsibility). bands == 1 needs
      // no check — SignBucketExpr caps bits at the vector length and
      // keeps the whole API lazy on that path.
      corpus.select(size(col(vecCol)).as("__d")).filter(col("__d").isNotNull)
        .head(1).foreach { r =>
          require(bits * bands <= r.getInt(0),
            s"bits*bands = ${bits * bands} exceeds embedding dim ${r.getInt(0)} — " +
              "a band past the vector degenerates to one bucket")
        }
    }
    def simCol(v1: Column, n1: Column, v2: Column, n2: Column): Column =
      dot(v1, v2) / (n1 * n2)
    if (bands == 1) {
      val bucketed = corpus
        .select(col(idCol).as("id"), col(vecCol).as("v"),
          norm(col(vecCol)).as("n"), signBucket(col(vecCol), bits).as("bucket"))
        .repartition(col("bucket"))
      val capped = HotBuckets.dropOversized(bucketed, maxBucketSize, "bucket")
      val a = capped.alias("a")
      val b = capped.alias("b")
      a.join(b, col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
        .withColumn("sim0",
          simCol(col("a.v"), col("a.n"), col("b.v"), col("b.n")))
        .filter(col("sim0") > threshold)
        .select(col("a.id").as("id1"), col("b.id").as("id2"),
          round(col("sim0"), 4).as("sim"))
    } else {
      val bandKeys = array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          signBucket(slice(col(vecCol), b * bits + 1, bits), bits).as("key"))
      }: _*)
      // candidate generation carries ONLY ids through the banded shuffle
      val banded = corpus
        .select(col(idCol).as("id"), explode(bandKeys).as("bk"))
        .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"))
      // grouped member sets (r15): ONE hash aggregate per (band, key)
      // bucket replaces the repartition → hot-cap anti-join → keyed
      // self-join. (id, band) is unique by construction (one key per
      // band per id), so collect_set ≡ collect rows and the set size
      // IS the old hot-bucket row count. Unlike the `sortedPairs`
      // callers, the cap here (4096) is far too large to materialize
      // size²/2 pair structs per group, so the pair expansion STREAMS
      // through two chained Generates — per-row state is the ≤cap
      // sorted member array (≤32 KB of longs), never a pair array; the
      // sorted order makes the inner slice exactly the a.id < b.id
      // half-product the self-join streamed.
      val grouped = banded.groupBy(col("band"), col("key"))
        .agg(sort_array(collect_set(col("id"))).as("__ids"))
        .filter(size(col("__ids")).between(2, maxBucketSize))
      val cands = grouped
        .select(col("__ids"), posexplode(col("__ids")).as(Seq("__i", "id1")))
        .select(col("id1"),
          explode(expr("slice(__ids, __i + 2, size(__ids))")).as("id2"))
        .distinct()
      // vectors and norms computed once per row, joined once per side
      val sides = corpus.select(col(idCol).as("__sid"),
        col(vecCol).as("__v"), norm(col(vecCol)).as("__n"))
      cands
        .join(sides.toDF("id1", "__v1", "__n1"), "id1")
        .join(sides.toDF("id2", "__v2", "__n2"), "id2")
        .withColumn("sim0", simCol(col("__v1"), col("__n1"), col("__v2"), col("__n2")))
        .filter(col("sim0") > threshold)
        .select(col("id1"), col("id2"), round(col("sim0"), 4).as("sim"))
    }
  }

  /** Write a corpus PARTITIONED BY sign bucket — the 100 TB ANN
    * layout (SCALE.md "Similarity search"): a probe filters on the
    * query's bucket literal, which becomes a PartitionFilter on the
    * parquet scan, so the query reads ONE bucket directory instead of
    * scanning the table. Pinned by the plan spec in BucketingSpec.
    */
  def writeBucketedCorpus(corpus: DataFrame, path: String, bits: Int,
      vecCol: String = "embedding"): Unit =
    corpus.withColumn("bucket", signBucket(col(vecCol), bits))
      .write.partitionBy("bucket").mode("overwrite").parquet(path)

  /** Driver-side sign bucket of a single probe vector — the same
    * semantics as the native `SignBucketExpr` kernel (bit i set iff
    * element i present and >= 0, NaN above all numbers), pinned by a
    * differential spec. Driver-side so the probe's bucket is a plan
    * LITERAL: only a literal (or DPP) predicate prunes partitions at
    * planning time.
    */
  def bucketOf(vec: Array[Float], bits: Int): Long = {
    require(bits >= 1 && bits <= 63, s"bits must be in [1, 63], got $bits")
    val n = math.min(bits, vec.length)
    var code = 0L
    var i = 0
    while (i < n) {
      if (vec(i) >= 0 || java.lang.Float.isNaN(vec(i))) code |= 1L << i
      i += 1
    }
    code
  }

  /** Top-k cosine probe of a [[writeBucketedCorpus]] layout: scans
    * only the query's bucket partition. Returns (cid, sim) ordered by
    * similarity; the global `orderBy().limit(k)` over one bucket plans
    * as TakeOrderedAndProject (per-partition top-k, no full sort).
    */
  def probeBucketed(spark: org.apache.spark.sql.SparkSession, path: String,
      queryVec: Array[Float], k: Int, bits: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val qn = math.sqrt(queryVec.map(x => x.toDouble * x).sum)
    val qLit = typedlit(queryVec)
    spark.read.parquet(path)
      .filter(col("bucket") === lit(bucketOf(queryVec, bits)))
      .select(col(idCol).as("cid"),
        (dot(qLit, col(vecCol)) / (norm(col(vecCol)) * qn)).as("sim"))
      .orderBy(col("sim").desc, col("cid"))
      .limit(k)
  }

  /** Corpus size for the lazy auto-sizing variants — the one shared
    * ladder (declared count → exact metadata count → one `count()`
    * job); see [[org.apache.spark.sql.GraftTableStats.sizeOf]].
    */
  private def sizeOf(corpus: DataFrame, knownCount: Option[Long]): Long =
    org.apache.spark.sql.GraftTableStats.sizeOf(corpus, knownCount)

  /** Bucket-count sizing for [[nearDupesAnnAuto]]: the smallest `bits`
    * with expected per-bucket population ≤ `targetBucketSize`, i.e.
    * ceil(log2(n / targetBucketSize)), clamped to [1, maxBits].
    */
  def autoBits(n: Long, targetBucketSize: Int, maxBits: Int): Int = {
    // integral ceil(log2(ceil(n / target))) — floating-point log2
    // overshoots by one bit at exact power-of-two ratios
    val ratio = math.max(1L, (n + targetBucketSize - 1) / targetBucketSize)
    val bits = 64 - java.lang.Long.numberOfLeadingZeros(ratio - 1)
    math.max(1, math.min(maxBits, bits))
  }

  /** [[nearDupesAnn]] with `bits` derived from the corpus size
    * (`autoBits`): holds the EXPECTED per-bucket population — and so
    * the per-bucket pair volume — constant as the corpus grows. A
    * fixed bucket count is quadratic under growth (10× corpus → 100×
    * pairs per bucket, then mass bucket drops once `maxBucketSize`
    * trips); sizing buckets from n keeps total pair volume ~linear at
    * the cost of one up-front count() job. `maxBits` must stay within
    * the vector dimensionality (the bucket key uses the leading
    * `bits` dims' signs).
    *
    * `knownCount` skips that count() job: a caller who already
    * materialized (or exactly knows) the corpus size passes it and the
    * whole construction stays lazy — no Spark job runs until the
    * result is acted on (pinned by a listener spec). An approximate
    * count works too: `autoBits` only reads ceil(log2(n/target)), so a
    * count off by <2× shifts the sizing by at most one bit.
    */
  def nearDupesAnnAuto(corpus: DataFrame, threshold: Double,
      targetBucketSize: Int = 1024, maxBits: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxBucketSize: Int = DefaultMaxBucketSize,
      knownCount: Option[Long] = None): DataFrame =
    nearDupesAnn(corpus, threshold,
      autoBits(sizeOf(corpus, knownCount), targetBucketSize, maxBits),
      idCol, vecCol, maxBucketSize)

  /** [[nearDupesAnnBanded]] with per-band `bits` sized from the corpus
    * count — the banded counterpart of [[nearDupesAnnAuto]], closing
    * the same quadratic-growth trap for the multi-band path: fixed
    * per-band bits hold the bucket COUNT constant, so a 10× corpus
    * puts 10× rows in every bucket and 100× pairs through every band
    * (the measured q76 super-linear growth). Sizing bits from n holds
    * the expected per-bucket population — and so per-band pair
    * volume — ~constant instead.
    *
    * Recall under auto-growth is the documented trade: per-band
    * collision probability is p^bits (p = 1 − θ/π per dimension), so a
    * pair survives with 1 − (1 − p^bits)^bands. Growing bits lowers
    * p^bits; callers holding a recall target under corpus growth
    * should grow `bands` accordingly (each +1 bit at cosine 0.98
    * costs ~2% per-band collision; doubling bands roughly recovers
    * it). The derived bits are clamped to dim/bands so a band can
    * never slice past the vector (which would degenerate to one
    * bucket); `knownCount` skips the sizing count() job exactly as in
    * [[nearDupesAnnAuto]]. For `bands > 1`, `dim` is read from one
    * sampled row — the same eager O(1) lookup the banded form already
    * performs; for `bands == 1` no dim lookup runs at all (the kernel
    * self-caps), so knownCount keeps that path fully lazy.
    */
  def nearDupesAnnBandedAuto(corpus: DataFrame, threshold: Double,
      bands: Int = 8, targetBucketSize: Int = 1024,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxBucketSize: Int = DefaultMaxBucketSize,
      knownCount: Option[Long] = None): DataFrame = {
    require(bands >= 1, "bands must be positive")
    val bits0 = autoBits(sizeOf(corpus, knownCount),
      targetBucketSize, maxBits = 24)
    // bands == 1 needs no dim clamp — SignBucketExpr self-caps bits at
    // the vector length and [[nearDupesAnnBanded]] skips its own dim
    // check for one band — so with `knownCount` supplied that path
    // stays fully lazy (no eager job), matching nearDupesAnnAuto
    // (ADVICE r5)
    val bits =
      if (bands == 1) bits0
      else {
        val dim = corpus.select(size(col(vecCol)).as("__d"))
          .filter(col("__d").isNotNull).head(1).headOption
          .map(_.getInt(0))
          .getOrElse(throw new IllegalArgumentException(
            s"cannot size bands: no non-null '$vecCol' row to read the dimension from"))
        require(dim / bands >= 1,
          s"bands = $bands exceeds embedding dim $dim — every band needs >= 1 dimension")
        math.min(bits0, dim / bands)
      }
    nearDupesAnnBanded(corpus, threshold, bits, bands, idCol, vecCol, maxBucketSize)
  }

  /** Per-list elementwise mean vectors — the IVF coarse quantizer and
    * the k-means recompute step. Computed via posexplode + avg +
    * re-assemble, which stays fully distributed (no whole-list collect
    * per group) — the formulation that survives lists with millions of
    * members. Returns (list_id, centroid: array<double>).
    */
  def labelCentroids(corpus: DataFrame, labelCol: String = "label",
      vecCol: String = "embedding"): DataFrame =
    corpus
      .select(col(labelCol).as("list_id"), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col("list_id"), col("pos"))
      .agg(avg(col("x").cast("double")).as("m"))
      .groupBy(col("list_id"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("list_id"), transform(col("pm"), p => p.getField("m")).as("centroid"))

  /** IVF-style ANN: centroids are the per-`labelCol` mean vectors
    * (coarse quantizer); each query probes the `nprobe` nearest
    * centroids' inverted lists only. With a corpus pre-partitioned by
    * list id this is the classic IVF-Flat layout on Spark partitions.
    */
  def annIvf(corpus: DataFrame, queries: DataFrame, k: Int, nprobe: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    val centroids = labelCentroids(corpus, labelCol, vecCol)
    val probes = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .crossJoin(broadcast(centroids))
      .withColumn("cd", cosine(col("qv"), col("centroid")))
      .withColumn("crn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cd").desc, col("list_id"))))
      .filter(col("crn") <= nprobe)
      .select(col("qid"), col("qv"), col("list_id"))
    val c = corpus.select(col(idCol).as("cid"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("cn"), col(labelCol).as("list_id"))
    topKByQid(
      c.join(broadcast(probes.withColumn("qn", norm(col("qv")))), Seq("list_id"))
        .filter(col("cid") =!= col("qid"))
        .select(col("qid"), col("cid"),
          (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("sim")),
      k)
  }

  /** STATELESS cosine-argmax assignment of every corpus vector to one
    * of a driver-held centroid set: the scoring expands to k native
    * dot products + a `greatest` over (similarity, −list_id) structs,
    * all inside whole-stage codegen — no join, no window, no
    * aggregation, ONE corpus pass (plan-asserted in CurationSpec).
    * Ties break toward the smaller list id (the −list_id struct
    * field), matching the SQL `ORDER BY sim DESC, list_id` oracle
    * convention. Centroids ride as plan literals, so this is for
    * coarse-quantizer k (≲ hundreds); assignment against large
    * codebooks is [[annIvf]] territory. NaN scores (a zero-norm
    * vector, or a zero-norm/degenerate centroid) are demoted below
    * every real similarity — Spark orders NaN ABOVE all doubles, so
    * without the demotion one degenerate seed would capture the
    * entire corpus; a zero-norm vector instead lands deterministically
    * on the smallest list id.
    */
  def kmeansAssign(corpus: DataFrame, cents: Seq[(Long, Array[Double])],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    corpus.select(col(idCol), bestList(cents, vecCol).as("list_id"))

  private def bestList(cents: Seq[(Long, Array[Double])], vecCol: String): Column = {
    require(cents.nonEmpty, "need at least one centroid")
    val vn = norm(col(vecCol))
    val scored = cents.map { case (lid, c) =>
      val cn = math.sqrt(c.map(x => x * x).sum)
      // try_divide: an exactly-zero norm is an ANSI DIVIDE_BY_ZERO
      // error, not infinity — NULL instead; then coalesce+nanvl demote
      // both the NULL and any NaN to -2 (cosine ∈ [-1, 1]), ranking a
      // degenerate score below every real centroid instead of above
      // all of them (Spark orders NaN as the largest double)
      struct(coalesce(
        nanvl(try_divide(dot(col(vecCol), typedLit(c.toSeq)), vn * lit(cn)),
          lit(-2.0)),
        lit(-2.0)).as("s"),
        lit(-lid).as("nl"))
    }
    val best =
      if (scored.size == 1) scored.head else greatest(scored: _*)
    (-best.getField("nl")).cast("long")
  }

  /** Lloyd k-means refinement: `iters` rounds of stateless assignment
    * ([[kmeansAssign]]) + distributed mean recompute (the
    * [[labelCentroids]] posexplode/avg shape). `init` is
    * (list_id, centroid: array<double>) — e.g. `labelCentroids` output
    * or any seeding. Each round collects the k centroids to the driver
    * (k·dim doubles — tiny) exactly as production distributed k-means
    * does: the collect truncates the iteration's lineage and turns the
    * next assignment into plan literals, so every round is ONE corpus
    * scan + one (list, pos)-aggregated shuffle of partial sums.
    * Clusters that capture no members drop out (standard empty-cluster
    * behavior — re-seed at the caller if undesired). Returns the
    * refined (list_id, centroid) frame.
    */
  /** Collect a (list_id, centroid) frame — [[labelCentroids]],
    * [[kmeansRefine]], or [[hashBucketCentroids]] output — to the
    * driver as the sorted literal-centroid seq the assignment
    * operators take. k·dim doubles: tiny by construction.
    */
  def collectCentroids(cents: DataFrame): Seq[(Long, Array[Double])] =
    cents.select(col("list_id").cast("long"), col("centroid"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
      .sortBy(_._1)

  def kmeansRefine(corpus: DataFrame, init: DataFrame, iters: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(iters >= 1, "iters must be positive")
    val spark = corpus.sparkSession
    import spark.implicits._
    var cents: Seq[(Long, Array[Double])] = collectCentroids(init)
    for (_ <- 1 to iters) {
      // assignment + the shared labelCentroids recompute shape
      val assigned = corpus.select(
        bestList(cents, vecCol).as("__list"), col(vecCol))
      cents = collectCentroids(labelCentroids(assigned, "__list", vecCol))
    }
    cents.map { case (l, c) => (l, c.toSeq) }.toDF("list_id", "centroid")
  }

  /** Deterministic k-way seeding for a corpus-sized codebook: bucket
    * vectors by `id % k` and take elementwise bucket means as initial
    * centroids (then refine with [[kmeansRefine]]). The point is that
    * k can GROW with the corpus — the property every Σ|cluster|²
    * bound (SemDeDup, IVF probe lists) actually depends on: k ∝ n
    * keeps cluster sizes constant as data scales. Deterministic (no
    * RNG, no sampling job) and one aggregation pass; with ~uniformly
    * distributed ids the buckets are balanced, so no seed captures a
    * skewed share of the corpus.
    */
  def hashBucketCentroids(corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, "k must be positive")
    labelCentroids(
      corpus.select((col(idCol) % k).cast("long").as("__bucket"), col(vecCol)),
      "__bucket", vecCol)
  }

  /** SemDeDup (Abbas et al. 2023): semantic near-dup removal by
    * clustering first, then comparing ONLY within clusters. Each
    * vector is assigned to its nearest centroid ([[kmeansAssign]]
    * semantics — stateless codegen'd argmax over broadcast-literal
    * centroids), and within a cluster a vector is dropped when some
    * smaller-id vector is cosine-similar above `tau` (smallest id
    * keeps — the same deterministic keeper rule as exact dedup).
    * Returns (idCol, list_id, keep).
    *
    * Scale shape: clustering bounds the pair space — the self-join is
    * an equi-join on list_id, so shuffle and compare cost is
    * Σ|cluster|², never O(n²); with k sized so clusters are ~10⁴–10⁵
    * vectors the per-cluster product fits one executor's partition.
    * Norms are computed once per side before the join (not per pair).
    * For clusters still too large, route candidates through the
    * sign-LSH banding of [[nearDupesAnnBanded]] INSIDE each cluster —
    * same verify step, sub-quadratic candidate generation.
    */
  def semDedupFlags(corpus: DataFrame, cents: Seq[(Long, Array[Double])],
      tau: Double, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val asg = corpus.select(col(idCol), col(vecCol),
      bestList(cents, vecCol).as("list_id"))
    val a = asg.select(col("list_id"), col(idCol).as("__id_a"),
      col(vecCol).as("__va"), norm(col(vecCol)).as("__na"))
    val b = asg.select(col("list_id"), col(idCol).as("__id_b"),
      col(vecCol).as("__vb"), norm(col(vecCol)).as("__nb"))
    // try_divide: a zero-norm (degenerate) vector must make the pair
    // predicate NULL — filtered out, both rows kept — not an ANSI
    // DIVIDE_BY_ZERO that kills the query (the bestList hardening,
    // applied to the pair stage too)
    val dropped = a.join(b, Seq("list_id"))
      .filter(col("__id_a") < col("__id_b"))
      .filter(try_divide(dot(col("__va"), col("__vb")),
        col("__na") * col("__nb")) > tau)
      .select(col("__id_b").as(idCol)).distinct()
      .withColumn("__dropped", lit(true))
    // final projection derives from side `a`, NOT a third reference to
    // `asg` — the k-way argmax scan is the dominant cost at large k,
    // and a third subplan would re-execute it once more
    a.select(col("__id_a").as(idCol), col("list_id"))
      .join(dropped, Seq(idCol), "left")
      .select(col(idCol), col("list_id"), col("__dropped").isNull.as("keep"))
  }

  /** Class-mean linear probe direction, in integer micro-units:
    * w = mean(x | isTarget) − mean(x), per dimension, floored to e6.
    * The cheapest useful quality classifier over an embedding column
    * (the FineWeb-Edu-style "train a tiny probe, score the corpus"
    * pattern with the probe reduced to its closed-form class-mean
    * solution — no gradient steps, one aggregation pass).
    *
    * Scale shape: posexplode → per-dimension partial means (dim groups,
    * map-side combined) → `dim` rows collected. The collect is the
    * probe's parameter vector — 64 longs here — not data.
    *
    * The e6 floor happens ONCE, on the `dim` learned weights; from
    * there scoring is exact integer arithmetic (see
    * [[linearScoreInt8]]), so scores are invariant to partitioning and
    * engine. (A floor boundary would need the double mean to sit
    * within ~1 ulp of an integer/1e6 — negligible, and checked by
    * tri-SF oracle parity.)
    */
  def classMeanDirectionE6(corpus: DataFrame, isTarget: Column,
      vecCol: String = "embedding"): Array[Long] = {
    val ex = corpus.select(isTarget.as("__t"),
      posexplode(col(vecCol)).as(Seq("__pos", "__x")))
      .select(col("__t"), col("__pos"), col("__x").cast("double").as("__x"))
    val rows = ex.groupBy("__pos")
      .agg(floor((avg(when(col("__t"), col("__x"))) - avg(col("__x"))) * 1000000.0)
        .cast("long").as("__w"))
      .orderBy("__pos")
      .collect()
    // an empty target class makes every avg(when(...)) NULL — fail
    // with the actual problem, not an NPE from getLong on a null cell
    require(rows.forall(!_.isNullAt(1)),
      "classMeanDirectionE6: isTarget matches no rows (empty target class)")
    rows.map(_.getLong(1))
  }

  /** Score every vector against a literal integer weight vector over
    * its int8-quantized form: score = Σ_i q_i · w_i with
    * q = [[graft.functions.VectorFunctions.int8Quantize]](x). Both
    * factors are integers, so the sum is EXACT in any order and any
    * engine — the whole score pipeline is reproducible bit-for-bit.
    * Returns the input plus (`score_q`, `predicted` = score_q > 0).
    *
    * Scale shape: stateless per-row map over a broadcast-literal
    * weight array — one scan, zero shuffles; quantized scoring is the
    * int8 storage path (q81) doing classifier duty, so at 100 TB the
    * scan reads the 4×-smaller int8 column, not the float32 one.
    */
  def linearScoreInt8(corpus: DataFrame, weightsE6: Array[Long],
      vecCol: String = "embedding"): DataFrame = {
    require(weightsE6.nonEmpty, "empty weight vector")
    val q = graft.functions.VectorFunctions.int8Quantize(col(vecCol))
    val score = aggregate(
      zip_with(q, typedLit(weightsE6.toSeq), (a, b) => a * b), lit(0L), _ + _)
    corpus.withColumn("score_q", score)
      .withColumn("predicted", col("score_q") > 0)
  }

  /** Asymmetric-distance (ADC) top-k over int8-quantized vectors: the
    * single-row `query` keeps full precision (weights in e6
    * micro-units), the corpus is scored on its [[graft.functions.VectorFunctions.int8Quantize]]
    * codes — the standard quantized-retrieval trade (Jégou et al.'s
    * ADC, scalar-quantizer form): at 100 TB the scan reads the
    * 4×-smaller int8 column and the float32 embeddings are touched
    * only if a re-scoring pass wants the exact top of the list.
    *
    * The score is `amax_e4 × Σ code_i·qw_i` — the unnormalized
    * inner product with the per-row dequantization scale folded in as
    * an exact integer factor (codes ≤ 127, |qw| ≤ ~2^21, 64 dims,
    * amax_e4 ≤ ~2^17 keeps the product well under 2^63). Pure 64-bit
    * integer arithmetic end to end, so ranks — and the DuckDB oracle
    * compare — are engine-exact, with (score desc, id) total order.
    *
    * Scale shape: one stateless scan of the quantized corpus against a
    * broadcast one-row literal, then TakeOrderedAndProject (per-
    * partition top-k, k-row driver merge). No global sort, no window,
    * no shuffle of the corpus. Expects a single query row (multi-row
    * input would interleave ranks across queries — use [[cosineTopK]]
    * for query batches).
    */
  def annInt8Adc(corpus: DataFrame, query: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, "k must be positive")
    val qw = query.select(
      transform(col(vecCol), x => floor(x.cast("double") * lit(1000000.0))).as("__qw"))
    // fused native kernel: amax → codes → dot in one codegen loop,
    // zero intermediate arrays (the HOF form measured 8.1 s on the
    // 100× corpus; differential spec pins kernel ≡ HOF in both
    // execution modes)
    corpus.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(qw))
      .select(col(idCol),
        graft.functions.VectorFunctions.int8AdcScore(col(vecCol), col("__qw"))
          .as("score_q"))
      .orderBy(col("score_q").desc, col(idCol))
      .limit(k)
  }

  /** Exact-integer embedding-centroid drift per group — the VECTOR
    * complement of the scalar KS gate (q149): for each group, the L1
    * distance between snapshot A's and snapshot B's centroid in
    * e6-quantized units, cross-multiplied so no division ever happens:
    *
    *   d_num = Σ_dims | sumA_i·nB − sumB_i·nA |,
    *   drifted ⇔ d_num > thresholdE6 · nA · nB
    *
    * (d_num / (nA·nB) is the centroid-gap L1 in e6 units). Elements
    * quantize as floor(x·10⁶) — float widens to double exactly, so
    * both engines compute identical integers and q158 is a full hash
    * oracle. An embedding platform runs this between ingest waves:
    * a drifted source means its upstream encoder or content changed,
    * and downstream ANN indexes trained on the old distribution (the
    * q132 drift monitor's codebooks) need attention. Groups present in
    * only ONE snapshot (new / vanished sources) surface via a full
    * outer join with `both_snapshots = false` and `drifted = true` —
    * appearing or disappearing outright is maximal drift.
    *
    * Scale shape: one posexplode + (group, snap, dim)-keyed hash agg
    * — map-side combined, |groups|·|snaps|·dim result; the drift join
    * and sum are over that tiny basis. The corpus shuffles nothing
    * but partial sums.
    */
  def centroidDriftE6(vecs: DataFrame, groupCol: String, snapCol: String,
      vecCol: String, thresholdE6: Long): DataFrame = {
    require(thresholdE6 >= 0, "thresholdE6 must be >= 0")
    val ex = vecs.select(col(groupCol), col(snapCol).as("__snap"),
        posexplode(col(vecCol)).as(Seq("__i", "__x")))
      .select(col(groupCol), col("__snap"), col("__i"),
        floor(col("__x").cast("double") * 1000000.0).cast("long").as("__v"))
    val sums = ex.groupBy(col(groupCol), col("__snap"), col("__i"))
      .agg(sum("__v").as("__s"))
    val ns = vecs.groupBy(col(groupCol))
      .agg(sum(when(col(snapCol) === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col(snapCol) === 1, 1L).otherwise(0L)).as("n_b"))
    val a = sums.filter(col("__snap") === 0)
      .select(col(groupCol), col("__i"), col("__s").as("__sa"))
    val b = sums.filter(col("__snap") === 1)
      .select(col(groupCol), col("__i"), col("__s").as("__sb"))
    // FULL outer: a group present in only one snapshot (a brand-new or
    // vanished source — the most drifted case of all) must SURFACE,
    // not vanish through an inner join; its cross-multiplied d_num is
    // identically 0 (one count is 0), so `both_snapshots` marks it and
    // forces drifted = true.
    a.join(b, Seq(groupCol, "__i"), "full_outer")
      .join(ns, Seq(groupCol))
      .groupBy(col(groupCol), col("n_a"), col("n_b"))
      .agg(sum(abs(coalesce(col("__sa"), lit(0L)) * col("n_b") -
        coalesce(col("__sb"), lit(0L)) * col("n_a"))).as("d_num"))
      .select(col(groupCol), col("n_a"), col("n_b"), col("d_num"),
        (col("n_a") > 0 && col("n_b") > 0).as("both_snapshots"),
        (col("n_a") === 0 || col("n_b") === 0 ||
          col("d_num") > col("n_a") * col("n_b") * thresholdE6).as("drifted"))
  }
}
