package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.plans.{PqAdcScoreExpr, PqEncodeExpr}

/** Product quantization: codebook training, corpus encoding, and ADC
  * retrieval (Jégou et al., TPAMI 2011) — the compression tier past
  * int8 (`Similarity.annInt8Adc`, 4×) that makes a 100 TB embedding
  * corpus RAM-resident: with m = 8 blocks × 8-bit codes, a 64-dim
  * float32 vector (256 B) becomes ONE packed 64-bit long (8 B, 32×),
  * and the retrieval scan reads a single LongType column.
  *
  * The reference's declared analysis stage commits to fingerprint/
  * similarity machinery over ingested records
  * (/root/reference/docs/system-plan.md:23-27); this is that
  * capability for the embedding modality at scale.
  *
  * Everything is integer-exact (e6 element scaling, truncating
  * integer-mean centroids, Σ(v−c)² assignment, integer LUT scores) so
  * the DuckDB oracle (q123) replays training + encode + retrieval
  * bit-for-bit — the q102 convention extended to a learned codebook.
  *
  * Scale shapes:
  *  - training: each round is ONE corpus scan (the per-row assignment
  *    rides the position explode as a native `pq_encode` call against
  *    the driver-literal codebook — no join) feeding a hash aggregate
  *    keyed by (block, code, bpos): m·ksub·subdim cells, map-side
  *    combined. The m·ksub·subdim-long codebook collects to the
  *    driver each round exactly like `Similarity.kmeansRefine` —
  *    k-means' classic driver-sync point, tiny by construction.
  *  - encode: stateless one-pass map; codes are one long per vector.
  *  - retrieval: LUT built driver-side from the single query row
  *    (m·ksub·subdim integer muls), then a stateless scan of the
  *    codes column + TakeOrderedAndProject (per-partition top-k,
  *    k-row driver merge). No shuffle of the corpus, no window.
  */
object Pq {

  /** Flattened [block][code][bpos] e6-integer codebook. */
  final case class Codebook(m: Int, ksub: Int, subdim: Int, flatE6: Array[Long]) {
    require(flatE6.length == m * ksub * subdim, "codebook layout mismatch")
  }

  /** e6-floored elements of the single row of `query` — the full-
    * precision side of the asymmetric compare. Bounded: one row. */
  def queryWeightsE6(query: DataFrame, vecCol: String = "embedding"): Array[Long] = {
    val rows = query
      .select(transform(col(vecCol),
        x => floor(x.cast("double") * lit(1000000.0)).cast("long")).as("qw"))
      .collect()
    require(rows.length == 1, s"expected exactly one query row, got ${rows.length}")
    rows(0).getSeq[Long](0).toArray
  }

  /** Train an m-block, ksub-centroid codebook: deterministic
    * id-bucket seeding (the `Similarity.hashBucketCentroids` shape —
    * no RNG, no sampling job, reproducible on any engine) followed by
    * `iters` Lloyd rounds of integer k-means per block. A cluster
    * that loses all members in a round KEEPS its previous centroid
    * (the standard empty-cluster policy) — deterministic, and what
    * the DuckDB oracle replays as a LEFT JOIN + COALESCE against the
    * prior round's codebook. The seed itself must populate every
    * (block, code) cell (`require`): with dense ids and ksub ≪ n the
    * id-hash buckets always do.
    */
  def trainCodebookE6(corpus: DataFrame, m: Int = 8, ksub: Int = 16,
      iters: Int = 1, idCol: String = "vec_id",
      vecCol: String = "embedding"): Codebook = {
    require(iters >= 0, "iters must be non-negative")
    val dim = corpus.select(size(col(vecCol)).as("d")).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m = $m")
    val subdim = dim / m

    // prev = None: seed pass, every cell must exist; Some(flat):
    // Lloyd round, an empty cluster falls back to its prior centroid
    def collectFlat(cells: DataFrame, prev: Option[Array[Long]]): Array[Long] = {
      val got = cells.collect()
        .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)), r.getLong(3))).toMap
      val flat = new Array[Long](m * ksub * subdim)
      for (b <- 0 until m; c <- 0 until ksub; j <- 0 until subdim) {
        val idx = (b * ksub + c) * subdim + j
        flat(idx) = got.getOrElse((b, c, j), prev match {
          case Some(p) => p(idx)
          case None => throw new IllegalStateException(
            s"PQ seed bucket (block=$b, code=$c) is empty — corpus has " +
              s"fewer than ksub=$ksub distinct id residues")
        })
      }
      flat
    }

    // seed: per (block, id-bucket, pos) truncating integer mean
    var flat = collectFlat(
      corpus.select(col(idCol).as("__id"),
          posexplode(col(vecCol)).as(Seq("__pos", "__x")))
        .select(
          expr(s"__pos div $subdim").cast("int").as("__block"),
          pmod(col("__id"), lit(ksub)).cast("int").as("__code"),
          expr(s"__pos % $subdim").cast("int").as("__bpos"),
          floor(col("__x").cast("double") * lit(1000000.0)).cast("long").as("__v"))
        .groupBy("__block", "__code", "__bpos")
        .agg(expr("sum(__v) div count(1)").as("__c")), None)

    for (_ <- 1 to iters) {
      // one scan: native per-row assignment rides the explode
      flat = collectFlat(
        corpus.select(col(idCol).as("__id"),
            PqEncodeExpr.pq_encode(col(vecCol), flat.toSeq, m, ksub).as("__codes"),
            posexplode(col(vecCol)).as(Seq("__pos", "__x")))
          .select(
            expr(s"__pos div $subdim").cast("int").as("__block"),
            expr(s"CAST(shiftright(__codes, 8 * CAST(__pos div $subdim AS INT)) & 255 AS INT)").as("__code"),
            expr(s"__pos % $subdim").cast("int").as("__bpos"),
            floor(col("__x").cast("double") * lit(1000000.0)).cast("long").as("__v"))
          .groupBy("__block", "__code", "__bpos")
          .agg(expr("sum(__v) div count(1)").as("__c")), Some(flat))
    }
    Codebook(m, ksub, subdim, flat)
  }

  /** Encode the corpus: (id, codes) with all m codes packed into one
    * long — the stored form a retrieval scan reads. */
  def encode(corpus: DataFrame, cb: Codebook, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    corpus.select(col(idCol),
      PqEncodeExpr.pq_encode(col(vecCol), cb.flatE6.toSeq, cb.m, cb.ksub).as("codes"))

  /** The query's ADC lookup table: lut[b][c] = ⟨q_e6 block b,
    * centroid (b,c)⟩. Driver-side: m·ksub·subdim integer muls. */
  def lutFor(cb: Codebook, queryE6: Array[Long]): Array[Long] = {
    require(queryE6.length == cb.m * cb.subdim,
      s"query dim ${queryE6.length} != ${cb.m * cb.subdim}")
    val lut = new Array[Long](cb.m * cb.ksub)
    for (b <- 0 until cb.m; c <- 0 until cb.ksub) {
      var s = 0L
      var j = 0
      while (j < cb.subdim) {
        s += queryE6(b * cb.subdim + j) * cb.flatE6((b * cb.ksub + c) * cb.subdim + j)
        j += 1
      }
      lut(b * cb.ksub + c) = s
    }
    lut
  }

  /** ADC top-k over an encoded corpus: fused unpack+LUT-sum kernel,
    * (score desc, id) total order, per-partition top-k. */
  def adcTopK(encoded: DataFrame, cb: Codebook, queryE6: Array[Long], k: Int,
      idCol: String = "vec_id", codesCol: String = "codes"): DataFrame = {
    require(k >= 1, "k must be positive")
    encoded.select(col(idCol),
        PqAdcScoreExpr.pq_adc_score(col(codesCol), lutFor(cb, queryE6).toSeq,
          cb.m, cb.ksub).as("score_q"))
      .orderBy(col("score_q").desc, col(idCol))
      .limit(k)
  }

  /** Train + encode + retrieve in one call — the q123 shape. */
  def pqTopK(corpus: DataFrame, query: DataFrame, k: Int, m: Int = 8,
      ksub: Int = 16, iters: Int = 1, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val cb = trainCodebookE6(corpus, m, ksub, iters, idCol, vecCol)
    adcTopK(encode(corpus, cb, idCol, vecCol), cb,
      queryWeightsE6(query, vecCol), k, idCol)
  }
}
