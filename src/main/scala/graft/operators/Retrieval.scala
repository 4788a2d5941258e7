package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank-fusion retrieval: combine independently-produced rankings of
  * the same id space into one list. (Reference scope: the reference's
  * query surface stops at per-source scans — ranking composition is a
  * training-data-pipeline extension, like BM25/DSIR before it.)
  *
  * Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
  * fused(d) = Σ_lists 1/(k + rank_list(d)), summed over the lists that
  * contain d. RRF is the standard way to merge a lexical (BM25) and a
  * dense (embedding cosine) shortlist without score calibration — only
  * RANKS cross the modality boundary, so the two scorers can live at
  * different scales.
  *
  * Scale shape: each input is a top-N SHORTLIST (the upstream rankers
  * produce theirs with TakeOrderedAndProject — k rows per partition on
  * the wire, no global sort), so the fusion itself joins tiny frames;
  * fused ordering over ≤ Σ N rows is driver-negligible. The corpus is
  * scanned once per ranker and never shuffled by the fusion.
  */
object Retrieval {

  /** Fuse ranked shortlists. Each input must carry (`idCol`, `rankCol`)
    * with ranks 1-based and unique within the list. Returns one row per
    * id present in ANY list: (id, rank_1.., rank_N.., rrf_e9) where
    * rank_i is 0 when the id is absent from list i and `rrf_e9` is the
    * fused score in integer nano-units (floor), stable across engines
    * because rank integers make every 1/(k+r) term bit-identical IEEE
    * division. Output is ordered by fused score (tiebreak id) and cut
    * to `topK`.
    */
  def rrfFuse(lists: Seq[(String, DataFrame)], idCol: String,
      rankCol: String, rrfK: Int = 60, topK: Int = 20): DataFrame = {
    require(lists.nonEmpty, "need at least one ranking")
    require(rrfK >= 0, "rrfK must be non-negative")
    val named = lists.map { case (name, df) =>
      df.select(col(idCol), col(rankCol).cast("long").as(s"rank_$name"))
    }
    val joined = named.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val rankCols = lists.map { case (name, _) => col(s"rank_$name") }
    val fused = rankCols
      .map(r => when(r.isNotNull, lit(1.0) / (lit(rrfK.toDouble) + r.cast("double")))
        .otherwise(lit(0.0)))
      .reduce(_ + _)
    joined
      .select((col(idCol) +:
        lists.map { case (name, _) => coalesce(col(s"rank_$name"), lit(0L)).as(s"rank_$name") }) :+
        fused.as("__rrf"): _*)
      .orderBy(col("__rrf").desc, col(idCol))
      .limit(topK)
      .withColumn("rrf_e9", floor(col("__rrf") * 1000000000.0).cast("long"))
      .drop("__rrf")
  }

  /** Attach a 1-based dense shortlist rank to a scored frame: top-`n`
    * rows by (`scoreCol` desc, `idCol` asc). The cut happens FIRST via
    * `orderBy(...).limit(n)` (TakeOrderedAndProject — per-partition
    * top-n, k-row driver merge, no global sort); the row_number window
    * then runs on the ≤ n surviving rows, where a single-partition sort
    * is free. Rank ties are impossible by construction (id tiebreak).
    */
  def shortlist(scored: DataFrame, idCol: String, scoreCol: String,
      n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col(scoreCol).desc, col(idCol))
    scored.orderBy(col(scoreCol).desc, col(idCol)).limit(n)
      .withColumn("rank", row_number().over(w).cast("long"))
  }

  /** Maximal-marginal-relevance rerank (Carbonell & Goldstein, SIGIR
    * 1998): greedily pick `k` of the top-`poolSize` candidates,
    * trading query relevance against redundancy with what's already
    * picked — step score = λ·sim(d, q) − (1−λ)·max_{s∈picked}
    * sim(d, s), ties broken by id. Returns (step, id, mmr_e6) in
    * selection order, the score in floored integer micro-units.
    *
    * Scale shape: the corpus-sized work — scoring every vector against
    * the query and cutting to the pool — is distributed
    * (TakeOrderedAndProject, codegen'd dot against a literal query);
    * the greedy selection then runs on the collected `poolSize`-row
    * shortlist, which is driver-sized BY DESIGN (every production MMR
    * reranks a shortlist; the algorithm is inherently sequential in
    * k). All driver arithmetic is plain IEEE double over sims computed
    * with the same left-to-right accumulation as the distributed
    * kernels, so the oracle (a recursive CTE replaying the greedy
    * loop) hash-matches.
    */
  def mmrRerank(corpus: DataFrame, queryVec: Array[Float], k: Int = 10,
      poolSize: Int = 50, lambda: Double = 0.7,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && poolSize >= k, "need poolSize >= k >= 1")
    // lambda = 0 would make the first pick degenerate (all scores 0)
    require(lambda > 0 && lambda <= 1, "lambda in (0, 1]")
    require(queryVec.nonEmpty, "empty query vector")
    import graft.functions.VectorFunctions.{dot, norm}
    val spark = corpus.sparkSession
    val qLit = typedLit(queryVec.toSeq)
    // zero-norm (degenerate) vectors are excluded BEFORE scoring: their
    // cosine is 0/0 = NaN, which Spark's descending sort ranks FIRST —
    // a zero vector would hijack the pool and poison every greedy
    // comparison (NaN compares false, floor(NaN) silently emits 0).
    // The oracle mirrors the exclusion (any-nonzero-element test).
    val pool = corpus
      .filter(norm(col(vecCol)) > 0)
      .select(col(idCol), col(vecCol),
        (dot(col(vecCol), qLit) / (norm(col(vecCol)) * norm(qLit))).as("__simq"))
      .orderBy(col("__simq").desc, col(idCol))
      .limit(poolSize)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getDouble(2)))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val mu = 1.0 - lambda
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    val pickedVecs = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
    val remaining = scala.collection.mutable.LinkedHashMap(
      pool.map { case (id, v, s) => id -> ((v, s)) }.toSeq: _*)
    var step = 1
    while (step <= k && remaining.nonEmpty) {
      val (bestId, bestScore) = remaining.iterator.map { case (id, (v, simq)) =>
        val red = if (pickedVecs.isEmpty) 0.0
          else pickedVecs.iterator.map(pv => cos(v, pv)).max
        (id, lambda * simq - mu * red)
      }.reduceLeft { (x, y) =>
        if (y._2 > x._2 || (y._2 == x._2 && y._1 < x._1)) y else x
      }
      picked += ((step, bestId, math.floor(bestScore * 1000000.0).toLong))
      pickedVecs += remaining(bestId)._1
      remaining.remove(bestId)
      step += 1
    }
    import spark.implicits._
    picked.toSeq.toDF("step", idCol, "mmr_e6")
  }
}
