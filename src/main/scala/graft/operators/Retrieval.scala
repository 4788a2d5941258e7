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
}
