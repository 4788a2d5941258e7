package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension maintenance (Kimball SCD type 2): turn a
  * stream of observed attribute states into a versioned history with
  * validity intervals. This is the dimension-table counterpart of the
  * corpus delta operators (q98/q124): a training-data platform tracks
  * source metadata (license, crawl policy, domain rating) that changes
  * over time, and joins *as-of* versions back to documents — which
  * requires the interval form, not the latest-wins form.
  */
object Scd {

  /** Collapse observations into SCD2 version intervals.
    *
    * Input: one row per OBSERVATION `(keys..., ts, attrs...)` — the
    * union of the current dimension (stamped with its load ts) and any
    * number of change batches. Output: one row per VERSION —
    * `(keys..., attrs..., valid_from, valid_to, is_current)` — where
    * consecutive observations with identical tracked attributes
    * collapse into one version (no-op changes produce no version), each
    * version closes at the next version's `valid_from`, and the last
    * version per key is open (`valid_to` NULL, `is_current` true).
    *
    * Determinism: all ordering is by `(ts, attrs...)` so same-timestamp
    * conflicting observations resolve identically on every run/engine.
    * Exact-duplicate observations need no separate distinct: after the
    * in-key sort they are ADJACENT and attribute-equal, so the lag
    * suppression drops them with the no-ops — an explicit `.distinct()`
    * was measured as a second full-width corpus exchange
    * (hash-partitioned on (key, ts, attrs), unshareable with the
    * window's (key) partitioning) buying nothing.
    *
    * Scale shape: ONE hash partitioning by key serves every step —
    * the lag-based change-and-duplicate suppression and the lead-based
    * interval close are windows over the same `partitionBy(keys)`,
    * so Catalyst plans a single exchange and reuses its ordering
    * (windows sort within partitions; no global sort anywhere). Version
    * counts per key are change-bounded, not observation-bounded, after
    * the suppression filter. At 100 TB the observation union is the
    * only corpus-sized input; the output is |versions|-sized.
    */
  def scd2(observations: DataFrame, keyCols: Seq[String], tsCol: String,
      attrCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty, "need key and attr columns")
    val keys = keyCols.map(col)
    val order: Seq[Column] = col(tsCol) +: attrCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    val attrs = struct(attrCols.map(col): _*)
    observations
      .select((keyCols ++ Seq(tsCol) ++ attrCols).map(col): _*)
      .withColumn("__prev", lag(attrs, 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= attrs)
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .select(keys ++ attrCols.map(col) ++ Seq(
        col(tsCol).as("valid_from"),
        col("valid_to"),
        col("valid_to").isNull.as("is_current")): _*)
  }

  /** As-of join facts to their SCD2 version: the version whose
    * `[valid_from, valid_to)` interval contains the fact's `ts`.
    * A range-predicate equi-key join: the equi part (the key) carries
    * the shuffle; the interval predicate filters within key groups,
    * which are version-count-bounded after `scd2`'s suppression.
    */
  def asOfVersion(facts: DataFrame, dim: DataFrame, keyCols: Seq[String],
      factTsCol: String): DataFrame = {
    val cond = keyCols.map(k => facts(k) === dim(k)).reduce(_ && _) &&
      facts(factTsCol) >= dim("valid_from") &&
      (dim("valid_to").isNull || facts(factTsCol) < dim("valid_to"))
    facts.join(dim, cond, "left")
  }
}
