package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting (SCALE.md "shuffle discipline").
  *
  * AQE's skew-join splitting handles most runtime skew; salting is the
  * explicit lever for the pathological cases it can't re-plan (skewed
  * aggregation keys, broadcast-ineligible skewed joins). Both helpers
  * are deterministic — the salt derives from row content hashes, not
  * rand() — so results are reproducible and plans stay cacheable.
  */
object Salting {

  /** Two-phase aggregation for skewed group keys: partial-aggregate on
    * (keys + salt) — spreading one hot key over `buckets` reducers —
    * then final-aggregate on the keys. Caller supplies the partial and
    * final expressions (e.g. partial sum → final sum, partial count →
    * final sum).
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], buckets: Int,
      partialAggs: Seq[Column], finalAggs: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(struct(df.columns.map(col).toSeq: _*)), lit(buckets.toLong)))
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    partial.groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Skewed large-side equi-join: the big (skewed) side gets a
    * content-derived salt in [0, buckets); the small side is exploded
    * `buckets`-fold so every (key, salt) partner exists. The shuffle
    * then spreads each hot key over `buckets` partitions. Inner and
    * left joins preserve semantics (each big row matches exactly its
    * original partners, once).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      buckets: Int, joinType: String = "inner"): DataFrame = {
    val bigSalted = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col).toSeq: _*)), lit(buckets.toLong)))
    val smallExploded = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    bigSalted.join(smallExploded, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Bloom-pruned fact-dim inner equi-join: build a Bloom filter over
    * the dim side's join keys (driver-collected, size-bounded — the
    * `Decontaminate.buildBloom` machinery), pre-filter the FACT side
    * with the codegen'd membership predicate, then run the exact join.
    * The result is IDENTICAL to the plain join — Bloom false positives
    * only let a few extra fact rows reach the join, where the exact
    * match drops them — which is why q146's oracle is simply the plain
    * SQL join.
    *
    * This is the manual form of the optimizer's runtime-filter
    * injection, exposed as an operator for the cases Spark's
    * InjectRuntimeFilter declines (non-selective-looking creation
    * side, disabled conf, or a dim that is the OUTPUT of upstream
    * graft operators the optimizer can't see through). At 100 TB the
    * win is shuffle mass: only Bloom-surviving fact rows (≈ the true
    * match set + fpp) are exchanged, instead of the whole fact table.
    * Inner join only: pruning the fact side is correctness-neutral
    * exactly when unmatched fact rows are dropped anyway.
    */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame, key: String,
      expectedDimKeys: Option[Long] = None, fpp: Double = 0.01): DataFrame = {
    val keys = dim.select(col(key)).distinct()
    // an UNDERSIZED filter stays correct but stops pruning (measured at
    // the 100× corpus: a 50 k-sized filter over ~300 k real keys let the
    // fact shuffle grow superlinear); when the caller can't bound the
    // dim, one count job sizes it exactly — dim-sized, the cheap side
    val expected = expectedDimKeys.getOrElse(math.max(1L, keys.count()))
    val bloom = Decontaminate.buildBloom(keys, key, expected, fpp)
    val pruned = bloom match {
      case Some(b) => fact.filter(Decontaminate.mightContain(b, col(key)))
      case None    => fact.filter(lit(false)) // empty dim ⇒ empty inner join
    }
    pruned.join(dim, Seq(key))
  }
}
