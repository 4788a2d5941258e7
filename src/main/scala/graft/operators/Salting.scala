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
}
