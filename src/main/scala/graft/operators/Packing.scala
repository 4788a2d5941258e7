package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Sequence packing for training-data preparation: the concat-and-split
  * layout (documents concatenated in a deterministic global order, the
  * token stream cut into fixed `ctxLen` windows) mapped back onto each
  * document — for every doc, the global token offset where it starts,
  * which context window ("pack") that is, and the offset inside it.
  * This is the standard packing used to fill LLM context windows
  * without padding; downstream a writer groups by `pack_id`.
  *
  * Scale shape — a DISTRIBUTED PREFIX SUM, not a global window: a
  * single `sum().over(Window.orderBy(id))` would collapse the whole
  * corpus into one partition (Spark plans an unpartitioned running
  * window as Exchange SinglePartition + Sort — the classic scale
  * cliff). Instead the classic two-level scan:
  *
  *  1. docs are assigned to `bucketSize`-wide id ranges; a hash
  *     aggregate computes each bucket's token total (map-side
  *     combined, one small shuffle);
  *  2. the running offset ACROSS buckets is a window over that
  *     aggregate — n/bucketSize rows, thousands at 100 TB, so the
  *     single-partition window is over a trivially small relation;
  *  3. bucket offsets broadcast-join back and a window PARTITIONED BY
  *     bucket (bounded partitions, local sort only) adds the
  *     within-bucket running sum.
  *
  * The result is bit-identical to the naive global window (same total
  * order: bucket = id div bucketSize is monotone in id), which is what
  * the DuckDB oracle (q79) checks it against.
  */
object Packing {

  /** (id, n_toks, start, pack_id, pack_off) per document — unsorted
    * (a global orderBy belongs to presentation, not the operator; the
    * catalog query adds one for the oracle compare). `idCol` must be
    * numeric (the bucketing uses integer division; any monotone
    * id-to-bucket map preserves the order).
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
      ctxLen: Int, bucketSize: Long = 1L << 20): DataFrame = {
    require(ctxLen > 0, "ctxLen must be positive")
    require(bucketSize > 0, "bucketSize must be positive")
    val base = docs.select(col(idCol).as("id"),
      TextFunctions.tokenCount(col(textCol)).as("n_toks"))
    packCounts(base, ctxLen, bucketSize).withColumnRenamed("id", idCol)
  }

  /** Packing over precomputed token counts: (id, n_toks) → adds
    * (start, pack_id, pack_off). Exposed so a pipeline that already
    * counted tokens (e.g. after tokenizer-specific counting) skips the
    * re-tokenization.
    */
  def packCounts(counts: DataFrame, ctxLen: Int,
      bucketSize: Long = 1L << 20): DataFrame = {
    val bucketed = counts.withColumn("__bucket",
      F.expr(s"id div ${bucketSize}L"))
    val perBucket = bucketed.groupBy("__bucket")
      .agg(sum("n_toks").as("__btoks"))
    // running offset across buckets: single-partition window over the
    // BUCKET AGGREGATE only (n/bucketSize rows — small by construction)
    val acrossBuckets = Window.orderBy("__bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perBucket
      .withColumn("__boff", coalesce(sum("__btoks").over(acrossBuckets), lit(0L)))
      .select("__bucket", "__boff")
    // within-bucket running sum: partitioned window, bounded local sort
    val withinBucket = Window.partitionBy("__bucket").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed
      .join(broadcast(offsets), Seq("__bucket"))
      .withColumn("start",
        col("__boff") + coalesce(sum("n_toks").over(withinBucket), lit(0L)))
      .withColumn("pack_id", F.expr(s"start div ${ctxLen}L"))
      .withColumn("pack_off", col("start") % ctxLen)
      .select(col("id"), col("n_toks").cast("long").as("n_toks"),
        col("start"), col("pack_id"), col("pack_off"))
  }
}
