package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data LAYOUT: Z-order (Morton) clustering + an
  * explicit per-file min/max manifest, and the pruned read that uses
  * it — the storage-side lever that turns a 100 TB two-predicate scan
  * into a few-file read (Morton 1966; the technique behind
  * Delta/Iceberg OPTIMIZE ZORDER, here made explicit because vanilla
  * parquet has no file-level stats catalog: Spark prunes partitions
  * and parquet prunes row groups, but nothing skips whole FILES by
  * content range without a manifest).
  *
  * The reference's batch layout stage writes numbered artifacts with
  * no locality story (runner.py:388-433 just orders pages); this is
  * the layout story a scan-heavy corpus needs.
  *
  * Scale shapes:
  *  - the z-value is a pure per-row expression (static shift/or tree,
  *    whole-stage codegen); clustering is ONE repartitionByRange on it
  *    (a sampled range exchange — the same cost as any global sort)
  *    plus an in-partition sort that parquet turns into tight
  *    row-group stats on BOTH dimensions.
  *  - the manifest is nFiles rows (one scan of the written data,
  *    grouped by input_file_name) stored under `_zorder_manifest` —
  *    an underscore path, so plain `spark.read.parquet(dir)` ignores
  *    it. Driver-side at probe time: nFiles (min, max) tuples, the
  *    same "tiny by construction" class as a k-means centroid
  *    collect.
  *  - a pruned read lists ONLY the manifest-surviving files — IO is
  *    proportional to the query box, not the corpus; the residual
  *    in-file filter still pushes down to parquet row groups.
  */
object Layout {

  /** Morton z-value: interleave the low `bits` of each column
    * (column i owns bit positions j·n + i). Out-of-range values
    * raise rather than silently aliasing into a wrong locality
    * bucket (the exactByContentPriority packing convention).
    */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.size >= 2, "z-order needs at least 2 columns")
    require(bits >= 1 && bits * cols.size <= 62,
      s"bits * dims = ${bits * cols.size} must fit a positive long")
    val n = cols.size
    val guarded = cols.map { c =>
      val l = c.cast("long")
      when(l.isNull, lit(null).cast("long"))
        .when(l < 0L || l >= (1L << bits),
          raise_error(concat(lit(s"z-order input out of [0, 2^$bits): "), l)))
        .otherwise(l)
    }
    guarded.zipWithIndex.flatMap { case (c, ci) =>
      (0 until bits).map { j =>
        shiftleft(shiftright(c, j).bitwiseAND(lit(1L)), j * n + ci)
      }
    }.reduce(_.bitwiseOR(_))
  }

  private def manifestPath(dir: String) = s"$dir/_zorder_manifest"

  /** Cluster `df` by the z-value of `zCols` into `nFiles` range
    * partitions, write parquet, and record the per-file min/max of
    * every z column as the manifest. */
  def writeZOrdered(df: DataFrame, dir: String, zCols: Seq[String],
      bits: Int, nFiles: Int): Unit = {
    require(nFiles >= 1, "nFiles must be positive")
    df.withColumn("__z", zValue(zCols.map(col), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
    val spark = df.sparkSession
    val aggs = zCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(manifestPath(dir))
  }

  /** Read only the files whose manifest range intersects every
    * `(col, lo, hi)` box side (inclusive), then apply the exact
    * residual filter. Returns (pruned frame, files read, files
    * total) so callers/specs can see the skip rate. */
  def prunedRead(spark: SparkSession, dir: String,
      box: Seq[(String, Long, Long)]): (DataFrame, Int, Int) = {
    val m = spark.read.parquet(manifestPath(dir)).collect()
    val total = m.length
    val keep = m.filter { r =>
      box.forall { case (c, lo, hi) =>
        val mn = r.getAs[Long](s"min_$c")
        val mx = r.getAs[Long](s"max_$c")
        mx >= lo && mn <= hi
      }
    }.map(_.getAs[String]("file"))
    val residual = box.map { case (c, lo, hi) =>
      col(c) >= lo && col(c) <= hi
    }.reduce(_ && _)
    val df =
      if (keep.isEmpty) spark.read.parquet(dir).filter(residual).limit(0)
      else spark.read.parquet(keep.toSeq: _*).filter(residual)
    (df, keep.length, total)
  }
}
