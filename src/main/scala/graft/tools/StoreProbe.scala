package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextOps}

/** Same-session A/B of the bucketed persisted digest stores against
  * the inline (re-derive every run) forms, at whatever scale
  * `args(0)` points to — the measurement the r7 verdict asked for on
  * q96's spilling 100× merge join ("kill the 24–79 s variance band").
  *
  * Times three delta-maintenance operators with q96/q98/q99's exact
  * parameters: containment pairs (store = bucket-sorted shingle
  * table), incremental exact dedup and shingle novelty (store =
  * digest sets, delta = doc_id % 10 >= 7). Store build time is
  * reported separately — it is the ONE-TIME cost the steady-state
  * runs amortize. Min of two passes per measurement, matching Bench.
  *
  * Usage: `runMain graft.tools.StoreProbe <dataDir> [buckets]`.
  */
object StoreProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val buckets = if (args.length > 1) args(1).toInt else 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // the store contract: trust the on-disk bucket sort (the store
      // writers guarantee one file per bucket)
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val catalog = docs.filter(col("doc_id") % 10 < 7)
    val delta = docs.filter(col("doc_id") % 10 >= 7)
    println(s"[probe] docs=${docs.count()} dir=$dir buckets=$buckets")

    def time[T](what: String, passes: Int = 2)(f: => T): Double = {
      val ts = (1 to passes).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $what%-28s ${ts.min}%8.2f s  (passes: ${ts.map(t => f"$t%.2f").mkString(", ")})")
      ts.min
    }

    // -- q96 containment ------------------------------------------------
    time("q96 inline", 2) {
      TextOps.containmentPairs(docs, "doc_id", "text", n = 3,
        blockCols = Seq("lang"), maxDfFraction = 0.5, maxDf = 2500,
        minContainment = 0.8).count()
    }
    spark.sql("DROP TABLE IF EXISTS probe_cont")
    spark.sql("DROP TABLE IF EXISTS probe_cont_meta")
    time("q96 store build (one-time)", 1) {
      TextOps.writeContainmentStore(docs, "doc_id", "text", "probe_cont",
        n = 3, blockCols = Seq("lang"), buckets = buckets)
    }
    time("q96 from store", 2) {
      TextOps.containmentPairsFromStore(spark, "probe_cont",
        blockCols = Seq("lang"), maxDfFraction = 0.5, maxDf = 2500,
        minContainment = 0.8).count()
    }

    // -- q98 incremental exact dedup ------------------------------------
    time("q98 inline", 2) {
      Dedup.incrementalExact(catalog, delta, "doc_id", "text").count()
    }
    spark.sql("DROP TABLE IF EXISTS probe_digests")
    time("q98 store build (one-time)", 1) {
      Dedup.writeDigestStore(catalog, "text", "probe_digests", buckets)
    }
    time("q98 from store", 2) {
      Dedup.incrementalExactVsStore(spark, "probe_digests", delta,
        "doc_id", "text").count()
    }

    // -- q99 novelty ----------------------------------------------------
    time("q99 inline", 2) {
      TextOps.noveltyVsCatalog(catalog, delta, "doc_id", "text").count()
    }
    spark.sql("DROP TABLE IF EXISTS probe_shingles")
    time("q99 store build (one-time)", 1) {
      TextOps.writeShingleDigestStore(catalog, "text", "probe_shingles", 3, buckets)
    }
    time("q99 from store", 2) {
      TextOps.noveltyVsStore(spark, "probe_shingles", delta,
        "doc_id", "text").count()
    }

    Seq("probe_cont", "probe_cont_meta", "probe_digests", "probe_shingles")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    spark.stop()
  }
}
