package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev-only stage profiler for the q44 MinHash-LSH pipeline. */
object ProfileQ44 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.engine.Tables.documents(spark, sfDir)
    docs.count() // warm
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      System.err.println(f"[prof] $tag rows=$n ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    // every stage collects the aggregated value — a count() over an
    // aggregate lets column pruning delete the kernel under test and
    // time only the scan
    time("scan-only")(docs.count())
    time("shingleHashes")(docs.select(size(Dedup.shingleHashes(col("text"))).as("n"))
      .agg(sum("n")).collect()(0).getLong(0))
    time("fused-bandkeys")(docs.select(
      graft.plans.MinHashBandKeysExpr.minhash_band_keys_from_hashes(
        Dedup.shingleHashes(col("text")), 8, 8).as("k"))
      .select(aggregate(col("k"), lit(0L), _ + _).as("s"))
      .agg(sum("s")).collect()(0).getLong(0))
    // sum of keys defeats column pruning, so the kernel really runs
    val keyed = docs
      .select(col("doc_id").as("id"),
        graft.plans.ShingleMinHashBandKeysExpr.shingle_minhash_band_keys(
          col("text"), 8, 8).as("keys"))
    time("fused-kernel")(keyed.select(aggregate(col("keys"), lit(0L), _ + _).as("s"))
      .agg(sum("s")).collect()(0).getLong(0))
    val banded = docs
      .select(col("doc_id").as("id"),
        posexplode(graft.plans.ShingleMinHashBandKeysExpr.shingle_minhash_band_keys(
          col("text"), 8, 8)).as(Seq("band", "key")))
      .repartition(col("band"), col("key"))
    time("banded+repartition")(banded.count())
    time("full-candidates")(Dedup.minHashCandidates(docs, "doc_id", "text").count())
    time("full-candidates-again")(Dedup.minHashCandidates(docs, "doc_id", "text").count())
    spark.stop()
  }
}
