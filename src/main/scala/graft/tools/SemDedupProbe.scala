package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Measures SemDeDup with a corpus-sized codebook: seeds k centroids
  * via the deterministic `hashBucketCentroids`, optionally one Lloyd
  * refinement round, then times `semDedupFlags` end-to-end (dropped
  * count forces the pair join). Args: sfDir k [tau] [refineIters].
  * Demonstrates the k ∝ n scale path the fixed-label q87 cannot show
  * on ScaleGen data (see SCALE.md 'Curation batch two').
  */
object SemDedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val k = args(1).toInt
    val tau = if (args.length > 2) args(2).toDouble else 0.3
    val iters = if (args.length > 3) args(3).toInt else 0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count() // warm the scan; cardinality for the report
    val t0 = System.nanoTime()
    val seeded = Similarity.hashBucketCentroids(emb, k)
    val refined = if (iters > 0) Similarity.kmeansRefine(emb, seeded, iters) else seeded
    val cents = Similarity.collectCentroids(refined)
    val tSeed = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val dropped = Similarity.semDedupFlags(emb, cents, tau)
      .filter(!col("keep")).count()
    val tDedup = (System.nanoTime() - t1) / 1e9
    println(f"""{"n":$n,"k":$k,"tau":$tau,"refine_iters":$iters,"seed_sec":$tSeed%.2f,"dedup_sec":$tDedup%.2f,"dropped":$dropped}""")
    spark.stop()
  }
}
