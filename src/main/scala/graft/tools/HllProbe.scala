package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: inspect Datasketches-HLL estimate paths (raw sketch vs
  * one-input union vs parts union) around the coupon/dense boundary. */
object HllProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("lang"), md5(col("text")).as("k"), col("doc_id"))
    val waves = (0 until 3).map(i => docs.filter(pmod(col("doc_id"), lit(3)) === i))
    val P = graft.operators.Profiling
    val merged = P.mergeSketches("lang",
        waves.map(w => P.groupSketches(w, "lang", col("k"))))
      .select(col("lang"), hll_sketch_estimate(col("hll")).as("m"))
    val whole1 = P.mergeSketches("lang",
        (0 until 2).map(i => P.groupSketches(docs.filter(pmod(col("doc_id"), lit(2)) === i), "lang", col("k"))))
      .select(col("lang"), hll_sketch_estimate(col("hll")).as("w1"))
    val whole0 = P.groupSketches(docs, "lang", col("k"))
      .select(col("lang"), hll_sketch_estimate(col("hll")).as("w0"))
    merged.join(whole1, "lang").join(whole0, "lang").orderBy("lang").show()
    spark.stop()
  }
}
