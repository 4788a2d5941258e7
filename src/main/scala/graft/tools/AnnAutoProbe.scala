package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Similarity

/** Measurement probe for the `nearDupesAnnAuto` scale claim: on the
  * same corpus, compare the fixed-bucket-count formulation against
  * the corpus-sized one at a real near-dup threshold. Prints one JSON
  * line: candidate volume (pre-verification pair count), result rows,
  * and wall time for each. Used to produce the numbers in SCALE.md's
  * "Measured scale evidence"; not part of the driver contract.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.AnnAutoProbe
  * [threshold] [fixedBits]`.
  */
object AnnAutoProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val threshold = args.lift(0).map(_.toDouble).getOrElse(0.95)
    val fixedBits = args.lift(1).map(_.toInt).getOrElse(6)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = graft.engine.Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val autoBits = Similarity.autoBits(n, 1024, 16)

    def run(bits: Int): (Long, Long, Double) = {
      import org.apache.spark.sql.functions._
      // candidate volume = bucket-collision pairs BEFORE the similarity
      // filter, under the SAME maxBucketSize cap the timed run applies
      // (an uncapped sum would count pairs the run never scores)
      val bucketed = emb.select(
        graft.functions.VectorFunctions.signBucket(col("embedding"), bits).as("b"))
        .groupBy("b").count()
        .filter(col("count") <= Similarity.DefaultMaxBucketSize)
      val cands = bucketed
        .agg(coalesce(sum(col("count") * (col("count") - 1) / 2), lit(0.0)))
        .collect()(0).getDouble(0).toLong
      // min of two passes: pass 1 absorbs one-time codegen/JIT, the
      // same steady-state methodology as graft.Bench (else whichever
      // configuration runs first looks slower)
      var rows = 0L
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        rows = Similarity.nearDupesAnn(emb, threshold, bits).count()
        (System.nanoTime() - t0) / 1e9
      }
      (cands, rows, times.min)
    }

    val (cFixed, rFixed, tFixed) = run(fixedBits)
    val (cAuto, rAuto, tAuto) = run(autoBits)
    // Locale.ROOT: default-locale %.2f prints comma decimals in many
    // locales, which is unparseable JSON
    def sec(t: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(t))
    println(
      s"""{"n":$n,"threshold":$threshold,"fixed_bits":$fixedBits,""" +
        s""""fixed_candidates":$cFixed,"fixed_rows":$rFixed,"fixed_sec":${sec(tFixed)},""" +
        s""""auto_bits":$autoBits,"auto_candidates":$cAuto,"auto_rows":$rAuto,"auto_sec":${sec(tAuto)}}""")
    spark.stop()
  }
}
