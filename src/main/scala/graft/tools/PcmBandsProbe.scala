package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe for the q196 signature-cap saturation (SCALE.md r12):
  * at 100× the 8-band signature space (~4 rates × 256 patterns) puts
  * every bucket over the hot cap and the candidate set goes EMPTY by
  * design. This measures the documented knob — `bands` — by running
  * the same planted-triangle fixture at the given corpus scale with
  * two band widths and reporting planted-pair recall for each.
  */
object PcmBandsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val bandsA = if (args.nonEmpty) args(0).toInt else 8
    val bandsB = if (args.length > 1) args(1).toInt else 16
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = graft.engine.Tables.documents(spark, sfDir).select(col("doc_id"))
    val ids = base.select(col("doc_id").as("id"), col("doc_id").as("base"),
        lit(1).as("scale"), lit(false).as("hv"))
      .unionByName(base.filter(col("doc_id") < 30)
        .select((col("doc_id") + 1000000L).as("id"), col("doc_id").as("base"),
          lit(2).as("scale"), lit(false).as("hv")))
      .unionByName(base.filter(col("doc_id") < 30)
        .select((col("doc_id") + 2000000L).as("id"), col("doc_id").as("base"),
          lit(1).as("scale"), lit(true).as("hv")))
    val media = graft.operators.Multimodal.synthesizeWavPcm(
      ids, "id", "base", "scale", "hv").cache()
    println(s"corpus: ${media.count()} WAV payloads from $sfDir")
    for (bands <- Seq(bandsA, bandsB)) {
      val pairs = graft.operators.Multimodal.pcmPerceptualCandidates(
        media, bands = bands, maxBucketSize = 64, thrPermille = 10)
      val total = pairs.count()
      // the 30 planted triangles: base, x2-volume twin (+1M),
      // re-encoded header variant (+2M) all pair pairwise
      val planted = pairs.filter(
        col("id1") % 1000000 === col("id2") % 1000000 &&
          (col("id2") >= 1000000L)).count()
      println(f"bands=$bands%-3d total_pairs=$total%-8d planted_pairs=$planted (of 90 expected)")
    }
    spark.stop()
  }
}
