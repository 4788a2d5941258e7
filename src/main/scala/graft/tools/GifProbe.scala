package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc probe: GIF kernel output vs the PNG twin (same dcBlock pixels). */
object GifProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").appName("gifprobe")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    val rows = Seq(
      (1L, graft.operators.Multimodal.pngGrayPayload(5L, 1)),
      (2L, graft.operators.Multimodal.gifGrayPayload(5L, 1, interlaced = false)),
      (3L, graft.operators.Multimodal.gifGrayPayload(5L, 1, interlaced = true)),
      (4L, graft.operators.Multimodal.gifGrayPayload(7L, 2, interlaced = false)),
      (5L, graft.operators.Multimodal.pngGrayPayload(7L, 2))
    ).toDF("id", "payload")
    val out = rows.select(col("id"),
      graft.plans.PngBlockMeanExpr.png_block_means(col("payload"), 4).as("png"),
      graft.plans.GifBlockMeanExpr.gif_block_means(col("payload"), 4).as("gif"))
      .collect()
    out.foreach(r => println(s"id=${r.get(0)} png=${r.get(1)} gif=${r.get(2)}"))
    spark.stop()
  }
}
