package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only probe for the Bench metric's semantics: times a catalog
  * query under `count()` (the bench action — Catalyst prunes
  * projection columns that feed no filter/join/aggregate/sort) vs
  * `foreach` (full row materialization). A large gap means the
  * query's compute is projection-only and the bench number is its
  * scan cost, not its operator cost (see the Bench.scala metric
  * note). Measured at sf0.1: q81 0.14 s counted / 1.15 s evaluated;
  * q102 identical both ways (its score feeds the top-k sort).
  */
object CountProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q81_embedding_quantize", "q102_ann_int8_adc")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    names.foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      time(s"$q count (cold)  ") { df.count() }
      time(s"$q count (steady)") { df.count() }
      time(s"$q foreach       ") { df.foreach(_ => ()) }
    }
    spark.stop()
  }
}
