package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: A/B q27 percentile formulations at sf0.1. */
object PctProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.DataFrame
    def t(tag: String)(f: => DataFrame): Unit = {
      // two passes, min — mirror the bench
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val r = f.select(xxhash64(struct(col("*"))).as("__h"))
          .agg(bit_xor(col("__h")).as("__x")).head()
        ((System.nanoTime() - t0) / 1e9, r.getLong(0))
      }
      System.err.println(f"[probe] $tag min=${times.map(_._1).min}%.2fs hash=${times.head._2}")
    }
    val li = graft.engine.Tables.lineitem(spark, sfDir)
    li.count()
    // A: current two-level histogram form
    t("A histogram-two-level") {
      val qtyH = li.groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("__n"))
        .groupBy(col("l_returnflag"))
        .agg(round(expr("percentile(l_quantity, 0.5, __n)"), 4).as("p50_qty"))
      val priceH = li.groupBy(col("l_returnflag"), col("l_extendedprice"))
        .agg(count(lit(1)).as("__n"))
        .groupBy(col("l_returnflag"))
        .agg(round(expr("percentile(l_extendedprice, 0.9, __n)"), 4).as("p90_price"),
          round(expr("percentile(l_extendedprice, 0.99, __n)"), 4).as("p99_price"))
      qtyH.join(priceH, "l_returnflag")
        .select(col("l_returnflag"), col("p50_qty"), col("p90_price"), col("p99_price"))
        .orderBy(col("l_returnflag"))
    }
    // B: one scan, direct percentile with shared array buffer for price
    t("B direct-array") {
      li.groupBy(col("l_returnflag"))
        .agg(round(expr("percentile(l_quantity, 0.5)"), 4).as("p50_qty"),
          expr("percentile(l_extendedprice, array(0.9, 0.99))").as("__pp"))
        .select(col("l_returnflag"), col("p50_qty"),
          round(col("__pp").getItem(0), 4).as("p90_price"),
          round(col("__pp").getItem(1), 4).as("p99_price"))
        .orderBy(col("l_returnflag"))
    }
    // C: qty histogram (collapses 600k->150) + price direct array, one join
    t("C qtyhist-pricearray") {
      val qtyH = li.groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("__n"))
        .groupBy(col("l_returnflag"))
        .agg(round(expr("percentile(l_quantity, 0.5, __n)"), 4).as("p50_qty"))
      val priceH = li.groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_extendedprice, array(0.9, 0.99))").as("__pp"))
        .select(col("l_returnflag"),
          round(col("__pp").getItem(0), 4).as("p90_price"),
          round(col("__pp").getItem(1), 4).as("p99_price"))
      qtyH.join(priceH, "l_returnflag")
        .select(col("l_returnflag"), col("p50_qty"), col("p90_price"), col("p99_price"))
        .orderBy(col("l_returnflag"))
    }
    spark.stop()
  }
}
