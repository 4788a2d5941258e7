package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: A/B q219 exact-revenue formulations at sf0.1. */
object RevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.DataFrame
    def t(tag: String)(f: => DataFrame): Unit = {
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val r = f.select(xxhash64(struct(col("*"))).as("__h"))
          .agg(bit_xor(col("__h")).as("__x")).head()
        ((System.nanoTime() - t0) / 1e9, r.getLong(0))
      }
      System.err.println(f"[probe] $tag min=${times.map(_._1).min}%.2fs hash=${times.head._2}")
    }
    import graft.functions.MoneyFunctions.{discountedNet, decimalEdgeE4}
    val T = graft.engine.Tables
    val c = T.customer(spark, sfDir)
    val o0 = T.orders(spark, sfDir)
    val l = T.lineitem(spark, sfDir)
    c.count(); o0.count(); l.count()
    // A: current shape
    t("A current") {
      val o = o0.filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
      broadcast(c).join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("c_mktsegment"))
        .agg(decimalEdgeE4(sum(discountedNet(col("l_extendedprice"), col("l_discount"))))
          .as("revenue_exact"),
          countDistinct(col("o_orderkey")).as("n_orders"))
        .orderBy(col("c_mktsegment"))
    }
    // B: pre-aggregate lineitem per order, count(*) replaces countDistinct
    t("B preagg") {
      val o = o0.filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
      val lagg = l.groupBy(col("l_orderkey"))
        .agg(sum(discountedNet(col("l_extendedprice"), col("l_discount"))).as("__net"))
      o.join(lagg, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(decimalEdgeE4(sum(col("__net"))).as("revenue_exact"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("c_mktsegment"))
    }
    spark.stop()
  }
}
