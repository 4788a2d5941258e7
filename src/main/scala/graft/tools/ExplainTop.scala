package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only plan auditor: prints the formatted physical plan of the
  * named catalog queries (default: the bench's most expensive ones).
  */
object ExplainTop {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q03_join_agg_revenue", "q01_agg_pricing", "q37_dedup_exact")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      System.err.println(s"===== $n =====")
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      System.err.println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
