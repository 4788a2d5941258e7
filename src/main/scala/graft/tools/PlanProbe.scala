package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc: print the executed plan of one catalog query at sf0.001. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q220")
    val spark = SparkSession.builder().master("local[4]").appName("planprobe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.plans.GraftExtensions.register(spark)
    graft.plans.GraftTableFunctions.register(spark)
    val q = graft.SparkEntry.queries.keys.find(_.startsWith(name)).get
    val df = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
    df.collect()
    println(s"=== $q ===")
    println(df.queryExecution.executedPlan.toString.take(6000))
    spark.stop()
  }
}
