package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc: print the executed plan of one catalog query.
  * Usage: PlanProbe <queryPrefix> [sfDir] — an ambiguous prefix picks
  * the lexically FIRST match (deterministic), an unknown prefix exits
  * with the candidate list instead of a bare exception. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q220")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val matches = graft.SparkEntry.queries.keys.filter(_.startsWith(name)).toSeq.sorted
    if (matches.isEmpty) {
      System.err.println(s"no query matches prefix '$name'")
      sys.exit(2)
    }
    val q = matches.head
    if (matches.size > 1)
      System.err.println(s"prefix '$name' matches ${matches.size}: picking $q")
    val spark = SparkSession.builder().master("local[4]").appName("planprobe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    try {
      graft.plans.GraftExtensions.register(spark)
      graft.plans.GraftTableFunctions.register(spark)
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      df.collect()
      println(s"=== $q ===")
      // full executed plan (AQE-final) — optionally to a file, since
      // interesting plans outgrow a terminal scrollback
      val full = df.queryExecution.executedPlan.toString
      args.lift(2) match {
        case Some(out) =>
          java.nio.file.Files.writeString(java.nio.file.Paths.get(out), full)
          println(s"wrote ${full.length} chars to $out")
        case None => println(full.take(6000))
      }
    } finally spark.stop()
  }
}
