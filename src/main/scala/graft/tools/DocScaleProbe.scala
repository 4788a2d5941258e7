package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Dev-only 1000× documents stress: generates a documents-ONLY corpus
  * at the given factor over sf0.1 (factor 1000 ≈ 5 M docs / ~1.5 GB
  * text — the other tables would be prohibitive at this factor, and
  * the probed operators read only `documents`) and times the
  * scan-shaped text-pipeline queries on it. This is the "one more
  * decade" check for the operators whose 100 TB story is "the scan IS
  * the cost": split assignment, native-kernel entropy, dup spectrum,
  * exact dedup, quality gates.
  *
  *   sbt -batch "runMain graft.tools.DocScaleProbe [factor] [qPrefix,...]"
  */
object DocScaleProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.lift(0).map(_.toInt).getOrElse(1000)
    val names = args.lift(1).map(_.split(",").toSeq).getOrElse(Seq(
      "q115_stratified_split", "q117_entropy_gate", "q120_dup_spectrum",
      "q37_dedup_exact", "q35_quality_score", "q36_lang_id", "q78_quality_gopher"))
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val dest = sys.env.getOrElse("SPARK_GRAFT_DOCSCALE_DIR", s"/tmp/graft_scale/docs$factor")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val destDocs = s"$dest/documents.parquet"
    // Reuse only a COMPLETE prior write: the _SUCCESS marker is the
    // Spark/Hadoop commit signal — a bare directory left by a crashed
    // partial write must be regenerated, not timed against.
    if (!new java.io.File(s"$destDocs/_SUCCESS").exists()) {
      System.err.println(s"[docscale] generating factor-$factor documents into $dest")
      ScaleGen.scaleDocuments(spark.read.parquet(s"$src/documents.parquet"), factor)
        .coalesce(32).write.mode(SaveMode.Overwrite).parquet(destDocs)
    }
    val n = spark.read.parquet(destDocs).count()
    System.err.println(s"[docscale] documents: $n rows")

    // min-of-two-passes, same contract as Bench
    val times = (1 to 2).map { pass =>
      names.map { name =>
        val t0 = System.nanoTime()
        val rows = graft.SparkEntry.queries(name)(spark, dest).count()
        val dt = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[docscale] pass $pass $name rows=$rows $dt%.2fs")
        name -> dt
      }.toMap
    }
    val best = names.map(nm => s""""$nm":${f"${times.map(_(nm)).min}%.2f"}""")
    println(s"""{"factor":$factor,"docs":$n,"queries":{${best.mkString(",")}}}""")
    spark.stop()
  }
}
