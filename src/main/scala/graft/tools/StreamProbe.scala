package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming-throughput probe for the curation surface: drives the
  * scaled `documents` corpus through a real file-source stream (many
  * micro-batches via maxFilesPerTrigger) into the two streaming
  * curation operators —
  *  1. `EventStreams.nearDupSuppress` (native 64-bit SimHash +
  *     watermark-bounded stateful dedup), and
  *  2. `EventStreams.contaminationFlagsAgainst` (broadcast benchmark
  *     shingle probe + watermark dedup)
  * — and prints one JSON line with end-to-end docs/sec for each.
  * Event time is synthesized from doc_id (1 s apart, near-monotone
  * in file order) so watermarks behave as in production. Measurement
  * tooling only; not part of the driver contract.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.StreamProbe`.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_scale/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // stage the corpus with an event-time column, split into enough
    // files that maxFilesPerTrigger yields a multi-batch stream
    val stage = java.nio.file.Files.createTempDirectory("streamprobe").toString
    // ts = doc_id seconds, UNWRAPPED: the ScaleGen copy stride is a
    // multiple of any small modulus, so a `% k` here would reset event
    // time at every copy boundary and the watermark would silently
    // drop ~all of each later copy's early rows as late — the probe
    // would then measure a stream that lost a quarter of its input
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("ts", timestamp_micros(col("doc_id") * 1000000L))
      .select("doc_id", "ts", "text")
    docs.repartitionByRange(16, col("doc_id"))
      .write.mode("overwrite").parquet(s"$stage/in")
    val n = spark.read.parquet(s"$stage/in").count()
    val schema = spark.read.parquet(s"$stage/in").schema

    def drive(name: String)(build: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame): (Long, Double) = {
      val in = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2).parquet(s"$stage/in")
      val out = build(in)
      val t0 = System.nanoTime()
      val q = out.writeStream.format("memory").queryName(name)
        .option("checkpointLocation", s"$stage/cp_$name")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val dt = (System.nanoTime() - t0) / 1e9
      (spark.table(name).count(), dt)
    }

    val (kept, tSup) = drive("suppress") { in =>
      graft.streaming.EventStreams.nearDupSuppress(in, "text", "ts",
        watermark = "1 hour")
        .select("doc_id")
    }

    // benchmark side: every 40th doc's text — a realistic eval-set size
    val bench = docs.filter(col("doc_id") % 40 === 0).select("text")
    val shingles = graft.streaming.EventStreams.benchmarkShingles(bench).persist()
    val nShingles = shingles.count()
    val (flagged, tCon) = drive("contam") { in =>
      graft.streaming.EventStreams.contaminationFlagsAgainst(in, shingles,
        watermark = "1 hour")
    }
    shingles.unpersist()

    def sec(t: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(t))
    def rate(t: Double) = String.format(java.util.Locale.ROOT, "%.0f", Double.box(n / t))
    println(
      s"""{"docs":$n,"suppress_sec":${sec(tSup)},"suppress_docs_per_sec":${rate(tSup)},""" +
        s""""suppress_kept":$kept,"bench_shingles":$nShingles,""" +
        s""""contam_sec":${sec(tCon)},"contam_docs_per_sec":${rate(tCon)},"contam_flagged":$flagged}""")
    spark.stop()
  }
}
