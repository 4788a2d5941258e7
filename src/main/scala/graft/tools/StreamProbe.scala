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
    // DETERMINISTIC staging: contiguous zero-padded id-range dirs, so
    // the file source replays the same near-monotone event-time order
    // every run. (repartitionByRange SAMPLES its bounds — run-to-run
    // file boundaries shifted which docs arrived late at the
    // watermark, and kept/flagged counts wandered across probe runs.)
    val maxIdRow = docs.agg(max("doc_id")).head()
    require(!maxIdRow.isNullAt(0), s"no documents found under $sfDir")
    val maxId = maxIdRow.getLong(0)
    val per = math.max(1L, maxId / 16 + 1)
    docs.withColumn("__f", format_string("%02d", expr(s"doc_id div ${per}L")))
      .repartition(col("__f"))
      .write.partitionBy("__f").mode("overwrite").parquet(s"$stage/in")
    // FileStreamSource batches by file modification time, and parallel
    // parquet task completion scrambles it — restamp every file in
    // id-range order so batch composition (and with it which rows are
    // late at the watermark) is identical on every probe run
    new java.io.File(s"$stage/in").listFiles()
      .filter(_.getName.startsWith("__f=")).sortBy(_.getName).zipWithIndex
      .foreach { case (d, i) =>
        d.listFiles().foreach(_.setLastModified((i + 1) * 60000L))
      }
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

    // the Bloom prefilter forms of the same decontamination: bloom-only
    // (stateless literal predicate, quarantine semantics) and
    // bloom + exact-verify (flags identical to the exact form)
    // fpp 1e-4, not the 1e-2 default: a doc with s distinct shingles
    // is falsely flagged with odds ~s·fpp, and these docs carry ~100
    // shingles — 1e-4 keeps the bloom-only false-flag rate ~1%
    val benchDocs = docs.filter(col("doc_id") % 40 === 0)
    val (flaggedB, tConB) = drive("contam_bloom") { in =>
      graft.streaming.EventStreams.contaminationFlagsBloom(in, benchDocs,
        watermark = "1 hour", fpp = 1e-4)
    }
    val (flaggedBV, tConBV) = drive("contam_bloom_verify") { in =>
      graft.streaming.EventStreams.contaminationFlagsBloom(in, benchDocs,
        watermark = "1 hour", fpp = 1e-4, verifyAgainst = Some(shingles))
    }
    shingles.unpersist()

    def sec(t: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(t))
    def rate(t: Double) = String.format(java.util.Locale.ROOT, "%.0f", Double.box(n / t))
    println(
      s"""{"docs":$n,"suppress_sec":${sec(tSup)},"suppress_docs_per_sec":${rate(tSup)},""" +
        s""""suppress_kept":$kept,"bench_shingles":$nShingles,""" +
        s""""contam_sec":${sec(tCon)},"contam_docs_per_sec":${rate(tCon)},"contam_flagged":$flagged,""" +
        s""""contam_bloom_sec":${sec(tConB)},"contam_bloom_docs_per_sec":${rate(tConB)},"contam_bloom_flagged":$flaggedB,""" +
        s""""contam_bloom_verify_sec":${sec(tConBV)},"contam_bloom_verify_docs_per_sec":${rate(tConBV)},"contam_bloom_verify_flagged":$flaggedBV}""")
    spark.stop()
  }
}
