package graft.sinks

import java.util.zip.GZIPOutputStream

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{ceil, count, lit}

/** NDJSON sink with reference-parity batch-file naming (S22):
  * `<out>/<source>/<source>-batch-NNNNNN.jsonl[.gz]`, one JSON doc per
  * line, UTF-8, ~`batchSize` records per file. Reference:
  * /root/reference/src/open_molecule_data_pipeline/ingestion/
  * common.py:251-276.
  *
  * Two modes:
  *  - [[write]] — the idiomatic sink: `df.write.json` with gzip, which
  *    at 100 TB is what you want (task-parallel commit protocol,
  *    `maxRecordsPerFile` bounding file sizes, no driver involvement).
  *  - [[writeNumberedBatches]] — exact filename parity: repartitions to
  *    ⌈rows/batchSize⌉ partitions and each task streams its partition
  *    to one numbered gzip file via the Hadoop FS API (works on any
  *    Hadoop-compatible FS). One `count()` action to size partitions —
  *    the same single extra pass the reference spends maintaining its
  *    batch counter.
  */
object NdjsonSink {

  /** Idiomatic NDJSON write (gzip), batch size bounded per file. */
  def write(df: DataFrame, outDir: String, compress: Boolean = true,
      maxRecordsPerFile: Long = 100000): Unit = {
    val w = df.write.mode("append")
      .option("maxRecordsPerFile", maxRecordsPerFile)
    (if (compress) w.option("compression", "gzip") else w).json(outDir)
  }

  final case class BatchWriteResult(batches: Long, records: Long)

  /** Reference-parity numbered batch files. One count() action sizes
    * the partitioning and doubles as the record metric (callers must
    * not re-count — at 100 TB every extra pass is a full scan).
    */
  def writeNumberedBatches(df: DataFrame, outDir: String, source: String,
      batchSize: Int, compress: Boolean = true, startBatch: Int = 0): BatchWriteResult = {
    val spark = df.sparkSession
    val total = df.count()
    if (total == 0) return BatchWriteResult(0L, 0L)
    val nBatches = math.max(1, math.ceil(total.toDouble / batchSize).toInt)
    val json = df.toJSON.repartition(nBatches)
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val suffix = if (compress) ".jsonl.gz" else ".jsonl"
    json.rdd.foreachPartition { it =>
      if (it.hasNext) {
        val batchIdx = startBatch + TaskContext.get().partitionId() + 1
        val path = new Path(f"$outDir/$source/$source-batch-$batchIdx%06d$suffix")
        val fs = FileSystem.get(path.toUri, conf.value)
        val raw = fs.create(path, true)
        val out = if (compress) new GZIPOutputStream(raw) else raw
        val writer = new java.io.BufferedWriter(
          new java.io.OutputStreamWriter(out, java.nio.charset.StandardCharsets.UTF_8))
        try it.foreach { line => writer.write(line); writer.write('\n') }
        finally writer.close()
      }
    }
    BatchWriteResult(nBatches.toLong, total)
  }
}
