package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.checkpoint.JobManifest
import graft.checkpoint.JobManifest.Checkpoint
import graft.model.MoleculeRecord
import graft.sinks.NdjsonSink

/** Cursor-paginated source (S4–S6, S18–S21): a driver-side fetch loop
  * feeding `spark.createDataset` per page, with checkpointed resume and
  * skip-completed short-circuit. Reference:
  * /root/reference/src/open_molecule_data_pipeline/ingestion/
  * common.py:176-243 (fetch/build/parse loop), chemspider.py (the
  * concrete config).
  *
  * The page fetcher is injected: `cursor => Page` — in production an
  * HTTP client with retry/backoff, in tests a canned sequence (the
  * reference uses the identical seam, client_factory injection in
  * runner.py:141-147). Zero-egress environments exercise the full
  * pagination/checkpoint/sink path with fake fetchers.
  *
  * Scale note: a paginated HTTP API is inherently a serial cursor walk
  * — the driver loop IS the maximal parallelism the protocol allows.
  * Each page's records are distributed immediately; heavy downstream
  * transforms run cluster-wide per page. A DataSource V2
  * MicroBatchStream (cursor-as-offset) is the streaming upgrade; this
  * batch loop keeps identical semantics and checkpoint format.
  */
object HttpPaginatedSource {

  type Cursor = Map[String, String]

  final case class Page(records: Seq[MoleculeRecord], nextCursor: Option[Cursor])

  final case class Result(pagesFetched: Int, recordsWritten: Long, completed: Boolean)

  /** Pull pages from `fetch` until exhausted, writing each page as a
    * numbered NDJSON batch and committing the checkpoint after the
    * write (atomic rename), resuming from any prior cursor.
    */
  def run(spark: SparkSession, sourceName: String,
      fetch: Cursor => Page,
      startCursor: Cursor,
      outDir: String, checkpointRoot: String,
      compress: Boolean = true,
      maxPages: Int = Int.MaxValue): Result = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration

    val existing = JobManifest.load(checkpointRoot, sourceName, conf)
    if (existing.exists(_.completed))
      return Result(0, 0, completed = true) // S21 short-circuit

    var cursor: Cursor = existing.map(_.cursor).getOrElse(startCursor)
    var batchIndex = existing.map(_.batchIndex).getOrElse(0)
    var pages = 0
    var written = 0L
    var done = false

    while (!done && pages < maxPages) {
      val page = fetch(cursor)
      if (page.records.nonEmpty) {
        val ds: Dataset[MoleculeRecord] = spark.createDataset(page.records)
        NdjsonSink.writeNumberedBatches(ds.toDF(), outDir, sourceName,
          batchSize = math.max(1, page.records.size), compress = compress,
          startBatch = batchIndex)
        batchIndex += 1
        written += page.records.size
      }
      pages += 1
      page.nextCursor match {
        case Some(next) =>
          cursor = next
          JobManifest.store(checkpointRoot, sourceName,
            Checkpoint(cursor, batchIndex, completed = false), conf)
        case None =>
          JobManifest.store(checkpointRoot, sourceName,
            Checkpoint(Map.empty, batchIndex, completed = true), conf)
          done = true
      }
    }
    Result(pages, written, done)
  }
}
