package graft.sources.dsv2

import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.model.{MoleculeRecord, Schemas}
import graft.sources.HttpPaginatedSource.{Cursor, Page}

/** DataSource V2 streaming source for cursor-paginated APIs — the
  * MicroBatchStream realization of the reference's fetch_pages loop
  * (/root/reference/src/open_molecule_data_pipeline/ingestion/
  * common.py:217-243), where the page cursor becomes a Spark streaming
  * offset and Structured Streaming's offset/commit logs provide the
  * exactly-once resume the reference approximates with JSON
  * checkpoint files.
  *
  * Usage:
  * {{{
  *   PagedStreamRegistry.register("mysrc", cursor => fetchPage(cursor))
  *   spark.readStream.format("graft.sources.dsv2.PagedSource")
  *     .option("pager", "mysrc").load()
  * }}}
  *
  * The pager runs on the driver (pagination is protocol-serial); each
  * fetched page's records are shipped inside the InputPartition, so
  * executors never need the pager — the source works identically in
  * cluster mode. `maxPagesPerBatch` bounds micro-batch size.
  */
object PagedStreamRegistry {
  private val pagers = new ConcurrentHashMap[String, Cursor => Page]()

  def register(name: String, pager: Cursor => Page): Unit = pagers.put(name, pager)

  private[dsv2] def pager(name: String): Cursor => Page = {
    val p = pagers.get(name)
    require(p != null, s"no pager registered under '$name'")
    p
  }
}

class PagedSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Schemas.molecule

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new PagedTable(properties.get("pager"),
      Option(properties.get("maxpagesperbatch")).map(_.toInt).getOrElse(10))
}

private class PagedTable(pagerName: String, maxPagesPerBatch: Int)
    extends Table with SupportsRead {
  override def name(): String = s"paged($pagerName)"
  override def schema(): StructType = Schemas.molecule
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = Schemas.molecule
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new PagedMicroBatchStream(pagerName, maxPagesPerBatch)
    }
}

/** Offset = (pages consumed, cursor that fetches the next page,
  * exhausted flag). Carrying the cursor makes the offset
  * self-describing: after a query restart the stream can replay an
  * uncommitted batch by re-walking the pager from the start offset's
  * cursor (cursor APIs are replayable by contract — the same property
  * the reference's JSON checkpoint resume relies on,
  * common.py:217-229), and a fresh instance fast-forwards its fetch
  * position to the recovered offset instead of re-ingesting from the
  * start cursor.
  */
private[graft] case class PageOffset(pageIndex: Long, cursor: Cursor, exhausted: Boolean)
    extends Offset {
  override def json(): String = {
    def q(s: String) = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val cur = cursor.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ", ", "}")
    s"""{"page": $pageIndex, "cursor": $cur, "exhausted": $exhausted}"""
  }
}

private[graft] object PageOffset {
  def fromJson(json: String): PageOffset = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    val cur = Option(node.get("cursor")).map { c =>
      val it = c.properties().iterator()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asText() }
      b.result()
    }.getOrElse(Map.empty[String, String])
    PageOffset(
      Option(node.get("page")).map(_.asLong()).getOrElse(
        throw new IllegalArgumentException(s"bad PagedSource offset: $json")),
      cur,
      Option(node.get("exhausted")).exists(_.asBoolean()))
  }
}

private[graft] class PagedMicroBatchStream(pagerName: String, maxPagesPerBatch: Int)
    extends MicroBatchStream {

  private val pager = PagedStreamRegistry.pager(pagerName)
  // driver-held buffer of fetched-but-uncommitted pages
  private val buffer = mutable.TreeMap.empty[Long, Seq[MoleculeRecord]]
  private var cursor: Cursor = Map.empty
  private var exhausted = false
  private var nextPage = 0L

  override def initialOffset(): Offset = PageOffset(0L, Map.empty, exhausted = false)

  override def deserializeOffset(json: String): Offset = {
    val off = PageOffset.fromJson(json)
    synchronized {
      // Restart fast-forward: an offset recovered from the log that is
      // ahead of everything this (fresh) instance has fetched moves the
      // live fetch position, so new batches continue from the recovered
      // cursor instead of duplicating from the start. During normal
      // operation every deserialized offset originated from this
      // instance's latestOffset, so pageIndex <= nextPage and this is a
      // no-op.
      if (off.pageIndex > nextPage && buffer.isEmpty) {
        nextPage = off.pageIndex
        cursor = off.cursor
        exhausted = off.exhausted
      }
    }
    off
  }

  override def latestOffset(): Offset = synchronized {
    var fetched = 0
    while (!exhausted && fetched < maxPagesPerBatch) {
      val page = pager(cursor)
      if (page.records.nonEmpty) {
        buffer(nextPage) = page.records
        nextPage += 1
      }
      fetched += 1
      page.nextCursor match {
        case Some(c) => cursor = c
        case None => exhausted = true
      }
    }
    PageOffset(nextPage, cursor, exhausted)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    synchronized {
      val s = start.asInstanceOf[PageOffset]
      val e = end.asInstanceOf[PageOffset]
      if ((s.pageIndex until e.pageIndex).exists(i => !buffer.contains(i)))
        replay(s, e) // restart: the uncommitted batch's pages are gone
      (s.pageIndex until e.pageIndex).map { i =>
        val recs = buffer.getOrElse(i, throw new IllegalStateException(
          s"page $i of [$s, $e) missing after cursor replay — refusing to " +
            "commit a silently-empty batch"))
        PageInputPartition(i, recs)
      }.toArray[InputPartition]
    }

  /** Rebuild pages [start.pageIndex, end.pageIndex) by re-walking the
    * pager from the start offset's cursor. Throws rather than planning
    * an empty batch if the pager cannot reproduce the range.
    */
  private def replay(start: PageOffset, end: PageOffset): Unit = {
    var c = start.cursor
    var idx = start.pageIndex
    var done = false
    while (idx < end.pageIndex && !done) {
      val page = pager(c)
      if (page.records.nonEmpty) {
        buffer(idx) = page.records
        idx += 1
      }
      page.nextCursor match {
        case Some(n) => c = n
        case None => done = true
      }
    }
    if (idx < end.pageIndex)
      throw new IllegalStateException(
        s"pager exhausted at page $idx while replaying to ${end.pageIndex} " +
          s"from cursor ${start.cursor} — source is not replayable")
  }

  override def createReaderFactory(): PartitionReaderFactory = PagedReaderFactory

  override def commit(end: Offset): Unit = synchronized {
    val e = end.asInstanceOf[PageOffset].pageIndex
    buffer.keys.takeWhile(_ < e).toSeq.foreach(buffer.remove)
  }

  override def stop(): Unit = ()
}

/** Records travel inside the partition — serializable, executor-safe. */
private case class PageInputPartition(pageIndex: Long, records: Seq[MoleculeRecord])
    extends InputPartition

private object PagedReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val recs = partition.asInstanceOf[PageInputPartition].records
    new PartitionReader[InternalRow] {
      private val it = recs.iterator
      private var current: MoleculeRecord = _
      override def next(): Boolean = { val h = it.hasNext; if (h) current = it.next(); h }
      override def get(): InternalRow = {
        import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
        val meta = current.metadata
        InternalRow(
          UTF8String.fromString(current.source),
          UTF8String.fromString(current.identifier),
          UTF8String.fromString(current.smiles),
          ArrayBasedMapData(
            meta.keys.map(k => UTF8String.fromString(k)).toArray[Any],
            meta.values.map(v => UTF8String.fromString(v)).toArray[Any]))
      }
      override def close(): Unit = ()
    }
  }
}
