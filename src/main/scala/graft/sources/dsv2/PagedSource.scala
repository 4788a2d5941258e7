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

/** Offset = number of pages fully fetched (monotonic page index). */
private case class PageOffset(pageIndex: Long) extends Offset {
  override def json(): String = pageIndex.toString
}

private class PagedMicroBatchStream(pagerName: String, maxPagesPerBatch: Int)
    extends MicroBatchStream {

  private val pager = PagedStreamRegistry.pager(pagerName)
  // driver-held buffer of fetched-but-uncommitted pages
  private val buffer = mutable.TreeMap.empty[Long, Seq[MoleculeRecord]]
  private var cursor: Cursor = Map.empty
  private var exhausted = false
  private var nextPage = 0L

  override def initialOffset(): Offset = PageOffset(0L)

  override def deserializeOffset(json: String): Offset = PageOffset(json.toLong)

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
    PageOffset(nextPage)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    synchronized {
      val s = start.asInstanceOf[PageOffset].pageIndex
      val e = end.asInstanceOf[PageOffset].pageIndex
      (s until e).flatMap(i => buffer.get(i).map(PageInputPartition(i, _)))
        .toArray[InputPartition]
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
