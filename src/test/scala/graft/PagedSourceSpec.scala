package graft

import org.apache.spark.sql.streaming.Trigger

import graft.model.MoleculeRecord
import graft.sources.HttpPaginatedSource.Page
import graft.sources.dsv2.{PagedMicroBatchStream, PagedStreamRegistry, PageOffset}

/** DSv2 MicroBatchStream: cursor pagination as streaming offsets. */
class PagedSourceSpec extends SparkSpec {

  test("paged DSv2 source streams all pages exactly once through micro-batches") {
    def rec(i: Int) = MoleculeRecord("api", s"id$i", "C" * (i + 1), Map("page" -> s"${i / 2}"))
    var fetches = 0
    PagedStreamRegistry.register("spec-pager", { cursor =>
      fetches += 1
      val pageNo = cursor.get("p").map(_.toInt).getOrElse(0)
      val recs = Seq(rec(pageNo * 2), rec(pageNo * 2 + 1))
      if (pageNo < 2) Page(recs, Some(Map("p" -> (pageNo + 1).toString)))
      else Page(recs, None)
    })

    val cp = tmpDir("dsv2_cp")
    val q = spark.readStream
      .format("graft.sources.dsv2.PagedSource")
      .option("pager", "spec-pager")
      .option("maxPagesPerBatch", "2")
      .load()
      .writeStream.outputMode("append").format("memory")
      .queryName("paged_out")
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)

    val rows = spark.table("paged_out").collect()
    assert(rows.length === 6, s"3 pages x 2 records, got ${rows.length}")
    assert(rows.map(_.getString(1)).sorted.toSeq ===
      (0 to 5).map(i => s"id$i").sorted)
    assert(rows.forall(_.getString(0) === "api"))
    val meta = rows.find(_.getString(1) == "id4").get.getMap[String, String](3)
    assert(meta("page") === "2")
    assert(fetches === 3, s"each page fetched exactly once, got $fetches")
  }

  test("restart replays the uncommitted batch from the offset's cursor — no silent loss") {
    def pager(cursor: Map[String, String]): Page = {
      val p = cursor.get("p").map(_.toInt).getOrElse(0)
      val recs = Seq(MoleculeRecord("api", s"id$p", "C" * (p + 1), Map.empty))
      if (p < 3) Page(recs, Some(Map("p" -> (p + 1).toString)))
      else Page(recs, None)
    }
    PagedStreamRegistry.register("restart-pager", pager)

    // instance A fetches two pages, writes the offset log... and "crashes"
    // before the batch executes
    val a = new PagedMicroBatchStream("restart-pager", 2)
    val startJson = a.initialOffset().json()
    val endJson = a.latestOffset().json()
    assert(PageOffset.fromJson(endJson) ===
      PageOffset(2, Map("p" -> "2"), exhausted = false), "cursor travels in the offset")

    // instance B = the restarted query: fresh buffer, recovered offsets
    val b = new PagedMicroBatchStream("restart-pager", 2)
    val s = b.deserializeOffset(startJson)
    val e = b.deserializeOffset(endJson)
    val parts = b.planInputPartitions(s, e)
    assert(parts.length === 2, "uncommitted batch re-fetched, not silently dropped")

    // and new batches continue from the recovered cursor (pages 2..3),
    // not from the beginning
    val e2 = b.latestOffset()
    val parts2 = b.planInputPartitions(e, e2)
    assert(PageOffset.fromJson(e2.json()).exhausted)
    assert(parts2.length === 2)
  }

  test("non-replayable pager fails the restarted batch loudly instead of committing empty") {
    // a pager whose state is consumed: yields one page ever, then exhausts
    var remaining = List(Page(Seq(MoleculeRecord("api", "id0", "C", Map.empty)),
      Some(Map("p" -> "1"))))
    PagedStreamRegistry.register("oneshot-pager", { _ =>
      remaining match {
        case h :: t => remaining = t; h
        case Nil => Page(Nil, None)
      }
    })
    val a = new PagedMicroBatchStream("oneshot-pager", 1)
    val startJson = a.initialOffset().json()
    val endJson = a.latestOffset().json()
    val b = new PagedMicroBatchStream("oneshot-pager", 1)
    val s = b.deserializeOffset(startJson)
    val e = b.deserializeOffset(endJson)
    assertThrows[IllegalStateException](b.planInputPartitions(s, e))
  }
}
