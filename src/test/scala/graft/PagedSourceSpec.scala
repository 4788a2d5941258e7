package graft

import org.apache.spark.sql.streaming.Trigger

import graft.model.MoleculeRecord
import graft.sources.HttpPaginatedSource.Page
import graft.sources.dsv2.PagedStreamRegistry

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
}
