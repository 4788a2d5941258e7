package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-static and stream-stream (watermarked interval) joins —
  * the remaining §2C streaming rows.
  */
class StreamJoinSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  case class Click(user_id: Long, ts: Timestamp)
  case class Buy(user_id: Long, ts: Timestamp, amount: Double)

  test("stream-static join enriches events with a dimension table") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val src = MemoryStream[Click]
    val q = src.toDF().join(dim, Seq("user_id"), "left")
      .writeStream.outputMode("append").format("memory")
      .queryName("ss_join_out").start()
    src.addData(Click(1, ts(0)), Click(2, ts(1)), Click(9, ts(2)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ss_join_out").collect()
      .map(r => (r.getLong(0), Option(r.getString(2)).getOrElse("none"))).sorted
    assert(got.toSeq === Seq((1L, "gold"), (2L, "silver"), (9L, "none")))
  }

  test("stream-stream interval join matches purchases to recent clicks") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[Click]
    val buys = MemoryStream[Buy]
    val c = clicks.toDF().withWatermark("ts", "10 minutes").as("c")
    val b = buys.toDF().withColumnRenamed("ts", "bts")
      .withWatermark("bts", "10 minutes").as("b")
    val joined = c.join(b,
      expr("""c.user_id = b.user_id AND
              bts BETWEEN c.ts AND c.ts + INTERVAL 15 minutes"""))
      .select(col("c.user_id"), col("c.ts").as("click_ts"),
        col("bts").as("buy_ts"), col("amount"))
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("interval_join_out").start()

    clicks.addData(Click(1, ts(0)), Click(2, ts(5)))
    buys.addData(Buy(1, ts(10), 9.99),   // within 15 min of click → match
      Buy(2, ts(50), 5.0))               // 45 min later → no match
    q.processAllAvailable()
    clicks.addData(Click(3, ts(55)))     // advance watermarks
    buys.addData(Buy(3, ts(56), 1.0))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("interval_join_out").collect()
      .map(r => (r.getLong(0), r.getDouble(3))).sorted
    assert(got.contains((1L, 9.99)))
    assert(!got.map(_._1).contains(2L), s"out-of-interval purchase must not join: ${got.toSeq}")
  }
}
