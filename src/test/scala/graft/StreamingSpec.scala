package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.EventStreams

/** Structured Streaming semantics driven deterministically through
  * MemoryStream + processAllAvailable.
  */
class StreamingSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  test("tumbling window with watermark aggregates and drops late data") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = EventStreams.tumblingCounts(src.toDF(), "1 hour", "30 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("tumbling_out").start()

    src.addData(
      Ev(1, ts(5), 1, "click", 1.0), Ev(2, ts(20), 1, "click", 2.0),
      Ev(3, ts(65), 2, "view", 3.0),
      Ev(4, ts(200), 1, "click", 4.0)) // advances watermark past hour 0-1
    q.processAllAvailable()
    src.addData(Ev(5, ts(6), 1, "click", 99.0)) // late beyond watermark: dropped
    q.processAllAvailable()
    src.addData(Ev(6, ts(400), 1, "click", 1.0)) // flush remaining windows
    q.processAllAvailable()
    q.stop()

    val out = spark.table("tumbling_out")
      .select("window_start", "event_type", "n", "total_value")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    assert(out.contains(("2024-01-01 00:00:00.0", "click", 2L, 3.0)),
      s"late event must not inflate hour-0 window: ${out.mkString(", ")}")
    assert(out.exists(t => t._1 == "2024-01-01 01:00:00.0" && t._3 == 1L))
  }

  test("session windows split on gap") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = EventStreams.sessionAgg(src.toDF(), gap = "10 minutes", watermark = "5 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("session_out").start()
    src.addData(
      Ev(1, ts(0), 7, "click", 1.0), Ev(2, ts(5), 7, "click", 1.0),   // session A
      Ev(3, ts(30), 7, "click", 1.0),                                  // session B
      Ev(4, ts(300), 7, "click", 0.0))                                 // watermark flush
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table("session_out")
      .filter(col("n_events") > 0).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"))).toSeq.sorted
    assert(sessions.contains((7L, 2L)) && sessions.contains((7L, 1L)),
      s"expected a 2-event and a 1-event session: $sessions")
  }

  test("dropDuplicatesWithinWatermark removes re-delivered events") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = EventStreams.dedupWithinWatermark(src.toDF(), "1 hour")
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_out").start()
    src.addData(Ev(1, ts(0), 1, "click", 1.0), Ev(1, ts(1), 1, "click", 1.0),
      Ev(2, ts(2), 1, "view", 1.0))
    q.processAllAvailable()
    src.addData(Ev(1, ts(3), 1, "click", 1.0)) // duplicate within watermark
    q.processAllAvailable()
    q.stop()
    assert(spark.table("dedup_out").count() === 2)
  }

  test("streaming near-dup suppression keeps one doc per simhash within the watermark") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val src = MemoryStream[StreamingSpec.Doc]
    import StreamingSpec.Doc
    val q = EventStreams.nearDupSuppress(src.toDF(), "text", "ts", "1 hour")
      .writeStream.outputMode("append").format("memory")
      .queryName("neardup_out").start()
    val boiler = "standard footer text repeated on every single page of this site"
    src.addData(
      Doc(1, ts(0), boiler),
      Doc(2, ts(1), "a genuinely different document about joins and shuffles"))
    q.processAllAvailable()
    // identical boilerplate re-arrives in a later batch → suppressed by state
    src.addData(Doc(3, ts(2), boiler))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("neardup_out").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 2L), s"boilerplate re-arrival must be suppressed: $kept")
  }

  test("streaming contamination flags docs sharing shingles with the static benchmark") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import StreamingSpec.Doc
    val benchmark = Seq((100L, "the held out benchmark question about spark shuffles appears here"))
      .toDF("doc_id", "text")
    val src = MemoryStream[Doc]
    val q = EventStreams.contaminationFlags(src.toDF(), benchmark, watermark = "1 hour")
      .writeStream.outputMode("append").format("memory")
      .queryName("contam_out").start()
    src.addData(
      // contains the benchmark 4-gram "benchmark question about spark"
      Doc(1, ts(0), "prefix words then the held out benchmark question about spark shuffles leaked"),
      Doc(2, ts(1), "a clean document with entirely different content and no overlap"))
    q.processAllAvailable()
    // the same contaminated doc re-delivered → still one flag
    src.addData(Doc(1, ts(2), "prefix words then the held out benchmark question about spark shuffles leaked"))
    q.processAllAvailable()
    q.stop()
    val flagged = spark.table("contam_out").select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(flagged === Seq(1L), s"only the leaked doc is flagged, once: $flagged")

    // maxDriverShingles = Int.MaxValue means "no cap": the probe limit
    // must saturate instead of overflowing to a negative limit
    // (AnalysisException at construction) — ADVICE r5
    val uncapped = EventStreams.contaminationFlags(src.toDF(), benchmark,
      watermark = "1 hour", maxDriverShingles = Int.MaxValue)
    assert(uncapped.isStreaming)
  }

  test("streaming bloom decontamination: stateless prefilter, exact with verify, no broadcast in bloom-only plan") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import StreamingSpec.Doc
    val benchmark = Seq((100L, "the held out benchmark question about spark shuffles appears here"))
      .toDF("doc_id", "text")
    // bloom-only path: deterministic sketch, tiny fpp — same flags as
    // the exact form on this corpus (no false negatives by
    // construction; false positives would be stable, not flaky)
    val src = MemoryStream[Doc]
    val q = EventStreams.contaminationFlagsBloom(src.toDF(), benchmark,
      watermark = "1 hour", fpp = 1e-4)
      .writeStream.outputMode("append").format("memory")
      .queryName("bloom_contam_out").start()
    src.addData(
      Doc(1, ts(0), "prefix words then the held out benchmark question about spark shuffles leaked"),
      Doc(2, ts(1), "a clean document with entirely different content and no overlap"))
    q.processAllAvailable()
    src.addData(Doc(1, ts(2), "prefix words then the held out benchmark question about spark shuffles leaked"))
    q.processAllAvailable()
    q.stop()
    val flagged = spark.table("bloom_contam_out").select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(flagged === Seq(1L), s"bloom flags must match the exact form here: $flagged")

    // the bloom-only micro-batch plan is a stateless literal predicate:
    // no join anywhere before the watermark dedup (analyzed plan — a
    // streaming frame can't run the batch optimizer)
    val plan = EventStreams.contaminationFlagsBloom(src.toDF(), benchmark,
      watermark = "1 hour", fpp = 1e-4).queryExecution.analyzed.toString
    assert(plan.contains("might_contain"), s"expected might_contain in:\n$plan")
    assert(!plan.contains("Join"), s"bloom-only path must be join-free:\n$plan")

    // exact path: bloom prefilter + verify join reproduces the exact
    // operator's flags
    val real = EventStreams.benchmarkShingles(benchmark).persist()
    try {
      val q2 = EventStreams.contaminationFlagsBloom(src.toDF(), benchmark,
        watermark = "1 hour", fpp = 1e-4, verifyAgainst = Some(real))
        .writeStream.outputMode("append").format("memory")
        .queryName("bloom_contam_exact_out").start()
      src.addData(
        Doc(7, ts(3), "another leak of the held out benchmark question about spark shuffles"),
        Doc(8, ts(4), "still clean and still entirely unrelated prose"))
      q2.processAllAvailable()
      q2.stop()
      // q2 starts after the earlier batches were consumed, so it sees
      // only docs 7 (leaked) and 8 (clean)
      val exact = spark.table("bloom_contam_exact_out").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(exact === Set(7L), s"verified flags: $exact")
    } finally real.unpersist()

    // empty benchmark → constructs a streaming frame that flags nothing
    val none = EventStreams.contaminationFlagsBloom(src.toDF(),
      benchmark.filter(col("doc_id") < 0), watermark = "1 hour")
    assert(none.isStreaming)
  }

  test("cursor machine keeps per-user monotonic state across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val src = MemoryStream[EventStreams.UserEvent]
    val q = EventStreams.cursorMachine(src.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("cursor_out").start()
    src.addData(EventStreams.UserEvent(1, 10, 1.0), EventStreams.UserEvent(1, 11, 2.0))
    q.processAllAvailable()
    src.addData(EventStreams.UserEvent(1, 11, 99.0), EventStreams.UserEvent(1, 12, 3.0))
    q.processAllAvailable()
    q.stop()
    val updates = spark.table("cursor_out")
      .orderBy("last_event_id").collect()
      .map(r => (r.getAs[Long]("last_event_id"), r.getAs[Double]("running_value"), r.getAs[Long]("n_events")))
    assert(updates.last === ((12L, 6.0, 3L)),
      s"replayed event 11 must be ignored by the cursor: ${updates.mkString(", ")}")
  }

  test("transformWithState cursor machine matches fMGWS semantics (RocksDB store)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val src = MemoryStream[EventStreams.UserEvent]
      val q = EventStreams.cursorMachineTws(src.toDS())
        .writeStream.outputMode("append").format("memory")
        .queryName("tws_out").start()
      src.addData(EventStreams.UserEvent(5, 10, 1.0), EventStreams.UserEvent(5, 11, 2.0))
      q.processAllAvailable()
      src.addData(EventStreams.UserEvent(5, 11, 99.0), EventStreams.UserEvent(5, 12, 3.0))
      q.processAllAvailable()
      q.stop()
      val updates = spark.table("tws_out").orderBy("last_event_id").collect()
        .map(r => (r.getAs[Long]("last_event_id"), r.getAs[Double]("running_value"), r.getAs[Long]("n_events")))
      assert(updates.last === ((12L, 6.0, 3L)), updates.mkString(", "))
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("trending terms: closed-window counts match batch, read-side top-k ranks deterministically") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val src = MemoryStream[(Timestamp, String)]
    val dir = tmpDir("trend")
    val q = EventStreams
      .trendingTermsStream(src.toDS().toDF("ts", "text"), "ts", "text",
        window_ = "10 minutes", watermark = "0 seconds")
      .writeStream.outputMode("append").format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/cp")
      .start()
    try {
      src.addData((ts(0), "spark spark flink"), (ts(5), "spark duck"))
      q.processAllAvailable()
      // watermark pusher closes the first window
      src.addData((ts(25), "later words"))
      q.processAllAvailable()
      src.addData((ts(35), "tail"))
      q.processAllAvailable()
    } finally q.stop()
    val landed = spark.read.parquet(s"$dir/out")
    val w0 = EventStreams.topTermsPerWindow(landed, k = 2)
      .filter(col("window_start") === ts(0))
      .select("term", "n", "rank").as[(String, Long, Long)].collect().toSeq
    // window [0,10): spark×3, duck×1, flink×1 → top-2 = spark, duck (tie → term order)
    assert(w0 == Seq(("spark", 3L, 1L), ("duck", 1L, 2L)), s"got $w0")
  }

  test("TTL cursor machine: live state dedups replays, expired state restarts the cursor") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // Trigger.Once (not the default continuous trigger, and not
      // AvailableNow): a ProcessingTime-mode TWS query free-spins
      // no-data micro-batches — shouldRunAnotherBatch is true whenever
      // processing time advances, each spin pays a RocksDB snapshot
      // commit, and BOTH processAllAvailable and AvailableNow defer to
      // it, so neither ever settles (measured: 700 s and climbing /
      // batchId 548 at zero input rows). Trigger.Once runs exactly one
      // micro-batch and stops; the SAME MemoryStream + checkpoint
      // resumes across runs, and the TTL lapses on the wall clock
      // between them — the production rerun shape.
      def runWave(src: MemoryStream[EventStreams.UserEvent], ttl: java.time.Duration,
          dir: String): Unit = {
        val q = EventStreams.cursorMachineTwsTtl(src.toDS(), ttl)
          .writeStream.outputMode("append").format("parquet")
          .option("path", s"$dir/out").option("checkpointLocation", s"$dir/cp")
          .trigger(Trigger.Once()).start(): @annotation.nowarn("cat=deprecation")
        assert(q.awaitTermination(120000), "single-batch run must terminate")
      }
      def rowsOf(dir: String): Seq[(Long, Double, Long)] =
        spark.read.parquet(s"$dir/out").collect().toSeq
          .map(r => (r.getAs[Long]("last_event_id"),
            r.getAs[Double]("running_value"), r.getAs[Long]("n_events")))

      // long TTL: behaves exactly like cursorMachineTws — the replay of
      // event 11 inside the TTL window is suppressed by live state
      val src1 = MemoryStream[EventStreams.UserEvent]
      val d1 = tmpDir("ttl_long")
      src1.addData(EventStreams.UserEvent(7, 10, 1.0), EventStreams.UserEvent(7, 11, 2.0))
      runWave(src1, java.time.Duration.ofHours(1), d1)
      src1.addData(EventStreams.UserEvent(7, 11, 99.0), EventStreams.UserEvent(7, 12, 3.0))
      runWave(src1, java.time.Duration.ofHours(1), d1)
      assert(rowsOf(d1).contains((12L, 6.0, 3L)),
        s"live state must suppress the event-11 replay: ${rowsOf(d1)}")

      // tiny TTL + wall-clock gap: the state store evicts the cursor, so
      // an OLDER event id after expiry restarts counting from scratch —
      // the bounded-state trade documented on TtlCursorProcessor
      val src2 = MemoryStream[EventStreams.UserEvent]
      val d2 = tmpDir("ttl_short")
      src2.addData(EventStreams.UserEvent(8, 10, 1.0), EventStreams.UserEvent(8, 11, 2.0))
      runWave(src2, java.time.Duration.ofMillis(50), d2)
      Thread.sleep(500) // let the 50 ms TTL lapse in processing time
      src2.addData(EventStreams.UserEvent(8, 5, 4.0))
      runWave(src2, java.time.Duration.ofMillis(50), d2)
      assert(rowsOf(d2).contains((5L, 4.0, 1L)),
        s"expired cursor must restart (event 5 re-counted): ${rowsOf(d2)}")
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("near-dup suppression state survives a query restart (checkpoint recovery)") {
    import spark.implicits._
    val in = tmpDir("nd_in")
    val out = tmpDir("nd_out")
    val cp = tmpDir("nd_cp")
    val boiler = "standard footer boilerplate repeated on every page of the site"
    val schema = "doc_id LONG, ts TIMESTAMP, text STRING"
    def write(rows: (Long, Int, String)*): Unit =
      rows.map { case (id, m, t) => (id, ts(m), t) }.toDF("doc_id", "ts", "text")
        .write.mode("append").parquet(in)
    def runOnce(): Unit = {
      val q = EventStreams.nearDupSuppress(
          spark.readStream.schema(schema).parquet(in), "text", "ts", "2 hours")
        .writeStream.format("json")
        .option("path", out).option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }
    write((1L, 0, boiler), (2L, 1, "a different document about joins"))
    runOnce()
    // the boiler re-arrives AFTER a full stop/restart: only the
    // checkpoint-restored dedup state can suppress it
    write((3L, 2, boiler), (4L, 3, "a third genuinely new document"))
    runOnce()
    val kept = spark.read.json(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 2L, 4L),
      s"restored state must suppress the re-arrived boilerplate: $kept")
  }

  test("file sink + checkpoint: restart does not duplicate output (exactly-once)") {
    val batch = graft.engine.Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "event_type", "value")
    val in = tmpDir("eo_in")
    batch.write.mode("overwrite").parquet(in)
    val out = tmpDir("eo_out")
    val cp = tmpDir("eo_cp")
    def runOnce(): Unit = {
      val q = spark.readStream.schema(batch.schema).parquet(in)
        .writeStream.format("json")
        .option("path", out).option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }
    runOnce()
    val n1 = spark.read.json(out).count()
    assert(n1 === batch.count())
    runOnce() // restart with same checkpoint: no new input → no new rows
    val n2 = spark.read.json(out).count()
    assert(n2 === n1, "restart from the commit log must not re-emit batches")
  }

  test("file-stream AvailableNow over parquet events matches batch aggregation") {
    val dir = "/root/testdata/sf0.001"
    val batch = graft.engine.Tables.events(spark, dir)
    val expected = batch.groupBy(date_trunc("hour", col("ts")).as("h"))
      .count().collect().map(r => (r.getTimestamp(0).toString, r.getLong(1))).toMap

    val cp = tmpDir("stream_cp")
    // write the batch out as the stream input (ts already micros)
    val in = tmpDir("stream_in")
    batch.write.mode("overwrite").parquet(in)
    val q = spark.readStream.schema(batch.schema).parquet(in)
      .groupBy(date_trunc("hour", col("ts")).as("h")).count()
      .writeStream.outputMode("complete").format("memory")
      .queryName("file_stream_out")
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("file_stream_out").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1))).toMap
    assert(got === expected)
  }

  test("streaming incremental dedup drops catalog-seen and stream-repeated content") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import StreamingSpec.Doc
    val catalog = Seq("already ingested yesterday").toDF("text")
      .select(unhex(md5(col("text"))).as("digest"))
    val src = MemoryStream[Doc]
    val q = EventStreams.incrementalDedupStream(src.toDF(), catalog, watermark = "1 hour")
      .writeStream.outputMode("append").format("memory")
      .queryName("incdedup_out").start()
    src.addData(
      Doc(1, ts(0), "already ingested yesterday"),  // in catalog → dropped
      Doc(2, ts(1), "brand new document"),          // kept
      Doc(3, ts(2), "brand new document"))          // in-batch repeat → dropped
    q.processAllAvailable()
    src.addData(Doc(4, ts(3), "brand new document"), // cross-batch repeat → state drop
      Doc(5, ts(4), "another fresh one"))            // kept
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("incdedup_out").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L, 5L), s"expected only first-seen fresh docs, got $kept")
  }

  test("bloom-routed incremental dedup stays exact and disjoint across branches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import StreamingSpec.Doc
    val catTexts = Seq("already ingested yesterday", "old boilerplate page")
    val catalog = catTexts.toDF("text").select(unhex(md5(col("text"))).as("digest"))
    val bloom = graft.operators.Decontaminate
      .buildBloom(catalog, "digest", expectedItems = 2, fpp = 0.01)
    assert(bloom.nonEmpty)
    val src = MemoryStream[Doc]
    val q = EventStreams.incrementalDedupStream(src.toDF(), catalog,
        watermark = "1 hour", bloom = bloom)
      .writeStream.outputMode("append").format("memory")
      .queryName("incdedup_bloom_out").start()
    src.addData(
      Doc(1, ts(0), "already ingested yesterday"), // catalog hit via bloom branch
      Doc(2, ts(1), "old boilerplate page"),       // catalog hit via bloom branch
      Doc(3, ts(2), "brand new document"),         // kept (bloom-negative fast path)
      Doc(4, ts(3), "brand new document"))         // in-stream repeat → dropped
    q.processAllAvailable()
    src.addData(Doc(5, ts(4), "brand new document")) // cross-batch repeat → dropped
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("incdedup_bloom_out").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(3L), s"bloom routing must not change exact-dedup output: $kept")
  }

  test("bloom routing keeps a null-text doc exactly like the non-bloom path") {
    // null text → null digest → might_contain is NULL; a bare
    // filter(p)/filter(!p) pair would drop the doc from BOTH branches,
    // while the non-bloom path keeps one per window (null keys never
    // match a left-anti join). The coalesce routing must make the two
    // paths agree: exactly one null-text survivor per window in each.
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import StreamingSpec.Doc
    val catalog = Seq("already ingested yesterday").toDF("text")
      .select(unhex(md5(col("text"))).as("digest"))
    val bloom = graft.operators.Decontaminate
      .buildBloom(catalog, "digest", expectedItems = 2, fpp = 0.01)
    for ((blm, out) <- Seq(
        (Option.empty[Array[Byte]], "incdedup_null_plain"),
        (bloom, "incdedup_null_bloom"))) {
      val src = MemoryStream[Doc]
      val q = EventStreams.incrementalDedupStream(src.toDF(), catalog,
          watermark = "1 hour", bloom = blm)
        .writeStream.outputMode("append").format("memory")
        .queryName(out).start()
      src.addData(
        Doc(1, ts(0), null),                 // null text → kept (first null digest)
        Doc(2, ts(1), null),                 // in-batch null repeat → dropped
        Doc(3, ts(2), "brand new document")) // kept
      q.processAllAvailable()
      q.stop()
      val kept = spark.table(out).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept === Set(1L, 3L),
        s"$out: null-text docs must survive dedup identically in both paths: $kept")
    }
  }
}

object StreamingSpec {
  final case class Doc(doc_id: Long, ts: java.sql.Timestamp, text: String)
}
