package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.streaming.EventStreams

/** Streaming incremental near-dup: the q124 band-store probe run per
  * micro-batch via foreachBatch, with the persisted store as the only
  * cross-batch state. The headline test pins the streamed result
  * against a BATCH-SEQUENTIAL replay of the same rule built from
  * `Dedup.incrementalNearDupCandidates` — the "cross-batch suppression
  * equals the batch q124 result" contract.
  */
class NearDupStreamSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val dir = new java.io.File(wh, name)
    if (dir.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  // distinct filler texts long enough to shingle (shingleSize = 3)
  private def mkText(i: Int): String = {
    val words = Seq("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima", "mike")
    val rnd = new scala.util.Random(i)
    (0 until 14).map(_ => words(rnd.nextInt(words.length))).mkString(" ")
  }

  /** The operator's declared suppression rule applied in BATCH form:
    * candidates vs the kept corpus (inline q124 probe), suppress id2
    * when it is a batch member, else id1. Returns (admitted, kept').
    */
  private def batchReplayStep(kept: DataFrame, batch: DataFrame): DataFrame = {
    val cand = Dedup.incrementalNearDupCandidates(kept, batch,
      "doc_id", "text", bands = 8, rowsPerBand = 4)
    val bid = batch.select(col("doc_id").as("bid")).distinct()
    val suppressed = cand
      .join(bid.select(col("bid").as("id2"), lit(true).as("b2")), Seq("id2"), "left")
      .select(when(coalesce(col("b2"), lit(false)), col("id2"))
        .otherwise(col("id1")).as("sid"))
      .distinct()
    batch.join(suppressed, batch("doc_id") === suppressed("sid"), "left_anti")
  }

  test("streamed suppression equals a batch-sequential q124 replay, store tracks the kept corpus") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import StreamingSpec.Doc

    val catalog = (0L until 20L).map(i => (i, mkText(i.toInt)))
      .toDF("doc_id", "text")
    val table = "neardup_stream_store"
    dropTable(table)
    Dedup.writeBandStore(catalog, "doc_id", "text", table,
      bands = 8, rowsPerBand = 4, buckets = 8)

    val outDir = tmpDir("neardup_out")
    val ckpt = tmpDir("neardup_ckpt")
    val src = MemoryStream[Doc]
    val q = EventStreams.incrementalNearDupStream(src.toDF(), table, outDir,
        bands = 8, rowsPerBand = 4, buckets = 8)
      .option("checkpointLocation", ckpt).start()

    // batch 1: 1001 duplicates catalog doc 0 → suppressed vs store;
    // 1002 fresh → admitted; 1003 duplicates 1002 (same batch, larger
    // id) → suppressed; 1004 fresh → admitted
    val b1 = Seq(
      Doc(1001L, ts(1), mkText(0)),
      Doc(1002L, ts(1), "completely novel first streaming document body"),
      Doc(1003L, ts(2), "completely novel first streaming document body"),
      Doc(1004L, ts(2), "another novel streaming document arriving now"))
    src.addData(b1: _*)
    q.processAllAvailable()

    // batch 2: 2001 duplicates ADMITTED 1002 → suppressed via the
    // store append (cross-batch); 2002 fresh → admitted
    val b2 = Seq(
      Doc(2001L, ts(3), "completely novel first streaming document body"),
      Doc(2002L, ts(3), "a third novel streaming document distinct again"))
    src.addData(b2: _*)
    q.processAllAvailable()
    q.stop()

    val landed = spark.read.parquet(outDir)
    val admitted = landed.select("doc_id").as[Long].collect().toSet
    assert(admitted === Set(1002L, 1004L, 2002L), s"streamed admits: $admitted")
    // provenance: the per-batch landing dirs surface as a batch_id column
    assert(landed.columns.contains("batch_id"))

    // --- batch-sequential replay of the SAME rule via the inline q124
    // probe: streamed result must match exactly
    var kept: DataFrame = catalog
    var replayAdmitted = Set.empty[Long]
    for (b <- Seq(b1, b2)) {
      val bdf = b.toDF().select(col("doc_id"), col("text"))
      val adm = batchReplayStep(kept, bdf)
      replayAdmitted ++= adm.select("doc_id").as[Long].collect()
      kept = kept.unionByName(adm)
    }
    assert(admitted === replayAdmitted,
      s"streamed $admitted != batch-sequential replay $replayAdmitted")

    // the store holds band keys for catalog + admitted only (keeper
    // semantics: suppressed docs never feed the store)
    val storeIds = spark.table(table).select("id").as[Long].collect().toSet
    assert(storeIds === (0L until 20L).toSet ++ Set(1002L, 1004L, 2002L))
    dropTable(table)
  }

  test("streaming index-drift monitor: clean embeddings stay quiet, shifted ones alert") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import NearDupStreamSpec.Vec
    val emb = graft.engine.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .filter(col("vec_id") =!= 0)
    val idx = graft.operators.Pq.trainIvfPq(emb, ncells = 4, m = 8, ksub = 16)
    // catalog baseline per cell (avg_err_cat over the training corpus)
    val baseline = graft.operators.Pq.ivfPqDriftStats(emb, emb.limit(0), idx)
      .collect().map(r => r.getLong(0).toInt -> r.getLong(3)).toMap
    val base = (0 until 4).map(c => baseline(c))

    val rows = emb.select("embedding").as[Seq[Float]].take(20)
    val src = MemoryStream[Vec]
    val q = EventStreams.indexDriftStream(src.toDF(), idx, base,
        window_ = "1 hour", watermark = "30 minutes", alertPct = 150)
      .writeStream.outputMode("append").format("memory")
      .queryName("drift_out").start()
    // hour 0: in-distribution vectors; hour 1: the same vectors scaled
    // 3x — residuals blow up against the frozen codebooks
    src.addData(rows.zipWithIndex.map { case (v, i) => Vec(i.toLong, ts(i % 50), v) }: _*)
    src.addData(rows.zipWithIndex.map { case (v, i) =>
      Vec(100L + i, ts(65 + i % 50), v.map(_ * 3.0f)) }: _*)
    q.processAllAvailable()
    src.addData(Vec(999L, ts(400), rows.head)) // advance watermark, flush windows
    q.processAllAvailable()
    q.stop()

    val out = spark.table("drift_out")
      .select(col("window.start").cast("string").as("w"), col("cell"),
        col("n"), col("avg_err"), col("alert"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    val hour0 = out.filter(_._1.startsWith("2024-01-01 00"))
    val hour1 = out.filter(_._1.startsWith("2024-01-01 01"))
    assert(hour0.nonEmpty && hour1.nonEmpty, s"both windows must flush: ${out.mkString(", ")}")
    assert(hour0.forall(!_._5), s"in-distribution hour must not alert: ${hour0.mkString(", ")}")
    assert(hour1.exists(_._5), s"shifted hour must alert somewhere: ${hour1.mkString(", ")}")
    assert(hour0.map(_._3).sum === 20L && hour1.map(_._3).sum === 20L)
  }

  test("compactBandStore removes replayed duplicates and preserves the probe result") {
    import spark.implicits._
    val catalog = (0L until 30L).map(i => (i, mkText(i.toInt)))
      .toDF("doc_id", "text")
    val delta = Seq((9001L, mkText(0)), (9002L, "some novel text body going past"))
      .toDF("doc_id", "text")
    val table = "neardup_compact_store"
    dropTable(table); dropTable(s"${table}__compact")
    Dedup.writeBandStore(catalog, "doc_id", "text", table,
      bands = 8, rowsPerBand = 4, buckets = 8)
    val clean = spark.table(table).count()
    // simulate an at-least-once replayed append: same rows twice
    val extra = catalog.filter(col("doc_id") < 5)
    Dedup.appendToBandStore(extra, "doc_id", "text", table,
      bands = 8, rowsPerBand = 4, buckets = 8)
    Dedup.appendToBandStore(extra, "doc_id", "text", table,
      bands = 8, rowsPerBand = 4, buckets = 8)
    assert(spark.table(table).count() > clean)

    Dedup.compactBandStore(spark, table, buckets = 8)
    assert(spark.table(table).count() === clean,
      "distinct rewrite must restore the clean row count")
    // layout preserved: still bucketed on band_key
    val cat = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
    assert(cat.bucketSpec.exists(b =>
      b.numBuckets === 8 && b.bucketColumnNames === Seq("band_key")))
    // probe after compaction == inline recompute
    val stored = Dedup.incrementalNearDupCandidatesVsStore(spark, table, delta,
        "doc_id", "text", bands = 8, rowsPerBand = 4)
      .orderBy("id1", "id2").collect().toSeq
    val inline = Dedup.incrementalNearDupCandidates(catalog, delta,
        "doc_id", "text", bands = 8, rowsPerBand = 4)
      .orderBy("id1", "id2").collect().toSeq
    assert(stored.nonEmpty && stored === inline)
    dropTable(table)
  }

  test("winnowAdmitStream: per-wave pairs equal the as-of cross probe, store equals batch winnow of the union") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import StreamingSpec.Doc
    val table = "winnow_stream_store"
    dropTable(table)
    val pairsDir = tmpDir("winnow_pairs")
    val src = MemoryStream[Doc]
    val q = EventStreams.winnowAdmitStream(src.toDF(), table, pairsDir,
        k = 4, w = 4, buckets = 4, minShared = 1, maxDf = 8)
      .option("checkpointLocation", tmpDir("winnow_ckpt")).start()
    val base =
      "the winnow scheme selects minimum digests from sliding windows reliably"
    val b1 = Seq(
      Doc(1L, ts(1), base),
      Doc(2L, ts(1), "completely different content about spark partitions and shuffles"))
    val b2 = Seq(
      Doc(11L, ts(2), s"prefix edit $base"), // near-dup of wave-0 doc 1
      Doc(12L, ts(2), "nothing in common with anything else in this corpus"))
    try {
      src.addData(b1: _*); q.processAllAvailable()
      src.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    // wave 0 probes an empty world; wave 1 finds its planted catalog twin
    assert(spark.read.parquet(s"$pairsDir/batch_id=0").count() == 0L)
    val p1 = spark.read.parquet(s"$pairsDir/batch_id=1")
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(p1 == Set((1L, 11L)))
    // streamed store == one-shot batch winnow of the union
    val streamed = spark.table(table).select($"doc_id", lower(hex($"dg")))
      .as[(Long, String)].collect().toSet
    val direct = graft.operators.TextOps.winnowedFingerprints(
        (b1 ++ b2).map(d => (d.doc_id, d.text)).toDF("doc_id", "text"),
        "doc_id", "text", k = 4, w = 4)
      .select($"doc_id", lower(hex($"dg"))).distinct().as[(Long, String)].collect().toSet
    assert(streamed == direct)
    // a replayed wave-1 probe (as-of wave 0 — the self wave is
    // excluded even though it already landed) reproduces its pairs
    val again = graft.operators.TextOps.winnowedCrossPairs(
        graft.operators.Stores.asOf(spark, table, 0L),
        graft.operators.TextOps.winnowedFingerprints(
          b2.map(d => (d.doc_id, d.text)).toDF("doc_id", "text"),
          "doc_id", "text", k = 4, w = 4),
        minShared = 1, maxDf = 8)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(again == p1)
    dropTable(table)
  }

  test("curatedAdmitStream: url dedup + repetition strip front the admission; ≡ batch-sequential replay") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import NearDupStreamSpec.CuratedDoc
    import graft.operators.{Stores, TextOps}
    val canonT = "curated_canon_store"; val winnowT = "curated_winnow_store"
    dropTable(canonT); dropTable(winnowT)
    val pairsDir = tmpDir("curated_pairs")
    val src = MemoryStream[CuratedDoc]
    val q = EventStreams.curatedAdmitStream(src.toDF(), canonT, winnowT,
        pairsDir, k = 4, w = 4, buckets = 4, minShared = 1, maxDf = 8,
        lineTokens = 4)
      .option("checkpointLocation", tmpDir("curated_ckpt")).start()
    val base =
      "the winnow scheme selects minimum digests from sliding windows reliably"
    // chunk-aligned self-repetition: strips back to exactly `twin`
    val twin = "prefix edit more " + base // 13 tokens -> chunks of 4
    def repeatChunks(text: String): String = {
      val toks = text.split(" ")
      toks.grouped(4).flatMap(c => Seq(c, c)).map(_.mkString(" ")).mkString(" ")
    }
    // three spellings of ONE canonical URL (case/www/:80/tracking
    // params/order/fragment — the q199 variants)
    val uA1 = "HTTP://WWW.example.com:80/p0?utm_source=feed&b=2&a=1#top"
    val uA2 = "http://example.com/p0/?a=1&b=2"
    val uA3 = "http://example.com/p0?gclid=zzz&b=2&a=1"
    val b1 = Seq(
      CuratedDoc(1L, ts(1), uA1, base),
      // same canonical URL, same batch: min-id keeper wins, 2 drops
      CuratedDoc(2L, ts(1), uA2,
        "completely different content about spark partitions and shuffles"),
      CuratedDoc(3L, ts(1), "http://example.com/p3",
        "nothing in common with anything else in this corpus"))
    val b2 = Seq(
      // same canonical URL as wave 0's keeper: the canon store drops it
      CuratedDoc(11L, ts(2), uA3,
        "would near dup " + base + " but the url gate never lets it in"),
      // self-repetitive page whose STRIP is a near-dup of doc 1
      CuratedDoc(12L, ts(2), "http://example.com/p12", repeatChunks(twin)),
      CuratedDoc(13L, ts(2), "http://example.com/p13",
        "yet another unrelated document concerning buckets and joins"))
    try {
      src.addData(b1: _*); q.processAllAvailable()
      src.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    // wave 0 probes an empty world; wave 1 finds ONLY the stripped twin
    // (doc 11 was canon-gated out before fingerprinting)
    assert(spark.read.parquet(s"$pairsDir/batch_id=0").count() == 0L)
    val p1 = spark.read.parquet(s"$pairsDir/batch_id=1")
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(p1 == Set((1L, 12L)), s"wave-1 pairs: $p1")
    // ≡ batch-sequential replay: the same three steps applied batch
    // after batch with the BATCH operators
    def admitted(batch: Seq[CuratedDoc], seen: Set[Seq[Byte]]): Seq[(Long, String, Seq[Byte])] =
      TextOps.urlDedup(
          batch.map(d => (d.doc_id, d.url, d.text)).toDF("doc_id", "url", "text"),
          "doc_id", "url")
        .filter($"is_kept")
        .select($"doc_id", $"text", unhex(md5($"canon")).as("dg"))
        .as[(Long, String, Array[Byte])].collect().toSeq
        .map(r => (r._1, r._2, r._3.toSeq))
        .filterNot(r => seen.contains(r._3))
    val a1 = admitted(b1, Set.empty)
    val a2 = admitted(b2, a1.map(_._3).toSet)
    val cleanedUnion = TextOps.intraDocRepetitionStrip(
      (a1 ++ a2).map(r => (r._1, r._2)).toDF("doc_id", "text"),
      "doc_id", "text", lineTokens = 4)
    val directFps = TextOps.winnowedFingerprints(cleanedUnion,
        "doc_id", "cleaned", k = 4, w = 4)
      .select($"doc_id", lower(hex($"dg"))).distinct().as[(Long, String)].collect().toSet
    val streamedFps = spark.table(winnowT).select($"doc_id", lower(hex($"dg")))
      .as[(Long, String)].collect().toSet
    assert(streamedFps == directFps,
      "streamed winnow store must equal the batch replay of the curated union")
    val streamedCanon = spark.table(canonT).select("dg")
      .as[Array[Byte]].collect().map(_.toSeq).toSet
    assert(streamedCanon == (a1 ++ a2).map(_._3).toSet,
      "canon store must hold exactly the admitted canonical digests")
    // idempotent wave landing: a replayed wave 1 replaces, never grows
    val before = spark.table(winnowT).count()
    val replayFps = TextOps.winnowedFingerprints(
        TextOps.intraDocRepetitionStrip(
          a2.map(r => (r._1, r._2)).toDF("doc_id", "text"),
          "doc_id", "text", lineTokens = 4),
        "doc_id", "cleaned", k = 4, w = 4)
      .select($"doc_id", $"dg").distinct()
    Stores.appendWave(replayFps, winnowT, 1L, "dg", buckets = 4)
    assert(spark.table(winnowT).count() == before,
      "a crash-replayed wave must replace its partition, not duplicate it")
    dropTable(canonT); dropTable(winnowT)
  }

  test("domainGateStream: cumulative verdict ≡ batch-sequential domainFilter; flips when a host goes bad; idempotent waves") {
    import spark.implicits._
    import NearDupStreamSpec.CuratedDoc
    import graft.operators.{Stores, TextOps}
    implicit val sq = spark.sqlContext
    val statsT = "domain_gate_stats"
    dropTable(statsT)
    val keptDir = tmpDir("domain_gate_kept")
    val clean = (i: Long) =>
      s"a perfectly ordinary document number $i with plenty of distinct words " +
        "padding the token count well past the short threshold for this gate"
    // farm.com is CLEAN at wave 0 (two distinct long docs) and floods
    // with exact duplicates at wave 1 — the cumulative dup rate crosses
    // 500000 e6 and the verdict flips; stubs.com is short-doc-condemned
    // from its first appearance; the hostless doc passes ungated
    val b0 = Seq(
      CuratedDoc(1L, ts(1), "http://good.com/p1", clean(1)),
      CuratedDoc(2L, ts(1), "HTTP://WWW.FARM.com:80/m1", clean(100)),
      CuratedDoc(3L, ts(1), "http://farm.com/m2", clean(101)),
      CuratedDoc(4L, ts(1), "http://stubs.com/s1", "stub"),
      CuratedDoc(5L, ts(1), "not a url at all", clean(5)))
    val b1 = Seq(
      CuratedDoc(11L, ts(2), "http://good.com/p2", clean(11))) ++
      (12L until 18L).map(i =>
        CuratedDoc(i, ts(2), s"http://farm.com/m$i", "mirror mirror content"))
    val b2 = Seq(
      CuratedDoc(21L, ts(3), "http://good.com/p3", clean(21)),
      CuratedDoc(22L, ts(3), "http://farm.com/m22", clean(22)), // too late: host condemned
      CuratedDoc(23L, ts(3), "http://stubs.com/s2", clean(23)))
    val src = MemoryStream[CuratedDoc]
    val q = EventStreams.domainGateStream(src.toDF(), statsT, keptDir,
        maxDupE6 = 500000L, maxShortPermille = 500L, shortTokens = 8,
        buckets = 4)
      .option("checkpointLocation", tmpDir("domain_gate_ckpt")).start()
    try {
      src.addData(b0: _*); q.processAllAvailable()
      src.addData(b1: _*); q.processAllAvailable()
      src.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    def keptIds(batch: Int): Set[Long] =
      spark.read.parquet(s"$keptDir/batch_id=$batch")
        .select("doc_id").as[Long].collect().toSet
    // ≡ batch-sequential replay: batch N's kept rows are domainFilter
    // over everything seen through batch N, restricted to batch N
    val batches = Seq(b0, b1, b2)
    (0 until 3).foreach { n =>
      val union = batches.take(n + 1).flatten
        .map(d => (d.doc_id, d.url, d.text)).toDF("doc_id", "url", "text")
      val expect = TextOps.domainFilter(union, "url", "text",
          maxDupE6 = 500000L, maxShortPermille = 500L, shortTokens = 8)
        .select("doc_id").as[Long].collect().toSet
        .intersect(batches(n).map(_.doc_id).toSet)
      assert(keptIds(n) == expect, s"batch $n: ${keptIds(n)} vs $expect")
    }
    // the flip is visible: farm.com admitted at wave 0, condemned after
    assert(keptIds(0).contains(2L) && keptIds(0).contains(3L))
    assert(!keptIds(1).exists(id => id >= 12L && id < 18L))
    assert(!keptIds(2).contains(22L),
      "farm.com's cumulative dup rate keeps it condemned at wave 2")
    assert(keptIds(0).contains(5L), "hostless docs pass ungated")
    assert(!keptIds(0).contains(4L),
      "the short-doc domain is condemned at its first wave")
    // the gate is cumulative-stats-driven, NOT sticky: stubs.com's
    // wave-2 long doc brings its short rate back to exactly the 500‰
    // threshold (1 short of 2 docs), so the host RECOVERS — the same
    // verdict the batch gate gives over the full corpus
    assert(keptIds(2).contains(23L),
      "a host whose cumulative stats recover is re-admitted")
    // the differential identity behind the stream: verdict over
    // additive stats rows ≡ the batch gate's surviving hosts
    val all = batches.flatten.map(d => (d.doc_id, d.url, d.text))
      .toDF("doc_id", "url", "text")
    val vHosts = TextOps.domainVerdict(
        TextOps.domainStatsRows(all, "url", "text", shortTokens = 8),
        maxDupE6 = 500000L, maxShortPermille = 500L)
      .as[String].collect().toSet
    val fHosts = TextOps.domainFilter(all, "url", "text",
        maxDupE6 = 500000L, maxShortPermille = 500L, shortTokens = 8)
      .filter($"__host" =!= "").select("__host").distinct()
      .as[String].collect().toSet
    assert(vHosts == fHosts, s"verdict $vHosts ≠ batch gate hosts $fHosts")
    // idempotent wave landing: a crash-replayed stats wave replaces
    val before = spark.table(statsT).count()
    Stores.appendWave(
      TextOps.domainStatsRows(
        b1.map(d => (d.doc_id, d.url, d.text)).toDF("doc_id", "url", "text"),
        "url", "text", shortTokens = 8),
      statsT, 1L, "__host", buckets = 4)
    assert(spark.table(statsT).count() == before,
      "a crash-replayed stats wave must replace its partition")
    dropTable(statsT)
  }

  test("imageAdmitStream: cross-format pairs across waves, as-of probe, idempotent signature waves") {
    import spark.implicits._
    import NearDupStreamSpec.MediaRow
    import graft.operators.{Multimodal, Stores}
    implicit val sq = spark.sqlContext
    val sigT = "image_sig_store"
    dropTable(sigT)
    val pairsDir = tmpDir("image_admit_pairs")
    // wave 0 admits a JPEG; wave 1 brings its PNG re-encode (the
    // cross-format twin) + an unrelated JPEG; wave 2 a re-encoded
    // JPEG twin pairing BOTH earlier forms
    val b0 = Seq(MediaRow(1L, ts(1), Multimodal.jpegPayload(7L, 1, variant = false)),
      MediaRow(2L, ts(1), Multimodal.pngGrayPayload(8L, 1)))
    val b1 = Seq(MediaRow(3L, ts(2), Multimodal.pngGrayPayload(7L, 1)),
      MediaRow(4L, ts(2), Multimodal.jpegPayload(9L, 1, variant = false)))
    val b2 = Seq(MediaRow(5L, ts(3), Multimodal.jpegPayload(7L, 1, variant = true)))
    val src = MemoryStream[MediaRow]
    val q = EventStreams.imageAdmitStream(src.toDF(), sigT, pairsDir,
        grid = 4, buckets = 4)
      .option("checkpointLocation", tmpDir("image_admit_ckpt")).start()
    try {
      src.addData(b0: _*); q.processAllAvailable()
      src.addData(b1: _*); q.processAllAvailable()
      src.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    def pairs(b: Int): Set[(Long, Long, Long)] =
      spark.read.parquet(s"$pairsDir/batch_id=$b")
        .as[(Long, Long, Long)].collect().toSet
    assert(pairs(0) == Set.empty)
    assert(pairs(1) == Set((1L, 3L, 0L)),
      s"the PNG twin must pair its wave-0 JPEG across formats: ${pairs(1)}")
    assert(pairs(2) == Set((1L, 5L, 0L), (3L, 5L, 0L)),
      s"the re-encoded JPEG must pair both earlier forms: ${pairs(2)}")
    // ≡ batch replay: the wave-2 probe equals imageCrossPairs over the
    // explicit catalog ∪ delta split
    def sigsOf(rows: Seq[MediaRow]): org.apache.spark.sql.DataFrame =
      Multimodal.imageSignatures(
        rows.map(r => (r.media_id, r.payload)).toDF("media_id", "payload"), 4)
    val replay = Multimodal.imageCrossPairs(sigsOf(b0 ++ b1), sigsOf(b2))
      .as[(Long, Long, Long)].collect().toSet
    assert(replay == pairs(2), s"stream ≠ batch replay: $replay vs ${pairs(2)}")
    // idempotent wave landing: a crash-replayed signature wave replaces
    val before = spark.table(sigT).count()
    Stores.appendWave(sigsOf(b1), sigT, 1L, "__key", buckets = 4)
    assert(spark.table(sigT).count() == before)
    dropTable(sigT)
  }
  test("imageAdmitStream: a GIF twin admits against a PNG/JPEG catalog (r15 third format, no code change)") {
    import spark.implicits._
    import NearDupStreamSpec.MediaRow
    import graft.operators.Multimodal
    implicit val sq = spark.sqlContext
    val sigT = "image_sig_store_gif"
    dropTable(sigT)
    val pairsDir = tmpDir("image_admit_gif_pairs")
    // wave 0: a PNG catalog image; wave 1: its GIF twin (same dcBlock
    // pixels behind an LZW stream + gray-ramp palette) and an
    // interlaced GIF twin — both must pair the catalog PNG at L1 = 0
    // through the UNCHANGED stream (the GIF arm lives in
    // imageSignatures' coalesce)
    val b0 = Seq(MediaRow(1L, ts(1), Multimodal.pngGrayPayload(7L, 1)))
    val b1 = Seq(
      MediaRow(2L, ts(2), Multimodal.gifGrayPayload(7L, 1, interlaced = false)),
      MediaRow(3L, ts(2), Multimodal.gifGrayPayload(7L, 1, interlaced = true)))
    val src = MemoryStream[MediaRow]
    val q = EventStreams.imageAdmitStream(src.toDF(), sigT, pairsDir,
        grid = 4, buckets = 4)
      .option("checkpointLocation", tmpDir("image_admit_gif_ckpt")).start()
    try {
      src.addData(b0: _*); q.processAllAvailable()
      src.addData(b1: _*); q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(s"$pairsDir/batch_id=1")
      .as[(Long, Long, Long)].collect().toSet
    // catalog×batch legs (1,2),(1,3) AND the within-batch leg (2,3)
    assert(got == Set((1L, 2L, 0L), (1L, 3L, 0L), (2L, 3L, 0L)),
      s"GIF twins must admit at L1 = 0: $got")
    dropTable(sigT)
  }

  test("imageAdmitStream: same-batch twins pair at the stream; accumulated pairs equal the full recompute") {
    import spark.implicits._
    import NearDupStreamSpec.MediaRow
    import graft.operators.{Multimodal, Stores}
    implicit val sq = spark.sqlContext
    val sigT = "image_withinbatch_store"
    dropTable(sigT)
    val pairsDir = tmpDir("image_within_pairs")
    // wave 0 carries a cross-format twin PAIR in one batch (r14's gap:
    // both were admitted and never paired) + an unrelated image;
    // wave 1 carries another same-batch twin pair of the same image
    val b0 = Seq(
      MediaRow(1L, ts(1), Multimodal.jpegPayload(7L, 1, variant = false)),
      MediaRow(2L, ts(1), Multimodal.pngGrayPayload(7L, 1)),
      MediaRow(3L, ts(1), Multimodal.pngGrayPayload(8L, 1)))
    val b1 = Seq(
      MediaRow(4L, ts(2), Multimodal.jpegPayload(7L, 1, variant = true)),
      MediaRow(5L, ts(2), Multimodal.jpegPayload(7L, 2, variant = false)))
    val src = MemoryStream[MediaRow]
    val q = EventStreams.imageAdmitStream(src.toDF(), sigT, pairsDir,
        grid = 4, buckets = 4)
      .option("checkpointLocation", tmpDir("image_within_ckpt")).start()
    try {
      src.addData(b0: _*); q.processAllAvailable()
      src.addData(b1: _*); q.processAllAvailable()
    } finally q.stop()
    def pairs(b: Int): Set[(Long, Long, Long)] =
      spark.read.parquet(s"$pairsDir/batch_id=$b")
        .as[(Long, Long, Long)].collect().toSet
    assert(pairs(0) == Set((1L, 2L, 0L)),
      s"wave 0's SAME-BATCH cross-format twins must pair: ${pairs(0)}")
    assert(pairs(1) == Set((4L, 5L, 0L), (1L, 4L, 0L), (1L, 5L, 0L),
      (2L, 4L, 0L), (2L, 5L, 0L)),
      s"wave 1: within-batch pair AND all catalog crosses: ${pairs(1)}")
    // accumulated stream pairs == the one-shot batch recompute over the
    // union (as unordered pairs — the recompute orders by id)
    val streamed = (pairs(0) ++ pairs(1)).map(p => (p._1, p._2))
    val full = Multimodal.imagePerceptualCandidates(
        (b0 ++ b1).map(r => (r.media_id, r.payload)).toDF("media_id", "payload"),
        grid = 4)
      .as[(Long, Long, Long)].collect().map(p => (p._1, p._2)).toSet
    assert(streamed == full,
      s"stream accumulation $streamed != full recompute $full")
    dropTable(sigT)
  }

  test("migrateImageSignatureStore: mid-stream grid widening; resumed admissions equal a stream that started wide") {
    import spark.implicits._
    import NearDupStreamSpec.MediaRow
    import graft.operators.{Multimodal, Stores}
    implicit val sq = spark.sqlContext
    val tA = "image_migrate_g4"; val tB = "image_migrate_g5"
    val tC = "image_migrate_ref"
    Seq(tA, tB, tC).foreach(dropTable)
    val pairsA = tmpDir("migrate_pairs_a"); val pairsB = tmpDir("migrate_pairs_b")
    val pairsC = tmpDir("migrate_pairs_c")
    val ckpt = tmpDir("migrate_ckpt")
    val b0 = Seq(MediaRow(1L, ts(1), Multimodal.jpegPayload(7L, 1, variant = false)),
      MediaRow(2L, ts(1), Multimodal.pngGrayPayload(8L, 1)))
    val b1 = Seq(MediaRow(3L, ts(2), Multimodal.pngGrayPayload(7L, 1)),
      MediaRow(4L, ts(2), Multimodal.jpegPayload(9L, 1, variant = false)))
    val b2 = Seq(MediaRow(5L, ts(3), Multimodal.jpegPayload(7L, 1, variant = true)))
    // phase 1: two waves at grid 4
    val src = MemoryStream[MediaRow]
    val q1 = EventStreams.imageAdmitStream(src.toDF(), tA, pairsA,
        grid = 4, buckets = 4)
      .option("checkpointLocation", ckpt).start()
    try {
      src.addData(b0: _*); q1.processAllAvailable()
      src.addData(b1: _*); q1.processAllAvailable()
    } finally q1.stop()
    // the migration: re-sign the catalog at grid 5 into a NEW store
    val mediaTable = (b0 ++ b1).map(r => (r.media_id, r.payload))
      .toDF("media_id", "payload")
    Multimodal.migrateImageSignatureStore(spark, mediaTable, tA, tB,
      newGrid = 5, buckets = 4)
    // phase 2: the SAME checkpointed source resumes against the new
    // store at the new grid — wave numbering continues at 2
    val q2 = EventStreams.imageAdmitStream(src.toDF(), tB, pairsB,
        grid = 5, buckets = 4)
      .option("checkpointLocation", ckpt).start()
    try {
      src.addData(b2: _*); q2.processAllAvailable()
    } finally q2.stop()
    // reference: a stream that ran at grid 5 FROM SCRATCH
    val srcF = MemoryStream[MediaRow]
    val q3 = EventStreams.imageAdmitStream(srcF.toDF(), tC, pairsC,
        grid = 5, buckets = 4)
      .option("checkpointLocation", tmpDir("migrate_ckpt_ref")).start()
    try {
      srcF.addData(b0: _*); q3.processAllAvailable()
      srcF.addData(b1: _*); q3.processAllAvailable()
      srcF.addData(b2: _*); q3.processAllAvailable()
    } finally q3.stop()
    def pairsOf(dir: String, b: Int): Set[(Long, Long, Long)] =
      spark.read.parquet(s"$dir/batch_id=$b")
        .as[(Long, Long, Long)].collect().toSet
    val resumed = pairsOf(pairsB, 2)
    val fresh = pairsOf(pairsC, 2)
    assert(resumed.nonEmpty && resumed == fresh,
      s"post-migration admissions must equal the started-wide stream: $resumed vs $fresh")
    // the migrated store is row-identical to the fresh wide build's
    // first two waves (same wave structure, same signatures)
    def rows(t: String, upTo: Long): Set[(Long, Long, Seq[Long], Long, Long)] =
      Stores.asOf(spark, t, upTo)
        .select("id", "__key", "__f", "__t", "wave")
        .as[(Long, Long, Seq[Long], Long, Long)].collect().toSet
    assert(rows(tB, 1L) == rows(tC, 1L),
      "migrated store must equal a fresh wide build of the same history")
    // the resumed stream's wave 2 landed in the NEW store
    assert(rows(tB, 2L).exists(_._5 == 2L),
      "the post-migration wave must land in the migrated store")
    Seq(tA, tB, tC).foreach(dropTable)
  }

  test("admission pairs: a re-delivered id votes once, never pairs itself, pairs are order-normalized") {
    import spark.implicits._
    import graft.operators.{Multimodal, TextOps}
    // --- winnow tier: doc 5 sits in the catalog AND is re-delivered in
    // the delta with the same digests; doc 9 shares exactly 2 digests
    // with it. Without (pair, digest) dedup the two legs would count 4
    // shared digests and pass minShared = 3 for a below-threshold pair.
    val cat = Seq((5L, "A"), (5L, "B")).toDF("doc_id", "dg")
    val dlt = Seq((5L, "A"), (5L, "B"), (9L, "A"), (9L, "B"), (9L, "C"))
      .toDF("doc_id", "dg")
    val strict = TextOps.winnowedAdmissionPairs(cat, dlt, minShared = 3, maxDf = 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(strict.isEmpty,
      s"2 truly-shared digests must not pass minShared = 3: $strict")
    val loose = TextOps.winnowedAdmissionPairs(cat, dlt, minShared = 2, maxDf = 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(loose == Set((5L, 9L, 2L)),
      s"one pair, counted once, never (5,5): $loose")
    // --- image tier: catalog id 10 re-delivered in the delta alongside
    // its twin id 5 (smaller than the catalog id — exercises ordering)
    val catSigs = Multimodal.imageSignatures(
      Seq((10L, Multimodal.jpegPayload(7L, 1, variant = false)))
        .toDF("media_id", "payload"), 4)
    val dltSigs = Multimodal.imageSignatures(
      Seq((10L, Multimodal.jpegPayload(7L, 1, variant = false)),
        (5L, Multimodal.pngGrayPayload(7L, 1)))
        .toDF("media_id", "payload"), 4)
    val img = Multimodal.imageAdmissionPairs(catSigs, dltSigs)
      .as[(Long, Long, Long)].collect().toSeq
    assert(img == Seq((5L, 10L, 0L)),
      s"exactly one normalized pair, no self-pair, no duplicate: $img")
  }

  test("winnowAdmitStream: same-batch near-dups pair at the stream") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import StreamingSpec.Doc
    val table = "winnow_withinbatch_store"
    dropTable(table)
    val pairsDir = tmpDir("winnow_within_pairs")
    val src = MemoryStream[Doc]
    val q = EventStreams.winnowAdmitStream(src.toDF(), table, pairsDir,
        k = 4, w = 4, buckets = 4, minShared = 1, maxDf = 8)
      .option("checkpointLocation", tmpDir("winnow_within_ckpt")).start()
    val base =
      "the winnow scheme selects minimum digests from sliding windows reliably"
    // docs 1 and 2 are near-dups arriving in the SAME first batch
    val b0 = Seq(
      Doc(1L, ts(1), base),
      Doc(2L, ts(1), s"prefix edit $base"),
      Doc(3L, ts(1), "completely different content about spark partitions and shuffles"))
    try {
      src.addData(b0: _*); q.processAllAvailable()
    } finally q.stop()
    val p0 = spark.read.parquet(s"$pairsDir/batch_id=0")
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(p0 == Set((1L, 2L)),
      s"wave 0's same-batch near-dups must pair: $p0")
    dropTable(table)
  }

}

object NearDupStreamSpec {
  final case class MediaRow(media_id: Long, ts: java.sql.Timestamp,
    payload: Array[Byte])
  final case class Vec(vec_id: Long, ts: java.sql.Timestamp, embedding: Seq[Float])
  final case class CuratedDoc(doc_id: Long, ts: java.sql.Timestamp,
    url: String, text: String)
}
