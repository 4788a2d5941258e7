package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Sampling, Similarity, TextOps}

/** Round-7 delta/maintenance operators: incremental dedup, novelty
  * scoring, per-group cap (heap aggregate), int8 ADC retrieval, epoch
  * shuffle, pivot/unpivot round-trip.
  */
class DeltaOpsSpec extends SparkSpec {
  import spark.implicits._

  private def finalPlan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)

  test("incrementalExact keeps only content new to catalog and delta") {
    val catalog = Seq((1L, "alpha beta"), (2L, "gamma delta"))
      .toDF("doc_id", "text")
    val delta = Seq(
      (10L, "alpha beta"),   // exact dup of catalog content → dropped
      (11L, "epsilon zeta"), // new → kept
      (12L, "epsilon zeta"), // within-delta dup, higher id → dropped
      (13L, "eta theta")     // new → kept
    ).toDF("doc_id", "text")
    val kept = Dedup.incrementalExact(catalog, delta, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(11L, 13L))
  }

  test("incrementalExact with an empty catalog degrades to delta self-dedup") {
    val catalog = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val delta = Seq((5L, "a b"), (6L, "a b"), (7L, "c d")).toDF("doc_id", "text")
    val kept = Dedup.incrementalExact(catalog, delta, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(5L, 7L))
  }

  test("noveltyVsCatalog computes exact shingle novelty fractions") {
    // n = 2 shingles: doc 10 = {a b, b c} both seen; doc 11 = {a b, b x}
    // one seen; doc 12 = {p q} unseen
    val catalog = Seq((1L, "a b c")).toDF("doc_id", "text")
    val delta = Seq(
      (10L, "a b c"), (11L, "a b x"), (12L, "p q")
    ).toDF("doc_id", "text")
    val rows = TextOps.noveltyVsCatalog(catalog, delta, "doc_id", "text", n = 2)
      .select("doc_id", "n_shingles", "n_novel", "novelty_e4")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq(
      (10L, 2L, 0L, 0L),
      (11L, 2L, 1L, 5000L),
      (12L, 1L, 1L, 10000L)))
  }

  test("noveltyVsCatalog counts DISTINCT shingles per delta doc") {
    // "a b a b a" with n=2 → shingles {a b, b a} (each repeated) —
    // distinct count must be 2, not 4
    val catalog = Seq((1L, "z z z")).toDF("doc_id", "text")
    val delta = Seq((10L, "a b a b a")).toDF("doc_id", "text")
    val r = TextOps.noveltyVsCatalog(catalog, delta, "doc_id", "text", n = 2)
      .select("n_shingles", "n_novel").as[(Long, Long)].collect()
    assert(r.toSeq == Seq((2L, 2L)))
  }

  test("groupCap matches the windowed top-k exactly, sort- and window-free") {
    val docs = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
    val capped = Sampling.groupCap(docs, "source", "doc_id", k = 5)
    val got = capped.select("source", "doc_id", "h_lcg")
      .as[(String, Long, Long)].collect().sortBy(r => (r._1, r._2))

    val w = Window.partitionBy(col("source"))
      .orderBy(col("h_lcg"), col("doc_id"))
    val want = docs.select(col("source"), col("doc_id"),
        Sampling.hashLcg(col("doc_id")).as("h_lcg"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).drop("rn")
      .as[(String, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == want.toSeq)

    // the scale contract: bounded heap aggregate, never a corpus sort
    capped.collect()
    val plan = finalPlan(capped)
    assert(plan.contains("ObjectHashAggregate"),
      s"groupCap must plan the typed bounded aggregate:\n$plan")
    assert(!plan.contains("Window"), s"no Window in groupCap:\n$plan")
    assert(!plan.contains("Sort"), s"no Sort in groupCap:\n$plan")
  }

  test("groupCap passes small groups through whole") {
    val df = Seq((1L, "g1"), (2L, "g1"), (3L, "g2")).toDF("id", "g")
    val got = Sampling.groupCap(df, "g", "id", k = 5)
      .select("id").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 2L, 3L))
  }

  test("annInt8Adc scores match the dequantized integer formula and rank correctly") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.5f)),   // query
      (1L, Array(2.0f, 0.0f, 1.0f)),   // same direction as query
      (2L, Array(-1.0f, 0.0f, -0.5f)), // opposite
      (3L, Array(0.0f, 0.0f, 0.0f)),   // zero vector → score 0
      (4L, Array(0.0f, 3.0f, 0.0f))    // orthogonal → score 0
    ).toDF("vec_id", "embedding")
    val got = Similarity.annInt8Adc(
        emb.filter($"vec_id" =!= 0), emb.filter($"vec_id" === 0), k = 5)
      .as[(Long, Long)].collect().toMap

    // hand replica: qw = floor(q*1e6); code = floor(x*127/amax + 0.5);
    // score = floor(amax*1e4) * Σ code·qw
    def score(v: Array[Float]): Long = {
      val qw = Array(1000000L, 0L, 500000L)
      val amax = v.map(x => math.abs(x.toDouble)).max
      if (amax == 0) 0L
      else {
        val code = v.map(x => math.floor(x.toDouble * 127.0 / amax + 0.5).toLong)
        math.floor(amax * 10000.0).toLong *
          code.zip(qw).map { case (a, b) => a * b }.sum
      }
    }
    assert(got(1L) == score(Array(2.0f, 0.0f, 1.0f)))
    assert(got(2L) == score(Array(-1.0f, 0.0f, -0.5f)))
    assert(got(3L) == 0L)
    assert(got(4L) == 0L)
    assert(got(1L) > 0 && got(2L) < 0)

    // top-1 keeps the aligned vector only
    val top1 = Similarity.annInt8Adc(
        emb.filter($"vec_id" =!= 0), emb.filter($"vec_id" === 0), k = 1)
      .as[(Long, Long)].collect()
    assert(top1.map(_._1).toSeq == Seq(1L))
  }

  test("epochShards yields dense per-shard positions over a permutation") {
    val docs = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
    val s = Sampling.epochShards(docs, "doc_id", nShards = 8)
    val rows = s.select("doc_id", "shard", "pos").as[(Long, Int, Long)].collect()
    assert(rows.length == docs.count())
    assert(rows.map(_._1).distinct.length == rows.length)
    rows.groupBy(_._2).foreach { case (_, grp) =>
      val ps = grp.map(_._3).sorted
      assert(ps.toSeq == (1L to grp.length).toSeq, "positions must be dense per shard")
    }
    // deterministic under arbitrary input partitioning
    val again = Sampling.epochShards(docs.repartition(7), "doc_id", nShards = 8)
      .select("doc_id", "shard", "pos").as[(Long, Int, Long)].collect()
    assert(again.sortBy(_._1).toSeq == rows.sortBy(_._1).toSeq)
  }

  test("numericProfile: nulls, distincts, floor-scaled ranges per column") {
    val df = Seq(
      (Some(1.5), Some(-0.015)),
      (Some(1.5), Some(2.0)),
      (None, Some(2.0)),
      (Some(3.25), None)
    ).toDF("a", "b")
    val rows = graft.operators.Profiling.numericProfile(df, Seq("a", "b"))
      .as[(String, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    // floor(-0.015*100) = floor(-1.5) = -2 — floor, not truncation
    assert(rows.toSeq == Seq(
      ("a", 4L, 1L, 2L, 150L, 325L),
      ("b", 4L, 1L, 2L, -2L, 200L)))
  }

  test("corpusDiff classifies added/removed/changed/unchanged") {
    val v1 = Seq((1L, "same"), (2L, "old text"), (3L, "gone")).toDF("doc_id", "text")
    val v2 = Seq((1L, "same"), (2L, "new text"), (4L, "fresh")).toDF("doc_id", "text")
    val got = Dedup.corpusDiff(v1, v2, "doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, "unchanged"), (2L, "changed"), (3L, "removed"), (4L, "added")))
  }

  test("temperatureSample keeps the smallest stratum whole and flattens shares toward sqrt") {
    val docs = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
    val counts = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val minLang = counts.minBy(_._2)._1
    val kept = graft.operators.Mixing.temperatureSample(docs, "lang")
      .as[(Long, String)].collect()
    val keptCounts = kept.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(keptCounts(minLang) == counts(minLang), "smallest stratum is never downsampled")
    // every stratum's expected kept count is √(n_s·min_n); the md5
    // gate is Bernoulli(⌊65536·√(mn/n)⌋/65536) per doc — allow 4σ
    counts.foreach { case (lang, n) =>
      if (lang != minLang) {
        val p = math.floor(65536.0 * math.sqrt(counts(minLang).toDouble) /
          math.sqrt(n.toDouble)) / 65536.0
        val sd = math.sqrt(n * p * (1 - p))
        assert(math.abs(keptCounts.getOrElse(lang, 0L) - n * p) <= 4 * sd + 1,
          s"$lang kept ${keptCounts.getOrElse(lang, 0L)} vs expected ${n * p}")
      }
    }
    // deterministic under input partitioning
    val again = graft.operators.Mixing.temperatureSample(docs.repartition(7), "lang")
      .as[(Long, String)].collect()
    assert(again.map(_._1).sorted.toSeq == kept.map(_._1).sorted.toSeq)
  }

  test("delta operators keep their scale shapes: no Sort/Window; ADC is scan + TakeOrdered") {
    val docs = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
    // incrementalExact: three digest-keyed hash ops, nothing ordered
    val inc = Dedup.incrementalExact(
      docs.filter(col("doc_id") % 10 < 7), docs.filter(col("doc_id") % 10 >= 7),
      "doc_id", "text")
    inc.collect()
    val p1 = finalPlan(inc)
    assert(!p1.contains("Sort"), s"no Sort in incrementalExact:\n$p1")
    assert(!p1.contains("Window"), s"no Window in incrementalExact:\n$p1")
    // noveltyVsCatalog: store probe + per-doc re-aggregation, unordered
    val nov = TextOps.noveltyVsCatalog(
      docs.filter(col("doc_id") % 10 < 7), docs.filter(col("doc_id") % 10 >= 7),
      "doc_id", "text", n = 3)
    nov.collect()
    val p2 = finalPlan(nov)
    assert(!p2.contains("Sort"), s"no Sort in noveltyVsCatalog:\n$p2")
    assert(!p2.contains("Window"), s"no Window in noveltyVsCatalog:\n$p2")
    // temperatureSample: broadcast gates only — the corpus itself is
    // never hash-exchanged (the two tiny aggregates are)
    val temp = graft.operators.Mixing.temperatureSample(docs, "lang")
    temp.collect()
    val p3 = finalPlan(temp)
    assert(!p3.contains("Sort") && !p3.contains("Window"),
      s"no Sort/Window in temperatureSample:\n$p3")
    assert(p3.contains("BroadcastExchange"), s"gates must broadcast:\n$p3")
    // annInt8Adc: one corpus scan against a broadcast literal, then a
    // per-partition top-k — no hash exchange of the corpus anywhere
    val emb = graft.engine.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val adc = Similarity.annInt8Adc(
      emb.filter(col("vec_id") =!= 0), emb.filter(col("vec_id") === 0), k = 10)
    adc.collect()
    val p4 = finalPlan(adc)
    assert(p4.contains("TakeOrderedAndProject"), s"ADC must TakeOrdered:\n$p4")
    assert(!p4.contains("Exchange hashpartitioning"),
      s"the quantized corpus must not shuffle:\n$p4")
  }

  test("numericProfileApprox plans a single pass: no Expand; exact profile has none either") {
    val li = graft.engine.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val cols9 = Seq("l_quantity", "l_discount")
    val approx = graft.operators.Profiling.numericProfileApprox(li, cols9)
    approx.collect()
    val pa = finalPlan(approx)
    assert(!pa.contains("Expand"), s"approx profile must not Expand the scan:\n$pa")
    // exact profile: one narrow groupBy(value).count per column unioned
    // into one action — no Expand replication of the scan (the r15
    // histogram-per-column rewrite), and each branch's scan prunes to
    // its single column
    val exact = graft.operators.Profiling.numericProfile(li, cols9)
    exact.collect()
    val pe = finalPlan(exact)
    assert(!pe.contains("Expand"),
      s"exact profile must not Expand the scan (histogram-per-column):\n$pe")
    assert(pe.contains("Union"), s"per-column branches union into one action:\n$pe")
    assert(pe.contains("ReadSchema: struct<l_quantity:double>"),
      s"each branch's scan must prune to its own column:\n$pe")
  }

  test("exactByContentPriority keeps the best (priority, id) per content, sort-free") {
    val df = Seq(
      (1L, "same text", 2),  // crawl copy
      (2L, "same text", 0),  // curated copy → keeper despite higher id
      (3L, "same text", 2),
      (4L, "unique", 1)
    ).toDF("doc_id", "text", "priority")
    val kept = Dedup.exactByContentPriority(df, "doc_id", "text", "priority")
    assert(kept.select("doc_id").as[Long].collect().sorted.toSeq == Seq(2L, 4L))
    val plan = finalPlan(kept)
    assert(!plan.contains("Sort") && !plan.contains("Window"),
      s"priority dedup must stay a hash aggregate + semi join:\n$plan")
    // priority ties fall back to the smallest id
    val tied = Seq((5L, "t", 1), (6L, "t", 1)).toDF("doc_id", "text", "priority")
    assert(Dedup.exactByContentPriority(tied, "doc_id", "text", "priority")
      .select("doc_id").as[Long].collect().toSeq == Seq(5L))
  }

  test("madOutlierGate drops only rows beyond k MADs of their group median") {
    // group g: scores 10,10,12,12,100 → med4=48, |4x−med4| = 8,8,0,0,352,
    // mad4 = 8 → k=2 keeps |dev| ≤ 16: drops only the 100
    val df = Seq(("g", 10L), ("g", 10L), ("g", 12L), ("g", 12L), ("g", 100L),
      ("h", 7L)).toDF("lang", "score")
    val kept = graft.operators.Sampling.madOutlierGate(df, "lang", "score", k = 2)
      .select("lang", "score").as[(String, Long)].collect().sortBy(r => (r._1, r._2))
    assert(kept.toSeq == Seq(("g", 10L), ("g", 10L), ("g", 12L), ("g", 12L), ("h", 7L)))
  }

  test("pivot/unpivot round-trip reproduces per-(source,lang) counts with zero-fill") {
    val docs = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
    val langs = Seq("de", "en", "es", "fr", "zh")
    val wide = docs.groupBy("source").pivot("lang", langs).agg(count(lit(1)))
    val longForm = wide.unpivot(Array(col("source")), langs.map(col).toArray, "lang", "cnt")
      .select(col("source"), col("lang"), coalesce(col("cnt"), lit(0L)).as("doc_count"))
      .as[(String, String, Long)].collect().sortBy(r => (r._1, r._2))

    val direct = docs.groupBy("source", "lang").count()
      .as[(String, String, Long)].collect()
      .map { case (s, l, c) => (s, l) -> c }.toMap
    val sources = docs.select("source").distinct().as[String].collect()
    val want = (for { s <- sources; l <- langs }
      yield (s, l, direct.getOrElse((s, l), 0L))).sortBy(r => (r._1, r._2))
    assert(longForm.toSeq == want.toSeq)
    // the data really exercises the zero-fill arm
    assert(longForm.exists(_._3 == 0L), "expected at least one absent (source, lang) combo")
  }

  test("clusterSafeSplit: transitive cluster members share the keeper's split") {
    import spark.implicits._
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c"), (10L, "d"), (11L, "e"))
      .toDF("doc_id", "text")
    // chain 1–2–3 (3 reachable only transitively), 10 and 11 singletons
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id1", "id2")
    val out = graft.operators.Mixing.clusterSafeSplit(docs, "doc_id", pairs)
      .select("doc_id", "cluster", "split")
      .as[(Long, Long, String)].collect().toSeq.sortBy(_._1)
    assert(out.map(r => (r._1, r._2)) ==
      Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 11L)))
    val splits = out.map(r => r._1 -> r._3).toMap
    assert(splits(2L) == splits(1L) && splits(3L) == splits(1L),
      s"chained members must share the keeper's split: $splits")
  }

  test("admissionWaterfall: first-failing-gate attribution and zero-filled gates") {
    import spark.implicits._
    val docs = Seq(
      (1L, false, true),   // fails gate A
      (2L, false, false),  // fails BOTH → attributed to A (first)
      (3L, true, false),   // fails gate B
      (4L, true, true)     // admitted
    ).toDF("id", "ga", "gb")
    val out = graft.operators.Profiling.admissionWaterfall(docs,
        Seq(("a", col("ga")), ("b", col("gb")), ("never", lit(true))))
      .as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((1L, "a", 2L), (2L, "b", 1L), (3L, "never", 0L),
      (4L, "admitted", 1L)))
  }
}
