package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Retrieval, Sampling, Similarity, TextOps}

/** Behavioral contracts for the rank-fusion / probe-scoring /
  * calibration / overlap / clustering / budget-fill / containment /
  * MMR batch (q90–q97).
  */
class FusionSpec extends SparkSpec {
  import spark.implicits._

  test("rrfFuse sums reciprocal ranks over present lists only, ties broken by id") {
    val a = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("id", "rank")
    val b = Seq((2L, 1L), (4L, 2L)).toDF("id", "rank")
    val out = Retrieval.rrfFuse(Seq("a" -> a, "b" -> b), "id", "rank", rrfK = 60, topK = 10)
      .orderBy(desc("rrf_e9"), col("id")).collect()
    // id 2: 1/62 + 1/61; id 1: 1/61; id 4: 1/62; id 3: 1/63
    val expect2 = math.floor((1.0 / 62 + 1.0 / 61) * 1e9).toLong
    assert(out.map(_.getLong(0)).toSeq == Seq(2L, 1L, 4L, 3L))
    assert(out.head.getAs[Long]("rrf_e9") == expect2)
    // absent ranks surface as 0
    val r4 = out.find(_.getLong(0) == 4L).get
    assert(r4.getAs[Long]("rank_a") == 0L && r4.getAs[Long]("rank_b") == 2L)
  }

  test("rrfFuse topK cuts by fused score with id tiebreak") {
    // two ids with identical single-list rank → identical rrf; id wins
    val a = Seq((7L, 1L)).toDF("id", "rank")
    val b = Seq((5L, 1L)).toDF("id", "rank")
    val out = Retrieval.rrfFuse(Seq("a" -> a, "b" -> b), "id", "rank", topK = 1).collect()
    assert(out.length == 1 && out.head.getLong(0) == 5L)
  }

  test("shortlist ranks 1-based by score desc with id tiebreak, cut first") {
    val df = Seq((1L, 10L), (2L, 30L), (3L, 30L), (4L, 5L)).toDF("id", "s")
    val out = Retrieval.shortlist(df, "id", "s", 3)
      .select("id", "rank").as[(Long, Long)].collect().toMap
    assert(out == Map(2L -> 1L, 3L -> 2L, 1L -> 3L))
    // the limit happens before ranking — plan is TakeOrdered, not global sort
    val plan = Retrieval.shortlist(df, "id", "s", 3).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("classMeanDirectionE6 learns mean(target) - mean(all), floored e6") {
    val df = Seq(
      (0L, Seq(1.0f, 0.0f), true),
      (1L, Seq(3.0f, 2.0f), true),
      (2L, Seq(-2.0f, 4.0f), false)).toDF("vec_id", "embedding", "t")
    val w = Similarity.classMeanDirectionE6(df, col("t"))
    // dim0: target mean 2, all mean 2/3 → 4/3 → 1333333; dim1: 1 - 2 = -1e6
    assert(w.toSeq == Seq(1333333L, -1000000L))
  }

  test("classMeanDirectionE6 rejects an empty target class with a clear error") {
    val df = Seq((0L, Seq(1.0f, 2.0f), false)).toDF("vec_id", "embedding", "t")
    val e = intercept[IllegalArgumentException] {
      Similarity.classMeanDirectionE6(df, col("t"))
    }
    assert(e.getMessage.contains("empty target class"))
  }

  test("linearScoreInt8 scores quantized vectors exactly and gates at 0") {
    val df = Seq(
      (0L, Seq(1.0f, -1.0f)),   // q = [127, -127]
      (1L, Seq(-0.5f, 1.0f)),   // amax 1 → q = [floor(-63.5+0.5), 127] = [-63, 127]
      (2L, Seq(0.0f, 0.0f))     // zero vector → q = [0, 0]
    ).toDF("vec_id", "embedding")
    val out = Similarity.linearScoreInt8(df, Array(2L, 1L))
      .select("vec_id", "score_q", "predicted").as[(Long, Long, Boolean)]
      .collect().map { case (k, s, p) => k -> ((s, p)) }.toMap
    assert(out(0L) == ((127L * 2 - 127L, true)))
    assert(out(1L) == ((-63L * 2 + 127L, true)))
    assert(out(2L) == ((0L, false)))
  }

  test("quantileGate keeps rows strictly above their own group's percentile") {
    // group g1 scores 1..4: p75 at index 0.75*3 = 2.25 → 3 + 0.25 = 3.25
    // → cutoff_q4 = 13 → keep only score 4. g2 all equal → keep none.
    val df = Seq(("g1", 1L), ("g1", 2L), ("g1", 3L), ("g1", 4L),
      ("g2", 7L), ("g2", 7L)).toDF("g", "score")
    val out = Sampling.quantileGate(df, "g", "score", 0.75)
      .select("g", "score", "cutoff_q4").collect()
    assert(out.length == 1)
    assert(out.head.getString(0) == "g1" && out.head.getLong(1) == 4L
      && out.head.getLong(2) == 13L)
  }

  test("quantileGate broadcasts the per-group cutoffs") {
    val df = Seq(("g1", 1L), ("g1", 2L)).toDF("g", "score")
    val plan = Sampling.quantileGate(df, "g", "score", 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("sourceOverlap computes exact pairwise shingle jaccard incl. zero pairs") {
    val docs = Seq(
      ("s1", "a b c d"),     // 3-gram digests: {abc, bcd}
      ("s2", "a b c"),       // {abc}
      ("s3", "x y z")        // {xyz}
    ).toDF("source", "text")
    val out = TextOps.sourceOverlap(docs, "source", "text", n = 3)
      .orderBy("src1", "src2")
      .select("src1", "src2", "n_inter", "n_union", "jaccard_e6")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("s1", "s2", 1L, 2L, 500000L),
      ("s1", "s3", 0L, 3L, 0L),
      ("s2", "s3", 0L, 2L, 0L)))
  }

  test("chunkSharePairs emits distinct ordered pairs; hot-span cap prunes edges") {
    val docs = Seq(
      (1L, "a b c d"),   // chunks(2): {ab, cd}
      (2L, "a b x y"),   // {ab, xy}
      (3L, "c d x y"),   // {cd, xy}
      (4L, "p q")        // {pq} — isolated
    ).toDF("doc_id", "text")
    val pairs = Dedup.chunkSharePairs(docs, "doc_id", "text", chunkLen = 2)
      .orderBy("id1", "id2").as[(Long, Long)].collect().toSeq
    assert(pairs == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    // cap at df ≤ 2 keeps everything (each span df ≤ 2); a shared span in
    // 3 docs would be dropped
    val docs3 = Seq((1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "a b c d"))
      .toDF("doc_id", "text")
    val capped = Dedup.chunkSharePairs(docs3, "doc_id", "text", chunkLen = 2,
      maxSpanDf = Some(2)).collect()
    // span "a b" df=3 > 2 → pruned from the edge set... but doc 4's
    // distinct tail span "c d" (df=1) survives, pairing with nothing
    assert(capped.isEmpty)
  }

  test("tokenBudgetFill keeps docs whose start offset is under the group budget") {
    // draw order within a group is (hashUniform(id), id) — compute it
    // here and check the running-sum cut matches the scalar replay
    val docs = Seq(
      (1L, "g1", "a b c"), (2L, "g1", "d e"), (3L, "g1", "f g h i"),
      (4L, "g2", "x")).toDF("doc_id", "source", "text")
    val out = Sampling.tokenBudgetFill(docs, "doc_id", "text", "source", budget = 5L)
      .select("doc_id", "start_toks").as[(Long, Long)].collect().toMap
    def u(id: Long) = (((id % 2147483648L) * 1103515245L + 12345L) % 2147483648L + 0.5) / 2147483648.0
    val order = Seq(1L -> 3L, 2L -> 2L, 3L -> 4L).sortBy { case (id, _) => (u(id), id) }
    val starts = order.scanLeft(0L)(_ + _._2).init
    val expected = order.map(_._1).zip(starts).filter(_._2 < 5L).toMap + (4L -> 0L)
    assert(out == expected)
    // every non-empty group fills at least one doc
    assert(out.contains(4L))
  }

  test("tokenBudgetFill two-level scan matches a naive per-group window") {
    import org.apache.spark.sql.expressions.Window
    val docs = (1L to 200L).map(i => (i, s"g${i % 3}", ("w " * (i.toInt % 17 + 1)).trim))
      .toDF("doc_id", "source", "text")
    // nBuckets = 4 forces multi-doc buckets, exercising both scan levels
    val fast = Sampling.tokenBudgetFill(docs, "doc_id", "text", "source",
      budget = 100L, nBuckets = 4)
      .select("doc_id", "start_toks").as[(Long, Long)].collect().toMap
    val w = Window.partitionBy("source")
      .orderBy(Sampling.hashUniform(col("doc_id")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = docs
      .withColumn("n", graft.functions.TextFunctions.tokenCount(col("text")))
      .withColumn("start_toks", coalesce(sum("n").over(w), lit(0L)))
      .filter(col("start_toks") < 100L)
      .select("doc_id", "start_toks").as[(Long, Long)].collect().toMap
    assert(fast == naive)
  }

  test("containmentPairs finds asymmetric subset near-dups that jaccard misses") {
    // doc 2's shingles {abc, bcd} are fully inside doc 1's {abc, bcd,
    // cde, def, efg}; jaccard = 2/5 = 0.4 but containment(2→1) = 1.0.
    // doc 3 shares nothing above threshold.
    val docs = Seq(
      (1L, "en", "a b c d e f g"),
      (2L, "en", "a b c d"),
      (3L, "en", "x y z w")).toDF("doc_id", "lang", "text")
    // maxDfFraction 0.7: at 3 docs the shared shingles have df 2 —
    // the default 0.5 cap (1.5 docs) would prune them in a corpus
    // this small
    val out = TextOps.containmentPairs(docs, "doc_id", "text",
        n = 3, blockCols = Seq("lang"), maxDfFraction = 0.7,
        minContainment = 0.8)
      .select("id1", "id2", "c1_e6", "c2_e6")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, 400000L, 1000000L)))
  }

  test("containmentPairs blocks across languages and prunes hot shingles") {
    // identical text, different lang → blocked apart; with three docs
    // sharing one shingle, df-prune at 0.5 drops it entirely
    val blocked = Seq((1L, "en", "a b c"), (2L, "fr", "a b c"))
      .toDF("doc_id", "lang", "text")
    assert(TextOps.containmentPairs(blocked, "doc_id", "text",
      n = 3, blockCols = Seq("lang")).isEmpty)
    val hot = Seq((1L, "en", "a b c"), (2L, "en", "a b c"), (3L, "en", "a b c"))
      .toDF("doc_id", "lang", "text")
    assert(TextOps.containmentPairs(hot, "doc_id", "text",
      n = 3, blockCols = Seq("lang"), maxDfFraction = 0.5).isEmpty)
  }

  test("mmrRerank trades relevance for diversity and stops at the pool") {
    // q = x-axis; doc 1 most relevant; doc 2 nearly duplicates doc 1;
    // doc 3 equally relevant as 2 but orthogonal to 1 in its residual.
    // Greedy-by-similarity would pick (1, 2, 3); MMR picks (1, 3, 2).
    val emb = Seq(
      (1L, Seq(0.9f, 0.435f, 0f)),
      (2L, Seq(0.85f, 0.526f, 0f)),
      (3L, Seq(0.85f, 0f, 0.526f))).toDF("vec_id", "embedding")
    val out = Retrieval.mmrRerank(emb, Array(1f, 0f, 0f), k = 3,
      poolSize = 3, lambda = 0.7)
    assert(out.select("vec_id").as[Long].collect().toSeq == Seq(1L, 3L, 2L))
    // k beyond the AVAILABLE corpus stops early (2 vectors, k = 3):
    // the loop must exit on exhaustion, not pad or spin
    val short = Retrieval.mmrRerank(emb.filter(col("vec_id") <= 2),
      Array(1f, 0f, 0f), k = 3, poolSize = 3, lambda = 0.7).count()
    assert(short == 2)
    // zero vectors are excluded from the pool, never NaN-ranked first
    val withZero = emb.union(Seq((9L, Seq(0f, 0f, 0f))).toDF("vec_id", "embedding"))
    val ids = Retrieval.mmrRerank(withZero, Array(1f, 0f, 0f), k = 4,
      poolSize = 4, lambda = 0.7).select("vec_id").as[Long].collect().toSet
    assert(!ids.contains(9L) && ids == Set(1L, 2L, 3L))
    // scores are floored micro-units of lambda*sim - (1-lambda)*redundancy
    val first = out.orderBy("step").select("mmr_e6").as[Long].head()
    val sim1 = 0.9 / math.sqrt(0.9 * 0.9 + 0.435 * 0.435)
    assert(first == math.floor(0.7 * sim1 * 1e6).toLong)
  }

  test("dup clusters: connected components label chain by min id with sizes") {
    // chain 1-2, 2-3 plus isolated pair 10-11
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b x y"), (3L, "x y q r"),
      (10L, "m n"), (11L, "m n")).toDF("doc_id", "text")
    val pairs = Dedup.chunkSharePairs(docs, "doc_id", "text", chunkLen = 2)
    val labels = Dedup.nearDupKeeperLabels(pairs)
      .select(col("id"), col("lab")).as[(Long, Long)].collect().toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }
}
