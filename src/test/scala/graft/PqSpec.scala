package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.operators.{Pq, Similarity}

/** Product quantization (q123 family): kernel ≡ expression-tree
  * differentials in both execution modes, the null contract, recall
  * against exact cosine top-k on planted near-neighbors, and the
  * compression/plan shape the operator exists for.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def corpus = graft.engine.Tables.embeddings(spark, sf)
    .filter($"vec_id" =!= 0)
  private def query = graft.engine.Tables.embeddings(spark, sf)
    .filter($"vec_id" === 0)

  test("pq_encode and pq_adc_score match the HOF/expression-tree forms in both modes") {
    val cb = Pq.trainCodebookE6(corpus, m = 8, ksub = 16, iters = 1)
    val lut = Pq.lutFor(cb, Pq.queryWeightsE6(query))
    def check(): Unit = {
      // two separate comparisons: chaining the HOF encode tree into
      // the HOF score inlines it once per score term (Catalyst's
      // project-collapse) — the documented capture blowup, here it
      // OOMs the optimizer, and exactly why the production path is a
      // native kernel
      val encDiff = corpus.select(
        VectorFunctions.pqEncode($"embedding", cb.flatE6.toSeq, cb.m, cb.ksub).as("nk"),
        VectorFunctions.pqEncodeHof($"embedding", cb.flatE6.toSeq, cb.m, cb.ksub).as("hk"))
        .filter($"nk" =!= $"hk")
      assert(encDiff.count() === 0)
      val enc = Pq.encode(corpus, cb)
      val scoreDiff = enc.select(
        VectorFunctions.pqAdcScore($"codes", lut.toSeq, cb.m, cb.ksub).as("ns"),
        VectorFunctions.pqAdcScoreHof($"codes", lut.toSeq, cb.m, cb.ksub).as("hs"))
        .filter($"ns" =!= $"hs")
      assert(scoreDiff.count() === 0)
    }
    check()
    val conf = spark.conf
    val prevWhole = conf.get("spark.sql.codegen.wholeStage", "true")
    val prevFactory = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    conf.set("spark.sql.codegen.wholeStage", "false")
    conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try check()
    finally {
      conf.set("spark.sql.codegen.wholeStage", prevWhole)
      conf.set("spark.sql.codegen.factoryMode", prevFactory)
    }
  }

  test("pq_encode null contract: null vector, null element, wrong length") {
    // 2 blocks × 2 codes × subdim 2 → dim 4; trivial codebook
    val cb = Seq(0L, 0L, 1000000L, 1000000L, 0L, 0L, -1000000L, -1000000L)
    val rows = Seq(
      (1L, Some(Seq[java.lang.Double](0.1, 0.2, -0.3, -0.4))),
      (2L, None),
      (3L, Some(Seq[java.lang.Double](0.1, null, -0.3, -0.4))),
      (4L, Some(Seq[java.lang.Double](0.1, 0.2)))
    ).toDF("id", "v")
      .select($"id", VectorFunctions.pqEncode($"v", cb, 2, 2).as("codes"))
      .orderBy("id").collect()
    assert(!rows(0).isNullAt(1))
    assert(rows(1).isNullAt(1) && rows(2).isNullAt(1) && rows(3).isNullAt(1))
    // corrupt pack (code byte ≥ ksub) scores null, not a wrong lookup
    val bad = Seq(3L).toDF("codes")
      .select(VectorFunctions.pqAdcScore($"codes", Seq(1L, 2L, 3L, 4L), 2, 2))
      .collect()(0)
    assert(bad.isNullAt(0))
  }

  test("assignment minimizes in-block distance; ties break to the smaller code") {
    // 1 block, 3 codes, subdim 1; vector 0.0 is equidistant to codes
    // 0 (+1) and 1 (-1) → code 0; 2 is exact → code 2 for 2.0
    val cb = Seq(1000000L, -1000000L, 2000000L)
    val got = Seq(Seq(0.0f), Seq(2.0f), Seq(-0.9f)).toDF("v")
      .select(VectorFunctions.pqEncode($"v", cb, 1, 3).as("c"))
      .as[Long].collect().toSeq
    assert(got == Seq(0L, 2L, 1L))
  }

  test("empty Lloyd cluster keeps its seed centroid (deterministic fallback)") {
    // two tight groups around +1 and -1 on every axis, ids 0..7:
    // ksub=4 seeds from id%4 buckets mix the groups; after one round
    // the survivors split the groups and any emptied cluster must
    // retain its seed centroid instead of failing or shrinking
    val vecs = (0 until 8).map { i =>
      val v = if (i % 2 == 0) 1.0 else -1.0
      (i.toLong, Seq.fill(4)(v + i * 1e-7))
    }.toDF("vec_id", "embedding")
    val cb = Pq.trainCodebookE6(vecs, m = 2, ksub = 4, iters = 2)
    assert(cb.flatE6.length === 2 * 4 * 2)
    // training is deterministic: same input → same codebook
    val cb2 = Pq.trainCodebookE6(vecs, m = 2, ksub = 4, iters = 2)
    assert(cb.flatE6.toSeq == cb2.flatE6.toSeq)
  }

  test("PQ top-k recall vs exact cosine top-k on planted near-neighbors") {
    // plant 5 tiny perturbations of the query among the corpus: exact
    // top-5 is the planted set, and PQ ADC must keep them in its
    // top-20 shortlist (the re-rank pool) — the contract that makes a
    // 32×-compressed first pass usable
    val q = query.select($"embedding").as[Seq[Float]].head()
    val planted = (1 to 5).map { i =>
      (10000L + i, q.zipWithIndex.map { case (x, j) =>
        x + (if (j % 5 == i % 5) 2e-4f else 0f) })
    }
    val full = corpus.select($"vec_id", $"embedding".cast("array<float>"))
      .as[(Long, Seq[Float])].collect().toSeq ++ planted
    val corpusDf = full.toDF("vec_id", "embedding")
    val pqTop = Pq.pqTopK(corpusDf, query, k = 20, m = 8, ksub = 16, iters = 1)
      .select("vec_id").as[Long].collect().toSet
    val exactTop = Similarity.cosineTopK(corpusDf, query, k = 5)
      .select("cid").as[Long].collect().toSet
    assert(exactTop == planted.map(_._1).toSet,
      s"planted set is not the exact top-5: $exactTop")
    assert(planted.map(_._1).toSet.subsetOf(pqTop),
      s"PQ shortlist missed planted neighbors: ${planted.map(_._1).toSet -- pqTop}")
  }

  test("retrieval scan reads only the packed-codes long column") {
    val cb = Pq.trainCodebookE6(corpus, m = 8, ksub = 16, iters = 1)
    val enc = Pq.encode(corpus, cb)
    val out = tmpDir("pq_codes")
    enc.write.mode("overwrite").parquet(out)
    // stored form: one long per vector (+id) — 32× vs 64-dim float32
    val stored = spark.read.parquet(out)
    val plan = Pq.adcTopK(stored, cb, Pq.queryWeightsE6(query), 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema") &&
      plan.replaceAll("\\s", "").contains("struct<vec_id:bigint,codes:bigint>"),
      s"expected a codes-only scan:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k, not sort:\n$plan")
  }

  test("driver-local codebook training ≡ distributed Lloyd rounds (conf-forced)") {
    // the r15 local-training fast path must produce the IDENTICAL
    // codebook: same integer seed means (div truncation), same
    // strict-< smaller-code tie rule, same empty-cluster fallback.
    import spark.implicits._
    val vecs = (0L until 40L).map { i =>
      (i, Array.tabulate(8)(j => ((i * 37 + j * 11) % 23).toDouble / 7.0 - 1.5).toSeq)
    }.toDF("vec_id", "embedding")
    def forced[A](f: => A): A = {
      spark.conf.set("spark.graft.pq.localTrainMaxRows", "0")
      try f finally spark.conf.unset("spark.graft.pq.localTrainMaxRows")
    }
    for (iters <- Seq(0, 1, 3)) {
      val local = Pq.trainCodebookE6(vecs, m = 4, ksub = 4, iters = iters)
      val dist = forced(Pq.trainCodebookE6(vecs, m = 4, ksub = 4, iters = iters))
      assert(local.m == dist.m && local.ksub == dist.ksub &&
        local.subdim == dist.subdim, s"shape mismatch at iters=$iters")
      assert(local.flatE6.toSeq == dist.flatE6.toSeq,
        s"codebook mismatch at iters=$iters")
    }
  }
}
