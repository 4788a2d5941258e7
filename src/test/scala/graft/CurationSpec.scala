package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions, VectorFunctions}
import graft.operators.{Decontaminate, Dedup, Mixing, Packing, Similarity}

/** Round-6 curation operators: Bloom decontamination, sequence
  * packing, mixing rebalance, int8 quantization, Gopher gate.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")

  test("bloom decontamination equals the exact-join formulation (no false negatives, verified positives)") {
    val benchmark = docs.filter(col("doc_id") % 37 === 0)
    val corpus = docs.filter(col("doc_id") % 37 =!= 0)
    val viaBloom = Decontaminate.contaminatedDocs(corpus, benchmark)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // the exact formulation (q68's shape): shared distinct 4-gram count
    val sh = docs.select(col("doc_id"),
      explode(array_distinct(Dedup.shingles(col("text"), 4))).as("shingle"))
      .filter(col("shingle") =!= "")
    val ev = sh.filter(col("doc_id") % 37 === 0).select("shingle").distinct()
    val exact = sh.filter(col("doc_id") % 37 =!= 0)
      .join(ev, "shingle")
      .groupBy("doc_id").agg(countDistinct("shingle").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaBloom === exact,
      "bloom prefilter + exact verify must reproduce the exact join bit-for-bit")
    assert(exact.nonEmpty, "gate corpus must actually exercise contamination")
  }

  test("bloom prefilter actually prunes and the predicate is a plan literal") {
    val benchmark = docs.filter(col("doc_id") % 37 === 0)
    val evalShingles = benchmark.select(
      explode(array_distinct(Dedup.shingles(col("text"), 4))).as("shingle"))
      .filter(col("shingle") =!= "").distinct()
    val bloom = Decontaminate.buildBloom(evalShingles, "shingle",
      expectedItems = 10000).get
    val corpusShingles = docs.filter(col("doc_id") % 37 =!= 0)
      .select(explode(array_distinct(Dedup.shingles(col("text"), 4))).as("shingle"))
      .filter(col("shingle") =!= "")
    val total = corpusShingles.count()
    val kept = corpusShingles
      .filter(Decontaminate.mightContain(bloom, col("shingle"))).count()
    // true overlap is a tiny fraction; at 1% fpp the filter must drop
    // the overwhelming majority of clean shingles
    assert(kept < total / 2,
      s"bloom should prune most non-benchmark shingles: kept $kept of $total")
    assert(kept > 0, "true contaminated shingles must survive")
    // and the membership test is a codegen'd expression on a literal,
    // not a join
    val plan = corpusShingles
      .filter(Decontaminate.mightContain(bloom, col("shingle")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"expected might_contain in:\n$plan")
    assert(!plan.contains("Join"), s"the prefilter must not be a join:\n$plan")
  }

  test("duplicate-id corpus rows do not inflate the overlap count") {
    // re-crawled revisions: the same doc_id twice, each carrying the
    // same benchmark shingle — n_overlap must still be 1 (the
    // distinct-overlap semantics the exact formulation defines)
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val corpus = Seq(
      (5L, "prefix alpha beta gamma delta suffix"),
      (5L, "other prefix alpha beta gamma delta"),
      (6L, "entirely clean words only here")).toDF("doc_id", "text")
    val out = Decontaminate.contaminatedDocs(corpus, bench)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out === Map(5L -> 1L), s"got $out")
  }

  test("a degenerate zero centroid must not capture the corpus (NaN demotion)") {
    val rnd = new scala.util.Random(41)
    val corpus = (0L until 60L)
      .map(i => (i, Array.fill(4)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val cents = Seq(
      0L -> Array(0.0, 0.0, 0.0, 0.0), // degenerate seed: cosine = NaN
      1L -> Array(1.0, 0.0, 0.0, 0.0),
      2L -> Array(-1.0, 0.0, 0.0, 0.0))
    val byList = Similarity.kmeansAssign(corpus, cents)
      .collect().map(_.getLong(1)).groupBy(identity).view.mapValues(_.length).toMap
    assert(!byList.contains(0L),
      s"NaN scores must rank below real similarities: $byList")
    assert(byList.keySet === Set(1L, 2L), s"real centroids split the corpus: $byList")
  }

  test("empty benchmark yields an empty contamination result") {
    val out = Decontaminate.contaminatedDocs(
      docs, docs.filter(col("doc_id") < 0))
    assert(out.collect().isEmpty)
    assert(out.columns.toSeq === Seq("doc_id", "n_overlap"))
  }

  test("packing reproduces the naive global prefix sum across bucket boundaries") {
    val rnd = new scala.util.Random(7)
    // ids with gaps + empty docs; bucketSize 7 forces many buckets
    val rows = (0L until 500L).filter(_ % 3 != 1).map { i =>
      (i * 2, if (i % 11 == 0) 0 else rnd.nextInt(40) + 1)
    }
    val counts = rows.toDF("id", "n_toks")
    val out = Packing.packCounts(counts, ctxLen = 64, bucketSize = 7)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .sortBy(_._1) // the operator is unsorted by design
    // driver-side oracle: running sum in id order
    var acc = 0L
    val expected = rows.sortBy(_._1).map { case (id, n) =>
      val start = acc; acc += n
      (id, (n.toLong, start, start / 64, start % 64))
    }
    assert(out.toSeq === expected)
  }

  test("packing plans bounded windows: doc-level window is bucket-partitioned") {
    val counts = (0L until 200L).map(i => (i, (i % 13).toInt)).toDF("id", "n_toks")
    val df = Packing.packCounts(counts, ctxLen = 32, bucketSize = 16)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // the doc-level running sum must carry the bucket partition key
    // (no corpus-wide single-partition window over the documents)
    assert(plan.contains("windowspecdefinition(__bucket"),
      s"doc-level window must be partitioned by __bucket:\n$plan")
  }

  test("uniform rebalance: under-represented strata keep all rows, over-represented shrink toward the share") {
    val docs01 = graft.engine.Tables.documents(spark, "/root/testdata/sf0.01")
    val before = docs01.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = Mixing.rebalanceUniform(docs01, "lang")
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = before.values.sum
    val share = total / before.size // 100 at sf0.01
    before.foreach { case (lang, n) =>
      if (n * before.size <= total)
        assert(after(lang) === n, s"$lang is under target and must keep all rows")
      else {
        // hash gate realizes the fraction to within sampling noise
        assert(after(lang) < n, s"$lang must shrink")
        assert(math.abs(after(lang) - share) < share / 2,
          s"$lang: got ${after(lang)}, target ~$share")
      }
    }
    // deterministic: identical on re-run (set compare — unsorted op)
    val again = Mixing.rebalanceUniform(docs01, "lang")
      .collect().map(_.getLong(0)).toSet
    assert(again === Mixing.rebalanceUniform(docs01, "lang")
      .collect().map(_.getLong(0)).toSet)
  }

  test("weighted rebalance honors per-mille shares and absent strata keep all") {
    val data = (0L until 900L).map(i =>
      (i, if (i < 600) "big" else if (i < 800) "mid" else "small"))
      .toDF("doc_id", "s")
    // big: target 10% of 900 = 90 rows; mid absent (keeps 200);
    // small target 50% of 900 = 450 > 100 → keeps all 100
    val out = Mixing.rebalanceWeighted(data, "s",
      Map("big" -> 100, "small" -> 500))
      .groupBy("s").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("mid") === 200L)
    assert(out("small") === 100L)
    assert(out("big") < 600L && math.abs(out("big") - 90L) < 45,
      s"big should be ~90, got ${out("big")}")
  }

  test("no window or global sort in the rebalance plan") {
    val docs01 = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
    val df = Mixing.rebalanceUniform(docs01, "lang")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!plan.contains("Window"), s"rebalance must be window-free:\n$plan")
    assert(!plan.contains("Sort"), s"rebalance must be sort-free:\n$plan")
  }

  test("int8 quantization: values in [-127,127], error bounded by half a step, exact roundtrip on grid points") {
    val rnd = new scala.util.Random(23)
    val vecs = (0L until 200L).map { i =>
      (i, Array.fill(16)((rnd.nextFloat() * 2 - 1) * (i % 7 + 1)))
    } :+ (200L, Array.fill(16)(0f)) // all-zero vector
    val df = vecs.toDF("vec_id", "embedding")
    val out = df.select(col("vec_id"),
      VectorFunctions.absMax(col("embedding")).as("amax"),
      VectorFunctions.int8Quantize(col("embedding")).as("q"),
      VectorFunctions.int8Error(col("embedding")).as("err")).collect()
    out.foreach { r =>
      val amax = if (r.isNullAt(1)) 0.0 else r.getDouble(1)
      val q = r.getSeq[Long](2)
      val err = r.getDouble(3)
      assert(q.forall(v => v >= -127 && v <= 127), s"q out of range: $q")
      val bound = amax / 254.0 * (1 + 1e-9) + 1e-12
      assert(err <= bound, s"vec ${r.getLong(0)}: err $err > bound $bound")
    }
    // zero vector → zeros, zero error
    val z = out.find(_.getLong(0) == 200L).get
    assert(z.getSeq[Long](2).forall(_ == 0L) && z.getDouble(3) === 0.0)
    // grid points reconstruct exactly: x = k·amax/127 with amax = 127
    val grid = Seq((0L, Array(127f, -127f, 64f, 0f, -3f))).toDF("vec_id", "embedding")
    val g = grid.select(
      VectorFunctions.int8Quantize(col("embedding")).as("q"),
      VectorFunctions.int8Error(col("embedding")).as("err")).head
    assert(g.getSeq[Long](0) === Seq(127L, -127L, 64L, 0L, -3L))
    assert(g.getDouble(1) === 0.0)
  }

  test("kmeans refinement converges to planted cluster means; assignment is stateless") {
    val rnd = new scala.util.Random(31)
    // three well-separated unit-ish cluster centers in 8 dims
    val centers = Seq(
      Array(1.0, 0, 0, 0, 1, 0, 0, 0),
      Array(0, 1.0, 0, 0, 0, 1, 0, 0),
      Array(0, 0, 1.0, 0, 0, 0, 1, 0))
    val vecs = (0L until 300L).map { i =>
      val c = centers((i % 3).toInt)
      (i, c.map(x => (x + rnd.nextGaussian() * 0.05).toFloat))
    }
    val corpus = vecs.toDF("vec_id", "embedding")
    // deliberately poor seeding: three copies of a corner point nudged
    // toward each true center
    val init = centers.zipWithIndex.map { case (c, j) =>
      (j.toLong, c.map(_ * 0.2 + 0.4).toSeq)
    }.toDF("list_id", "centroid")
    val refined = Similarity.kmeansRefine(corpus, init, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(refined.size === 3, s"all three clusters must survive: ${refined.keySet}")
    // every refined centroid lies within noise distance of a distinct
    // planted center (cosine > 0.99)
    val matched = centers.map { c =>
      refined.values.exists { m =>
        val dot = c.zip(m).map { case (a, b) => a * b }.sum
        val nc = math.sqrt(c.map(x => x * x).sum)
        val nm = math.sqrt(m.map(x => x * x).sum)
        dot / (nc * nm) > 0.99
      }
    }
    assert(matched.forall(identity), s"refined centroids must recover planted centers: $refined")

    // assignment is one stateless pass: no join, no window, no
    // aggregate before the recompute's own aggregation
    val cents = refined.toSeq.map { case (l, c) => (l, c.toArray) }
    val asg = Similarity.kmeansAssign(corpus, cents)
    asg.collect()
    val plan = asg.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!plan.contains("Join"), s"assignment must be join-free:\n$plan")
    assert(!plan.contains("Window"), s"assignment must be window-free:\n$plan")
    assert(!plan.contains("Sort"), s"assignment must be sort-free:\n$plan")
    // and it assigns the planted clusters correctly
    val byCluster = asg.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1 % 3).map { case (k, v) => k -> v.map(_._2).distinct }
    assert(byCluster.values.forall(_.length === 1),
      s"each planted cluster maps to exactly one list: $byCluster")
  }

  test("gopher gate: each rule independently rejects") {
    val cases = Seq(
      (1L, "the quick brown fox jumps over a lazy dog", true), // passes all
      (2L, "too short", false),                                // < 5 words
      (3L, "a b c d e f g h", false),                          // avg word len < 2
      (4L, "pneumonoultramicroscopic silicovolcanoconiosis " * 5 + "the a of", false), // avg len > 12
      (5L, "quick brown foxes jump high over lazy sleeping dogs", false)) // no stopword
    val df = cases.map(c => (c._1, c._2)).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), TextFunctions.gopherKeep(col("text")))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    cases.foreach { case (id, _, want) =>
      assert(got(id) === want, s"doc $id")
    }
  }

  test("policyAudit: longest prefix wins, default-allow, messy URLs canonicalize; zero exchanges") {
    import spark.implicits._
    val policy = Seq(
      ("x.example.com", "/", false), ("x.example.com", "/pub", true),
      ("x.example.com", "/pub/raw", false),
      ("y.example.com", "/data", false))
    val docs = Seq(
      (1L, "http://x.example.com/pub/a"),          // /pub allow (len 4)
      (2L, "http://x.example.com/pub/raw/b"),      // /pub/raw deny (len 8)
      (3L, "http://x.example.com/secret"),         // / deny (len 1)
      (4L, "HTTP://WWW.X.EXAMPLE.COM:80/pub/a?utm_source=z#f"), // canon → allow
      (5L, "http://y.example.com/other"),          // no match → default allow
      (6L, "http://z.example.com/anything"),       // unlisted host → allow
      (7L, "not a url at all")                     // hostless → no rule → allow
    ).toDF("doc_id", "url")
    val audit = graft.operators.TextOps.policyAudit(docs, "url", policy)
    val got = audit.select("doc_id", "__allow").as[(Long, Boolean)].collect().toMap
    assert(got === Map(1L -> true, 2L -> false, 3L -> false, 4L -> true,
      5L -> true, 6L -> true, 7L -> true), s"verdicts: $got")
    // the gate keeps exactly the allowed rows
    val kept = graft.operators.TextOps.policyGate(docs, "url", policy)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 4L, 5L, 6L, 7L))
    // policy-as-literal: the whole audit plans with NO exchange and
    // NO join — the verdict is resolved inside the scan stage
    val plan = audit.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"policy gate must not shuffle:\n$plan")
    assert(!plan.toLowerCase.contains("join"), s"policy gate must not join:\n$plan")
  }
}
