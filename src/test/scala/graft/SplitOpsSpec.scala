package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Round-8 split family (q115–q118): hash-holdout assignment,
  * vocabulary coverage, the per-row entropy machinery, and the
  * split-leakage audit's plan shape.
  */
class SplitOpsSpec extends SparkSpec {
  import spark.implicits._

  test("tokenRunCounts is the sorted-run histogram: multiset of counts matches groupBy") {
    val docs = Seq(
      "a b a b a",          // a:3 b:2
      "x",                  // x:1
      "k k k k",            // k:4
      "p q r p q r p",      // p:3 q:2 r:2
      "",                   // []
      "   "                 // whitespace-only → []
    ).toDF("text")
    val got = docs.select(sort_array(TextFunctions.tokenRunCounts($"text")).as("c"))
      .as[Seq[Int]].collect().toSeq
    assert(got == Seq(Seq(2, 3), Seq(1), Seq(4), Seq(2, 2, 3), Seq(), Seq()))
  }

  test("tokenRunCounts differential vs relational explode+groupBy on the corpus") {
    val docs = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
    val perRow = docs.select($"doc_id",
      sort_array(TextFunctions.tokenRunCounts($"text")).as("counts"))
    val relational = docs
      .select($"doc_id", explode(TextFunctions.tokens($"text")).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).cast("int").as("c"))
      .groupBy("doc_id").agg(sort_array(collect_list("c")).as("counts"))
    assert(perRow.join(relational, "doc_id")
      .filter(perRow("counts") =!= relational("counts")).isEmpty)
  }

  test("unigramClogcE6: floored terms sum; null on empty; ln(1)-runs contribute 0") {
    val got = Seq("a a a b", "c d e", "").toDF("text")
      .select(TextFunctions.unigramClogcE6($"text")).as[Option[Long]].collect().toSeq
    // "a a a b": 3·ln3·1e6 = 3295836.866… → 3295836; 1·ln1 = 0
    assert(got == Seq(Some(3295836L), Some(0L), None))
  }

  test("native clogc kernel ≡ HOF differential oracle on the corpus") {
    val docs = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
    val diff = docs.select(
      TextFunctions.unigramClogcE6($"text").as("native"),
      TextFunctions.unigramClogcE6Hof($"text").as("hof"))
    assert(diff.filter(!($"native" <=> $"hof")).isEmpty)
  }

  test("split assignment is a total partition with frozen membership") {
    val d = "/root/testdata/sf0.001"
    val q = SparkEntry.queries("q115_stratified_split")(spark, d)
    val splits = q.select("split").distinct().as[String].collect().toSet
    assert(splits.subsetOf(Set("train", "valid", "test")) && splits.contains("train"))
    // totality: the report's doc count equals the corpus count
    val total = q.agg(sum("n_docs")).as[Long].head()
    assert(total == graft.engine.Tables.documents(spark, d).count())
  }

  test("vocab coverage is monotone and ends ≤ 10000 bp") {
    val rows = SparkEntry.queries("q116_vocab_coverage")(spark, "/root/testdata/sf0.001")
      .select("rank", "cov_bp").as[(Long, Long)].collect().sortBy(_._1)
    assert(rows.nonEmpty && rows.size <= 16)
    assert(rows.sliding(2).forall { case Array((_, a), (_, b)) => a <= b; case _ => true })
    assert(rows.last._2 <= 10000L)
  }

  test("rankVocab matches the naive global ranking window, including ties and skew") {
    // heavy tf=1 tail (the web-vocab shape), duplicate tf values both
    // within and across log2 bands, and tie-break-on-token cases
    val vc = (Seq(("the", 900L), ("of", 512L), ("and", 512L), ("a", 511L),
      ("to", 300L), ("in", 64L), ("is", 64L), ("it", 63L), ("on", 7L),
      ("at", 7L), ("by", 7L), ("or", 2L), ("an", 1L)) ++
      (1 to 500).map(i => (f"tail$i%04d", 1L))).toDF("token", "tf")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"tf".desc, $"token")
    val naive = vc
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum", sum("tf").over(
        w.rowsBetween(Long.MinValue, 0)))
      .filter($"rank" <= 16)
      .select("token", "tf", "rank", "cum")
    val banded = graft.engine.SplitQueries.rankVocab(vc, 16)
    assert(banded.count() === 16)
    assert(banded.exceptAll(naive).isEmpty && naive.exceptAll(banded).isEmpty)
  }

  test("q116/q119 plans have no corpus-sized unpartitioned window") {
    // the only unpartitioned WindowExec allowed is the ≤64-row band-
    // offset prefix (outputs band/cnt_off/sum_off, never the token);
    // the token-carrying ranking window must be PARTITIONED (by band)
    for (q <- Seq("q116_vocab_coverage", "q119_oov_rate")) {
      // unwrap the AQE root (and any nested adaptive subtrees) or
      // collect() sees only the AdaptiveSparkPlanExec wrapper
      def windowsIn(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.window.WindowExec] =
        p.collect {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            windowsIn(a.executedPlan)
          case w: org.apache.spark.sql.execution.window.WindowExec => Seq(w)
        }.flatten
      val plan = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan
      val windows = windowsIn(plan)
      assert(windows.nonEmpty, s"$q: expected window nodes")
      val unpartitionedOverTokens = windows.filter(w =>
        w.partitionSpec.isEmpty &&
          w.child.output.exists(_.name == "token"))
      assert(unpartitionedOverTokens.isEmpty,
        s"$q: token-carrying unpartitioned window:\n$plan")
      assert(windows.exists(w => w.partitionSpec.nonEmpty),
        s"$q: expected a band-partitioned ranking window:\n$plan")
    }
  }

  test("q118 leakage join broadcasts the test-split shingle set") {
    val plan = SparkEntry.queries("q118_split_leakage")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast of test shingles:\n$plan")
  }

  test("q117 entropy is computed inside the row: no explode, no aggregate in the plan") {
    // the relational formulation would show Generate (explode) +
    // HashAggregate over (doc, token); the per-row form must show
    // neither — its only exchange is the final presentation sort
    val plan = SparkEntry.queries("q117_entropy_gate")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"), s"unexpected explode:\n$plan")
    assert(!plan.contains("HashAggregate"), s"unexpected aggregate:\n$plan")
  }

  test("q119 OOV counts are consistent and the vocab join broadcasts") {
    val df = SparkEntry.queries("q119_oov_rate")(spark, "/root/testdata/sf0.001")
    assert(df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    val rows = df.select("n_toks", "n_oov", "oov_bp").as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, oov, bp) =>
      assert(oov <= n && bp == oov * 10000 / n)
    }
  }

  test("q120 spectrum conserves the corpus: Σ n_docs = |docs|, n_docs = k·n_clusters") {
    val d = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q120_dup_spectrum")(spark, d)
      .select("cluster_size", "n_clusters", "n_docs").as[(Long, Long, Long)].collect()
    rows.foreach { case (k, c, nd) => assert(nd == k * c) }
    assert(rows.map(_._3).sum == graft.engine.Tables.documents(spark, d).count())
  }

  test("q121 boilerplate spans: df ≥ 2, ≤ 3 per source, rank ordered by df desc") {
    val rows = SparkEntry.queries("q121_boilerplate_spans")(spark, "/root/testdata/sf0.001")
      .select("source", "df", "rn").as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, df, rn) => assert(df >= 2 && rn >= 1 && rn <= 3) }
    rows.groupBy(_._1).values.foreach { g =>
      val byRn = g.sortBy(_._3)
      assert(byRn.map(_._3).toSeq == (1L to byRn.size).toSeq)
      assert(byRn.sliding(2).forall { case Array(a, b) => a._2 >= b._2; case _ => true })
    }
  }

  test("boilerplate strip: greedy single-pass semantics, hand-computed") {
    import graft.plans.BoilerplateStripExpr.boilerplate_strip
    val spans = Seq("a b c d", "a b a b")
    val got = Seq(
      "x a b c d y",          // simple removal mid-doc
      "a b c d a b c d",      // adjacent occurrences both removed
      "a b a a b a b b a b",  // greedy: hit at pos 3 only; the REJOINED
                              //   text contains "a b a b" — single-pass
                              //   survival, the documented semantic
      "a b c",                // shorter than the window: untouched
      ""                      // empty → empty
    ).toDF("text")
      .select(boilerplate_strip($"text", spans, 4).as("c")).as[String].collect().toSeq
    assert(got == Seq("x y", "", "a b a b a b", "a b c", ""))
  }

  test("q122 output is consistent: n_removed = token delta, multiples of the window") {
    val rows = SparkEntry.queries("q122_boilerplate_strip")(spark, "/root/testdata/sf0.001")
      .select("n_removed").as[Long].collect()
    assert(rows.exists(_ > 0), "fixture must exercise actual removal")
    rows.foreach(r => assert(r >= 0 && r % 4 == 0))
  }

  test("entropy gate keeps only docs at/above 3.0 nats and never exceeds ln(n)") {
    val rows = SparkEntry.queries("q117_entropy_gate")(spark, "/root/testdata/sf0.001")
      .select("n_toks", "ent_e6").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, e) =>
      assert(e >= 3000000L)
      assert(e <= math.floor(math.log(n.toDouble) * 1000000.0).toLong)
    }
  }
}
