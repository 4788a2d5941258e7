package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.Bpe

/** BPE merge induction (q125): kernel ≡ HOF-fold differential in both
  * execution modes, greedy-scan edge semantics, and training pinned
  * against a hand-computed classic fixture.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("bpe_merge kernel matches the HOF fold in both execution modes") {
    def check(): Unit = {
      val docs = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
        .select(expr("filter(split(text, ''), x -> x <> '')").as("syms"))
      // a frequent pair on real character data: ('e', ' ') etc. —
      // exercise three merges including multi-char symbols
      for ((l, r) <- Seq(("e", " "), ("t", "h"), ("th", "e"))) {
        val diff = docs.select(
          graft.plans.BpeMergeExpr.bpe_merge($"syms", l, r).as("nk"),
          TextFunctions.bpeMergeHof($"syms", l, r).as("hk"))
          .filter(not($"nk" === $"hk"))
        assert(diff.count() === 0, s"merge ($l,$r) diverged")
      }
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

  test("greedy leftmost non-overlapping scan: runs, products, nulls") {
    def merge(in: Seq[String], l: String, r: String): Seq[String] =
      Seq(Tuple1(in)).toDF("syms")
        .select(graft.plans.BpeMergeExpr.bpe_merge($"syms", l, r))
        .as[Seq[String]].head()
    // run of four 'a': two non-overlapping merges, never a chain
    assert(merge(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
    // run of three: merge + orphan
    assert(merge(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    // a merge product never re-merges within the round
    assert(merge(Seq("a", "b", "a", "b"), "a", "b") == Seq("ab", "ab"))
    // no match → unchanged
    assert(merge(Seq("x", "y"), "a", "b") == Seq("x", "y"))
    // null elements never match and pass through
    val withNull = Seq(Tuple1(Seq[String]("a", null, "a"))).toDF("syms")
      .select(graft.plans.BpeMergeExpr.bpe_merge($"syms", "a", "a"))
      .collect()(0).getSeq[String](0)
    assert(withNull == Seq("a", null, "a"))
  }

  test("training replays the classic low/lower/newest fixture by hand") {
    // word freqs: low×5, lower×2, newest×6 — richest pairs first:
    // (e,s) 6, (e,w) 6+2=8, (s,t) 6, (n,e) 6, (w,e) 6+2... compute:
    // adjacent pairs: low: l-o, o-w ×5; lower: l-o, o-w, w-e, e-r ×2;
    // newest: n-e, e-w, w-e, e-s, s-t ×6
    // counts: l-o 7, o-w 7, w-e 8, e-r 2, n-e 6, e-w 6, e-s 6, s-t 6
    // round 1: (w,e) 8 → we
    // round 2: l-o 7, o-we 7 (low's o-w now o-w still? low has no e:
    //   low stays l,o,w; lower → l,o,we,r; newest → n,e,we,s,t)
    //   counts: l-o 7, o-w 5, o-we 2, we-r 2, n-e 6, e-we 6, we-s 6, s-t 6
    //   → (l,o) 7 → lo
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest")).map(Tuple1(_)).toDF("text")
    val merges = Bpe.trainMerges(docs, "text", 2)
    assert(merges.map(m => (m.round, m.lhs, m.rhs, m.pairCount)) ==
      Seq((1, "w", "e", 8L), (2, "l", "o", 7L)))
    // determinism: identical rerun
    assert(Bpe.trainMerges(docs, "text", 2) == merges)
    // encode side: applying the merges re-tokenizes 'lower'
    val enc = Seq(Tuple1("lower")).toDF("text")
      .select(Bpe.applyMerges(
        expr("filter(split(text, ''), x -> x <> '')"), merges).as("syms"))
      .as[Seq[String]].head()
    assert(enc == Seq("lo", "we", "r"))
  }

  test("batched training skips symbol-sharing candidates within a round") {
    // pairs of "the"×9: t-h 9, h-e 9 — they share 'h', so one counting
    // round with batchSize 2 may accept only (h,e)... ordering: counts
    // tie at 9, lexical (h,e) < (t,h) → accept (h,e); (t,h) shares h →
    // skipped. Next round re-counts: "the" → t,he: (t,he) 9.
    val docs = Seq.fill(9)(Tuple1("the")).toDF("text")
    val batched = Bpe.trainMerges(docs, "text", nMerges = 2, batchSize = 2)
    assert(batched.map(m => (m.round, m.lhs, m.rhs, m.pairCount)) ==
      Seq((1, "h", "e", 9L), (2, "t", "he", 9L)))
    // the skip rule makes batched ≡ sequential here (the conflicting
    // pair was deferred to a fresh count, not taken on stale numbers)
    assert(batched == Bpe.trainMerges(docs, "text", nMerges = 2))
  }

  test("batchSize 1 is bit-identical to the classic sequential trainer") {
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest")).map(Tuple1(_)).toDF("text")
    assert(Bpe.trainMerges(docs, "text", 4, batchSize = 1) ==
      Bpe.trainMerges(docs, "text", 4))
  }

  test("merge-table artifact round-trips: load == save, encode identical") {
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest")).map(Tuple1(_)).toDF("text")
    val merges = Bpe.trainMerges(docs, "text", nMerges = 4)
    val path = tmpDir("bpe_artifact") + "/merges"
    Bpe.saveMerges(spark, merges, path)
    val loaded = Bpe.loadMerges(spark, path)
    assert(loaded == merges)
    val direct = Bpe.encodeStats(docs.withColumn("doc_id",
        org.apache.spark.sql.functions.monotonically_increasing_id()),
      "doc_id", "text", merges).orderBy("doc_id").collect().toSeq
    val viaArtifact = Bpe.encodeStats(docs.withColumn("doc_id",
        org.apache.spark.sql.functions.monotonically_increasing_id()),
      "doc_id", "text", loaded).orderBy("doc_id").collect().toSeq
    assert(direct == viaArtifact)
  }

  test("WordPiece argmax is the likelihood-gain score, not the pair count") {
    // corpus: "xy"×6, "xz"×20, "ab"×4 → round-1 counts x=26 y=6 z=20
    // a=b=4; pair (x,z) has the top COUNT (20) but score 1/26, while
    // (a,b) scores 4/(4·4)=0.25 — WordPiece must take (a,b) first
    // where BPE takes (x,z). Round 2: (x,y) and (x,z) both score
    // exactly ⌊10¹²/26⌋ (r-symbols exclusive to their pair), so the
    // cnt-DESC tie-break hands it to (x,z).
    val docs = (Seq.fill(6)("xy") ++ Seq.fill(20)("xz") ++ Seq.fill(4)("ab"))
      .map(Tuple1(_)).toDF("text")
    val wp = Bpe.trainWordPiece(docs, "text", nMerges = 2)
    assert(wp == Seq(
      Bpe.WpMerge(1, "a", "b", 4L, 250000000000L),
      Bpe.WpMerge(2, "x", "z", 20L, 38461538461L)))
    val bpe = Bpe.trainMerges(docs, "text", nMerges = 1)
    assert(bpe.head.lhs == "x" && bpe.head.rhs == "z")
  }

  test("batched WordPiece ≡ sequential on a conflict-free corpus; B=1 bit-identical") {
    // four pairwise-disjoint alphabets — symbol-disjoint acceptance
    // pins counts AND score denominators at their sequential values
    val docs = (Seq.fill(5)("abab") ++ Seq.fill(6)("cdcd") ++
      Seq.fill(7)("efef") ++ Seq.fill(8)("ghgh")).map(Tuple1(_)).toDF("text")
    val seqT = Bpe.trainWordPiece(docs, "text", nMerges = 8)
    val batT = Bpe.trainWordPiece(docs, "text", nMerges = 8, batchSize = 4)
    assert(batT == seqT, s"batched $batT vs sequential $seqT")
    // B = 1 through the batched code path is the classic trainer
    val mixed = (Seq.fill(6)("xy") ++ Seq.fill(20)("xz") ++ Seq.fill(4)("ab"))
      .map(Tuple1(_)).toDF("text")
    assert(Bpe.trainWordPiece(mixed, "text", 2, batchSize = 1) ==
      Bpe.trainWordPiece(mixed, "text", 2))
    // conflict skip: shared symbols defer to a fresh scoring round
    val the = Seq.fill(9)(Tuple1("the")).toDF("text")
    val b2 = Bpe.trainWordPiece(the, "text", nMerges = 2, batchSize = 2)
    assert(b2.map(m => (m.round, m.lhs, m.rhs)) ==
      Seq((1, "h", "e"), (2, "t", "he")))
  }

  test("WordPiece encode stats reuse the shared merge kernel via wpAsMerges") {
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest")).map(Tuple1(_)).toDF("text")
      .withColumn("doc_id", org.apache.spark.sql.functions.monotonically_increasing_id())
    val wp = Bpe.trainWordPiece(docs, "text", nMerges = 3)
    val stats = Bpe.encodeStats(docs, "doc_id", "text", Bpe.wpAsMerges(wp))
      .orderBy("doc_id").collect()
    // every doc is one word: n_tokens = 1, n_chars = word length,
    // n_subwords = |applyMerges(chars)| — recompute directly per word
    val direct = docs.select(col("doc_id"), col("text"),
        size(Bpe.applyMerges(expr("filter(split(text, ''), x -> x <> '')"),
          Bpe.wpAsMerges(wp))).cast("long").as("n_sub"))
      .orderBy("doc_id").collect()
    stats.zip(direct).foreach { case (s, d) =>
      assert(s.getLong(1) == 1L && s.getLong(2) == d.getString(1).length.toLong &&
        s.getLong(3) == d.getLong(2), s"stats $s vs direct $d")
    }
  }

  test("driver-local training ≡ distributed rounds (conf-forced) for BPE and WordPiece") {
    // the r15 local-training fast path must make IDENTICAL decisions
    // to the distributed round loop: same candidate window, same
    // (cnt/score, l, r) ordering with UTF-8-byte tie-breaks, same
    // conflict rule, same greedy merge kernel. Force the distributed
    // path via the conf ceiling and compare on a corpus with ties,
    // batching conflicts, and multi-byte tokens.
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("naïveté") ++
      Seq.fill(9)("the") ++ Seq.fill(4)("東京都")).map(Tuple1(_)).toDF("text")
    def forced[A](f: => A): A = {
      spark.conf.set("spark.graft.bpe.localTrainMaxVocab", "0")
      try f finally spark.conf.unset("spark.graft.bpe.localTrainMaxVocab")
    }
    for (b <- Seq(1, 3)) {
      val localB = Bpe.trainMerges(docs, "text", nMerges = 6, batchSize = b)
      val distB = forced(Bpe.trainMerges(docs, "text", nMerges = 6, batchSize = b))
      assert(localB == distB, s"BPE local != distributed at batchSize=$b")
      val localW = Bpe.trainWordPiece(docs, "text", nMerges = 6, batchSize = b)
      val distW = forced(Bpe.trainWordPiece(docs, "text", nMerges = 6, batchSize = b))
      assert(localW == distW, s"WordPiece local != distributed at batchSize=$b")
    }
  }
}
