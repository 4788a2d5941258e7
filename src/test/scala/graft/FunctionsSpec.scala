package graft

import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, VectorFunctions}

/** Direct tests for text/vector Column functions and SQL registration. */
class FunctionsSpec extends SparkSpec {

  test("tokenizer: runs of whitespace collapse, empty docs yield zero tokens") {
    import spark.implicits._
    val df = Seq(
      "the  cat\tsat\non the mat",  // double space, tab, newline
      "  padded  ",
      "",
      "   ").toDF("text")
    val got = df.select(TextFunctions.tokenCount($"text"),
      round(TextFunctions.avgWordLen($"text"), 2)).collect()
    assert(got(0).getLong(0) === 6, "no empty tokens from whitespace runs")
    assert(got(0).getDouble(1) === 2.83, "17 non-ws chars / 6 tokens")
    assert(got(1).getLong(0) === 1, "leading/trailing whitespace trimmed")
    assert(got(2).getLong(0) === 0, "empty doc has zero tokens, not one")
    assert(got(2).isNullAt(1), "ratios are NULL on empty docs, not DIVIDE_BY_ZERO")
    assert(got(3).getLong(0) === 0)
  }

  test("native token-set hits match the HOF hit counts over the real corpus") {
    import spark.implicits._
    val sets = Seq(TextFunctions.Stopwords) ++ TextFunctions.LangMarkers.map(_._2)
    val corpus = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("text"))
      .union(Seq("the der el le und", "", "   ", "no markers here at all").toDF("text"))
    val native = graft.plans.TokenSetHitsExpr.token_set_hits(col("text"), sets)
    val diffs = sets.zipWithIndex.map { case (s, i) =>
      not(native.getItem(i) === TextFunctions.hitCountHof(col("text"), s))
    }.reduce(_ || _)
    assert(corpus.filter(diffs).count() === 0)
  }

  test("native tokenizer matches the HOF formulation over the real corpus and edge cases") {
    import spark.implicits._
    val corpus = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("text"))
      .union(Seq("\tleading tab  and   runs", "one", "", "   \t ").toDF("text"))
    val diff = corpus.select(
      TextFunctions.tokens($"text").as("native"),
      TextFunctions.tokensHof($"text").as("hof"))
      .filter(not(col("native") === col("hof")))
    assert(diff.count() === 0)
    // empty and all-whitespace docs tokenize to [], not [""]
    val empties = Seq("", "  \t ").toDF("text")
      .select(size(TextFunctions.tokens($"text"))).collect().map(_.getInt(0))
    assert(empties.toSeq === Seq(0, 0))
  }

  test("bpe pre-tokenizer: contractions, letter/digit runs, punctuation runs") {
    import spark.implicits._
    val df = Seq("don't stop-me now, it's 2026!!", "", "the dogs' 'toy").toDF("text")
    val got = df.select(TextFunctions.bpeTokens($"text"),
      TextFunctions.bpeTokenCount($"text")).collect()
    assert(got(0).getSeq[String](0) ===
      Seq("don", "'t", "stop", "-", "me", "now", ",", "it", "'s", "2026", "!!"))
    assert(got(0).getLong(1) === 11)
    assert(got(1).getLong(1) === 0, "empty text has zero pre-tokens")
    // standalone apostrophes (possessives, quotes) are tokens, not
    // dropped; a quote before a 't…' word splits as a contraction —
    // the GPT-2 pattern's own lookahead-free behavior, kept for parity
    assert(got(2).getSeq[String](0) === Seq("the", "dogs", "'", "'t", "oy"))
  }

  test("text functions: tokens, counts, ratios, quality, langid, fingerprints") {
    import spark.implicits._
    val df = Seq(
      ("the cat sat on the mat", "en-ish"),
      ("der hund und die katze", "de-ish"),
      ("xyzzy plugh", "und-ish")).toDF("text", "tag")
    val out = df.select(
      TextFunctions.tokenCount($"text").as("n"),
      round(TextFunctions.stopwordRatio($"text"), 4).as("sw"),
      TextFunctions.langIdMarkers($"text").as("lang"),
      TextFunctions.fingerprint($"text").as("fp"),
      TextFunctions.rollingTokenHash($"text").as("rh")).collect()
    assert(out(0).getLong(0) === 6)
    assert(out(0).getDouble(1) === 0.3333) // "the" twice / 6
    assert(out(0).getString(2) === "en")
    assert(out(1).getString(2) === "de")
    assert(out(2).getString(2) === "und")
    assert(out(0).getString(3).length === 32) // md5 hex
    assert(out(0).getLong(4) !== out(1).getLong(4))
  }

  test("quality score is in [0,1] and rewards longer, denser text") {
    import spark.implicits._
    val df = Seq(
      "the the the the a a of",
      "substantive engineering document describing partitioned shuffle topology extensively")
      .toDF("text")
    val q = df.select(TextFunctions.qualityScore($"text")).collect().map(_.getDouble(0))
    assert(q.forall(v => v >= 0 && v <= 1))
    assert(q(1) > q(0))
  }

  test("vector functions: dot/norm/cosine/l2/signBucket") {
    import spark.implicits._
    val df = Seq((Array(3.0f, 4.0f), Array(4.0f, 3.0f))).toDF("a", "b")
    val r = df.select(
      VectorFunctions.dot($"a", $"b").as("dot"),
      VectorFunctions.norm($"a").as("na"),
      round(VectorFunctions.cosine($"a", $"b"), 6).as("cos"),
      VectorFunctions.l2Distance($"a", $"b").as("l2"),
      VectorFunctions.signBucket($"a", 2).as("bucket")).collect()(0)
    assert(r.getDouble(0) === 24.0)
    assert(r.getDouble(1) === 5.0)
    assert(r.getDouble(2) === 0.96)
    assert(math.abs(r.getDouble(3) - math.sqrt(2)) < 1e-12)
    assert(r.getLong(4) === 3L) // both dims positive → bits 0+1 set
  }

  test("native dot product: bit-identical to HOF form, null semantics, real corpus") {
    import spark.implicits._
    // length mismatch and null elements both poison to NULL, like the HOF form
    val edge = Seq(
      (Array[java.lang.Float](1.0f, 2.0f), Array[java.lang.Float](3.0f)),
      (Array[java.lang.Float](1.0f, null), Array[java.lang.Float](3.0f, 4.0f)))
      .toDF("a", "b")
      .select(VectorFunctions.dot($"a", $"b").as("native"),
        VectorFunctions.dotHof($"a", $"b").as("hof"))
      .collect()
    edge.foreach { r => assert(r.isNullAt(0) && r.isNullAt(1)) }
    // bit-identical accumulation over the full embeddings corpus, on a
    // real parquet scan so the codegen path runs (cross pairs included:
    // first 20 x first 20 via self-join)
    val emb = graft.engine.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .filter($"vec_id" < 20)
    val pairs = emb.alias("x").crossJoin(emb.alias("y"))
      .select(
        VectorFunctions.dot(col("x.embedding"), col("y.embedding")).as("native"),
        VectorFunctions.dotHof(col("x.embedding"), col("y.embedding")).as("hof"))
    // === on doubles is exact equality — the accumulation order is pinned
    assert(pairs.filter(not(col("native") === col("hof"))).count() === 0)
    assert(pairs.count() === 400)
  }

  test("native sign bucket matches the HOF formulation, incl. short and negative vectors") {
    import spark.implicits._
    val edge = Seq(
      Array(1.0f, -2.0f, 3.0f, -4.0f, 5.0f, -6.0f, 7.0f, -8.0f),
      Array(-1.0f, 1.0f),   // shorter than bits → missing dims contribute 0
      Array(0.0f, -0.0f),   // zero is non-negative in both forms
      Array(Float.NaN, -1.0f, Float.NaN)) // SQL >= is NaN-safe: NaN sets the bit
      .toDF("a")
    val corpus = graft.engine.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("embedding").as("a"))
    Seq(edge, corpus).foreach { df =>
      val diff = df.select(
        VectorFunctions.signBucket(col("a"), 6).as("native"),
        VectorFunctions.signBucketHof(col("a"), 6).as("hof"))
        .filter(not(col("native") === col("hof")))
      assert(diff.count() === 0)
    }
  }

  test("native int8 ADC score matches the HOF formulation in both execution modes") {
    import spark.implicits._
    def check(): Unit = {
      // edge: zero vector scores 0 (not null); length mismatch and a
      // null element both poison to NULL, like the HOF form
      val edge = Seq(
        (Array[java.lang.Float](0.0f, 0.0f), Array[java.lang.Long](5L, 7L)),
        (Array[java.lang.Float](1.0f, 2.0f), Array[java.lang.Long](5L)),
        (Array[java.lang.Float](1.0f, null), Array[java.lang.Long](5L, 7L)))
        .toDF("v", "qw")
        .select(VectorFunctions.int8AdcScore($"v", $"qw").as("native"),
          VectorFunctions.int8AdcScoreHof($"v", $"qw").as("hof"))
        .collect()
      assert(edge(0).getLong(0) == 0L && edge(0).getLong(1) == 0L)
      assert(edge(1).isNullAt(0) && edge(1).isNullAt(1))
      assert(edge(2).isNullAt(0) && edge(2).isNullAt(1))
      // full corpus vs the vec_id-0 query weights, on a real parquet
      // scan; exact long equality — the arithmetic is integer end-to-end
      val emb = graft.engine.Tables.embeddings(spark, "/root/testdata/sf0.001")
      val qw = emb.filter($"vec_id" === 0).select(
        transform($"embedding", x => floor(x.cast("double") * lit(1000000.0))).as("qw"))
      val diff = emb.crossJoin(broadcast(qw))
        .select(VectorFunctions.int8AdcScore($"embedding", $"qw").as("native"),
          VectorFunctions.int8AdcScoreHof($"embedding", $"qw").as("hof"))
        .filter(not(col("native") === col("hof")))
      assert(diff.count() === 0)
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

  test("fingerprint OR-fold aggregator unions bit sets per group") {
    import spark.implicits._
    import graft.functions.{Chemistry, FingerprintAgg}
    val df = Seq(("grp1", "CCO"), ("grp1", "CCN"), ("grp2", "C")).toDF("g", "smiles")
    val out = df
      .select($"g", Chemistry.morgan_fp($"smiles").as("bits"))
      .groupBy($"g").agg(FingerprintAgg.fingerprint_or($"bits").as("profile"))
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1).toSet).toMap
    val ccoBits = Chemistry.morganBits("CCO").get.toSet
    val ccnBits = Chemistry.morganBits("CCN").get.toSet
    assert(out("grp1") === (ccoBits ++ ccnBits), "group profile is the union")
    assert(out("grp2") === Chemistry.morganBits("C").get.toSet)
  }

  test("SQL registration exposes the full function surface to spark.sql") {
    graft.engine.Functions.registerAll(spark)
    val row = spark.sql(
      """SELECT is_valid_smiles('CCO') AS v, round(molecular_weight('CCO'), 3) AS mw,
        | normalize_smiles('C[C@H](N)O.[Na+]') AS norm,
        | sdf_props('mol\nM  END\n> <A>\nval\n')['A'] AS a,
        | format_bytes(2048) AS fb
        |""".stripMargin).collect()(0)
    assert(row.getBoolean(0))
    assert(row.getDouble(1) === 46.069)
    assert(row.getString(2) === "C[CH](N)O")
    assert(row.getString(3) === "val")
    assert(row.getString(4) === "2.00 KB")
  }

  test("native minhash_signature is callable from SQL text") {
    graft.engine.Functions.registerAll(spark)
    val sig = spark.sql(
      "SELECT minhash_signature(array(7L, 99L, 12345L), 8) AS sig")
      .collect()(0).getSeq[Long](0)
    assert(sig.length === 8)
    assert(sig.forall(v => v >= 0 && v < 2147483647L))
    // deterministic
    val sig2 = spark.sql(
      "SELECT minhash_signature(array(7L, 99L, 12345L), 8) AS sig")
      .collect()(0).getSeq[Long](0)
    assert(sig === sig2)
  }

  test("the full native-kernel SQL surface is callable from SQL text") {
    graft.engine.Functions.registerAll(spark)
    val r = spark.sql(
      """SELECT size(ws_tokens(' a  b\tc ')) AS n_toks,
        |       token_shingles('a b c', 2) AS sh,
        |       simhash32('hello world') = simhash32('hello world') AS sh_det,
        |       sign_bucket(array(CAST(1.0 AS FLOAT), CAST(-1.0 AS FLOAT)), 2) AS sb,
        |       dot_product(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)),
        |                   array(CAST(4.0 AS FLOAT), CAST(3.0 AS FLOAT))) AS dp,
        |       array_jaccard(array('a','b','c'), array('a','b','d')) AS aj,
        |       array_jaccard(CAST(array() AS ARRAY<STRING>),
        |                     CAST(array() AS ARRAY<STRING>)) AS aj_null
        |""".stripMargin).collect()(0)
    assert(r.getInt(0) === 3)
    assert(r.getSeq[String](1) === Seq("a b", "b c"))
    assert(r.getBoolean(2))
    assert(r.getLong(3) === 1L)
    assert(r.getDouble(4) === 24.0)
    assert(r.getDouble(5) === 0.5)
    assert(r.isNullAt(6), "empty/empty jaccard is NULL")
    // wrong-typed arguments are rejected at analysis, not as an opaque
    // executor ClassCastException at runtime
    Seq("ws_tokens(42)", "simhash32(42)", "token_shingles(7, 2)",
      "minhash_band_keys(9, 4, 4)", "minhash_signature(array('a'), 8)",
      "array_jaccard(array(1), array(2))")
      .foreach { bad =>
        intercept[org.apache.spark.sql.AnalysisException] {
          spark.sql(s"SELECT $bad").collect()
        }
      }
  }

  test("native minhash_band_keys is callable from SQL text and matches the Column API") {
    graft.engine.Functions.registerAll(spark)
    val viaSql = spark.sql(
      "SELECT minhash_band_keys('the quick brown fox jumps over the dog', 8, 4) AS ks")
      .collect()(0).getSeq[Long](0)
    assert(viaSql.length === 8)
    import spark.implicits._
    val viaCol = Seq("the quick brown fox jumps over the dog").toDF("t")
      .select(graft.plans.ShingleMinHashBandKeysExpr
        .shingle_minhash_band_keys(org.apache.spark.sql.functions.col("t"), 8, 4))
      .collect()(0).getSeq[Long](0)
    assert(viaSql === viaCol)
  }

  test("native int8 quantize + error match the HOF formulations in both execution modes") {
    import spark.implicits._
    def check(): Unit = {
      // edge: all-zero vector → zero codes, 0.0 error; empty → empty, 0.0
      val edge = Seq(Array(0.0f, 0.0f), Array.empty[Float], Array(3.0f, -1.5f, 0.25f))
        .toDF("v")
        .select(VectorFunctions.int8Quantize($"v").as("nq"),
          VectorFunctions.int8QuantizeHof($"v").as("hq"),
          VectorFunctions.int8Error($"v").as("ne"),
          VectorFunctions.int8ErrorHof($"v").as("he"))
        .collect()
      assert(edge(0).getSeq[Long](0) == Seq(0L, 0L) && edge(0).getSeq[Long](1) == Seq(0L, 0L))
      assert(edge(1).getSeq[Long](0).isEmpty && edge(1).getSeq[Long](1).isEmpty)
      assert(edge(0).getDouble(2) == 0.0 && edge(1).getDouble(2) == 0.0)
      edge.foreach(r => assert(r.getDouble(2) == r.getDouble(3)))
      assert(edge(2).getSeq[Long](0) == edge(2).getSeq[Long](1))
      // edge: amax==0 with a null ELEMENT — null stays null (is NOT
      // 0-coded) in BOTH forms; the non-null zero still 0-codes
      val nullEdge = Seq(Seq[java.lang.Double](null, 0.0))
        .toDF("v")
        .select(VectorFunctions.int8Quantize($"v").as("nq"),
          VectorFunctions.int8QuantizeHof($"v").as("hq"))
        .collect()(0)
      assert(nullEdge.getSeq[java.lang.Long](0) == Seq(null, 0L))
      assert(nullEdge.getSeq[java.lang.Long](0) == nullEdge.getSeq[java.lang.Long](1))
      // documented divergence: a non-finite ELEMENT poisons the whole
      // vector in the HOF chain but is excluded/0-coded by the kernel,
      // which quantizes the remaining finite elements normally
      val nf = Seq(Array(Float.NaN, 1.0f), Array(Float.PositiveInfinity, -2.0f, 1.0f))
        .toDF("v")
        .select(VectorFunctions.int8Quantize($"v").as("nq"),
          VectorFunctions.int8Error($"v").as("ne"))
        .collect()
      assert(nf(0).getSeq[Long](0) == Seq(0L, 127L) && nf(0).getDouble(1) == 0.0)
      assert(nf(1).getSeq[Long](0) == Seq(0L, -127L, 64L))
      // full corpus differential, exact equality (quantize is integer;
      // error follows the identical double association order per element)
      val emb = graft.engine.Tables.embeddings(spark, "/root/testdata/sf0.001")
      val diff = emb.select(
        VectorFunctions.int8Quantize($"embedding").as("nq"),
        VectorFunctions.int8QuantizeHof($"embedding").as("hq"),
        VectorFunctions.int8Error($"embedding").as("ne"),
        VectorFunctions.int8ErrorHof($"embedding").as("he"))
        .filter(not($"nq" === $"hq") || not($"ne" === $"he"))
      assert(diff.count() === 0)
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

  test("luhnValid: classic card test numbers pass, off-by-one twins fail") {
    import spark.implicits._
    val out = Seq("4111111111111111", "4111111111111112", "79927398713",
        "79927398710", "0000000000000")
      .toDF("tok")
      .select(graft.functions.TextFunctions.luhnValid(col("tok")))
      .as[Boolean].collect().toSeq
    // 4111... is the canonical Visa test number; 79927398713 the
    // textbook Luhn example; all-zeros sums to 0 mod 10 (valid shape)
    assert(out == Seq(true, false, true, false, true))
  }

  test("normalizeAscii: controls, runs, trim, lowercase — idempotent") {
    import spark.implicits._
    val f = graft.functions.TextFunctions.normalizeAscii _
    val out = Seq("  A\tB\u0001C  ", "already normal", "MiXeD   CaSe")
      .toDF("t").select(f(col("t")).as("n")).as[String].collect().toSeq
    assert(out == Seq("a b c", "already normal", "mixed case"))
    val idem = Seq("  A\tB\u0001C  ").toDF("t")
      .select(f(f(col("t")))).as[String].head()
    assert(idem == "a b c", "normalization must be a fixpoint")
  }

  test("exact money sum is partition-order-free where the double sum is not") {
    import graft.functions.MoneyFunctions.{discountedNet, decimalEdgeE4}
    import spark.implicits._
    // 2e11-magnitude rows + many small 2dp rows: a double sum of these
    // needs 16+ significant digits, so different reduction orders give
    // different last bits. The decimal path must be bit-identical under
    // ANY partitioning; pin 1 vs 4 vs reversed-order partitionings.
    val rows = Seq.tabulate(4000) { i =>
      if (i % 1000 == 0) (2.0e11 + i + 0.37, 0.05) else (10000.01 + i, 0.07)
    }
    def sumWith(parts: Int, rev: Boolean) = {
      val base = (if (rev) rows.reverse else rows).toDF("price", "disc")
        .repartition(parts)
      base.agg(decimalEdgeE4(sum(discountedNet($"price", $"disc"))))
        .as[String].head()
    }
    val a = sumWith(1, rev = false)
    val b = sumWith(4, rev = false)
    val c = sumWith(4, rev = true)
    assert(a == b && b == c, s"decimal sum must be order-free: $a / $b / $c")
    // and the recovery step is exact: money2 of a nominal-2dp double
    // round-trips the decimal string (incl. the x.xx5 repr edge family)
    val edges = Seq(2.675, 8.945, 1.005, 68423.46, 0.1)
      .toDF("x").select(graft.functions.MoneyFunctions.money2($"x").cast("string"))
      .as[String].collect().toSeq
    assert(edges == Seq("2.68", "8.95", "1.01", "68423.46", "0.10"),
      s"shortest-repr HALF_UP recovery: $edges")
  }
}
