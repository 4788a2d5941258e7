package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.checkpoint.JobManifest
import graft.functions.Chemistry
import graft.sources.SdfReader

/** ScalaCheck property tests for the parsers (SURVEY.md §5 engine test
  * plan): SDF render↔parse round-trip, checkpoint JSON round-trip, and
  * the alkane molecular-weight closed form.
  */
class PropertySpec extends SparkSpec {

  private def check(prop: Prop, name: String): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, s"$name: $res")
  }

  private val tagGen: Gen[String] = for {
    h <- Gen.alphaUpperChar
    t <- Gen.listOfN(8, Gen.oneOf(Gen.alphaUpperChar, Gen.numChar, Gen.const('_')))
  } yield (h :: t).mkString

  // value lines: printable, no leading '>', non-blank, pre-trimmed
  private val valueLineGen: Gen[String] = Gen.chooseNum(1, 20)
    .flatMap(n => Gen.listOfN(n, Gen.oneOf(Gen.alphaNumChar, Gen.const('-'), Gen.const('.'))))
    .map(_.mkString)
  private val valueGen: Gen[String] =
    Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, valueLineGen)).map(_.mkString("\n"))

  test("property: scaledJoin renders any float array as the documented floor(x·1e6) form") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // the oracle contract for array-typed outputs (q51/q55): element-wise
    // floor(x·10⁶) after an exact float32→double widening, comma-joined.
    // DuckDB renders the identical string from the same closed form, so
    // any drift on the Spark side breaks hash parity — pin it.
    val edge = Seq(0f, -0f, 1e-7f, -1e-7f, 0.5f, -0.5f, 1.5f, Float.MinPositiveValue,
      123.456f, -123.456f, 1e6f, -1e6f)
    val rnd = new scala.util.Random(7)
    val arrays = (edge.grouped(4).toSeq ++
      (0 until 40).map(_ => Seq.fill(8)(rnd.nextFloat() * 2000 - 1000)))
      .map(_.toArray)
    val got = arrays.zipWithIndex.map { case (a, i) => (i, a) }
      .toDF("i", "arr")
      .select(col("i"), graft.functions.VectorFunctions.scaledJoin(col("arr")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    arrays.zipWithIndex.foreach { case (a, i) =>
      val want = a.map(x => math.floor(x.toDouble * 1000000.0).toLong.toString).mkString(",")
      assert(got(i) === want, s"array ${a.mkString("[", ",", "]")}")
    }
  }

  test("property: native text kernels match their HOF oracles on arbitrary text") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, not}
    import graft.operators.Dedup
    import graft.functions.TextFunctions
    // adversarial text: random words joined by random whitespace runs
    // (spaces/tabs/newlines), unicode letters included, plus leading/
    // trailing whitespace — one batch through Spark, all kernels at once
    val wordGen = Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n,
      Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('é', 'ß', '中', '\'', '-')))).map(_.mkString)
    val wsGen = Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n,
      Gen.oneOf(' ', '\t', '\n'))).map(_.mkString)
    val textGen = for {
      k <- Gen.chooseNum(0, 12)
      ws <- Gen.listOfN(k + 1, wsGen)
      words <- Gen.listOfN(k, wordGen)
      lead <- Gen.oneOf("", " ", "\t")
    } yield lead + words.zip(ws).map { case (w, s) => w + s }.mkString
    val texts = Gen.listOfN(300, textGen).sample.get
    val df = texts.toDF("text")
    val diff = df.select(
        TextFunctions.tokens($"text").as("t_n"),
        TextFunctions.tokensHof($"text").as("t_h"),
        Dedup.shingles($"text", 3).as("s_n"),
        Dedup.shinglesHof($"text", 3).as("s_h"),
        Dedup.simHash32($"text").as("sh_n"),
        Dedup.simHash32Hof($"text").as("sh_h"),
        graft.plans.ShingleMinHashBandKeysExpr
          .shingle_minhash_band_keys($"text", 4, 4).as("bk_n"),
        Dedup.lshBandKeys(Dedup.signatureFromHashesHof(
          Dedup.shingleHashes($"text"), 16), 4, 4).as("bk_h"))
      .filter(not(col("t_n") === col("t_h")) || not(col("s_n") === col("s_h"))
        || not(col("sh_n") === col("sh_h")) || not(col("bk_n") === col("bk_h")))
    assert(diff.count() === 0)
  }

  test("property: SDF render → parse round-trips any tag map") {
    val propsGen = Gen.mapOfN(5, Gen.zip(tagGen, valueGen))
    check(Prop.forAll(propsGen) { props =>
      val rendered = "mol\n  comment\n\nM  END\n" +
        props.map { case (k, v) => s"> <$k>\n$v\n" }.mkString("\n")
      SdfReader.parseProps(rendered) == props
    }, "sdf round-trip")
  }

  test("property: checkpoint JSON round-trips any cursor map") {
    val kvGen = Gen.zip(
      Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString),
      Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('"', '\\', '/', ' ', ':')))
        .map(_.mkString))
    val cpGen = for {
      cur <- Gen.mapOfN(4, kvGen)
      idx <- Gen.chooseNum(0, 100000)
      done <- Gen.oneOf(true, false)
    } yield JobManifest.Checkpoint(cur, idx, done)
    check(Prop.forAll(cpGen) { cp =>
      JobManifest.parse(JobManifest.render(cp)).contains(cp)
    }, "checkpoint round-trip")
  }

  test("property: alkane molecular weight matches the closed form") {
    check(Prop.forAll(Gen.chooseNum(1, 60)) { n =>
      val mw = Chemistry.molecularWeight("C" * n).get
      math.abs(mw - (n * 12.011 + (2 * n + 2) * 1.008)) < 1e-9
    }, "alkane MW")
  }

  test("property: normalize is idempotent and salt-strip keeps a fragment") {
    val smilesGen = Gen.oneOf("CCO", "C[C@H](N)C(=O)O", "CCO.[Na+]", "F/C=C/F",
      "c1ccccc1.[Cl-]", "CC(C)(C)Br")
    check(Prop.forAll(smilesGen) { s =>
      val n1 = Chemistry.normalize(s)
      Chemistry.normalize(n1) == n1 && Chemistry.stripSalt(s).nonEmpty
    }, "normalize idempotent")
  }

  test("property: entropy kernel matches a plain-Scala histogram on generated docs") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.functions.TextFunctions
    // one Spark job over many generated rows (the scaledJoin pattern):
    // random docs over a small vocab (forces repeated tokens), plus
    // whitespace-noise edges; expected value computed independently in
    // plain Scala from a HashMap histogram
    val vocab = Vector("a", "bb", "ccc", "déjà", "x1", "zz")
    val rnd = new scala.util.Random(11)
    val docs = (0 until 120).map { i =>
      val n = rnd.nextInt(40)
      val sep = if (i % 7 == 0) "  " else " "
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(sep) +
        (if (i % 13 == 0) " \t" else ""))
    }
    val got = docs.toDF("i", "text")
      .select(col("i"), TextFunctions.unigramClogcE6(col("text")).as("clogc"))
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    docs.foreach { case (i, text) =>
      val toks = text.split("\\s+").filter(_.nonEmpty)
      val want =
        if (toks.isEmpty) None
        else Some(toks.groupBy(identity).values
          .map(g => math.floor(g.length.toDouble * math.log(g.length.toDouble) * 1000000.0).toLong)
          .sum)
      assert(got(i) == want, s"doc $i: got ${got(i)}, want $want")
    }
  }

  test("property: int8 codes bounded by ±127 and error within amax/254 on random vectors") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.functions.VectorFunctions
    val rnd = new scala.util.Random(23)
    val vecs = (0 until 100).map { i =>
      val d = 1 + rnd.nextInt(24)
      (i, Array.fill(d)((rnd.nextFloat() * 2 - 1) * math.pow(10, rnd.nextInt(7) - 3).toFloat))
    }
    val rows = vecs.toDF("i", "v")
      .select(col("i"),
        VectorFunctions.int8Quantize(col("v")).as("q"),
        VectorFunctions.int8Error(col("v")).as("err"),
        VectorFunctions.absMax(col("v")).as("amax"))
      .collect()
    rows.foreach { r =>
      val q = r.getSeq[Long](1)
      val amax = r.getDouble(3)
      assert(q.forall(c => c >= -127L && c <= 127L), s"codes out of range: $q")
      // ⌊x·127/amax + ½⌋ rounds to nearest: max reconstruction error is
      // half a step = amax/254 (1 ulp slack for the double arithmetic)
      assert(r.getDouble(2) <= amax / 254.0 * (1 + 1e-12) + java.lang.Math.ulp(amax),
        s"error ${r.getDouble(2)} exceeds ${amax / 254.0}")
    }
  }
}
