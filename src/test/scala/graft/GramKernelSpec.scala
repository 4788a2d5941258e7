package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Differential specs for the native gram/winnow kernels
  * ([[graft.plans.GramDigestsExpr]] family) against the pre-kernel
  * HOF dataframe formulations they replaced — the house pattern for
  * any per-row compute that leaves the built-in expression tier.
  * Digest equality is compared via `lower(hex(dg))` (the kernel's raw
  * 16-byte digests vs the HOF path's lowercase hex strings).
  */
class GramKernelSpec extends SparkSpec {

  import spark.implicits._

  private def corpus = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta"),
    (2L, "one two three alpha beta gamma delta epsilon"),
    (3L, "tok tok tok tok tok tok tok tok tok tok"), // all-tie winnowing
    (4L, "exactly four token doc"),                  // n == k
    (5L, "three tok doc"),                           // n < k -> no grams
    (6L, ""),                                        // empty
    (7L, "   \t  "),                                 // whitespace only
    (8L, "émile noël über straße 東京 大阪 kyōto naïve"), // multi-byte UTF-8
    (9L, "a b c d e f g h i j k l m n o p q r s t u v w x y z")
  ).toDF("doc_id", "text")

  test("md5_grams kernel ≡ HOF transform/slice/md5 (pos and hex digest)") {
    val native = corpus.select(col("doc_id"),
        explode(graft.plans.GramDigestsExpr.md5_grams(col("text"), 4)).as("g"))
      .select(col("doc_id"), col("g.pos").as("pos"),
        lower(hex(col("g.dg"))).as("dg"))
      .as[(Long, Int, String)].collect().toSet
    val hof = corpus.select(col("doc_id").as("__id"),
        graft.functions.TextFunctions.tokens(col("text")).as("__toks"))
      .filter(size(col("__toks")) >= 4)
      .select(col("__id"), explode(expr(
        "transform(sequence(0, size(__toks) - 4), " +
          "i -> struct(i AS pos, md5(array_join(slice(__toks, i + 1, 4), ' ')) AS dg))"))
        .as("g"))
      .select(col("__id"), col("g.pos"), col("g.dg"))
      .as[(Long, Int, String)].collect().toSet
    assert(native == hof)
    assert(native.nonEmpty)
  }

  test("md5_gram_set kernel ≡ per-doc distinct of md5_grams") {
    val set = corpus.select(col("doc_id"),
        explode(graft.plans.GramDigestsExpr.md5_gram_set(col("text"), 4)).as("dg"))
      .select(col("doc_id"), lower(hex(col("dg"))).as("dg"))
      .as[(Long, String)].collect()
    // distinct within each doc, and equal as a set to the full grams
    assert(set.length == set.toSet.size)
    val full = corpus.select(col("doc_id"),
        explode(graft.plans.GramDigestsExpr.md5_grams(col("text"), 4)).as("g"))
      .select(col("doc_id"), lower(hex(col("g.dg"))).as("dg"))
      .as[(Long, String)].collect().toSet
    assert(set.toSet == full)
  }

  test("winnow_select kernel ≡ window-explode HOF winnowing (q188 shape)") {
    for ((k, w) <- Seq((4, 4), (2, 3), (3, 2))) {
      val native = TextOps.winnowedFingerprints(corpus, "doc_id", "text", k, w)
        .select(col("doc_id"), col("pos").cast("int"),
          lower(hex(col("dg"))))
        .as[(Long, Int, String)].collect()
      val hof = TextOps.winnowedFingerprintsHof(corpus, "doc_id", "text", k, w)
        .select(col("doc_id"), col("pos").cast("int"), col("dg"))
        .as[(Long, Int, String)].collect().toSet
      assert(native.toSet == hof, s"winnow mismatch at k=$k w=$w")
      // kernel output is distinct by construction (the HOF path needed
      // a frame-level distinct)
      assert(native.length == native.toSet.size)
    }
  }

  test("gramDf kernel basis ≡ HOF distinct-count basis") {
    val native = TextOps.gramDf(corpus, "doc_id", "text", k = 4)
      .select(lower(hex(col("dg"))).as("dg"), col("df"))
      .as[(String, Long)].collect().toSet
    val hof = corpus.select(col("doc_id").as("__id"),
        graft.functions.TextFunctions.tokens(col("text")).as("__toks"))
      .filter(size(col("__toks")) >= 4)
      .select(col("__id"), explode(expr(
        "transform(sequence(0, size(__toks) - 4), " +
          "i -> md5(array_join(slice(__toks, i + 1, 4), ' ')))")).as("dg"))
      .distinct()
      .groupBy("dg").agg(count(lit(1)).as("df"))
      .as[(String, Long)].collect().toSet
    assert(native == hof)
  }
}
