package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deduplication operators for web-scale corpora, in increasing
  * fuzziness: exact (hash groupBy), MinHash+LSH banding, SimHash, and
  * token-set Jaccard verification. (Reference scope: duplicate
  * detection is a committed QA stage, /root/reference/docs/
  * system-plan.md:26.)
  *
  * Scale design: nothing here compares all pairs. Exact dedup is one
  * shuffle on the fingerprint; MinHash/SimHash reduce each document to
  * a constant-size signature at scan speed (all higher-order-function
  * expressions — codegen, no UDFs), and candidate generation is an
  * equi-join on (band, bucket) keys, so the shuffle volume is
  * O(docs × bands), never O(docs²). Verification runs only on bucket
  * collisions.
  */
object Dedup {

  /** Exact dedup keeping the smallest id per identical content.
    * One hash-partition shuffle on the fingerprint; at 100 TB this is
    * the cheapest possible formulation (no sort, partial agg on the
    * map side reduces each partition to unique fps first).
    */
  def exactByContent(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(TextFunctions.fingerprint(col(textCol)))
      .orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Token `n`-gram shingles as an array column. */
  def shingles(text: Column, n: Int): Column = {
    val toks = TextFunctions.tokens(text)
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  /** Mersenne prime 2^31−1: keeps every intermediate product below
    * 2^63 under Spark's ANSI overflow checking (a ≤ 127, h < 2^31 →
    * a·h + b < 2^40).
    */
  private val P31 = 2147483647L

  /** MinHash signature: `numHashes` permutations approximated by
    * (a_k · h(shingle) + b_k) mod (2^31−1) with deterministic odd
    * multipliers over xxhash64 shingle hashes. Returns
    * ArrayType(LongType) of length `numHashes`.
    */
  def minHashSignature(text: Column, numHashes: Int, shingleSize: Int = 3): Column = {
    val sh = shingles(text, shingleSize)
    transform(sequence(lit(0), lit(numHashes - 1)), k => {
      val a = k.cast("long") * 2 + 1
      val b = pmod(k.cast("long") * lit(2654435761L) + 1, lit(P31))
      array_min(transform(sh, s =>
        pmod(a * pmod(xxhash64(s), lit(P31)) + b, lit(P31))))
    })
  }

  /** Band keys for LSH: the signature is cut into `bands` slices of
    * `rowsPerBand` and each slice is folded to one key with a modular
    * polynomial hash (mod 2^31−1, overflow-safe under ANSI mode).
    * Documents sharing any (band, key) become candidate pairs.
    */
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      aggregate(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)),
        lit(0L), (acc, h) => pmod(acc * lit(1000003L) + h, lit(P31))))

  /** Candidate near-dup pairs via MinHash LSH banding.
    * Output: (id1, id2, n_shared_bands), id1 < id2.
    */
  def minHashCandidates(df: DataFrame, idCol: String, textCol: String,
      bands: Int = 8, rowsPerBand: Int = 8, shingleSize: Int = 3): DataFrame = {
    val sig = minHashSignature(col(textCol), bands * rowsPerBand, shingleSize)
    val banded = df
      .select(col(idCol).as("id"), posexplode(lshBandKeys(sig, bands, rowsPerBand)).as(Seq("band", "key")))
    val a = banded.alias("a")
    val b = banded.alias("b")
    a.join(b, col("a.band") === col("b.band") && col("a.key") === col("b.key")
        && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
      .agg(count(lit(1)).as("n_shared_bands"))
  }

  /** 32-bit SimHash over tokens: each token hash votes ±1 per bit
    * position; the final code sets bits with a positive vote sum.
    * 32 bits (not 64) so bit extraction stays exact in the double
    * arithmetic available to higher-order expressions.
    */
  def simHash32(text: Column): Column = {
    val toks = TextFunctions.tokens(text)
    val votes = aggregate(
      toks,
      transform(sequence(lit(0), lit(31)), _ => lit(0L)),
      (acc, tok) => {
        val h = pmod(xxhash64(tok), lit(4294967296L)) // low 32 bits, non-negative
        zip_with(acc, sequence(lit(0), lit(31)), (v, i) =>
          v + when(pmod(floor(h / pow(lit(2.0), i.cast("double"))).cast("long"), lit(2L)) === 1, 1L)
            .otherwise(-1L))
      })
    aggregate(
      zip_with(votes, sequence(lit(0), lit(31)), (v, i) =>
        when(v > 0, pow(lit(2.0), i.cast("double")).cast("long")).otherwise(lit(0L))),
      lit(0L), _ + _)
  }

  /** Jaccard similarity of distinct token sets — the exact verifier
    * applied to candidate pairs (never to the full cross product).
    */
  def tokenJaccard(textA: Column, textB: Column): Column = {
    val sa = TextFunctions.tokenSet(textA)
    val sb = TextFunctions.tokenSet(textB)
    val inter = size(array_intersect(sa, sb)).cast("double")
    inter / (size(sa) + size(sb) - size(array_intersect(sa, sb))).cast("double")
  }
}
