package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev-only probe backing the q44/q45 contract-bound choices: prints
  * the RAW measurements (candidate-pair Jaccard precision fraction,
  * mean SimHash Hamming distances to small vs large perturbations) at
  * the SF dir under test, so the pinned slack bounds in the catalog
  * oracles are chosen from data, not guessed.
  */
object ContractProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.engine.Tables.documents(spark, sfDir)

    // q44: planted corpus → candidates → exact-Jaccard precision
    val corpus = docs.select(col("doc_id"), col("text")).unionByName(
      docs.filter(col("doc_id") < 40)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    val cand = Dedup.minHashCandidates(corpus, "doc_id", "text",
      bands = 8, rowsPerBand = 4)
    val texts1 = corpus.select(col("doc_id").as("id1"), col("text").as("t1"))
    val texts2 = corpus.select(col("doc_id").as("id2"), col("text").as("t2"))
    val j = cand.join(texts1, "id1").join(texts2, "id2")
      .select(graft.plans.ArrayJaccardExpr.array_jaccard(
        graft.plans.TokenShinglesExpr.token_shingles(col("t1"), 3),
        graft.plans.TokenShinglesExpr.token_shingles(col("t2"), 3)).as("j"))
    val row = j.agg(count(lit(1)).as("n"),
      sum(when(col("j") >= 0.5, 1L).otherwise(0L)).as("n_ge05"),
      min(col("j")).as("min_j"), avg(col("j")).as("avg_j")).collect()(0)
    val n = row.getLong(0)
    println(f"[q44] $sfDir candidates=$n jaccard>=0.5: ${row.getLong(1)} " +
      f"(frac=${if (n == 0) 1.0 else row.getLong(1).toDouble / n}%.4f) " +
      f"min_j=${row.getDouble(2)}%.4f avg_j=${row.getDouble(3)}%.4f")

    // q45: mean Hamming to small vs large perturbation
    val h = Dedup.simHash32(col("text"))
    def ham(a: Column, b: Column) = bit_count(a.bitwiseXOR(b))
    val r2 = docs.agg(
      avg(ham(h, Dedup.simHash32(concat(col("text"), lit(" qq"))))).as("avg_s"),
      avg(ham(h, Dedup.simHash32(md5(col("text"))))).as("avg_l")).collect()(0)
    println(f"[q45] $sfDir avg_hamming_small=${r2.getDouble(0)}%.3f " +
      f"avg_hamming_large=${r2.getDouble(1)}%.3f")
    spark.stop()
  }
}
