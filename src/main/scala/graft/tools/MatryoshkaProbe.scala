package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Same-session A/B of two-stage Matryoshka retrieval
  * ([[Similarity.prefixRerankTopK]]: prefix-16 shortlist → full-dim
  * rerank) against the single-stage full-dimension scan
  * ([[Similarity.cosineTopK]]) — the measurement the r10 verdict
  * asked to record in SCALE.md next to q183's equivalence oracle.
  * Also reports top-k agreement between the two paths on the natural
  * (unplanted) corpus, so the speedup is read next to the recall it
  * costs. Min of two passes per measurement, matching Bench.
  *
  * Usage: `runMain graft.tools.MatryoshkaProbe <dataDir> [nQueries] [k]`.
  */
object MatryoshkaProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nQueries = if (args.length > 1) args(1).toInt else 64
    val k = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < nQueries)
    println(s"[probe] vectors=${emb.count()} queries=${queries.count()} k=$k dir=$dir")

    def time(what: String, passes: Int = 2)(f: => DataFrame): Double = {
      val ts = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        // full-evaluation action (the Bench r10 convention)
        f.select(xxhash64(struct(col("*"))).as("h")).agg(bit_xor(col("h"))).head()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $what%-28s ${ts.min}%8.2f s  (passes: ${ts.map(t => f"$t%.2f").mkString(", ")})")
      ts.min
    }

    val tFull = time("full-dim cosineTopK") {
      Similarity.cosineTopK(emb, queries, k)
    }
    val tTwo = time("two-stage prefixRerankTopK") {
      Similarity.prefixRerankTopK(emb, queries, k, prefixDim = 16, shortlist = 4 * k)
    }
    // natural-corpus agreement: |two-stage ∩ full| / (|queries|·k)
    val full = Similarity.cosineTopK(emb, queries, k).select("qid", "cid")
    val two = Similarity.prefixRerankTopK(emb, queries, k, 16, 4 * k)
      .select("qid", "cid")
    val overlap = full.join(two, Seq("qid", "cid")).count()
    val total = full.count()
    println(f"[probe] speedup ${tFull / tTwo}%.2fx  agreement ${overlap * 10000 / math.max(1, total)} bp ($overlap/$total)")
    spark.stop()
  }
}
