package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev-only probe for batched BPE training (q161): trains the same
  * merge budget with batchSize 1 (strict sequential, one count job
  * per merge) and a larger batch (one count job per ~B merges) on the
  * documents corpus, reporting wall time and DRIVER JOB COUNT for
  * each — the quantity that dominates a 30k-merge production vocab,
  * where per-job fixed overhead (scheduling, codegen of the next
  * chained kernel plan) swamps the vocab-sized counting work itself.
  */
object BpeBatchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nMerges = if (args.nonEmpty) args(0).toInt else 64
    val batch = if (args.length > 1) args(1).toInt else 16
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    })
    // third arg "wp" probes WordPiece (likelihood-gain argmax) instead
    // of classic BPE — same batching contract, same job-count story
    val wordPiece = args.length > 2 && args(2) == "wp"
    val docs = graft.engine.Tables.documents(spark, sfDir)
    docs.count() // warm footers
    def run(label: String, b: Int): Seq[graft.operators.Bpe.Merge] = {
      Thread.sleep(500) // let listener events drain before baselining
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      val m =
        if (wordPiece) graft.operators.Bpe.wpAsMerges(
          graft.operators.Bpe.trainWordPiece(docs, "text", nMerges, batchSize = b))
        else graft.operators.Bpe.trainMerges(docs, "text", nMerges, batchSize = b)
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"$label%-14s merges=$nMerges wall=$dt%.2fs driver_jobs=${jobs.get() - j0}")
      m
    }
    val seq = run("sequential", 1)
    val bat = run(s"batch=$batch", batch)
    val same = seq.map(m => (m.lhs, m.rhs)).toSet == bat.map(m => (m.lhs, m.rhs)).toSet
    println(s"merge SETS identical on this corpus: $same " +
      "(order/equality is only contractual on conflict-free corpora — q161)")
    spark.stop()
  }
}
