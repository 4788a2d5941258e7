package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: long-document straggler measurement for the intra-doc
  * repetition strip — native O(chunks) hash-set kernel
  * ([[graft.plans.KeepFirstChunksExpr]]) vs the original O(chunks²)
  * `array_position` HOF, on documents of 100k–1M tokens (the
  * machine-generated repetitive pages the operator targets). Numbers
  * land in SCALE.md.
  */
object StripProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // the quadratic's true worst case is mostly-DISTINCT chunks: for
    // chunk i, `array_position` scans all the way to position i before
    // concluding first-occurrence (a heavily-duplicated page
    // short-circuits at the early first match). Long real pages are
    // exactly this: unique content with interspersed repeats — here one
    // in eight chunks repeats chunk 0, the rest are unique.
    def page(tokens: Int, seed: Int): String = {
      val sb = new StringBuilder(tokens * 8)
      var i = 0
      while (i < tokens) {
        val chunk = i / 8
        if (chunk % 8 == 7) sb.append("rep").append(seed).append('_').append(i % 8).append(' ')
        else sb.append("tok").append(seed).append('_').append(i).append(' ')
        i += 1
      }
      sb.toString
    }
    for (tok <- Seq(100000, 300000, 1000000)) {
      val docs = (0 until 8).map(i => (i.toLong, page(tok, i))).toDF("doc_id", "text")
      docs.cache().count()
      // foreach, not count: under count() ColumnPruning deletes the very
      // projection being measured (the CountProbe/q81 lesson)
      def time(f: org.apache.spark.sql.DataFrame): Double = {
        val t0 = System.nanoTime(); f.foreach(_ => ()); (System.nanoTime() - t0) / 1e9
      }
      val tN = time(graft.operators.TextOps
        .intraDocRepetitionStrip(docs, "doc_id", "text", 8))
      val tH = time(graft.operators.TextOps
        .intraDocRepetitionStripHof(docs, "doc_id", "text", 8))
      println(f"[strip-probe] tokens=$tok%7d native=$tN%8.2fs hof=$tH%8.2fs ratio=${tH / tN}%6.1fx")
      docs.unpersist()
    }
    spark.stop()
  }
}
