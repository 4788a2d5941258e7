package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage-level timing of the q157 prefix-join pipeline. */
object PrefixProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[probe] $tag ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val base = graft.engine.Tables.documents(spark, sfDir).select("doc_id", "text")
    val corpus = base.filter(col("doc_id") % 5 === 0)
      .unionByName(base.filter(col("doc_id") < 30)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" x")).as("text")))
    t("warmup count")(corpus.count())
    val n = t("corpus count")(corpus.count())
    System.err.println(s"[probe] corpus rows = $n")
    val sets = corpus.select(col("doc_id").as("__sid"),
      graft.functions.TextFunctions.tokenSet(col("text")).as("__set")).localCheckpoint(false)
    t("sets materialize")(sets.count())
    val ex = sets.select(col("__sid").as("__id"), size(col("__set")).as("__m"),
      explode(col("__set")).as("__tok"))
    val dfreq = ex.groupBy("__tok").agg(count(lit(1)).as("__df"))
    System.err.println(s"[probe] vocab = ${t("dfreq count")(dfreq.count())}")
    val tPct = 90
    val ranked = ex.join(dfreq, "__tok")
      .groupBy("__id")
      .agg(sort_array(collect_list(struct(col("__df"), col("__tok")))).as("__ord"))
      .select(col("__id"), size(col("__ord")).as("__m"),
        explode(expr(s"slice(__ord, 1, CAST(size(__ord) - (($tPct * size(__ord) + 99) div 100) + 1 AS INT))")).as("__p"))
      .select(col("__id"), col("__p.__tok").as("__tok"), col("__m"))
      .localCheckpoint(false)
    System.err.println(s"[probe] prefix rows = ${t("ranked")(ranked.count())}")
    val cands = ranked.as("a").join(ranked.as("b"),
        col("a.__tok") === col("b.__tok") && col("a.__id") < col("b.__id") &&
          col("a.__m") * tPct <= col("b.__m") * 100 &&
          col("b.__m") * tPct <= col("a.__m") * 100)
      .select(col("a.__id").as("id1"), col("b.__id").as("id2"))
      .distinct()
    System.err.println(s"[probe] cands = ${t("cands")(cands.count())}")
    val verified = cands
      .join(sets.select(col("__sid").as("id1"), col("__set").as("__s1")), "id1")
      .join(sets.select(col("__sid").as("id2"), col("__set").as("__s2")), "id2")
      .withColumn("__inter", size(array_intersect(col("__s1"), col("__s2"))).cast("long"))
      .withColumn("__union",
        (size(col("__s1")) + size(col("__s2"))).cast("long") - col("__inter"))
      .filter(col("__inter") * 100 >= col("__union") * tPct)
      .select(col("id1"), col("id2"), expr("__inter * 1000000 div __union").as("j_e6"))
    System.err.println(s"[probe] verified = ${t("verify")(verified.count())}")
    t("full ordered")(verified.orderBy("id1", "id2").collect())
    t("full ordered again")(verified.orderBy("id1", "id2").collect())
    spark.stop()
  }
}
