package graft

import org.apache.spark.sql.functions._

/** Bucketed-table co-located join: pre-partitioning both sides by the
  * join key eliminates the shuffle entirely (SCALE.md "the LSH band
  * join ... written bucketed ... co-located"). The plan assertion is
  * the point: no Exchange on either side of the join.
  */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans without exchanges") {
    import spark.implicits._
    val n = 1000
    val a = (1 to n).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to n).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
    spark.sql("DROP TABLE IF EXISTS bkt_a")
    spark.sql("DROP TABLE IF EXISTS bkt_b")
    a.write.bucketBy(8, "k").sortBy("k").saveAsTable("bkt_a")
    b.write.bucketBy(8, "k").sortBy("k").saveAsTable("bkt_b")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(joined.count() === n)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }

  test("bucket-partitioned ANN corpus: probe prunes to one partition directory") {
    import spark.implicits._
    import graft.operators.Similarity
    val rnd = new scala.util.Random(11)
    val corpus = (0L until 200L).map(i => (i, Array.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val path = tmpDir("ann_bucketed") + "/corpus"
    val bits = 4
    Similarity.writeBucketedCorpus(corpus, path, bits)

    // driver-side bucket matches the native kernel (differential)
    val diff = corpus.select(col("vec_id"),
      graft.functions.VectorFunctions.signBucket(col("embedding"), bits).as("nb"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val vecs = corpus.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    vecs.foreach { case (id, v) =>
      assert(Similarity.bucketOf(v, bits) === diff(id), s"vec $id")
    }

    val query = vecs(42L)
    val probe = Similarity.probeBucketed(spark, path, query, k = 3, bits = bits)
    val rows = probe.collect()
    // partition pruning: the scan's PartitionFilters are non-empty and
    // it reads exactly one of the 16 bucket directories
    val scan = probe.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
      .getOrElse(fail("no FileSourceScanExec in probe plan"))
    assert(scan.partitionFilters.nonEmpty,
      s"PartitionFilters must prune the bucket: ${scan.partitionFilters}")
    assert(scan.relation.location.listFiles(scan.partitionFilters, Nil).size === 1,
      "probe must read exactly one bucket partition")
    // and no full sort: global top-k over the bucket is TakeOrdered
    assert(probe.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))

    // correctness: identical to brute-force top-k restricted to the bucket
    val bucketIds = diff.filter(_._2 === Similarity.bucketOf(query, bits)).keySet
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val expect = bucketIds.toSeq.map(id => (id, cos(query, vecs(id))))
      .sortBy { case (id, s) => (-s, id) }.take(3).map(_._1)
    assert(rows.map(_.getLong(0)).toSeq === expect)
  }
}
