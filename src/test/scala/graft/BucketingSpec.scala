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
}
