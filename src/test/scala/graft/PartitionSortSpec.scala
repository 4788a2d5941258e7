package graft

import org.apache.spark.sql.functions._

/** sortWithinPartitions: partition-local ordering without a global
  * shuffle — the write-side primitive behind sorted bucketed tables.
  */
class PartitionSortSpec extends SparkSpec {

  test("sortWithinPartitions orders every partition without an exchange") {
    import spark.implicits._
    val df = (1 to 10000).map(i => ((i * 2654435761L) % 997, i))
      .toDF("k", "v").repartition(8)
    val sorted = df.sortWithinPartitions("k")

    val plan = sorted.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning")
      || plan.indexOf("Sort") < plan.indexOf("Exchange hashpartitioning"),
      s"local sort must not add a shuffle:\n$plan")

    val violations = sorted.select("k").mapPartitions { it =>
      val ks = it.map(_.getLong(0)).toSeq
      Iterator.single(ks.zip(ks.drop(1)).count { case (a, b) => a > b })
    }.collect().sum
    assert(violations === 0, "every partition must be internally sorted")
  }
}
