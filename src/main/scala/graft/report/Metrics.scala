package graft.report

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Pipeline metrics via `Dataset.observe` (SURVEY.md S24 Spark
  * disposition): record/byte counters ride INSIDE the job — no second
  * scan — and surface through a QueryExecutionListener. This is the
  * 100 TB replacement for the reference's per-page Python counters.
  */
object Metrics {

  /** Attach standard ingestion metrics to a molecule DataFrame. */
  def observed(df: DataFrame, name: String): DataFrame =
    df.observe(name,
      count(lit(1)).as("n_records"),
      count(col("smiles")).as("n_smiles"),
      sum(length(col("smiles"))).as("smiles_chars"))

  /** Collects observation results by (name) as they complete. */
  final class Collector extends QueryExecutionListener {
    val results = new TrieMap[String, Map[String, Any]]()
    private def capture(qe: QueryExecution): Unit =
      qe.observedMetrics.foreach { case (name, row: Row) =>
        results.put(name, row.getValuesMap[Any](row.schema.fieldNames.toSeq))
      }
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      capture(qe)
    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
      capture(qe)
  }

  def install(spark: SparkSession): Collector = {
    val c = new Collector
    spark.listenerManager.register(c)
    c
  }
}
