package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine capability: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query
  * over the same parquet tables. The driver hash-compares the two
  * (columns sorted by name), so every computed column is aliased to the
  * SAME name on both sides and every query ends in a total-order sort.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    setup: Option[(SparkSession, String) => Unit] = None)

object QueryDef {
  def sql(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)

  /** A query whose fixture construction (store writes, planted
    * lifecycles) is a SEPARATE untimed step: Verify composes
    * setup-then-query (the driver contract is one function), while
    * Bench runs `setup` once outside the timed region and reports the
    * query's own cost — a store AUDIT's number must not be dominated
    * by building the store it audits (r10 verdict, q163).
    */
  def sqlWithSetup(name: String, oracle: String)(
      setup: (SparkSession, String) => Unit)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle), Some(setup))
}
