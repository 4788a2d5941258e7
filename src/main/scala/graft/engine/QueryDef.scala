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
    oracle: Option[String])

object QueryDef {
  def sql(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
