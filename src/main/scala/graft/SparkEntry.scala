package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query catalog itself lives in `graft.engine.*Queries`; this object
  * just flattens it into the (name -> fn) / (name -> oracle SQL) maps the
  * driver consumes.
  */
object SparkEntry {

  /** Every declared capability (SURVEY.md §2C + pipeline extensions). */
  def catalog: Seq[QueryDef] =
    RelationalQueries.all ++ EventQueries.all ++ DocQueries.all ++
      PipelineQueries.all ++ MoleculeQueries.all ++ ExtraQueries.all ++
      TrainingQueries.all ++ CurationQueries.all ++ CorpusQueries.all ++
      FusionQueries.all ++ DeltaQueries.all ++ DeclarativeQueries.all ++
      SplitQueries.all ++ RetrievalQueries.all ++ WarehouseQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_agg_pricing")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. Fixture
    * setup (when a query declares one) composes in front of the query
    * so the driver contract stays a single function per name; Bench
    * reads `catalog` directly to keep setup outside the timed region.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map { q =>
      q.name -> (q.setup match {
        case Some(su) => (s: SparkSession, d: String) => { su(s, d); q.fn(s, d) }
        case None     => q.fn
      })
    }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalog.collect { case QueryDef(n, _, Some(o), _) => n -> o }.toMap
}
