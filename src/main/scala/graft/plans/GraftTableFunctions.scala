package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** TABLE-valued SQL functions over the engine's PERSISTED ARTIFACTS —
  * the second half of the SQL door ([[GraftExtensions]] covers scalar
  * kernels): the flagship operators whose state lives on disk (a saved
  * IVF-PQ index, a winnow fingerprint store, a wave-layered store, an
  * SCD2 dimension) become relations a pure-SQL client can SELECT from,
  * mirroring how the reference exposes its derived artifacts to report
  * queries (/root/reference/src/open_molecule_data_pipeline/ingestion/
  * runner.py:317-385) — except these are full relational inputs, not
  * fixed reports.
  *
  * Each builder returns the SAME logical plan the Scala surface
  * builds, so every scale property survives the SQL boundary verbatim:
  * the IVF-PQ probe partition-prunes to its probed cells, the winnow
  * probe stays dg-bucketed with the cross-side df cap, the as-of read
  * prunes wave partitions (spec-pinned FROM SQL, not just Scala).
  * Arguments must be literals — table names and paths are resolution-
  * time constants, exactly as in `read_parquet('...')`-style TVFs.
  */
object GraftTableFunctions {

  private def strLit(e: Expression, what: String): String = e match {
    case Literal(s: UTF8String, StringType) => s.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) if v.isValidInt => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def longLit(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _)  => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def plan(df: org.apache.spark.sql.DataFrame): LogicalPlan =
    df.queryExecution.logical

  private[plans] def buildIvfPqTopK(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 4,
      "graft_ivfpq_topk(indexDir, queryTable, k, nprobe)")
    val spark = SparkSession.active
    val dir = strLit(args.head, "indexDir")
    val idx = graft.operators.Pq.loadIvfPqMeta(spark, dir)
    // the query vector is a driver-side constant by design (it seeds
    // the probe-set choice and the ADC LUTs), exactly as on the Scala
    // surface — a one-row collect of the named query table
    val qe6 = graft.operators.Pq.queryWeightsE6(
      spark.table(strLit(args(1), "queryTable")))
    plan(graft.operators.Pq.ivfPqTopKFromEncoded(
      spark.read.parquet(dir), idx, qe6,
      intLit(args(2), "k"), intLit(args(3), "nprobe")))
  }

  private[plans] def buildWinnowPairs(args: Seq[Expression]): LogicalPlan = {
    require(args.size >= 2 && args.size <= 6,
      "graft_winnow_pairs(storeTable, deltaDocsTable[, minShared, maxDf[, k, w]])")
    val spark = SparkSession.active
    val store = spark.table(strLit(args.head, "storeTable"))
    val delta = spark.table(strLit(args(1), "deltaDocsTable"))
    val minShared = if (args.size > 2) intLit(args(2), "minShared") else 3
    val maxDf = if (args.size > 3) intLit(args(3), "maxDf") else 8
    val k = if (args.size > 4) intLit(args(4), "k") else 4
    val w = if (args.size > 5) intLit(args(5), "w") else 4
    plan(graft.operators.TextOps.winnowedCrossPairs(store,
      graft.operators.TextOps.winnowedFingerprints(delta, "doc_id", "text", k, w),
      minShared, maxDf))
  }

  private[plans] def buildStoreAsOf(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 2, "graft_store_asof(table, wave)")
    val spark = SparkSession.active
    plan(graft.operators.Stores.asOf(spark,
      strLit(args.head, "table"), longLit(args(1), "wave")))
  }

  private[plans] def buildScd2AsOf(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 4,
      "graft_scd2_asof(factsTable, dimTable, keyCol, factTsCol)")
    val spark = SparkSession.active
    plan(graft.operators.Scd.asOfVersion(
      spark.table(strLit(args.head, "factsTable")),
      spark.table(strLit(args(1), "dimTable")),
      Seq(strLit(args(2), "keyCol")), strLit(args(3), "factTsCol")))
  }

  private[plans] def buildSpanStrip(args: Seq[Expression]): LogicalPlan = {
    require(args.size >= 2 && args.size <= 5,
      "graft_span_strip(gramStoreTable, deltaDocsTable[, k, minDocs[, minMatch]])")
    val spark = SparkSession.active
    val store = spark.table(strLit(args.head, "gramStoreTable"))
    val delta = spark.table(strLit(args(1), "deltaDocsTable"))
    val k = if (args.size > 2) intLit(args(2), "k") else 8
    val minDocs = if (args.size > 3) intLit(args(3), "minDocs") else 2
    val minMatch = if (args.size > 4) intLit(args(4), "minMatch") else 0
    plan(graft.operators.TextOps.incrementalSpanDedupStrip(
      store.select("dg", "df"), delta, "doc_id", "text", k, minDocs, minMatch))
  }

  /** The artifact-probe TVF surface: name → builder. */
  val builders: Seq[(String, Seq[Expression] => LogicalPlan)] = Seq(
    ("graft_ivfpq_topk", buildIvfPqTopK _),
    ("graft_winnow_pairs", buildWinnowPairs _),
    ("graft_store_asof", buildStoreAsOf _),
    ("graft_scd2_asof", buildScd2AsOf _),
    ("graft_span_strip", buildSpanStrip _))

  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan)] =
    builders.map { case (name, b) =>
      (FunctionIdentifier(name),
        new ExpressionInfo(GraftTableFunctions.getClass.getName, name), b)
    }

  /** Direct registration into an existing session (the `query` CLI,
    * tests, notebooks) — the table-function twin of
    * [[GraftExtensions.register]]. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      spark.sessionState.tableFunctionRegistry
        .createOrReplaceTempFunction(name, b, "scala_udf")
    }
}
