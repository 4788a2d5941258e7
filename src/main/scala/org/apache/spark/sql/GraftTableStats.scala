/* Bridge into Spark's plan statistics and the parquet footer layer —
 * exact row counts WITHOUT running a job, for lazy auto-sizing
 * (graft.operators.Multimodal.autoGrid and friends). Lives in the
 * spark.sql package for the same reason as GraftColumnBridge: the
 * logical-plan nodes it matches are private[sql].
 */
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat

object GraftTableStats {

  /** Exact row count of `df` from metadata only, or None when no
    * metadata source is exact:
    *
    *  1. a bare local relation's in-memory row count;
    *  2. parquet FOOTER row counts, when the plan is a bare
    *     column-pruning view of a parquet file relation (projections
    *     and aliases preserve row count; any filter/join/limit/
    *     generate does not and falls through) — one driver-side
    *     metadata read per file, no payload scan, no Spark job.
    *
    * The optimized plan's `stats.rowCount` is DELIBERATELY not
    * consulted: it is not exact — Spark fabricates
    * `rowCount = Some(limit)` for GlobalLimit even with CBO off
    * (regardless of how few rows the child has), and under CBO it
    * carries filter/join ESTIMATES and possibly-stale ANALYZE
    * numbers. A None means the caller must count (or pass a known
    * count) — never a guess: auto-sizing derivations are replayed by
    * oracles, so an approximate count here would be a correctness
    * bug, not an optimization.
    */
  def exactRowCount(df: Dataset[_]): Option[Long] =
    unwrap(df.queryExecution.optimizedPlan) match {
      case l: LocalRelation => Some(l.data.length.toLong)
      case other => parquetFooterCount(other)
    }

  /** The shared auto-sizing ladder: the caller's declared count, else
    * [[exactRowCount]], else one `count()` job.
    */
  def sizeOf(df: Dataset[_], knownCount: Option[Long]): Long =
    knownCount.orElse(exactRowCount(df)).getOrElse(df.count())

  /** Strip row-count-preserving wrappers (Project without generators,
    * SubqueryAlias) down to a bare relation, if that is all there is.
    */
  @annotation.tailrec
  private def unwrap(plan: LogicalPlan): LogicalPlan = plan match {
    case p: Project if p.projectList.forall(_.deterministic) => unwrap(p.child)
    case a: SubqueryAlias => unwrap(a.child)
    case other => other
  }

  private def parquetFooterCount(plan: LogicalPlan): Option[Long] =
    plan match {
      case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] &&
          lr.relation.asInstanceOf[HadoopFsRelation]
            .fileFormat.isInstanceOf[ParquetFileFormat] =>
        val rel = lr.relation.asInstanceOf[HadoopFsRelation]
        try {
          val conf = rel.sparkSession.sessionState.newHadoopConf()
          val files = rel.location.listFiles(Nil, Nil).flatMap(_.files)
          // footers read CONCURRENTLY (parallel stream over the file
          // list): on an object store each open is 1-2 remote GETs,
          // and a serial walk over tens of thousands of files would
          // take driver minutes for a "metadata-only" count
          val total = new java.util.concurrent.atomic.LongAdder()
          scala.jdk.CollectionConverters.SeqHasAsJava(files).asJava
            .parallelStream().forEach { f =>
              val in = org.apache.parquet.hadoop.util.HadoopInputFile
                .fromStatus(f.fileStatus, conf)
              val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
              try total.add(reader.getRecordCount)
              finally reader.close()
            }
          Some(total.sum())
        } catch {
          case scala.util.control.NonFatal(e) =>
            // visible degradation, not a silent one: the caller falls
            // back to the count() job this path exists to avoid
            System.err.println(
              s"[graft] parquet footer count failed (${e.getMessage}) — falling back to count()")
            None
        }
      case _ => None
    }
}
