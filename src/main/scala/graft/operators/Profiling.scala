package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-level data-quality profiling — the "ANALYZE"-style QA pass
  * a pipeline runs on every new table drop before admitting it (the
  * reference's QA/metrics stage, `docs/system-plan.md:26`, recast at
  * column granularity: row/null/distinct counts and value ranges).
  *
  * One aggregation over one scan produces every per-column statistic;
  * `stack` then unpivots the single result row to one row per column.
  * Numeric ranges are floor-scaled to e2 integers so the output is
  * hash-stable across engines.
  *
  * Scale shape: a single pass — the N exact `count(DISTINCT)`s share
  * one scan via Expand (N+1 tagged copies of the projected columns
  * into one shuffle). Exact distincts are the audit-grade form;
  * at 100 TB swap in `approx_count_distinct` (q61's ε-bounded HLL
  * contract) for the routine runs — same operator shape, no Expand.
  */
object Profiling {

  /** Profile `cols` (numeric) of `df`: one output row per column with
    * (col_name, n_rows, n_null, n_distinct, min_e2, max_e2).
    */
  def numericProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "no columns to profile")
    val aggs = count(lit(1)).as("__n_rows") +: cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__${c}__nnull"),
        countDistinct(col(c)).as(s"__${c}__ndist"),
        floor(min(col(c)) * 100).cast("long").as(s"__${c}__min"),
        floor(max(col(c)) * 100).cast("long").as(s"__${c}__max"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', __n_rows, __${c}__nnull, __${c}__ndist, __${c}__min, __${c}__max"
    }.mkString(", ")
    row.select(expr(
      s"stack(${cols.size}, $stackArgs) as (col_name, n_rows, n_null, n_distinct, min_e2, max_e2)"))
  }

  /** The routine-run profile: identical shape to [[numericProfile]]
    * but distincts are HLL++ `approx_count_distinct(c, rsd)` — ONE
    * aggregation pass with NO Expand (plan-asserted in DeltaOpsSpec):
    * the scan is not replicated per column, and the shuffle carries
    * one sketch per column instead of per-partition distinct values.
    * This is the form a 100 TB drop gate runs daily; the exact
    * profile is the audit-grade escalation. Estimates carry the q61
    * ε-bound contract (q107 asserts |approx − exact| ≤ 3·rsd·exact).
    */
  def numericProfileApprox(df: DataFrame, cols: Seq[String],
      rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "no columns to profile")
    val aggs = count(lit(1)).as("__n_rows") +: cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__${c}__nnull"),
        approx_count_distinct(col(c), rsd).as(s"__${c}__acd"),
        floor(min(col(c)) * 100).cast("long").as(s"__${c}__min"),
        floor(max(col(c)) * 100).cast("long").as(s"__${c}__max"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', __n_rows, __${c}__nnull, __${c}__acd, __${c}__min, __${c}__max"
    }.mkString(", ")
    row.select(expr(
      s"stack(${cols.size}, $stackArgs) as (col_name, n_rows, n_null, n_distinct_approx, min_e2, max_e2)"))
  }
}
