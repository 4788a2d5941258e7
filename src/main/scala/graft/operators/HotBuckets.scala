package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sort-free hot-bucket guard shared by the LSH candidate generators
  * ([[Dedup.minHashCandidates]], [[Similarity.nearDupesAnnBanded]]).
  *
  * The previous formulation — `count(1).over(Window.partitionBy(keys))`
  * — was semantically right but planned a partition-local Sort on the
  * bucket keys under the window, and on the similarity bands=1 path the
  * sorted rows carried the full embedding vectors: an avoidable
  * O(corpus log corpus) term in exactly the paths built for 100 TB.
  * This form aggregates bucket sizes instead (output is one row per
  * HOT bucket) and drops their members with a left-anti join whose
  * build side AQE sizes at runtime — on normal data the hot set is
  * tiny and broadcasts (the no-Sort plan spec pins this); on a
  * pathological corpus it degrades to a shuffled anti-join that
  * completes (see the method doc for why there is deliberately NO
  * static broadcast hint). Either way: no Sort node, and one hash
  * aggregation that reuses the (keys) exchange the caller already
  * forced for the self-join.
  *
  * Row-level semantics match the window form for every joinable row:
  * both drop exactly the members of groups larger than `cap`. (The one
  * divergence is null-keyed rows — an anti-join can never match them,
  * so they survive here where an oversized null "group" was dropped
  * before. Null keys also never match in the downstream equi-self-join,
  * so no candidate pair is affected; they are dead rows either way.)
  * The oracle SQL keeps the `QUALIFY count(*) OVER (...) <= cap`
  * formulation — same surviving pairs, independently expressed.
  */
private[graft] object HotBuckets {

  /** Remove every member of a `keys`-group with more than `cap` rows.
    *
    * No static `broadcast()` hint on the hot set: a hint bypasses the
    * size check and collects the build side to the driver REGARDLESS
    * of size, and the hot set is only "tiny" on well-behaved data —
    * on exactly the degenerate corpus this cap exists for (worst case
    * ~n/cap keys), a forced broadcast is a driver OOM. Under AQE the
    * runtime size decides: a normal hot set broadcasts anyway (the
    * no-Sort plan spec pins this), a pathological one degrades to a
    * shuffled join that completes — the same graceful-degradation
    * contract the old window form had, minus its guaranteed sort.
    */
  def dropOversized(df: DataFrame, cap: Int, keys: String*): DataFrame = {
    // deliberately NO localCheckpoint here (r15): a checkpoint of an
    // AQE plan materializes its query stages when the RDD is built,
    // i.e. at CONSTRUCTION time — and the ANN auto variants promise
    // (spec-pinned) that construction runs no job. Callers without a
    // laziness contract materialize their keyed frame themselves
    // before calling (minHashCandidates, the perceptual signature
    // stages), which is where the expensive kernel subtree lives.
    val hot = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__bsz"))
      .filter(col("__bsz") > cap)
      .select(keys.map(col): _*)
    df.join(hot, keys, "left_anti")
  }
}
