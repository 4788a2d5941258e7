package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded per-group top-k WITHOUT a window sort: a typed
  * `Aggregator` whose buffer holds at most `k` (key, id) pairs in
  * ascending lexicographic order — the k smallest keys seen so far.
  *
  * The per-group cap is the C4/RefinedWeb "at most N documents per
  * domain" curation move. The textbook Spark form is
  * `row_number().over(Window.partitionBy(group).orderBy(key)) <= k`,
  * which plans a hash exchange PLUS a partition-local sort of the
  * ENTIRE corpus — at 100 TB that sort is the dominant cost and is
  * pure waste, because only k rows per group survive it. This
  * aggregator replaces sort-everything with keep-k: Spark gives any
  * `Aggregator` registered through `functions.udaf` full partial
  * aggregation (ObjectHashAggregate), so each map task reduces its
  * slice to ≤ k pairs per group BEFORE the exchange, the shuffle
  * carries O(groups × partitions × k) pairs instead of the corpus,
  * and no Sort node appears anywhere in the plan (asserted by
  * DeltaOpsSpec). Groups smaller than k pass through whole.
  *
  * Buffer layout: interleaved `[key0, id0, key1, id1, …]` in one
  * `Array[Long]` — flat primitive storage, cheap to encode, and the
  * merge is a linear two-pointer merge of sorted runs.
  */
object GroupCapAgg {

  def capAgg(k: Int): Aggregator[(Long, Long), Array[Long], Seq[(Long, Long)]] = {
    require(k >= 1, "cap must be positive")
    new Aggregator[(Long, Long), Array[Long], Seq[(Long, Long)]] {
      private val cap = k

      override def zero: Array[Long] = Array.emptyLongArray

      // strict lexicographic (key, id) order — ids are unique upstream,
      // so ties on key resolve deterministically
      private def less(k1: Long, i1: Long, k2: Long, i2: Long): Boolean =
        k1 < k2 || (k1 == k2 && i1 < i2)

      override def reduce(buf: Array[Long], in: (Long, Long)): Array[Long] = {
        val n = buf.length / 2
        val (key, id) = in
        if (n == cap && !less(key, id, buf(2 * n - 2), buf(2 * n - 1))) buf
        else {
          var pos = 0
          while (pos < n && less(buf(2 * pos), buf(2 * pos + 1), key, id)) pos += 1
          val outN = math.min(n + 1, cap)
          val out = new Array[Long](outN * 2)
          System.arraycopy(buf, 0, out, 0, pos * 2)
          out(2 * pos) = key
          out(2 * pos + 1) = id
          System.arraycopy(buf, pos * 2, out, pos * 2 + 2,
            math.min(n, outN - 1 - pos) * 2)
          out
        }
      }

      override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
        if (a.isEmpty) return b
        if (b.isEmpty) return a
        val outN = math.min((a.length + b.length) / 2, cap)
        val out = new Array[Long](outN * 2)
        var ia = 0; var ib = 0; var io = 0
        while (io < outN) {
          val takeA = ib * 2 >= b.length ||
            (ia * 2 < a.length &&
              less(a(2 * ia), a(2 * ia + 1), b(2 * ib), b(2 * ib + 1)))
          if (takeA) { out(2 * io) = a(2 * ia); out(2 * io + 1) = a(2 * ia + 1); ia += 1 }
          else { out(2 * io) = b(2 * ib); out(2 * io + 1) = b(2 * ib + 1); ib += 1 }
          io += 1
        }
        out
      }

      override def finish(buf: Array[Long]): Seq[(Long, Long)] =
        (0 until buf.length / 2).map(i => (buf(2 * i), buf(2 * i + 1)))

      override def bufferEncoder = ExpressionEncoder[Array[Long]]()
      override def outputEncoder = ExpressionEncoder[Seq[(Long, Long)]]()
    }
  }

  /** Column form: `cap_pairs(k)(key, id)` → `array<struct<_1 key, _2 id>>`
    * of the group's k lexicographically-smallest (key, id) pairs.
    */
  def cap_pairs(k: Int)(key: Column, id: Column): Column =
    udaf(capAgg(k)).apply(key, id)
}
