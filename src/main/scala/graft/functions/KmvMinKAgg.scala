package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded k-minimum-values (KMV) distinct sketch: per group, the k
  * SMALLEST DISTINCT hash values — the classical theta-sketch
  * construction (Bar-Yossef et al. 2002; Beyer et al. 2007), kept
  * deliberately transparent: because the sketch IS "the k smallest
  * md5-derived integers", every downstream estimate (distinct count,
  * union, intersection, difference) is plain integer/IEEE arithmetic
  * that an independent SQL engine replays EXACTLY — so unlike the
  * HLL tier (q133, whose estimates are promotion-boundary-dependent
  * and get a contract oracle), the KMV tier carries a full hash
  * oracle.
  *
  * Scale shape ([[TopKAgg]]'s treatment applied to distinct
  * sketching): as a `udaf`-registered Aggregator this gets full
  * partial aggregation — each map task reduces its slice to ≤ k
  * longs per group before the shuffle, so building "distinct docs
  * per corpus" sketches over 100 TB ships O(groups × partitions × k)
  * longs and sorts nothing. Merge is a sorted-merge dedup keeping k,
  * which makes the sketch EXACTLY split-invariant: the global k
  * smallest distinct values are each the k smallest of their own
  * wave, so merge(wave sketches) == sketch(whole corpus)
  * bit-for-bit (pinned in OperatorsSpec — contrast q133's measured
  * HLL merge non-identity).
  *
  * Buffer: sorted-ascending distinct `Array[Long]`, ≤ k entries.
  * Null inputs must be filtered by the caller (a primitive-long UDAF
  * input would silently read null as 0).
  */
object KmvMinKAgg {

  def kmvAgg(k: Int): Aggregator[Long, Array[Long], Seq[Long]] = {
    require(k >= 1, "k must be positive")
    new Aggregator[Long, Array[Long], Seq[Long]] {
      private val cap = k

      override def zero: Array[Long] = Array.emptyLongArray

      override def reduce(buf: Array[Long], h: Long): Array[Long] = {
        val n = buf.length
        if (n == cap && h >= buf(n - 1)) return buf
        var pos = java.util.Arrays.binarySearch(buf, h)
        if (pos >= 0) return buf // already present: DISTINCT semantics
        pos = -pos - 1
        val outN = math.min(n + 1, cap)
        val out = new Array[Long](outN)
        System.arraycopy(buf, 0, out, 0, pos)
        out(pos) = h
        System.arraycopy(buf, pos, out, pos + 1, math.min(n - pos, outN - 1 - pos))
        out
      }

      override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
        if (a.isEmpty) return b
        if (b.isEmpty) return a
        val out = new Array[Long](math.min(a.length + b.length, cap))
        var ia = 0; var ib = 0; var io = 0
        var last = Long.MinValue
        while (io < out.length && (ia < a.length || ib < b.length)) {
          val takeA = ib >= b.length || (ia < a.length && a(ia) <= b(ib))
          val v = if (takeA) { val x = a(ia); ia += 1; x }
                  else { val x = b(ib); ib += 1; x }
          if (io == 0 || v != last) { out(io) = v; last = v; io += 1 }
        }
        if (io == out.length) out else java.util.Arrays.copyOf(out, io)
      }

      override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

      override def bufferEncoder = ExpressionEncoder[Array[Long]]()
      override def outputEncoder = ExpressionEncoder[Seq[Long]]()
    }
  }

  /** Column form: `kmv_sketch(k)(hash)` → sorted-ascending
    * `array<long>` of the group's k smallest distinct hashes. */
  def kmv_sketch(k: Int)(hash: Column): Column = udaf(kmvAgg(k)).apply(hash)
}
