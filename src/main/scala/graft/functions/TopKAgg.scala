package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded per-group top-k by (score DESC, id ASC) WITHOUT a window
  * sort — [[GroupCapAgg]]'s keep-k treatment applied to scored
  * retrieval: the textbook
  * `row_number().over(Window.partitionBy(qid).orderBy(sim desc))`
  * shuffles and sorts EVERY scored (query, candidate) pair — Q·C rows
  * at brute-force ANN scale, which is exactly the relation that must
  * never materialize in an exchange at 100 TB. As a `udaf`-registered
  * Aggregator this gets full partial aggregation: each map task
  * reduces its slice to ≤ k pairs per query before the shuffle, so
  * the wire carries O(queries × partitions × k) rows and no Sort node
  * appears.
  *
  * Buffer: interleaved `[score0, id0, score1, id1, …]` in one
  * `Array[Double]`, ordered best-first. Ids ride as doubles — exact
  * for |id| < 2^53, ENFORCED in `reduce` (an id outside the mantissa
  * range throws rather than silently corrupting; vec/doc ids are far
  * below that everywhere in this engine, but a future caller feeding
  * xxhash64-derived ids must not pass). Ties on score resolve to the
  * smaller id, matching every
  * retrieval window's (sim DESC, cid) total order.
  */
object TopKAgg {

  def topKAgg(k: Int): Aggregator[(Double, Long), Array[Double], Seq[(Double, Long)]] = {
    require(k >= 1, "k must be positive")
    new Aggregator[(Double, Long), Array[Double], Seq[(Double, Long)]] {
      private val cap = k

      // "a comes before b" under (score DESC, id ASC); Double.compare
      // is the TOTAL order (NaN greatest, like Spark's descending
      // double sort) so degenerate scores cannot make the result
      // arrival-dependent
      private def before(s1: Double, i1: Double, s2: Double, i2: Double): Boolean = {
        val c = java.lang.Double.compare(s1, s2)
        c > 0 || (c == 0 && i1 < i2)
      }

      override def zero: Array[Double] = Array.emptyDoubleArray

      override def reduce(buf: Array[Double], in: (Double, Long)): Array[Double] = {
        val n = buf.length / 2
        val score = in._1
        val id = in._2.toDouble
        // ids ride the buffer as doubles — refuse ids the mantissa can't
        // hold rather than silently corrupting candidates (64-bit hash
        // ids like xxhash64 are a plausible future caller)
        if (id.toLong != in._2)
          throw new IllegalArgumentException(
            s"TopKAgg id ${in._2} exceeds 2^53: not exactly representable as Double")
        if (n == cap && !before(score, id, buf(2 * n - 2), buf(2 * n - 1))) buf
        else {
          var pos = 0
          while (pos < n && before(buf(2 * pos), buf(2 * pos + 1), score, id)) pos += 1
          val outN = math.min(n + 1, cap)
          val out = new Array[Double](outN * 2)
          System.arraycopy(buf, 0, out, 0, pos * 2)
          out(2 * pos) = score
          out(2 * pos + 1) = id
          System.arraycopy(buf, pos * 2, out, pos * 2 + 2,
            math.min(n, outN - 1 - pos) * 2)
          out
        }
      }

      override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
        if (a.isEmpty) return b
        if (b.isEmpty) return a
        val outN = math.min((a.length + b.length) / 2, cap)
        val out = new Array[Double](outN * 2)
        var ia = 0; var ib = 0; var io = 0
        while (io < outN) {
          val takeA = ib * 2 >= b.length ||
            (ia * 2 < a.length &&
              before(a(2 * ia), a(2 * ia + 1), b(2 * ib), b(2 * ib + 1)))
          if (takeA) { out(2 * io) = a(2 * ia); out(2 * io + 1) = a(2 * ia + 1); ia += 1 }
          else { out(2 * io) = b(2 * ib); out(2 * io + 1) = b(2 * ib + 1); ib += 1 }
          io += 1
        }
        out
      }

      override def finish(buf: Array[Double]): Seq[(Double, Long)] =
        (0 until buf.length / 2).map(i => (buf(2 * i), buf(2 * i + 1).toLong))

      override def bufferEncoder = ExpressionEncoder[Array[Double]]()
      override def outputEncoder = ExpressionEncoder[Seq[(Double, Long)]]()
    }
  }

  /** Column form: `top_scored(k)(score, id)` →
    * `array<struct<_1 score, _2 id>>`, best-first. */
  def top_scored(k: Int)(score: Column, id: Column): Column =
    udaf(topKAgg(k)).apply(score, id)
}
