package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

/** Z-order layout (q130 family): interleave arithmetic, the guard,
  * and the thing the operator exists for — a 2-d box read that skips
  * most FILES via the min/max manifest while returning exactly the
  * full-scan result.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue matches a reference interleave and raises out of range") {
    def ref(a: Long, b: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, j) =>
        acc | (((a >> j) & 1L) << (2 * j)) | (((b >> j) & 1L) << (2 * j + 1))
      }
    val rows = for (a <- 0L until 16L; b <- 0L until 16L) yield (a, b)
    val got = rows.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zValue(Seq(col("a"), col("b")), 4).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    rows.foreach { case (a, b) =>
      assert(got((a, b)) === ref(a, b, 4), s"z($a,$b)")
    }
    // null propagates, out-of-range raises
    val nullZ = Seq((Some(1L), None: Option[Long])).toDF("a", "b")
      .select(Layout.zValue(Seq(col("a"), col("b")), 4).as("z")).collect()
    assert(nullZ(0).isNullAt(0))
    val ex = intercept[Exception] {
      Seq((16L, 0L)).toDF("a", "b")
        .select(Layout.zValue(Seq(col("a"), col("b")), 4)).collect()
    }
    assert(ex.getMessage.contains("z-order input out of"),
      s"wrong error: ${ex.getMessage}")
  }

  test("z-ordered layout: 2-d box read skips most files and equals the full scan") {
    // 64k rows over a 256x256 grid, clustered into 16 files
    val df = spark.range(0, 65536L)
      .select((col("id") % 256).as("x"), (col("id") / 256).cast("long").as("y"),
        col("id").as("payload"))
    val dir = tmpDir("zorder_data")
    Layout.writeZOrdered(df, dir, Seq("x", "y"), bits = 8, nFiles = 16)

    // plain reads ignore the underscore manifest: same row count
    assert(spark.read.parquet(dir).count() === 65536L)

    val box = Seq(("x", 10L, 40L), ("y", 10L, 40L))
    val (pruned, read, total) = Layout.prunedRead(spark, dir, box)
    assert(total === 16, s"expected 16 manifest entries, got $total")
    // a ~1/64 area box on a z-ordered 16-file layout must skip files;
    // a 1-d sort on x would read EVERY file for the y constraint
    assert(read < total, s"expected file skipping, read $read of $total")

    val expected = df.filter(col("x").between(10, 40) && col("y").between(10, 40))
      .orderBy("payload").collect().map(_.getLong(2)).toSeq
    val actual = pruned.orderBy("payload").collect()
      .map(_.getAs[Long]("payload")).toSeq
    assert(actual === expected, "pruned read must equal the full-scan filter")
    assert(actual.nonEmpty)

    // empty box → empty result, zero files
    val (none, readNone, _) = Layout.prunedRead(spark, dir,
      Seq(("x", 300L, 400L), ("y", 0L, 255L)))
    assert(readNone === 0 && none.count() === 0L)
  }
}
