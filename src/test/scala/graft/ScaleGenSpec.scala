package graft

import org.apache.spark.sql.functions._

import graft.tools.ScaleGen

/** The 10× stress generator must preserve per-copy statistical
  * structure, or the scale measurements in BENCH_sf1.json measure a
  * data-construction artifact instead of the engine (see ScaleGen
  * scaladoc): dup rates replicate per copy, never across copies.
  */
class ScaleGenSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "alpha beta gamma delta", "en", "web", 22L),
      (2L, "alpha beta gamma delta", "en", "web", 22L), // exact dup of 1
      (3L, "epsilon zeta eta theta", "de", "web", 22L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("documents: copies share no vocabulary; per-copy dup structure replicates") {
    val out = ScaleGen.scaleDocuments(docs, 3)
    assert(out.count() === 9)
    // copy 0 is identity
    assert(out.filter(col("doc_id") === 1L).collect()(0).getString(1)
      === "alpha beta gamma delta")
    // disjoint vocabulary across copies → the ONLY exact-dup groups are
    // the within-copy ones (3 copies × 1 group of 2)
    val groups = out.groupBy(md5(lower(col("text")))).count()
      .filter(col("count") > 1).collect()
    assert(groups.length === 3 && groups.forall(_.getLong(1) === 2))
    // token sets of copy 1 vs copy 0 are disjoint
    val t0 = out.filter(col("doc_id") === 1L)
    val t1 = out.filter(col("doc_id") === 10000001L)
    val inter = t0.select(graft.functions.TextFunctions.tokenSet(col("text")).as("a"))
      .crossJoin(t1.select(graft.functions.TextFunctions.tokenSet(col("text")).as("b")))
      .select(size(array_intersect(col("a"), col("b")))).collect()(0).getInt(0)
    assert(inter === 0)
  }

  test("embeddings: within-copy dot products exactly preserved, ids unique") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(0.5f, -0.25f, 0.125f, 1.0f), 0),
      (2L, Array(-1.0f, 0.75f, 0.5f, -0.125f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = ScaleGen.scaleEmbeddings(vecs, 4)
    assert(out.count() === 8)
    assert(out.select("vec_id").distinct().count() === 8)
    import graft.functions.VectorFunctions.dot
    val dots = out
      .withColumn("copy", floor(col("vec_id") / 10000000L))
      .groupBy("copy")
      .agg(collect_list(struct(col("vec_id"), col("embedding"))).as("vs"))
      .select(col("copy"),
        dot(element_at(col("vs"), 1).getField("embedding"),
          element_at(col("vs"), 2).getField("embedding")).as("d"))
      .collect().map(_.getDouble(1))
    // sign flips cancel in the product: s_k·a_k × s_k·b_k = a_k·b_k
    assert(dots.forall(d => math.abs(d - dots.head) < 1e-12),
      s"per-copy dot products must be identical: ${dots.toSeq}")
  }

  test("embeddings: copies of one vector are pairwise distinct and non-antipodal (decorrelated)") {
    import spark.implicits._
    // the regression this pins: a parity-degenerate sign hash made all
    // odd copies IDENTICAL and even copies exact negations — cross-copy
    // artifact duplicates that poison scale measurements
    val one = Seq((1L, Array.tabulate(64)(k => (k + 1).toFloat), 0))
      .toDF("vec_id", "embedding", "label")
    val copies = ScaleGen.scaleEmbeddings(one, 10)
      .orderBy("vec_id").collect().map(_.getSeq[Float](1).toArray)
    assert(copies.length === 10)
    for (i <- copies.indices; j <- copies.indices if i < j) {
      val same = copies(i).zip(copies(j)).forall { case (a, b) => a == b }
      val anti = copies(i).zip(copies(j)).forall { case (a, b) => a == -b }
      assert(!same, s"copies $i and $j identical — sign hash degenerate")
      assert(!anti, s"copies $i and $j antipodal — sign hash degenerate")
    }
    // sign vectors are balanced-ish per copy (not all-plus / all-minus)
    (1 until 10).foreach { j =>
      val plus = (0 until 64).count(k => ScaleGen.sign(j, k) > 0)
      assert(plus >= 16 && plus <= 48, s"copy $j sign vector too skewed: $plus/64")
    }
  }

  test("orders/lineitem: FK joins stay exactly consistent under scaling") {
    import spark.implicits._
    val orders = Seq((1L, 10L, "O", 5.0, java.sql.Date.valueOf("2024-01-01"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val li = Seq((1L, 7L, 3L, 1, 2.0, 10.0, 0.1, 0.05, "N", "O",
      java.sql.Date.valueOf("2024-01-05")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate")
    val so = ScaleGen.scaleOrders(orders, 5)
    val sl = ScaleGen.scaleLineitem(li, 5)
    assert(so.count() === 5 && sl.count() === 5)
    // every lineitem still joins to exactly one order
    assert(sl.join(so, col("l_orderkey") === col("o_orderkey")).count() === 5)
  }
}
