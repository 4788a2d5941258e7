package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.operators.Pq

/** IVF-PQ (q128 family): the long-array (already-e6) encode kernel
  * differential, the persisted inverted-file layout's partition
  * pruning, the encoded≡persisted probe differential, and recall of
  * the exact top-1 under a 2-of-4-cell probe.
  */
class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def corpus = graft.engine.Tables.embeddings(spark, sf)
    .filter($"vec_id" =!= 0)
  private def query = graft.engine.Tables.embeddings(spark, sf)
    .filter($"vec_id" === 0)

  test("pq_encode on already-e6 long arrays matches the HOF form in both modes") {
    val idx = Pq.trainIvfPq(corpus, ncells = 4, m = 8, ksub = 16)
    val resid = Pq.residualsE6(corpus, idx.coarse)
    def check(): Unit = {
      val diff = resid.select(
        VectorFunctions.pqEncode($"resid", idx.residual.flatE6.toSeq,
          idx.residual.m, idx.residual.ksub).as("nk"),
        VectorFunctions.pqEncodeHof($"resid", idx.residual.flatE6.toSeq,
          idx.residual.m, idx.residual.ksub, alreadyE6 = true).as("hk"))
        .filter($"nk" =!= $"hk")
      assert(diff.count() === 0)
    }
    check()
    val conf = spark.conf
    val prevWhole = conf.get("spark.sql.codegen.wholeStage", "true")
    val prevFactory = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    conf.set("spark.sql.codegen.wholeStage", "false")
    conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try check()
    finally {
      conf.set("spark.sql.codegen.wholeStage", prevWhole)
      conf.set("spark.sql.codegen.factoryMode", prevFactory)
    }
  }

  test("persisted inverted-file probe: partition-pruned scan, identical to the in-memory probe") {
    val idx = Pq.trainIvfPq(corpus, ncells = 4, m = 8, ksub = 16)
    val qe6 = Pq.queryWeightsE6(query)
    val path = tmpDir("ivfpq_index")
    Pq.writeIvfPqIndex(corpus, idx, path)
    // one directory per cell on disk
    val cellDirs = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell=")).map(_.getName).toSet
    assert(cellDirs.size === 4, s"expected 4 cell partitions, got $cellDirs")

    val fromDisk = Pq.ivfPqTopKFromEncoded(
      spark.read.parquet(path), idx, qe6, k = 20, nprobe = 2)
    val inMem = Pq.ivfPqTopKFromEncoded(
      Pq.encodeIvfPq(corpus, idx), idx, qe6, k = 20, nprobe = 2)
    val a = fromDisk.orderBy("vec_id").collect().toSeq
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val b = inMem.orderBy("vec_id").collect().toSeq
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(a.nonEmpty && a === b)

    // the cell IN (...) filter must reach the scan as a PARTITION
    // filter: only nprobe of ncells partitions are read — the
    // inverted-list property that makes the probe corpus-fraction,
    // not corpus-sized, at 100 TB. collect() on THIS df so its own
    // queryExecution carries the scan metrics.
    fromDisk.collect()
    val plan = fromDisk.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = plan.collectLeaves().collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty, s"expected a file scan in:\n$plan")
    val pf = scans.head.partitionFilters
    assert(pf.nonEmpty && pf.mkString.contains("cell"),
      s"cell filter must be a partition filter, plan:\n$plan")
    // executed-scan metrics: exactly the probed cells' files are read
    val probed = Pq.probedCells(idx, qe6, 2).toSet
    def filesUnder(cells: Set[Int]): Int = cells.toSeq.map { c =>
      new java.io.File(path, s"cell=$c").listFiles()
        .count(f => f.getName.endsWith(".parquet"))
    }.sum
    val readFiles = scans.head.metrics("numFiles").value
    assert(readFiles === filesUnder(probed).toLong,
      s"scan must read exactly the probed cells' files ($probed), read $readFiles of ${filesUnder(Set(0, 1, 2, 3))}")
    assert(filesUnder(Set(0, 1, 2, 3)) > filesUnder(probed),
      "pruning must exclude at least one cell's files")
  }

  test("pq_encode_err matches the HOF form in both modes, on floats and e6 longs") {
    val idx = Pq.trainIvfPq(corpus, ncells = 4, m = 8, ksub = 16)
    val resid = Pq.residualsE6(corpus, idx.coarse)
    def check(): Unit = {
      val diffLong = resid.select(
        VectorFunctions.pqEncodeErr($"resid", idx.residual.flatE6.toSeq, 8, 16).as("nk"),
        VectorFunctions.pqEncodeErrHof($"resid", idx.residual.flatE6.toSeq, 8, 16,
          alreadyE6 = true).as("hk"))
        .filter($"nk" =!= $"hk")
      assert(diffLong.count() === 0)
      val cb = Pq.trainCodebookE6(corpus, m = 8, ksub = 16)
      val diffFloat = corpus.select(
        VectorFunctions.pqEncodeErr($"embedding", cb.flatE6.toSeq, 8, 16).as("nk"),
        VectorFunctions.pqEncodeErrHof($"embedding", cb.flatE6.toSeq, 8, 16).as("hk"))
        .filter($"nk" =!= $"hk")
      assert(diffFloat.count() === 0)
    }
    check()
    val conf = spark.conf
    val prevWhole = conf.get("spark.sql.codegen.wholeStage", "true")
    val prevFactory = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    conf.set("spark.sql.codegen.wholeStage", "false")
    conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try check()
    finally {
      conf.set("spark.sql.codegen.wholeStage", prevWhole)
      conf.set("spark.sql.codegen.factoryMode", prevFactory)
    }
  }

  test("maintenance append under frozen codebooks: probe equals a from-scratch encode of the union") {
    val cat = corpus.filter($"vec_id" % 10 =!= 9)
    val del = corpus.filter($"vec_id" % 10 === 9)
    val idx = Pq.trainIvfPq(cat, ncells = 4, m = 8, ksub = 16)
    val qe6 = Pq.queryWeightsE6(query)
    val path = tmpDir("ivfpq_append")
    Pq.writeIvfPqIndex(cat, idx, path)
    Pq.appendIvfPqIndex(del, idx, path)
    val fromDisk = Pq.ivfPqTopKFromEncoded(
        spark.read.parquet(path), idx, qe6, k = 20, nprobe = 2)
      .orderBy("vec_id").collect().toSeq
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val fresh = Pq.ivfPqTopKFromEncoded(
        Pq.encodeIvfPq(cat.unionByName(del), idx), idx, qe6, k = 20, nprobe = 2)
      .orderBy("vec_id").collect().toSeq
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(fromDisk.nonEmpty && fromDisk === fresh)
    // drift stats cover every cell and count the full split
    val drift = Pq.ivfPqDriftStats(cat, del, idx).collect()
    assert(drift.map(_.getLong(1)).sum === cat.count())
    assert(drift.map(_.getLong(2)).sum === del.count())
  }

  test("2-of-4 probe finds the planted exact neighbor and beats cell-blind chance") {
    // plant an exact copy of the query vector in the corpus: its cell
    // is the query's best cell, so any nprobe >= 1 probe must rank it
    // first (max possible reconstructed inner product in its cell)
    val planted = query.select(lit(900001L).as("vec_id"), col("embedding"))
    val c = corpus.select(col("vec_id"), col("embedding")).unionByName(planted)
    val top = Pq.ivfPqTopK(c, query, k = 5, ncells = 4, nprobe = 2,
      m = 8, ksub = 16)
    val ids = top.select("vec_id").as[Long].collect().toSeq
    assert(ids.head === 900001L,
      s"planted copy of the query must rank first, got $ids")
  }
}
