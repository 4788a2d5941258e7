package graft

/** Guards the driver contract around `SparkEntry`: the catalog must
  * not silently shadow entries (queries is a Map — a duplicate name in
  * the catalog Seq would drop a query from the correctness gate with
  * no error), every oracle must belong to a declared query, and the
  * flagship smoke query must return rows at the smoke scale factor.
  */
class EntryContractSpec extends SparkSpec {

  test("catalog names are unique — no query can be silently shadowed") {
    val names = SparkEntry.catalog.map(_.name)
    val dups = names.groupBy(identity).collect { case (n, occ) if occ.size > 1 => n }
    assert(dups.isEmpty, s"duplicate catalog names: $dups")
    assert(names.forall(_.matches("q\\d+_[a-z0-9_]+")), "name convention")
  }

  test("every oracle belongs to a declared query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("flagship entry returns rows at the smoke scale factor") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  /** Queries whose EMPTY result at the smoke SF is the correct answer
    * (both engines agree on zero rows), so an empty oracle compare is
    * still meaningful for them: anti-join/except of sets that fully
    * overlap at this scale.
    */
  private val allowEmpty = Set("q05_join_anti", "q15_except")

  test("q50 oracle data preconditions hold: ASCII corpus, float-recoverable doc sizes") {
    // the q50 oracle equates payload BYTES with character CODES
    // (DuckDB has no blob-byte access) and recovers the bucket count
    // from a normalized float via f0 × n_bytes. Both are DATA
    // properties: one multi-byte character or a ≥10^6-byte document
    // breaks the compare looking like an engine bug. Enforce them per
    // SF so a regenerated corpus fails loudly as a data problem (the
    // q43-margin-gate pattern).
    import org.apache.spark.sql.functions._
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val docs = graft.engine.Tables.documents(spark, s"/root/testdata/$sf")
      val bad = docs.filter(octet_length(col("text")) =!= length(col("text")) ||
        length(col("text")) >= 1000000 || col("text").isNull)
      assert(bad.isEmpty,
        s"$sf: documents corpus violates the q50 oracle preconditions " +
          "(non-ASCII, >=1e6-byte, or null text) — fix the DATA or drop the q50 oracle")
    }
  }

  test("oracle-checked queries are non-empty at the smoke scale factor") {
    // the vacuity gate (ADVICE r4): a 0-row Spark result matching a
    // 0-row oracle result exercises nothing — q38's df cap silently
    // emptied it in round 4 and the hash compare stayed green. Any
    // parameter retune that empties an oracle-checked query must fail
    // HERE, not pass vacuously at the driver gate. `isEmpty` plans
    // with a limit, so this stays cheap across the catalog.
    val dir = "/root/testdata/sf0.001"
    val vacuous = SparkEntry.oracleSql.keySet.toSeq.sorted
      .filterNot(allowEmpty)
      .filter(name => SparkEntry.queries(name)(spark, dir).isEmpty)
    assert(vacuous.isEmpty,
      s"oracle-checked queries with empty (vacuous) results at sf0.001: $vacuous")
  }
}
