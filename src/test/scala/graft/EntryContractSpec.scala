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
}
