package graft

import graft.functions.Chemistry

/** Chemistry UDF algorithm tests: hand-computed expected values
  * (weights: C 12.011, H 1.008, O 15.999, N 14.007).
  */
class ChemistrySpec extends SparkSpec {

  private def mw(s: String): Double =
    math.rint(Chemistry.molecularWeight(s).get * 1000) / 1000

  test("validity: accepts organic subset, rings, branches, brackets, salts") {
    val valid = Seq("C", "CCO", "C1CCCCC1", "CC(=O)O", "c1ccccc1",
      "[Na+].[Cl-]", "C%10CCCCC%10", "N#C", "CC(C)(C)C", "ClCCl", "BrC=C")
    val invalid = Seq("", "C1CC", "CC(", "CC)", "[Xx]", "C=", "Q", "[C", "1CC")
    valid.foreach(s => assert(Chemistry.isValid(s), s"expected valid: $s"))
    invalid.foreach(s => assert(!Chemistry.isValid(s), s"expected invalid: $s"))
  }

  test("molecular weight: alkanes, ethanol, benzene, acetic acid, salt") {
    assert(mw("C") === 16.043)            // CH4
    assert(mw("CC") === 30.07)            // C2H6
    assert(mw("CCO") === 46.069)          // ethanol C2H6O
    assert(mw("c1ccccc1") === 78.114)     // benzene C6H6
    assert(mw("CC(=O)O") === 60.052)      // acetic acid
    assert(mw("[Na+].[Cl-]") === 58.443)  // NaCl
    assert(mw("N#N") === 28.014)          // N2 (triple bond, no H)
  }

  test("salt strip keeps largest fragment deterministically") {
    assert(Chemistry.stripSalt("CCO.[Na+]") === "CCO")
    assert(Chemistry.stripSalt("CCCC.CC") === "CCCC")
    assert(Chemistry.stripSalt("CCO") === "CCO")
  }

  test("normalize drops stereo and isotopes") {
    assert(Chemistry.normalize("C[C@H](N)C(=O)O") === "C[CH](N)C(=O)O")
    assert(Chemistry.normalize("[13C]CO") === "[C]CO")
    assert(Chemistry.normalize("F/C=C/F") === "FC=CF")
  }

  test("descriptors: proxies follow documented constants") {
    val d = Chemistry.descriptors("CC(=O)O").get
    assert(d.carbons === 2 && d.oxygens === 2)
    assert(d.logP === -0.3)   // 0.5*2 - 0.65*2
    assert(d.tpsa === 34.2)   // 2 * 17.1
    assert(d.hbd === 1)       // the hydroxyl O
    assert(d.hba === 2)
    assert(d.lipinskiOk)
  }

  test("fingerprints are deterministic and respond to structure") {
    val a = Chemistry.morganBits("CCO").get
    val b = Chemistry.morganBits("CCO").get
    val c = Chemistry.morganBits("CCN").get
    assert(a.sameElements(b))
    assert(!a.sameElements(c))
    assert(Chemistry.structuralKeys("CC(=O)O").get.contains(7)) // double bond key
  }

  test("UDFs run in a Spark plan") {
    import spark.implicits._
    val df = Seq("CCO", "bad(", "c1ccccc1").toDF("smiles")
    val got = df.select(
      Chemistry.is_valid_smiles($"smiles").as("v"),
      Chemistry.molecular_weight($"smiles").as("mw")).collect()
    assert(got.map(_.getBoolean(0)).toSeq === Seq(true, false, true))
    assert(math.abs(got(0).getDouble(1) - 46.069) < 1e-9)
  }

  /** Per-alert rejection (the q78 Gopher-gate pattern): every alert in
    * the table has a molecule that triggers it and only it — except
    * the quinone, which legitimately also triggers the Michael-
    * acceptor motif — and drug-like molecules trigger nothing.
    */
  test("structural alerts: each motif fires on its molecule, clean molecules pass") {
    import spark.implicits._
    val fixtures = Seq(
      ("CN=NC", "azo"),
      ("c1ccc(O)c(O)c1", "catechol"),
      ("C=CC(=O)C", "michael_acceptor"),
      ("c1ccc(cc1)[N+](=O)[O-]", "nitro"),
      ("O=C1C=CC(=O)C=C1", "michael_acceptor,quinone"),
      ("NC(=S)N", "thiocarbonyl"),
      ("C1CCCCC1", ""), ("CC(=O)O", ""), ("[Na+].[Cl-]", ""), ("CCO", ""))
    val got = fixtures.map(_._1).toDF("smiles")
      .select($"smiles", Chemistry.structural_alerts_csv($"smiles").as("alerts"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    fixtures.foreach { case (s, want) =>
      assert(got(s) === want, s"alerts for $s")
    }
  }

  test("composed PAINS+Lipinski gate: alerts reject, Lipinski rejects, clean+drug-like passes") {
    import spark.implicits._
    val rows = Seq(
      "NC(=S)N",        // alert → rejected even though small
      "C" * 30,         // clean but logP proxy 15 > 5 → Lipinski reject
      "C1CCCCC1",       // clean + drug-like → pass
      "CC(=O)O")        // clean + drug-like → pass
      .toDF("smiles")
      .select($"smiles",
        Chemistry.pains_ok($"smiles").as("p"),
        Chemistry.pains_lipinski_gate($"smiles").as("g"))
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2)))
    assert(rows.map(r => (r._2, r._3)).toSeq ===
      Seq((false, false), (true, false), (true, true), (true, true)))
  }
}
