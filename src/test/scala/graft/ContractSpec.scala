package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants for [[SparkEntry]]. The round driver trusts
  * these maps blindly: an oracle whose key doesn't match its query is
  * silently skipped, a cross-module name collision silently shadows a query
  * (`Map ++`), and a query that loses its oracle silently downgrades from
  * hash-checked to rows-only. Each of those failure modes becomes a test
  * failure here instead.
  */
class ContractSpec extends AnyFunSuite {

  /** Queries that are rows-only BY DESIGN (approximate / engine-native ops
    * with no SQL-expressible oracle); each has a ScalaTest bound instead.
    * Growing this set is a deliberate act — add the name here AND a spec.
    */
  private val rowsOnlyByDesign = Set.empty[String]
  // Round 6 graduated ss_ann_lsh / ss_ann_ivf / mm_decode_features; round 7
  // graduated ss_ann_pq / ss_ann_ivfpq, ta_bpe_merges / ta_bpe_encode, and
  // ta_fingerprint_fnv; round 8 graduated the last class — the SKETCHES
  // (ev_hll_rollup, q24_approx_distinct, q36_approx_quantiles) — via the
  // contract shape: the engine emits (exact, within_bound) with the bound
  // checked in-plan, the oracle computes the exact values with literal
  // TRUE. Every declared query now carries a full hash oracle.

  test("every oracle key names a declared query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without a query (typo?): ${orphans.toSeq.sorted}")
  }

  test("the rows-only set is exactly the declared by-design list") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val undeclared = rowsOnly -- rowsOnlyByDesign
    val stale = rowsOnlyByDesign -- rowsOnly
    assert(undeclared.isEmpty,
      s"queries silently downgraded to rows-only (lost their oracle?): ${undeclared.toSeq.sorted}")
    assert(stale.isEmpty,
      s"declared rows-only but now oracle-checked or gone (update the list): ${stale.toSeq.sorted}")
  }

  test("tuning sweeps bracket the production operating point") {
    // A sweep that omits the deployed configuration can't answer "is the
    // production setting on the knee of the curve" — the one question the
    // artifact exists for. Pin both sweeps to their production points.
    import graft.operators.{Dedup, Similarity}
    assert(Similarity.IvfSweepProbes.contains(Similarity.IvfProbes),
      "IVF probe sweep must include the production probe depth")
    assert(Dedup.BandSweepConfigs.contains((Dedup.Bands, Dedup.RowsPerBand)),
      "LSH band sweep must include the production (bands, rows) split")
    // Every swept split must partition the SAME signature: b·r = K exactly
    // (a non-divisor split would silently ignore trailing components).
    Dedup.BandSweepConfigs.foreach { case (b, r) =>
      assert(b * r == Dedup.K, s"($b, $r) does not tile the K=${Dedup.K} signature")
    }
  }

  test("no cross-module query-name collisions (Map ++ would shadow one)") {
    val perModule = SparkEntry.modules.map(_._1.keySet)
    assert(perModule.map(_.size).sum == SparkEntry.queries.size,
      {
        val dupes = perModule.flatten.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
        s"query name declared in more than one module: ${dupes.toSeq.sorted}"
      })
    val perModuleO = SparkEntry.modules.map(_._2.keySet)
    assert(perModuleO.map(_.size).sum == SparkEntry.oracleSql.size,
      {
        val dupes = perModuleO.flatten.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
        s"oracle declared in more than one module: ${dupes.toSeq.sorted}"
      })
  }
}
