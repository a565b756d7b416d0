package graft.tools

import graft.SparkSpec

/** Rot-proofs the cost-attribution probe (VERDICT r12 §wrong-2): the
  * probe's `*_full` variants must be the SAME plan as the production cd_*
  * queries, or its knob deltas attribute costs of plans that no longer
  * exist. After the r13 refactor both sides call one builder
  * ([[graft.operators.Changes.scd2History]] / `applyLatest`), so equality
  * holds by construction — this spec guards against someone re-inlining a
  * probe variant or drifting the production query off the builder.
  */
class CdProbeSpec extends SparkSpec {

  /** Canonicalized optimized plan: exprIds normalized, so two independent
    * constructions of the same logical plan compare equal.
    */
  private def plan(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.optimizedPlan.canonicalized

  test("CdProbe's full variants plan-equal the production cd_* queries") {
    val dir = sf()
    val probe = CdProbe.variants(spark, dir).toMap
    val prod = graft.operators.Changes.queries
    val pairs = Seq(
      "scd2_full" -> "cd_scd2_history",
      "apply_full" -> "cd_apply_changelog")
    for ((v, q) <- pairs) {
      val pv = plan(probe(v)())
      val pq = plan(prod(q)(spark, dir))
      assert(pv == pq,
        s"probe variant '$v' no longer plans like production '$q' — " +
          "re-align before trusting any CdProbe attribution:\n" +
          s"--- probe ---\n$pv\n--- production ---\n$pq")
    }
  }

  test("the knobbed variants actually differ from full (the probe measures something)") {
    val dir = sf()
    val probe = CdProbe.variants(spark, dir).toMap
    for ((full, knobbed) <- Seq(
        "scd2_full" -> "scd2_nopin", "scd2_full" -> "scd2_nosort",
        "apply_full" -> "apply_nopin", "apply_full" -> "apply_nosort"))
      assert(plan(probe(full)()) != plan(probe(knobbed)()),
        s"'$knobbed' plans identically to '$full' — its knob is vacuous")
  }
}
