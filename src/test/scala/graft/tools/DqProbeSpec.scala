package graft.tools

import graft.SparkSpec

/** Rot-proofs the dq cost-attribution probe (the CdProbeSpec discipline):
  * the probe's `*_full` variants must be the SAME plan as the production
  * dq_* queries, or its knob deltas attribute costs of plans that no
  * longer exist. Both sides call one builder
  * ([[graft.operators.Quality.profileStats]] / `riConstraint`), so
  * equality holds by construction — this spec guards against someone
  * re-inlining a probe variant or drifting the production query off the
  * builder (exactly what r12's ProfileProbe `hybrid` variant was).
  */
class DqProbeSpec extends SparkSpec {

  /** Canonicalized optimized plan: exprIds normalized, so two independent
    * constructions of the same logical plan compare equal.
    */
  private def plan(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.optimizedPlan.canonicalized

  test("DqProbe's full variants plan-equal the production dq_* queries") {
    val dir = sf()
    val probe = DqProbe.variants(spark, dir).toMap
    val prod = graft.operators.Quality.queries
    val pairs = Seq(
      "pf_full" -> "dq_profile",
      "rf_full" -> "dq_referential")
    for ((v, q) <- pairs) {
      val pv = plan(probe(v)())
      val pq = plan(prod(q)(spark, dir))
      assert(pv == pq,
        s"probe variant '$v' no longer plans like production '$q' — " +
          "re-align before trusting any DqProbe attribution:\n" +
          s"--- probe ---\n$pv\n--- production ---\n$pq")
    }
  }

  test("the knobbed variants actually differ from full (the probe measures something)") {
    val dir = sf()
    val probe = DqProbe.variants(spark, dir).toMap
    for ((full, knobbed) <- Seq(
        "pf_full" -> "pf_nodistinct",
        "rf_full" -> "rf_nodup"))
      assert(plan(probe(full)()) != plan(probe(knobbed)()),
        s"'$knobbed' plans identically to '$full' — its knob is vacuous")
  }
}
