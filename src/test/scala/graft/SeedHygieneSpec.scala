package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared `*Seed` constant feeds the same `md5Long(seed, id)` draw
  * family, so two equal seeds make their draws IDENTICAL for the same id —
  * the WSampleSeed == DsirSeed == 13 collision VERDICT r13 flagged (a
  * pipeline composing sp_weighted_sample with pl_dsir_select would have
  * gotten statistically dependent Bernoulli/Gumbel draws). This pin makes
  * the next collision a red bar at test time: ADD every new seed constant
  * to this list.
  */
class SeedHygieneSpec extends AnyFunSuite {
  test("all *Seed constants are pairwise distinct") {
    val seeds = Map(
      "Changes.OpSeed" -> operators.Changes.OpSeed,
      "Pipeline.SampleSeed" -> operators.Pipeline.SampleSeed,
      "Pipeline.WSampleSeed" -> operators.Pipeline.WSampleSeed,
      "Pipeline.ShuffleSeed" -> operators.Pipeline.ShuffleSeed,
      "Pipeline.ReservoirSeed" -> operators.Pipeline.ReservoirSeed,
      "Spatial.xSeed" -> operators.Spatial.xSeed,
      "Spatial.ySeed" -> operators.Spatial.ySeed,
      "Similarity.CellCkSeed" -> operators.Similarity.CellCkSeed,
      "Similarity.PqCkSeed" -> operators.Similarity.PqCkSeed,
      "Learn.DsirSeed" -> operators.Learn.DsirSeed)
    val dupes = seeds.groupBy(_._2).filter(_._2.size > 1)
    assert(dupes.isEmpty,
      s"seed collision(s): ${dupes.map { case (v, m) => s"$v used by ${m.keys.mkString(", ")}" }.mkString("; ")}")
  }
}
