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
      "Pipeline.GroupCapSeed" -> operators.Pipeline.GroupCapSeed,
      "Pipeline.WSampleSeed" -> operators.Pipeline.WSampleSeed,
      "Pipeline.ShuffleSeed" -> operators.Pipeline.ShuffleSeed,
      "Pipeline.ReservoirSeed" -> operators.Pipeline.ReservoirSeed,
      "Spatial.xSeed" -> operators.Spatial.xSeed,
      "Spatial.ySeed" -> operators.Spatial.ySeed,
      "Similarity.CellCkSeed" -> operators.Similarity.CellCkSeed,
      "Similarity.PqCkSeed" -> operators.Similarity.PqCkSeed,
      "Similarity.IvfInitSeed" -> operators.Similarity.IvfInitSeed,
      "Similarity.PqInitSeed" -> operators.Similarity.PqInitSeed,
      "Dedup.MinhashSeed1" -> operators.Dedup.MinhashSeed1,
      "Dedup.MinhashSeed2" -> operators.Dedup.MinhashSeed2,
      "Learn.DsirSeed" -> operators.Learn.DsirSeed)
    val dupes = seeds.groupBy(_._2).filter(_._2.size > 1)
    assert(dupes.isEmpty,
      s"seed collision(s): ${dupes.map { case (v, m) => s"$v used by ${m.keys.mkString(", ")}" }.mkString("; ")}")
  }

  /** The pairwise-distinct pin above only sees NAMED constants — an inline
    * `md5Long(7, …)` escapes it (exactly how the IVF-init/SampleSeed and
    * group-cap/SampleSeed collisions survived the r14 DsirSeed fix). This
    * scan makes a literal integer seed itself the red bar: every engine
    * draw must route through a named constant in the map above, and every
    * oracle twin must interpolate that constant rather than hard-coding
    * its value.
    */
  test("no inline integer seed literals in src/main (engine or oracle SQL)") {
    val root = java.nio.file.Paths.get("src/main/scala")
    val bad = new scala.collection.mutable.ArrayBuffer[String]
    val engine = java.util.regex.Pattern.compile("""md5Long\(\d""")
    val oracle = java.util.regex.Pattern.compile("""md5\('\d+:""")
    java.nio.file.Files.walk(root).forEach { p =>
      if (p.toString.endsWith(".scala")) {
        // Explicit UTF-8: the sources carry non-ASCII doc glyphs, and the
        // JVM's default charset here is not UTF-8.
        val text = new String(java.nio.file.Files.readAllBytes(p),
          java.nio.charset.StandardCharsets.UTF_8)
        text.linesIterator.zipWithIndex.foreach { case (line, i) =>
          if (engine.matcher(line).find() || oracle.matcher(line).find())
            bad += s"$p:${i + 1}: ${line.trim}"
        }
      }
    }
    assert(bad.isEmpty,
      s"inline seed literal(s) — lift into a named *Seed constant and add it to this spec:\n${bad.mkString("\n")}")
  }
}
