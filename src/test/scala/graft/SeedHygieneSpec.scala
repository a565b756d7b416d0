package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared `*Seed` constant feeds the same `md5Long(seed, id)` draw
  * family, so two equal seeds make their draws IDENTICAL for the same id —
  * the WSampleSeed == DsirSeed == 13 collision VERDICT r13 flagged (a
  * pipeline composing sp_weighted_sample with pl_dsir_select would have
  * gotten statistically dependent Bernoulli/Gumbel draws). Two pins make
  * the next collision a red bar at test time without relying on anyone
  * remembering to register anything:
  *
  *  - the distinctness test DISCOVERS seeds by reflection — every no-arg
  *    Int accessor named `*Seed`/`*Seed<digit>` on every operator module
  *    object (Scala `val`s compile to accessor methods; `private[graft]`
  *    is public in bytecode) — so a NEW named seed in ANY module is
  *    auto-registered the moment it exists;
  *  - the source scan bans inline integer seeds outright, so a draw cannot
  *    bypass naming.
  */
class SeedHygieneSpec extends AnyFunSuite {

  /** Every module object that can declare seeds — the SparkEntry.modules
    * inventory plus functions/tools helpers. A new module should be added
    * here; unlike a per-seed list this goes stale once per MODULE, not
    * once per constant, and the literal-scan test below still red-bars any
    * unnamed draw a forgotten module could hide.
    */
  private val modules: Seq[(String, AnyRef)] = Seq(
    "Relational" -> operators.Relational,
    "Relational2" -> operators.Relational2,
    "TextAnalysis" -> operators.TextAnalysis,
    "Dedup" -> operators.Dedup,
    "Similarity" -> operators.Similarity,
    "Events" -> operators.Events,
    "Multimodal" -> operators.Multimodal,
    "Joins" -> operators.Joins,
    "Connectors" -> operators.Connectors,
    "Pipeline" -> operators.Pipeline,
    "Skew" -> operators.Skew,
    "Maintenance" -> operators.Maintenance,
    "Changes" -> operators.Changes,
    "Quality" -> operators.Quality,
    "Retrieval" -> operators.Retrieval,
    "Spatial" -> operators.Spatial,
    "Analytics" -> operators.Analytics,
    "BpeTrainer" -> operators.BpeTrainer,
    "Learn" -> operators.Learn,
    "Bucketing" -> sources.Bucketing,
    "Versioned" -> sources.Versioned,
    "StreamGate" -> streaming.StreamGate)

  private def discoveredSeeds: Map[String, Int] =
    modules.flatMap { case (name, obj) =>
      obj.getClass.getMethods.toSeq
        .filter(m => m.getParameterCount == 0 &&
          m.getReturnType == java.lang.Integer.TYPE &&
          m.getName.matches(".*Seed\\d?"))
        .map(m => s"$name.${m.getName}" -> m.invoke(obj).asInstanceOf[Int])
    }.toMap

  test("all *Seed constants are pairwise distinct (discovered by reflection)") {
    val seeds = discoveredSeeds
    // Known floor: the 15 seeds declared as of r14. A DROP below this means
    // the discovery stopped seeing constants (e.g. a visibility change made
    // them bytecode-private), which would silently hollow out the pin.
    assert(seeds.size >= 15,
      s"seed discovery found only ${seeds.size} constants (${seeds.keys.toSeq.sorted.mkString(", ")}) — " +
        "expected at least the 15 declared in r14; did a visibility change hide them from reflection?")
    val dupes = seeds.groupBy(_._2).filter(_._2.size > 1)
    assert(dupes.isEmpty,
      s"seed collision(s): ${dupes.map { case (v, m) => s"$v used by ${m.keys.mkString(", ")}" }.mkString("; ")}")
  }

  /** The pairwise-distinct pin above only sees NAMED constants — an inline
    * `md5Long(7, …)` escapes it (exactly how the IVF-init/SampleSeed and
    * group-cap/SampleSeed collisions survived the r14 DsirSeed fix). This
    * scan makes a literal integer seed itself the red bar: every engine
    * draw must route through a named constant, and every oracle twin must
    * interpolate that constant rather than hard-coding its value. The
    * engine pattern tolerates whitespace/newlines after the paren, so a
    * line-split call cannot slip past.
    */
  test("no inline integer seed literals in src/main (engine or oracle SQL)") {
    val root = java.nio.file.Paths.get("src/main/scala")
    val bad = new scala.collection.mutable.ArrayBuffer[String]
    val engine = java.util.regex.Pattern.compile("""md5Long\(\s*\d""")
    val oracle = java.util.regex.Pattern.compile("""md5\('\d+:""")
    val walk = java.nio.file.Files.walk(root)
    try {
      walk.forEach { p =>
        if (p.toString.endsWith(".scala")) {
          // Explicit UTF-8: the sources carry non-ASCII doc glyphs, and the
          // JVM's default charset here is not UTF-8.
          val text = new String(java.nio.file.Files.readAllBytes(p),
            java.nio.charset.StandardCharsets.UTF_8)
          for (pat <- Seq(engine, oracle)) {
            val m = pat.matcher(text)
            while (m.find()) {
              val line = text.substring(0, m.start()).count(_ == '\n') + 1
              bad += s"$p:$line: ...${text.substring(m.start(), math.min(text.length, m.start() + 40))}..."
            }
          }
        }
      }
    } finally walk.close()
    assert(bad.isEmpty,
      s"inline seed literal(s) — lift into a named *Seed constant:\n${bad.mkString("\n")}")
  }
}
