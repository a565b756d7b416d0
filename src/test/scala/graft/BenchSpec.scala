package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's self-healing adjudication pass (VERDICT r14 #1): which
  * queries get re-read at the end of a run, and how the quiet-median
  * reference file is parsed. Pure-function tests — the pass itself runs
  * inside Bench.main against the live session.
  */
class BenchSpec extends AnyFunSuite {

  test("quiet-median parse: flat numeric entries in, provenance and junk out") {
    val text =
      """{"_provenance":"median of 3 quiet sf0.1 runs, r15","q1":0.35,
        |"dd_containment":1.70,"weird":"string","n":2}""".stripMargin
    val m = Bench.parseQuietMedians(text)
    assert(m == Map("q1" -> 0.35, "dd_containment" -> 1.70, "n" -> 2.0))
    assert(Bench.parseQuietMedians("") == Map.empty)
    assert(Bench.parseQuietMedians("not json at all") == Map.empty)
  }

  test("reread selection: relative factor AND absolute slack both required") {
    val medians = Map("big" -> 1.0, "small" -> 0.1, "nearby" -> 1.0)
    val results = Seq(
      "big" -> 1.9, // 1.9x, +0.9s  -> selected
      "small" -> 0.2, // 2.0x but +0.1s < slack -> scheduler noise, skipped
      "nearby" -> 1.3, // +0.3s but 1.3x < factor -> inside swing, skipped
      "unknown" -> 9.0) // no recorded median -> skipped
    assert(Bench.rereadSelection(results, medians) == Seq("big"))
  }

  test("reread selection: worst absolute excess first, capped at MaxRereads") {
    val n = Bench.MaxRereads + 8
    val medians = (1 to n).map(i => s"q$i" -> 1.0).toMap
    // q1 has the largest excess, descending from there; all trip the gate.
    val results = (1 to n).map(i => s"q$i" -> (2.0 + (n - i) * 0.01))
    val sel = Bench.rereadSelection(results, medians)
    assert(sel.size == Bench.MaxRereads)
    assert(sel == (1 to Bench.MaxRereads).map(i => s"q$i"))
    // Ties break by name so the pass is deterministic across runs.
    val tied = Seq("b" -> 2.0, "a" -> 2.0)
    assert(Bench.rereadSelection(tied, Map("a" -> 1.0, "b" -> 1.0)) == Seq("a", "b"))
  }
}
