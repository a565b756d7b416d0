package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property proofs for the [[MisraGries]] mergeable summary — the PODS'12
  * guarantees the gate query's `within_bound` column rests on, verified
  * over random streams, random counter budgets, and RANDOM PARTITIONINGS
  * (the summary is built per chunk with `reduce` and combined with
  * `merge`, exactly the map-side/exchange shape of the distributed
  * aggregation):
  *
  *  1. never overestimates: est(x) ≤ true(x) for every item;
  *  2. bounded undercount: true(x) − est(x) ≤ N/(k+1) for EVERY item
  *     (including items absent from the summary, est = 0) — whatever the
  *     chunking;
  *  3. at most k counters survive, all positive.
  *
  * Small budgets (k = 2..8) against a larger alphabet force the decrement
  * and merge-cut paths to actually fire.
  */
object MisraGriesProperties extends Properties("MisraGries") {

  private val word = Gen.choose(0, 25).map(i => s"w$i")
  private val stream = Gen.listOf(word)
  private val budget = Gen.choose(2, 8)
  private val seed = Gen.choose(0L, Long.MaxValue)

  /** Build the summary over `chunks` the way the engine does: reduce within
    * each chunk, merge across chunks (left fold — merge takes any tree).
    */
  private def summarize(chunks: Seq[Seq[String]], k: Int): Map[String, Long] = {
    val a = MisraGries.summary(k)
    chunks.map(_.foldLeft(a.zero)(a.reduce)).foldLeft(a.zero)(a.merge)
  }

  private def randomChunks(s: List[String], seed: Long): Seq[Seq[String]] = {
    val rnd = new scala.util.Random(seed)
    if (s.isEmpty) Seq(Seq.empty)
    else {
      // Split into 1..4 contiguous chunks at random boundaries — chunking
      // must not affect the guarantee (only the estimates).
      val cuts = Seq.fill(rnd.nextInt(4))(rnd.nextInt(s.length + 1)).sorted
      (0 +: cuts :+ s.length).sliding(2).map { case Seq(a, b) => s.slice(a, b) }.toSeq
    }
  }

  property("never overestimates; undercount bounded by N/(k+1); ≤k positive counters") =
    forAll(stream, budget, seed) { (s, k, sd) =>
      val est = summarize(randomChunks(s, sd), k)
      val truth = s.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val n = s.length.toLong
      est.size <= k &&
        est.values.forall(_ > 0) &&
        est.forall { case (w, e) => e <= truth(w) } &&
        truth.forall { case (w, t) => (t - est.getOrElse(w, 0L)) * (k + 1) <= n }
    }

  property("single-chunk and multi-chunk summaries obey the same bound") =
    forAll(stream, budget, seed) { (s, k, sd) =>
      val whole = summarize(Seq(s), k)
      val split = summarize(randomChunks(s, sd), k)
      val truth = s.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val n = s.length.toLong
      Seq(whole, split).forall(est =>
        truth.forall { case (w, t) => (t - est.getOrElse(w, 0L)) * (k + 1) <= n })
    }
}
