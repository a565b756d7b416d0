package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra–Gries heavy-hitters summary (Misra & Gries 1982;
  * mergeability per Agarwal et al., "Mergeable Summaries", PODS'12) as a
  * typed [[Aggregator]] — the map-side-summary aggregation shape for
  * frequent-item mining at 100 TB: every task reduces its token stream to
  * at most [[K]] counters, tasks ship ONLY their K-counter summaries
  * across the exchange (never the stream), and the final merge preserves
  * the deterministic error bound whatever the merge tree looks like.
  *
  * Invariants (the PODS'12 theorem, pinned in MisraGriesProperties):
  *  - estimates never overestimate: est(x) ≤ true(x) for every item;
  *  - total undercount is bounded: true(x) − est(x) ≤ N/(K+1) where N is
  *    the TOTAL stream length, across ANY partitioning and merge order —
  *    reduce's decrement-all step and merge's subtract-the-(K+1)-st-
  *    largest step each "spend" their decrements against distinct stream
  *    positions, so the spends sum to ≤ N/(K+1).
  *
  * The per-item ESTIMATE is merge-order-dependent (only the bound is
  * invariant), so the gate query emits the bound CHECK per exact heavy
  * hitter, never a raw estimate — the sketch-contract shape that put HLL
  * and the quantile sketch on the hash gate.
  *
  * Reference scope: none (the reference has no aggregation beyond
  * sort-grouping, SURVEY.md §2.1 O5-O6); this extends the E7 sketch tier.
  */
object MisraGries {

  /** Counter budget. Error bound N/(K+1); memory 64 counters per task. */
  val K = 64

  val agg: Aggregator[String, Map[String, Long], Map[String, Long]] = summary(K)

  /** The summary at an explicit counter budget `k` (the gate uses [[K]];
    * the property proofs use small budgets so decrements actually fire on
    * short planted streams).
    */
  def summary(k: Int): Aggregator[String, Map[String, Long], Map[String, Long]] =
    new Aggregator[String, Map[String, Long], Map[String, Long]] {
      def zero: Map[String, Long] = Map.empty

      // Classic MG step: hit → increment; room → insert; full miss →
      // decrement every counter (dropping zeros), charging this position
      // plus K tracked positions toward the error budget.
      def reduce(b: Map[String, Long], t: String): Map[String, Long] =
        b.get(t) match {
          case Some(c) => b.updated(t, c + 1)
          case None if b.size < k => b.updated(t, 1L)
          case None =>
            b.flatMap { case (w, c) => if (c > 1) Some(w -> (c - 1)) else None }
        }

      // PODS'12 merge: sum both summaries, then subtract the (K+1)-st
      // largest count from every counter and drop the non-positive — the
      // step that makes MG a MERGEABLE summary (bound survives any tree).
      def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
        val sum = b.foldLeft(a) { case (m, (w, c)) => m.updated(w, m.getOrElse(w, 0L) + c) }
        if (sum.size <= k) sum
        else {
          val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
          sum.flatMap { case (w, c) => if (c > cut) Some(w -> (c - cut)) else None }
        }
      }

      def finish(r: Map[String, Long]): Map[String, Long] = r
      def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
      def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
    }
}
