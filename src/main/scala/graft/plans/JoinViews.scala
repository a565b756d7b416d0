package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incremental maintenance of a materialized JOIN view — the delta-join
  * sibling of [[MatViews]]' aggregate views: a stored equi-join J = A ⋈ B
  * absorbs an append batch on EITHER side (or both) via the bilinearity of
  * the join,
  *
  *   (A₀ ∪ ΔA) ⋈ (B₀ ∪ ΔB)
  *     = A₀⋈B₀  ∪  ΔA⋈B₀  ∪  A₀⋈ΔB  ∪  ΔA⋈ΔB,
  *
  * so the refresh APPENDS three delta joins and never re-runs the stored
  * A₀⋈B₀ — the classic incremental-view-maintenance delta rule (Blakeley
  * et al. 1986; the same identity DBSP/differential dataflow generalizes).
  * At 100 TB this is the difference between an O(Δ)-shaped nightly refresh
  * (each delta join shuffles only delta keys; the base side is probed on
  * the join key, broadcast when the delta is small) and a full TB-scale
  * join recompute. Append-only bases only — deletes need the signed-delta
  * generalization ([[graft.operators.Changes]] carries the engine's CDC
  * merge semantics for that tier).
  *
  * Reference scope: none (the reference has no joins at all, SURVEY.md §4);
  * this extends the E15 optimizer/materialization tier. Correctness is
  * driver-gated end-to-end by `mv_join_incremental`: the gate query answers
  * an aggregate FROM the incrementally-maintained view parquet while the
  * oracle recomputes the full join from the base tables — a hash match
  * proves build + three-delta refresh == the monolithic join.
  */
object JoinViews {

  /** Materialize the initial view A₀ ⋈ B₀ (equi-join on `ak = bk`). */
  def build(a0: DataFrame, b0: DataFrame, ak: String, bk: String,
      viewPath: String): Unit =
    a0.join(b0, a0(ak) === b0(bk)).write.mode("overwrite").parquet(viewPath)

  /** Fold an append batch (ΔA, ΔB — either may be empty) into the stored
    * view: appends ΔA⋈B₀ ∪ A₀⋈ΔB ∪ ΔA⋈ΔB. The three joins touch the
    * pre-append base snapshots A₀/B₀ and the deltas only — the stored view
    * itself is never read or rewritten.
    *
    * Isolation caveat: a plain parquet directory append has NO atomic
    * commit point — a reader listing the directory mid-write can observe a
    * partial set of delta files, and a RETRY after a partially failed
    * append double-counts delta rows (the call is not idempotent). The
    * refresh protocol therefore assumes single-writer, no concurrent
    * readers during refresh; for snapshot-isolated readers and idempotent
    * retries, route the view through the manifest-committed
    * [[graft.sources.Versioned]] layout instead (readers resolve a
    * manifest, so a version is visible only after its one-file commit).
    */
  def refreshAppend(a0: DataFrame, da: DataFrame, b0: DataFrame, db: DataFrame,
      ak: String, bk: String, viewPath: String): Unit = {
    val delta = da.join(b0, da(ak) === b0(bk))
      .unionByName(a0.join(db, a0(ak) === db(bk)))
      .unionByName(da.join(db, da(ak) === db(bk)))
    delta.write.mode("append").parquet(viewPath)
  }
}
