package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The stored-structure tier's caching and eviction contracts: build thunks
  * run once per (structure, dataset dir); pinned frames are cached per
  * OWNING SparkContext and evicted only when that context stops (the r10
  * advisory fix — eviction used to key on the current applicationId, which
  * would let two live contexts thrash each other's pins).
  */
class StoredSpec extends SparkSpec {

  test("materialize builds once per (name, dir) and round-trips the rows") {
    import spark.implicits._
    var builds = 0
    def frame = { builds += 1; Seq((1L, "a"), (2L, "b")).toDF("id", "v") }
    val d1 = Stored.materialize("spec_mat", "specdir1", spark)(frame)
    val d2 = Stored.materialize("spec_mat", "specdir1", spark)(frame)
    assert(builds == 1, "second call must read the stored parquet, not rebuild")
    assert(d1.orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(d2.count() == 2)
    // A different dataset dir is a different structure.
    Stored.materialize("spec_mat", "specdir2", spark)(frame)
    assert(builds == 2)
  }

  test("scalarLong computes once and folds back the cached value") {
    var evals = 0
    def v = { evals += 1; 42L }
    assert(Stored.scalarLong("spec_scalar", "specdir")(v) == 42L)
    assert(Stored.scalarLong("spec_scalar", "specdir")(v) == 42L)
    assert(evals == 1)
  }

  test("pinned caches one checkpointed frame per live context and keeps it across calls") {
    import spark.implicits._
    var builds = 0
    def frame = { builds += 1; Seq(1L, 2L, 3L).toDF("id") }
    val p1 = Stored.pinned("spec_pin", "specdirA", spark)(frame)
    val p2 = Stored.pinned("spec_pin", "specdirA", spark)(frame)
    assert(builds == 1, "second call must return the pinned checkpoint, not rebuild")
    assert(p1 eq p2, "both consumers must share the SAME checkpointed frame")
    assert(p2.agg(sum("id")).head().getLong(0) == 6L)
    // The entry survives unrelated pinned calls from the same live context
    // (the old applicationId-prefix eviction would also have kept it, but
    // the point pinned entries live or die on is their OWNING context).
    Stored.pinned("spec_pin_other", "specdirA", spark)(Seq(9L).toDF("id"))
    val p3 = Stored.pinned("spec_pin", "specdirA", spark)(frame)
    assert(builds == 1 && (p1 eq p3))
    assert(Stored.livePinCount >= 2)
  }

  test("pinnedIfBounded pins under the bound and falls back LIVE over it") {
    import spark.implicits._
    // Under the bound: behaves exactly like pinned (cached, counted once).
    val under = Stored.pinnedIfBounded("spec_pib_small", "specdirC", spark, 10L)(
      Seq(1L, 2L).toDF("id"))
    assert(Stored.isPinned("spec_pib_small", "specdirC", spark),
      "a frame under the bound must be pinned")
    assert(under.count() == 2)
    // Over the bound: the frame must NOT enter the pin tier — consumers get
    // the live plan (still correct) instead of an executor-memory cliff.
    var builds = 0
    def big = { builds += 1; Seq(1L, 2L, 3L, 4L).toDF("id") }
    val over = Stored.pinnedIfBounded("spec_pib_big", "specdirC", spark, 3L)(big)
    assert(!Stored.isPinned("spec_pib_big", "specdirC", spark),
      "a frame over the bound must fall back to the live plan, not pin")
    assert(over.agg(sum("id")).head().getLong(0) == 10L)
    // The boundedness COUNT itself rides the scalar cache — a second call
    // re-builds the live plan (by-name thunk) but does not re-count.
    // Exactly 3 builds: call 1 evaluates the thunk for the count AND again
    // for the returned live frame (the documented deliberate extra pass);
    // call 2 skips the count (scalar cache) and builds only its live frame.
    // A regression to a cached/pinned over-bound frame would leave this at
    // 2, and a regression that drops the count cache would push it to 4.
    Stored.pinnedIfBounded("spec_pib_big", "specdirC", spark, 3L)(big)
    assert(builds == 3, "over-bound frames stay live (rebuilt per consumer), count cached once")
    assert(Stored.scalarLong("spec_pib_big:nrows", "specdirC")(99L) == 4L,
      "the row count must be cached from the first boundedness check")
  }

  test("pinned entries of a stopped context are evicted; a fresh context re-pins") {
    var builds = 0
    def frame(s: org.apache.spark.sql.SparkSession) = {
      import s.implicits._
      builds += 1; Seq(5L).toDF("id")
    }
    Stored.pinned("spec_pin_evict", "specdirB", spark)(frame(spark))
    assert(builds == 1)
    assert(Stored.livePinCount >= 1)
    // Stop the shared session: every pinned entry of this context must be
    // evicted on the next tier access, and the recreated context rebuilds.
    graft.SparkSpec.reset()
    assert(Stored.livePinCount == 0, "stopped-context entries must all be evicted")
    // `spark` (the suite's lazy val) now points at the stopped session —
    // take the recreated shared one, as a following suite would.
    val s2 = graft.SparkSpec.session
    val fresh = Stored.pinned("spec_pin_evict", "specdirB", s2)(frame(s2))
    assert(builds == 2, "a fresh context must re-pin, not read dead blocks")
    assert(fresh.head().getLong(0) == 5L)
  }
}
