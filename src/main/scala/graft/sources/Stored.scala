package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped stored-structure tier (shared by the ANN indexes in
  * [[graft.operators.Similarity]] and the BPE merge table in
  * [[graft.operators.BpeTrainer]]): materialize a trained/derived structure
  * to parquet ONCE per (structure, dataset dir) and read it back — the
  * production shape, where codebooks, centroids, and tokenizers are built
  * offline once and STORED; every query (and every repeat invocation in
  * this JVM) reads the stored artifact.
  *
  * The build thunk is by-name so a cache hit constructs no training plan at
  * all (plan construction itself was the LSH planning cliff). Keyed by
  * dataset dir so scale factors never share a structure; session-scoped via
  * the JVM map — a new process retrains, exactly like a cold index build.
  */
object Stored {
  private val stored = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val scalars = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** A stored ONE-VALUE structure (a model hyperstat like the LM vocabulary
    * size): compute once per (name, dataset dir) and cache the long on the
    * driver, so consumers fold it into their plans as a LITERAL — removing
    * a one-row scan + broadcast-join stage from every query that needs it.
    * Same locking doctrine as [[materialize]] (reentrant monitor — the
    * value thunk may itself call materialize).
    *
    * LOAD-BEARING ASSUMPTION (ADVICE r19): the corpus under `dir` is
    * immutable for the SESSION's lifetime — the same contract
    * [[materialize]] and the kNN/IVF/PQ index tiers already rely on for
    * index reuse, but here it is load-bearing for RESULT VALUES, not just
    * reuse: a folded literal (ss_pagerank's node count, ta_heaps's doc
    * count) goes stale if the dir is rewritten mid-session, where the old
    * in-plan count aggregate would have stayed live. Any future operator
    * that WRITES into a corpus dir in-session must invalidate via
    * [[dropSession]] (test hook) or use a fresh dir (the mt_* rewrite
    * queries already do the latter — they write to derived paths, never
    * into the corpus dir).
    */
  def scalarLong(name: String, dir: String)(v: => Long): Long = {
    val key = s"$name:$dir"
    scalars.get(key) match {
      case null =>
        this.synchronized {
          scalars.get(key) match {
            case null => val x = v; scalars.put(key, x); x
            case hit => hit.longValue()
          }
        }
      case hit => hit.longValue()
    }
  }

  /** A stored structure ALSO pinned in executor memory: one eagerly
    * localCheckpointed frame per (SparkContext, name, dir), shared by every
    * consumer in the session. The bench's build/exec attribution showed
    * each consuming query paying ~1.4 s re-reading AND re-checkpointing the
    * same stored parquet at construction; a production engine keeps hot
    * model artifacts in the block manager once, not once per query. Only
    * for boundedly-small frames (signature/model tables — the blocks stay
    * resident for the context's lifetime); keyed by applicationId so a new
    * context re-pins instead of reading another context's dead blocks.
    * Entries of stopped contexts are dropped on the next lookup.
    */
  def pinned(name: String, dir: String, s: SparkSession)(df: => DataFrame): DataFrame = {
    val key = s"${s.sparkContext.applicationId}:$name:$dir"
    // Evict only entries whose OWNING context has stopped (each entry keeps
    // its context ref so liveness is checked directly) — keying eviction on
    // the current applicationId would let two live contexts in one JVM
    // thrash each other's pins. A stopped context's checkpoint blocks died
    // with its block manager, so dropping the map entry is the whole
    // cleanup — there is nothing left to unpersist.
    frames.values().removeIf(_._1.isStopped)
    frames.get(key) match {
      case null =>
        this.synchronized {
          frames.get(key) match {
            case null =>
              val f = df.localCheckpoint(true)
              frames.put(key, (s.sparkContext, f))
              f
            case (_, hit) => hit
          }
        }
      case (_, hit) => hit
    }
  }
  private val frames =
    new java.util.concurrent.ConcurrentHashMap[String, (org.apache.spark.SparkContext, DataFrame)]()

  /** [[pinned]] with a LOUD boundedness check (ADVICE r11): the pin tier is
    * only for metadata-sized frames, but some "grids" are bounded by a
    * DOMAIN assumption (e.g. values snapping to a small price grid) that a
    * different corpus can break — a near-continuous value column makes the
    * grid scale with the fact table, and a strong-referenced localCheckpoint
    * of that would hold O(|events|) blocks in executor memory for the
    * context's lifetime. Counts the frame ONCE per (name, corpus) via the
    * scalar cache; pins only under `maxRows`, otherwise logs loudly and
    * returns the LIVE frame — consumers stay correct (they re-aggregate per
    * query, the pre-pin behavior) and the engine degrades to the
    * shuffle-per-query plan instead of an executor-memory cliff.
    *
    * The pin path DELIBERATELY executes the frame twice at first touch
    * (once for the boundedness count, once inside [[pinned]]'s eager
    * localCheckpoint). The alternative — pin first, count the checkpointed
    * blocks, evict if over — would MATERIALIZE the over-bound frame in
    * executor memory before the check can reject it, i.e. suffer exactly
    * the cliff this guard exists to prevent; and localCheckpoint blocks
    * have no public eager-eviction handle, so "evict" would really mean
    * "hold until context GC". One extra execution, once per (name, corpus)
    * per session, is the price of checking BEFORE committing memory.
    */
  def pinnedIfBounded(name: String, dir: String, s: SparkSession, maxRows: Long)(
      df: => DataFrame): DataFrame = {
    val n = scalarLong(s"$name:nrows", dir)(df.count())
    if (n <= maxRows) pinned(name, dir, s)(df)
    else {
      // stderr, not log4j: pin-tier misuse must be visible in any run log,
      // not filtered by logger level. Once per (name, dir) — every
      // consumer of a hot store calls this per plan construction, and a
      // repeated warning would bury the one that matters.
      if (warned.add(s"$name:$dir"))
        System.err.println(
          s"[graft.Stored] NOT pinning '$name' for $dir: $n rows exceeds the " +
            s"metadata-size bound $maxRows - the domain-boundedness assumption " +
            "does not hold on this corpus; consumers fall back to live plans")
      df
    }
  }
  private val warned =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Whether a frame is currently pinned (test hook for the boundedness
    * fallback — proves an over-bound frame was NOT pinned).
    */
  private[graft] def isPinned(name: String, dir: String, s: SparkSession): Boolean =
    frames.containsKey(s"${s.sparkContext.applicationId}:$name:$dir")

  /** Live pinned-entry count AFTER eviction — test hook for the eviction
    * policy (StoredSpec proves stopped-context entries are dropped and live
    * ones survive).
    */
  private[sources] def livePinCount: Int = {
    frames.values().removeIf(_._1.isStopped)
    frames.size()
  }

  /** Invalidate every session-cached structure derived from `dir` — the
    * test-visible hook behind [[scalarLong]]'s corpus-immutability
    * assumption (ADVICE r19): an operator that rewrites a corpus dir
    * in-session must call this so folded scalars, materialized parquet
    * paths, and pinned frames are all rebuilt from the new bytes on next
    * touch. No production caller today (the gate corpus is immutable and
    * the mt_* rewrites use derived paths); exists so a future
    * incremental-ingest operator has a correct door instead of a silent
    * stale-literal hazard.
    */
  private[graft] def dropSession(dir: String): Unit = {
    val suffix = s":$dir"
    scalars.keySet().removeIf((k: String) => k.endsWith(suffix))
    stored.keySet().removeIf((k: String) => k.endsWith(suffix))
    frames.keySet().removeIf((k: String) => k.endsWith(suffix))
    warned.removeIf((k: String) => k.endsWith(suffix))
  }

  def materialize(name: String, dir: String, s: SparkSession)(df: => DataFrame): DataFrame = {
    val key = s"$name:$dir"
    // NOT computeIfAbsent around the build: build thunks legitimately NEST
    // (ivf_cells trains ivf_centroids inside its own thunk), and
    // ConcurrentHashMap forbids recursive updates — the nested insert can
    // land mid-resize and throw IllegalStateException("Recursive update"),
    // bin-layout-dependent and therefore intermittent. Object-monitor
    // synchronization is REENTRANT, so nested builds on one thread are
    // fine; concurrent builders of different structures serialize, which is
    // irrelevant at build frequency (once per structure per session).
    val path = stored.get(key) match {
      case null =>
        this.synchronized {
          stored.get(key) match {
            case null =>
              val p = graft.operators.Connectors.tmp(name)
              df.write.mode("overwrite").parquet(p)
              stored.put(key, p)
              p
            case hit => hit
          }
        }
      case hit => hit
    }
    s.read.parquet(path)
  }
}
