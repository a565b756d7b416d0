package graft.tools

import graft.SparkSpec
import graft.operators.{Maintenance, Relational, Retrieval, Similarity}

/** Rot-proofs the tail-tier cost-attribution probe (the CdProbe/DqProbe
  * discipline): the probe's `*_full` variants must be the SAME computation
  * as the production queries, or its knob deltas attribute costs of plans
  * that no longer exist. Both sides call one builder each
  * ([[Similarity.pageRankRanks]] / [[Retrieval.prfRanked]] / the three
  * Maintenance phase builders), so equality holds by construction — this
  * spec guards against someone re-inlining a probe variant or drifting the
  * production query off the builder.
  */
class TailProbeSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.optimizedPlan.canonicalized

  test("pr_full plans identically to production ss_pagerank") {
    val dir = sf()
    val probe = TailProbe.variants(spark, dir).toMap
    val pv = plan(probe("pr_full")())
    val pq = plan(Similarity.queries("ss_pagerank")(spark, dir))
    assert(pv == pq,
      "probe variant 'pr_full' no longer plans like production " +
        s"'ss_pagerank' — re-align before trusting any TailProbe attribution:\n$pv\n--- production ---\n$pq")
  }

  test("the pagerank knob variants actually differ (each iter adds a round)") {
    val dir = sf()
    val probe = TailProbe.variants(spark, dir).toMap
    val ps = Seq("pr_init", "pr_iter1", "pr_iter2", "pr_full").map(n => plan(probe(n)()))
    assert(ps.distinct.size == ps.size,
      "two pagerank iteration variants plan identically — the iters knob is vacuous")
  }

  /** prfRanked(expand = true) EAGERLY materializes its feedback frames
    * (Dedup.materialized = localCheckpoint), so two independent
    * constructions scan distinct checkpoint RDDs and canonicalized plans
    * cannot compare equal — the pin is at the ROW level instead. Both
    * sides call the one builder, so this guards the queries-map wiring.
    */
  test("prf_full returns exactly the production rt_prf_expansion rows; the seed knob changes them") {
    val dir = sf()
    val probe = TailProbe.variants(spark, dir).toMap
    val full = probe("prf_full")().collect().toSeq
    val prod = Retrieval.queries("rt_prf_expansion")(spark, dir).collect().toSeq
    assert(full == prod,
      "probe variant 'prf_full' no longer computes production 'rt_prf_expansion'")
    val seed = probe("prf_seed")().collect().toSeq
    assert(seed != full,
      "'prf_seed' returns the full PRF ranking — the expansion knob is vacuous")
  }

  /** db_full / ph_full call the queries-map functions directly (identity
    * with production — no pin needed); the STAGE variants must come from
    * the same shared builders production composes, so check they are
    * consistent with the full result rather than vacuous.
    */
  test("dbscan and phash stage variants are consistent with their full queries") {
    val dir = sf()
    val probe = TailProbe.variants(spark, dir).toMap
    // Scale-robust invariants (at sf0.001 the core graph can be EMPTY):
    // a < b halves the directed pair set, and the CC stage labels exactly
    // the distinct endpoints of the core graph, no more, no fewer.
    val pairs = probe("db_pairs")().count()
    val corePairs = probe("db_corepairs")()
    assert(corePairs.count() <= pairs / 2,
      "more core-core edges than undirected radius pairs")
    val endpoints = corePairs.select("doc_a")
      .union(corePairs.select("doc_b")).distinct().count()
    val cc = probe("db_cc")().count()
    assert(cc == endpoints,
      s"the CC stage labeled $cc nodes; the core graph has $endpoints endpoints")
    // ONE hash frame for both checks — each probe() call re-runs the full
    // decode + dHash pass (eagerly materialized), so reuse it.
    val hashFrame = probe("ph_hashes")()
    assert(hashFrame.count() > 0, "the decode+dHash stage produced no hashes")
    // Every full-query near-dup pair's endpoints must carry a hash row.
    val ids = hashFrame.select("doc_id").collect().map(_.getLong(0)).toSet
    val pairsFull = probe("ph_full")().select("doc_a", "doc_b").collect()
    assert(pairsFull.forall(r => ids(r.getLong(0)) && ids(r.getLong(1))),
      "a near-dup pair references an id absent from the hash stage")
  }

  /** The three Maintenance phase builders compose to the production gate
    * query by construction; cross-check content preservation end-to-end
    * against an independent aggregate over the ORIGINAL table (the gate's
    * DuckDB oracle proves the same at sf0.01 — this keeps it red-barred at
    * spec time too).
    */
  test("the compaction phases compose to the pruned report over original content") {
    import org.apache.spark.sql.functions._
    val dir = sf()
    val composed = Maintenance.compactedLangReport(spark,
      Maintenance.compactLangTree(spark, Maintenance.fragmentByLang(spark, dir)))
      .collect().toSeq
    val direct = Relational.t(spark, dir, "documents")
      .filter(col("lang").isin("en", "zh"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"))
      .orderBy("lang")
      .collect().toSeq
    assert(composed == direct,
      "fragment → compact → report no longer preserves the original content")
  }
}
