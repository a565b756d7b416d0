package graft.tools

import graft.operators.{Dedup, Pipeline}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev probe: stage decomposition of the two remaining "documented
  * inherent" dedup costs (VERDICT r12 §next-7) — dd_ngram_pairs and
  * dd_incremental. Run in a QUIET JVM; numbers go to README "Performance
  * measurement notes".
  *
  * Production variants come from the shared gate builders
  * (`Dedup.queries` / the private[graft] tier functions — the CdProbe
  * no-drift discipline); the one INLINE plan here (`inc_cands_stored`) is
  * deliberately NOT a production restatement but a hypothetical
  * alternative being costed: cross-set candidates read from the STORED
  * ranked index (both sides' prefixes under the stored full-corpus
  * (df, sng) order — lossless under ANY common total order, so
  * verification keeps the result exact) instead of re-deriving df+rank
  * windows live over the union. The delta inc_cands − inc_cands_stored is
  * the price dd_incremental pays for measuring the ranking pass live.
  */
object DdProbe {
  def main(args: Array[String]): Unit = {
    // The corpus dir is REQUIRED (ADVICE r14 on TailProbe, applied to every
    // probe main): a machine-specific default silently probed the wrong (or
    // a missing) tree on any other checkout.
    if (args.isEmpty) {
      System.err.println("usage: DdProbe <corpusDir>   (e.g. DdProbe /root/testdata/sf0.1)")
      sys.exit(2)
    }
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val s = graft.EngineSession.local(cpus)
    def noop(df: DataFrame): Unit = df.write.mode("overwrite").format("noop").save()

    def sh() = Dedup.shingleStore(s, dir)
    def incCandsStored(): DataFrame = {
      // Hypothetical: prefixes from the stored index, sides by bucket tag.
      val pfx = Dedup.rankedStore(s, dir)
        .filter(col("rk") <= Dedup.prefixLenCol(Dedup.MinJaccardNum, Dedup.MinJaccardDen))
        .select(col("doc_id"), col("sng"),
          (Pipeline.bucket(col("doc_id")) >= Pipeline.LandingBucketCap).as("incoming"))
      pfx.filter(!col("incoming")).as("x")
        .join(pfx.filter(col("incoming")).as("y"), col("x.sng") === col("y.sng"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .transform(Dedup.spreadKeys("doc_a", "doc_b"))
        .distinct()
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      // Tier substrate reads (floors): the stored prefix index and the
      // session-pinned shingle table.
      "ranked_read" -> (() => Dedup.rankedStore(s, dir)),
      "shingle_read" -> (() => sh()),
      // dd_ngram_pairs decomposition: candidates over the stored index,
      // then the full gate query (adds verification joins + output sort).
      "ng_cands" -> (() => Dedup.jaccardCandidatesFrom(Dedup.rankedStore(s, dir))),
      "ng_full" -> (() => Dedup.queries("dd_ngram_pairs")(s, dir)),
      // dd_incremental decomposition: the live cross-set candidate tier
      // (union + df window + rank window + collision join), the stored-
      // index hypothetical, and the full gate query.
      "inc_cands" -> (() => Dedup.ngramCandidatesAcross(
        sh().filter(Pipeline.bucket(col("doc_id")) < Pipeline.LandingBucketCap),
        sh().filter(Pipeline.bucket(col("doc_id")) >= Pipeline.LandingBucketCap))),
      "inc_cands_stored" -> (() => incCandsStored()),
      "inc_full" -> (() => Dedup.queries("dd_incremental")(s, dir)),
      // dd_containment decomposition: one-sided prefix × FULL index
      // candidates over the stored index, then the full gate query
      // (adds the two shingle-store joins + array_intersect + sort).
      "ct_cands" -> (() => Dedup.containmentCandidatesFrom(Dedup.rankedStore(s, dir))),
      "ct_full" -> (() => Dedup.queries("dd_containment")(s, dir)),
    )
    // Warm every variant once (JIT/codegen + stored builds), then 3 timed
    // passes each.
    variants.foreach { case (_, f) => noop(f()) }
    (1 to 3).foreach { p =>
      variants.foreach { case (n, f) =>
        val t0 = System.nanoTime()
        noop(f())
        println(f"[ddprobe] pass$p $n%-16s ${(System.nanoTime() - t0) / 1e9}%6.3f s")
      }
    }
    s.stop()
  }
}
