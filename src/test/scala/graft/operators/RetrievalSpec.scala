package graft.operators

import graft.{SparkSpec, StaleStructureContract}
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {

  test("ndcg equals a driver-side recompute from the gated bm25 ranking") {
    val r = Retrieval.queries("rt_ndcg")(spark, sf()).head()
    val ranked = Retrieval.queries("rt_bm25")(spark, sf()).collect()
      .map(x => (x.getLong(0), x.getLong(1))) // (doc_id, n_terms) in rank order
    def gain(nt: Long): Long = (1L << nt) - 1
    val dcg = ranked.take(Retrieval.NdcgK).zipWithIndex
      .map { case ((_, nt), i) => gain(nt) * Retrieval.NdcgWPpm(i) }.sum
    assert(r.getLong(1) == dcg, s"dcg_q ${r.getLong(1)} vs $dcg")
    // Ideal DCG dominates the realized one, and nDCG lands in (0, 1].
    assert(r.getLong(2) >= r.getLong(1))
    val ndcg = r.getDouble(3)
    assert(ndcg > 0.0 && ndcg <= 1.0)
    assert(ndcg == r.getLong(1).toDouble / r.getLong(2).toDouble)
  }

  test("df histogram: mass identities against the inverted index and correct bucketing") {
    val hist = Retrieval.queries("rt_df_histogram")(spark, sf()).collect()
    val index = Retrieval.queries("rt_inverted_index")(spark, sf()).collect()
      .map(r => r.getLong(r.fieldIndex("df")))
    // Σ n_terms = vocabulary size; Σ n_postings = total posting entries.
    assert(hist.map(_.getLong(hist.head.fieldIndex("n_terms"))).sum == index.length)
    assert(hist.map(_.getLong(hist.head.fieldIndex("n_postings"))).sum == index.sum)
    // Shares partition the index: they sum to 1 (exact n_i/T divisions).
    val shareSum = hist.map(_.getDouble(hist.head.fieldIndex("postings_share"))).sum
    assert(math.abs(shareSum - 1.0) < 1e-9, s"shares sum to $shareSum")
    // Each bucket b holds exactly the terms with df in [2^b, 2^(b+1)).
    val expected = index.groupBy(df => 63 - java.lang.Long.numberOfLeadingZeros(df))
      .view.mapValues(_.length.toLong).toMap
    hist.foreach { r =>
      val b = r.getInt(r.fieldIndex("df_bucket"))
      assert(r.getLong(r.fieldIndex("n_terms")) == expected(b), s"bucket $b")
    }
    assert(hist.length == expected.size)
  }

  test("inverted index: df equals posting-list length; postings sorted and total matches") {
    val rows = Retrieval.queries("rt_inverted_index")(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ids = r.getString(r.fieldIndex("postings")).split(",").map(_.toLong)
      assert(ids.length.toLong == r.getLong(r.fieldIndex("df")), s"term ${r.getString(0)}")
      assert(ids.sameElements(ids.sorted), s"postings sorted for ${r.getString(0)}")
    }
    // Σ df over terms == distinct (doc, term) pairs in the corpus.
    val expected = Relational.t(spark, sf(), "documents")
      .select(col("doc_id"), explode(array_distinct(TextOps.tokens(col("text")))).as("t"))
      .count()
    assert(rows.map(_.getLong(1)).sum == expected)
  }

  test("snippet: windows hold the claimed terms; every hit-anchored window is dominated") {
    val rows = Retrieval.queries("rt_snippet")(spark, sf()).collect()
    assert(rows.nonEmpty)
    val textByDoc = Relational.t(spark, sf(), "documents")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("ts")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val terms = Retrieval.Bm25Terms.toSet
    rows.foreach { r =>
      val ts = textByDoc(r.getLong(0))
      val start = r.getLong(r.fieldIndex("start")).toInt
      val window = ts.slice(start - 1, start - 1 + Retrieval.SnipW)
      assert(r.getString(r.fieldIndex("snippet")) == window.mkString(" "))
      assert(terms.contains(ts(start - 1)), "window must anchor at a hit")
      val got = r.getLong(r.fieldIndex("n_terms"))
      assert(got == window.toSet.intersect(terms).size.toLong)
      // No hit-anchored window beats it; equal-count windows don't precede it.
      val hitStarts = ts.zipWithIndex.collect { case (t, i) if terms.contains(t) => i + 1 }
      hitStarts.foreach { s0 =>
        val c = ts.slice(s0 - 1, s0 - 1 + Retrieval.SnipW).toSet.intersect(terms).size.toLong
        assert(c < got || (c == got && s0 >= start),
          s"doc ${r.getLong(0)}: window at $s0 (count $c) beats chosen $start ($got)")
      }
    }
  }

  test("bm25: k results, positive non-increasing scores, docs really match the query") {
    val rows = Retrieval.queries("rt_bm25")(spark, sf()).collect()
    assert(rows.nonEmpty && rows.length <= Retrieval.Bm25K)
    val scores = rows.map(_.getDouble(rows.head.fieldIndex("score")))
    assert(scores.forall(_ > 0))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, "sorted by score desc")
    rows.foreach { r =>
      val nTerms = r.getLong(r.fieldIndex("n_terms"))
      assert(nTerms >= 1 && nTerms <= Retrieval.Bm25Terms.length)
    }
    // Every scored document contains at least one query term.
    val hitIds = rows.map(_.getLong(0)).toSet
    val withTerm = Relational.t(spark, sf(), "documents")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("ts"))
      .filter(arrays_overlap(col("ts"), lit(Retrieval.Bm25Terms.toArray)))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(hitIds.subsetOf(withTerm))
    // A doc matching MORE distinct query terms with the same length profile
    // should generally outrank fewer-term docs; at minimum the top result
    // matches at least as many terms as the median result.
    val byTerms = rows.map(r => r.getLong(r.fieldIndex("n_terms")))
    assert(byTerms.head >= byTerms(byTerms.length / 2) - 1)
  }

  test("incremental df maintenance: merge(stale, delta) == rebuild, and the stale read differs") {
    def rows(name: String) =
      Retrieval.queries(name)(spark, sf()).collect().map(r =>
        (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    // The gate output (the histogram over the maintained merge) must
    // reproduce the from-scratch full-corpus rebuild's EXACTLY — this also
    // pins dfHistogram determinism over the two input plans.
    assert(rows("rt_df_incremental") == rows("rt_df_histogram"),
      "merge(stale base, delta) must equal rebuild(unioned corpus)")
    // The shared lifecycle triple at TERM level (StaleStructureContract,
    // VERDICT r14 #4): merge ≡ rebuild per term; the stale base strictly
    // undercounts postings (mass = cdf — the df table is merge-UPDATED, so
    // entry count alone is not strict: the batch may add no vocabulary);
    // and the gate plan reads the stale base's stored parquet exactly once
    // while never touching the full-rebuild store or re-tokenizing the
    // corpus (the delta rides the checkpoint-pinned token store, so
    // documents.parquet appears zero times). Stored paths end in
    // "_<name>": "_rt_term_df" substring-matches the base path too, so
    // count 1 for it PLUS count 1 for "_rt_term_df_base" pins full-store
    // scans to exactly zero.
    val keyed = StaleStructureContract.keyed(_: org.apache.spark.sql.DataFrame, "term")
    StaleStructureContract.check(
      "rt_df_incremental",
      stale = keyed(Retrieval.baseDfStore(spark, sf())),
      maintained = keyed(Retrieval.mergedDfStore(spark, sf())),
      rebuilt = keyed(Retrieval.dfStore(spark, sf())),
      staleMass = (v: Seq[Any]) => v.head.asInstanceOf[Long],
      gatePlan = Retrieval.queries("rt_df_incremental")(spark, sf())
        .queryExecution.executedPlan.toString,
      scanCounts = Seq(
        "_rt_term_df" -> 1,
        "_rt_term_df_base" -> 1,
        "documents.parquet" -> 0))
  }

  test("PRF expansion widens the query and re-ranks under it") {
    val rows = Retrieval.queries("rt_prf_expansion")(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == Retrieval.Bm25K)
    // Scores strictly ordered under the (score DESC, doc_id ASC) cut.
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 > b._3 || (a._3 == b._3 && a._1 < b._1))
    }
    // The expanded query really is wider: some result matches more terms
    // than the seed query has, and no result exceeds seed + promoted.
    assert(rows.map(_._2).max > Retrieval.Bm25Terms.length,
      "expansion must contribute matching terms")
    assert(rows.map(_._2).max <= Retrieval.Bm25Terms.length + Retrieval.FbTerms)
  }

  test("hybrid RRF scores are exact reciprocal-rank sums from the two lists") {
    val rows = Retrieval.queries("rt_hybrid_rrf")(spark, sf("sf0.01")).collect()
    assert(rows.length == Similarity.NQueries * Retrieval.RrfTopK)
    // Every fused score must be EXACTLY expressible as 1/(60+rd) + 1/(60+rl)
    // or a single such term with rank ≤ RrfListK — RRF admits no other
    // value, so a score outside the achievable set means a broken rank or a
    // drifted arithmetic tree.
    val singles = (1 to Retrieval.RrfListK).map(r => 1.0 / (60.0 + r))
    val achievable = (singles ++
      (for (a <- singles; b <- singles) yield a + b)).toSet
    rows.foreach { r =>
      val rrf = r.getDouble(r.fieldIndex("rrf"))
      assert(achievable.contains(rrf), s"score $rrf is not a valid RRF sum")
    }
    // Per query: ranks are 1..TopK and scores are non-increasing in rank.
    rows.groupBy(_.getLong(0)).foreach { case (_, qr) =>
      val byRank = qr.sortBy(_.getInt(1))
      assert(byRank.map(_.getInt(1)).toSeq == (1 to Retrieval.RrfTopK))
      val scores = byRank.map(_.getDouble(3)).toSeq
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }
}
