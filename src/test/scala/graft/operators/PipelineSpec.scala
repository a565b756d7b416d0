package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, count, lit, size, when}

class PipelineSpec extends SparkSpec {

  test("release pipeline: per-source totals respect the cap; splits partition the release") {
    val rows = Pipeline.queries("pl_release_corpus")(spark, sf()).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // The cap bounds each source's TOTAL contribution across all splits.
    rows.groupBy(_._2).foreach { case (src, rs) =>
      assert(rs.map(_._3).sum <= Pipeline.GroupCapK, s"source $src over cap")
    }
    assert(rows.map(_._1).distinct.sorted.sameElements(
      rows.map(_._1).distinct.sorted.intersect(Seq("test", "train", "val"))))
    // Train dominates: the 80/10/10 split shows up in the release manifest.
    val bySplit = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(bySplit("train") > bySplit.getOrElse("val", 0L))
    assert(bySplit("train") > bySplit.getOrElse("test", 0L))
  }

  test("group cap keeps the k lowest-hash docs per source, never more than k") {
    import org.apache.spark.sql.functions._
    val kept = Pipeline.queries("sp_group_cap")(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val bySource = kept.groupBy(_._2)
    val all = Relational.t(spark, sf(), "documents")
      .select(col("doc_id"), col("source"),
        graft.functions.HashFunctions.md5Long(Pipeline.GroupCapSeed, col("doc_id")).as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._2)
    all.foreach { case (src, docs) =>
      val expect = docs.sortBy(d => (d._3, d._1)).take(Pipeline.GroupCapK).map(_._1).toSet
      val got = bySource.getOrElse(src, Array.empty).map(_._1).toSet
      assert(got == expect, s"source $src")
      assert(got.size <= Pipeline.GroupCapK)
    }
    // Stability under appends: the kept set from a corpus PREFIX is the
    // true cap of that prefix (membership is a pure function of the
    // group's members, no RNG, no partition dependence).
    val half = Relational.t(spark, sf(), "documents").filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("source"),
        graft.functions.HashFunctions.md5Long(Pipeline.GroupCapSeed, col("doc_id")).as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).groupBy(_._2)
    half.foreach { case (src, docs) =>
      val expectHalf = docs.sortBy(d => (d._3, d._1)).take(Pipeline.GroupCapK).map(_._1).toSet
      val keptFull = bySource.getOrElse(src, Array.empty).map(_._1).toSet
      // Full-corpus survivors restricted to the half-corpus are a subset of
      // the half-corpus cap (appends only displace, never reorder).
      assert(keptFull.filter(_ % 2 == 0).subsetOf(expectHalf), s"source $src stability")
    }
  }

  test("epoch allocation respects the budget, the cap, and the largest-prefix rule") {
    val rows = Pipeline.queries("pl_epoch_alloc")(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, nt, e, used) =>
      assert(e >= 0 && e <= Pipeline.MaxEpochs, s"epoch cap violated: $e")
      assert(used == e * nt)
    }
    assert(rows.map(_._4).sum <= Pipeline.EpochBudget, "budget exceeded")
    // The extra epoch goes to exactly the largest-first prefix whose
    // cumulative size fits the leftover.
    val total = rows.map(_._2).sum
    val be = math.min(Pipeline.EpochBudget / total, Pipeline.MaxEpochs.toLong)
    val leftover = Pipeline.EpochBudget - be * total
    var cum = 0L
    rows.sortBy(r => (-r._2, r._1)).foreach { case (_, nt, e, _) =>
      cum += nt
      val expected = be + (if (be < Pipeline.MaxEpochs && cum <= leftover) 1L else 0L)
      assert(e == expected, s"allocation diverges from the waterfall at cum=$cum")
    }
  }

  test("reservoir-k sample is exactly the k lowest hash priorities") {
    val got = Pipeline.queries("sp_reservoir_k")(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == Pipeline.ReservoirK)
    // Recompute every order's priority with a reference md5 and check the
    // sample is exactly the k-smallest (h, key) set.
    def md5long(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      var out = 0L
      for (i <- 0 until 8) out = (out << 8) | (d(i) & 0xffL)
      out >>> 4
    }
    val all = Relational.t(spark, sf(), "orders").select("o_orderkey").collect()
      .map(_.getLong(0)).map(k => (md5long(s"${Pipeline.ReservoirSeed}:$k"), k))
    val exp = all.sorted.take(Pipeline.ReservoirK).map { case (h, k) => (k, h) }
    assert(got.sortBy(_._2).toSeq == exp.toSeq.sortBy(_._2))
  }

  test("hash splits are disjoint, exhaustive, and roughly 80/10/10") {
    val counts = Pipeline.queries("sp_split_assign")(spark, sf())
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = Relational.t(spark, sf(), "documents").count()
    assert(counts.keySet == Set("train", "val", "test"))
    // Exhaustive + disjoint by construction: the bucket ranges partition
    // [0, 100), so the split sizes must sum to exactly the corpus size.
    assert(counts.values.sum == total)
    // The md5 buckets are uniform enough that train holds the strict
    // majority even on a 500-doc corpus.
    assert(counts("train") > total / 2)
  }

  test("observe() quality counters ride the corpus scan without a second pass") {
    import org.apache.spark.sql.Observation
    // The operational pattern for a 100 TB pipeline run: data-quality
    // counters (row count, null keys, short docs) collected as observed
    // metrics on the SAME job that produces the output — no second scan,
    // no separate monitoring query. Cross-checked against an independent
    // aggregation.
    val obs = new Observation("corpus_quality")
    val src = Relational.t(spark, sf(), "documents")
    val out = src.observe(obs,
      count(lit(1)).as("n_rows"),
      count(when(col("n_chars") < 100, 1)).as("n_short"),
      count(when(col("lang").isNull, 1)).as("n_null_lang"))
      .filter(col("n_chars") >= 100)
    val kept = out.count()
    val m = obs.get
    val expected = src.agg(
      count(lit(1)), count(when(col("n_chars") < 100, 1)), count(when(col("lang").isNull, 1)))
      .collect().head
    assert(m("n_rows") == expected.getLong(0))
    assert(m("n_short") == expected.getLong(1))
    assert(m("n_null_lang") == expected.getLong(2))
    assert(kept == expected.getLong(0) - expected.getLong(1))
  }

  test("sample membership is a pure function of doc_id (stable under repartitioning)") {
    val base = Pipeline.queries("sp_hash_sample")(spark, sf())
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      val re = Pipeline.queries("sp_hash_sample")(spark, sf())
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(re == base)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    // And the sample is a subset of the train/val/test universe with the
    // documented rate: bucket < 10 of 100 ⇒ sample ⊆ train (bucket < 80).
    val trainIds = Relational.t(spark, sf(), "documents")
      .filter(Pipeline.bucket(col("doc_id")) < 80)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(base.subsetOf(trainIds))
  }

  test("token chunks tile every document: full windows, stride offsets, covered tail") {
    val chunks = Pipeline.queries("pl_chunk_tokens")(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .groupBy(_._1)
    val docLens = Relational.t(spark, sf(), "documents")
      .select(col("doc_id"), size(TextOps.tokens(col("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(chunks.nonEmpty)
    chunks.foreach { case (docId, cs) =>
      val n = docLens(docId)
      val sorted = cs.sortBy(_._2)
      // chunk ids are 0..k-1 with the documented count
      val expectK = 1 + math.max(0, math.ceil((n - Pipeline.ChunkSize).toDouble / Pipeline.ChunkStride).toInt)
      assert(sorted.map(_._2).toSeq == (0 until expectK), s"doc $docId")
      sorted.foreach { case (_, i, len, text) =>
        val start = i * Pipeline.ChunkStride // 0-based
        // every chunk is the full window except where the doc ends
        assert(len == math.min(Pipeline.ChunkSize, n - start), s"doc $docId chunk $i")
        assert(text.split(" ").length == len)
      }
      // the last chunk reaches the final token: full coverage, no orphan tail
      val (_, lastI, lastLen, _) = sorted.last
      assert(lastI * Pipeline.ChunkStride + lastLen == n, s"doc $docId tail")
    }
  }

  test("dataset card rollup levels are internally consistent") {
    val rows = Pipeline.queries("pl_dataset_card")(spark, sf()).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val leaves = rows.filter { case ((l, s), _) => l != "ALL" && s != "ALL" }
    val grand = rows(("ALL", "ALL"))
    // Additive measures sum exactly up the hierarchy; the distinct count is
    // subadditive (a text can repeat across sources) but never exceeds docs.
    assert(leaves.values.map(_._1).sum == grand._1)
    assert(leaves.values.map(_._3).sum == grand._3)
    assert(leaves.values.map(_._4).sum == grand._4)
    rows.values.foreach { case (docs, uniq, chars, toks) =>
      assert(uniq > 0 && uniq <= docs && chars > 0 && toks > 0)
    }
    for ((lang, subtotal) <- rows.collect { case ((l, "ALL"), v) if l != "ALL" => (l, v) }) {
      val langLeaves = leaves.filter(_._1._1 == lang).values
      assert(langLeaves.map(_._1).sum == subtotal._1, s"doc subtotal broken for $lang")
      assert(langLeaves.map(_._4).sum == subtotal._4, s"token subtotal broken for $lang")
    }
  }

  test("bootstrap CI brackets the point estimate with sane nearest-rank bounds") {
    val rows = Pipeline.queries("sp_bootstrap_ci")(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (m, lo, hi) = (r.getDouble(r.fieldIndex("mean")),
        r.getDouble(r.fieldIndex("ci_lo")), r.getDouble(r.fieldIndex("ci_hi")))
      assert(r.getLong(r.fieldIndex("n_resamples")) == Pipeline.BootB)
      assert(lo <= hi)
      // The 95% interval of resampled means should bracket the sample mean
      // (Poisson-bootstrap means center on it) and be non-degenerate.
      assert(lo <= m && m <= hi, s"CI [$lo, $hi] misses point estimate $m")
      assert(hi > lo, "interval must have width on a non-constant statistic")
    }
  }

  test("global shuffle is a genuine permutation, decorrelated from id order") {
    val rows = Pipeline.queries("pl_global_shuffle")(spark, sf()).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val n = rows.length
    assert(rows.map(_._2).toSet == (1L to n).toSet, "positions must be exactly 1..n")
    // A hash permutation must not preserve id order: count id-order
    // adjacent pairs that stay adjacent in shuffle order (expected ~2 of
    // 499 by chance; the identity permutation would score n−1).
    val pos = rows.toMap
    val ids = rows.map(_._1).sorted
    val adjacentKept = ids.sliding(2).count {
      case Array(a, b) => math.abs(pos(a) - pos(b)) == 1
      case _           => false
    }
    assert(adjacentKept < n / 10, s"shuffle preserves id adjacency: $adjacentKept of $n")
  }

  test("global prefix sums equal a sequential scan, stable across partition counts") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (1 to 5000).map(i => (i.toLong, rnd.nextInt(1000).toLong))
    val want = rows.sortBy(_._1).scanLeft(0L)(_ + _._2).tail
    for (parts <- Seq(1, 7, 32)) {
      val df = rows.toDF("k", "v").repartition(parts)
      val got = Pipeline.globalPrefixSums(spark, df, "cum", "v", col("k"))
        .orderBy("k").collect().map(_.getLong(2))
      assert(got.toSeq == want, s"prefix sums diverge at $parts partitions")
    }
  }

  test("global row numbers are 1..N in key order, stable across partition counts") {
    val rows = Pipeline.queries("sp_row_numbers")(spark, sf()).collect()
      .map(r => r.getLong(0) -> r.getLong(r.fieldIndex("seq_id")))
    val n = Relational.t(spark, sf(), "documents").count()
    assert(rows.map(_._2).toSeq == (1L to n))
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq, "numbered in key order")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      val re = Pipeline.queries("sp_row_numbers")(spark, sf()).collect()
        .map(r => r.getLong(0) -> r.getLong(r.fieldIndex("seq_id")))
      assert(re.toSeq == rows.toSeq, "numbering must not depend on partitioning")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("weighted priority sample: k rows, deterministic, priority >= weight") {
    val a = Pipeline.queries("sp_weighted_sample")(spark, sf()).collect()
    assert(a.length == Pipeline.WSampleK)
    a.foreach { r =>
      // u <= 1 so priority = w/u >= w; equality only at the max hash value
      assert(r.getDouble(3) >= r.getLong(r.fieldIndex("n_chars")).toDouble)
    }
    // membership is a pure function of (doc_id, weight): stable re-run
    val b = Pipeline.queries("sp_weighted_sample")(spark, sf()).collect()
    assert(a.map(_.getLong(0)).toSeq == b.map(_.getLong(0)).toSeq)
  }

  test("mixture weights: normalized, sqrt-tempered between uniform and proportional") {
    val rows = Pipeline.queries("pl_mixture_weights")(spark, sf()).collect()
    val nSources = rows.length
    val totalTokens = rows.map(_.getLong(2)).sum.toDouble
    val weights = rows.map(r => r.getLong(2) -> r.getDouble(3))
    assert(math.abs(weights.map(_._2).sum - 1.0) < 1e-12, "weights form a distribution")
    // α = 1/2 damps toward uniform: every source's share sits BETWEEN its
    // raw proportional share and the uniform share (the defining property
    // of a sub-linear temperature — big sources give up mass, small ones
    // gain), with equality only if all sources are the same size.
    for ((nt, w) <- weights) {
      val prop = nt / totalTokens
      val unif = 1.0 / nSources
      val (lo, hi) = (math.min(prop, unif), math.max(prop, unif))
      assert(w >= lo - 1e-12 && w <= hi + 1e-12,
        s"share $w outside [$prop proportional, $unif uniform]")
    }
    // Monotone: more tokens never means a smaller share.
    val sorted = weights.sortBy(_._1)
    sorted.sliding(2).foreach { case Array((_, w1), (_, w2)) => assert(w2 >= w1 - 1e-15) }
    // Floor allocation never overspends the budget.
    assert(rows.map(_.getLong(4)).sum <= Pipeline.MixTokenBudget)
  }

  test("filter funnel: stages chain (n_in = prior n_out), counts match per-doc recomputation") {
    import org.apache.spark.sql.functions._
    val rows = Pipeline.queries("pl_filter_funnel")(spark, sf()).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4), "exactly the four ordered stages")
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_out")) ==
        r.getLong(r.fieldIndex("n_in")) - r.getLong(r.fieldIndex("n_removed")))
    }
    // Chaining: each stage starts with the previous stage's survivors.
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(b.fieldIndex("n_in")) == a.getLong(a.fieldIndex("n_out")))
    }
    // Ground truth: recompute the short-circuit chain per document.
    val docs = Relational.t(spark, sf(), "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getString(1).toLowerCase.split(" +").filter(_.nonEmpty))
      .filter(_.nonEmpty)
    val stages: Seq[Array[String] => Boolean] = Seq(
      ts => ts.length >= Pipeline.FunnelMinTokens,
      ts => ts.count(TextOps.Stopwords.contains) * 20L >= ts.length,
      ts => ts.distinct.length * 3L >= ts.length,
      ts => {
        val n = ts.length.toLong
        val s1 = ts.groupBy(identity).values
          .map(g => g.length * math.round(1e6 * math.log(g.length))).sum
        n * math.round(1e6 * math.log(n.toDouble)) - s1 >= Pipeline.FunnelMinEntropyQ * n
      })
    val removed = Array.fill(4)(0L)
    docs.foreach { ts =>
      val i = stages.indexWhere(p => !p(ts))
      if (i >= 0) removed(i) += 1
    }
    assert(rows.map(_.getLong(rows.head.fieldIndex("n_removed"))).toSeq == removed.toSeq,
      s"removal attribution diverges: got ${rows.map(_.getLong(3)).toSeq}, want ${removed.toSeq}")
    assert(rows.head.getLong(rows.head.fieldIndex("n_in")) == docs.length.toLong)
    // The funnel is non-degenerate on the corpus: something survives and
    // something is removed overall.
    assert(rows.last.getLong(rows.last.fieldIndex("n_out")) > 0)
    assert(removed.sum > 0)
  }

  test("filter labels aggregate exactly to the funnel's stage counts") {
    val labels = Pipeline.queries("pl_filter_labels")(spark, sf()).collect()
      .map(r => (r.getString(r.fieldIndex("reason")), r.getBoolean(r.fieldIndex("keep"))))
    // keep is precisely reason == pass.
    labels.foreach { case (reason, keep) => assert(keep == (reason == "pass")) }
    val byReason = labels.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val funnel = Pipeline.queries("pl_filter_funnel")(spark, sf()).collect()
      .map(r => r.getString(r.fieldIndex("stage")) -> r.getLong(r.fieldIndex("n_removed")))
    funnel.foreach { case (stage, n) =>
      assert(byReason.getOrElse(stage, 0L) == n,
        s"stage $stage: labels say ${byReason.getOrElse(stage, 0L)}, funnel says $n")
    }
    assert(byReason.getOrElse("pass", 0L) == labels.length - funnel.map(_._2).sum)
  }
}
