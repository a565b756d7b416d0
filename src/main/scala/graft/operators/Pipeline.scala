package graft.operators

import graft.functions.HashFunctions.md5Long
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-assembly operators for training-data pipelines: deterministic
  * sampling and split assignment over `documents`.
  *
  * Sampling here is HASH-based, not RNG-based (`TABLESAMPLE` / `df.sample`):
  * membership is a pure function of the row key, so it is reproducible across
  * runs, engines, partitionings, and cluster sizes; a document keeps its
  * split when the corpus is re-processed incrementally; and disjointness of
  * train/val/test is structural (bucket ranges partition [0,100)), not
  * statistical. At 100 TB this is a narrow map with no shuffle, no RNG state
  * per task, and full predicate pushdown past it — the standard way corpus
  * subsets and held-out splits are cut for LLM training runs.
  *
  * The bucket hash is the cross-engine
  * [[graft.functions.HashFunctions.md5Long]] (60-bit md5 prefix), so the
  * DuckDB oracle reproduces membership bit-for-bit.
  */
object Pipeline {

  /** Sampling seed: vary to draw an independent sample family. */
  val SampleSeed = 7

  /** Group-cap ranking seed of [[queries sp_group_cap]] — its OWN family:
    * was the literal 7 == [[SampleSeed]], which made per-source cap
    * survival and the sampling/split bucket functions of ONE md5Long draw
    * on the same doc_id space (a capped corpus would have sampled
    * non-uniformly under [[bucket]]). Pinned pairwise-distinct in
    * SeedHygieneSpec.
    */
  val GroupCapSeed = 47

  /** Hash bucket in [0, 100) for a document id — the sampling/split unit. */
  def bucket(docId: Column): Column =
    pmod(md5Long(SampleSeed, docId.cast("string")), lit(100L))

  /** THE landing-batch split point: ids with [[bucket]] < this are "already
    * indexed / existing corpus", the rest are the incoming batch. One
    * constant shared by every incremental-lifecycle surface (dd_incremental
    * / crossMatchStore, rt_df_incremental's base df store,
    * ss_ivf_incremental's base quantizer, the streaming ingest twin) so the
    * 80/20 shape cannot drift between tiers.
    */
  val LandingBucketCap = 80

  /** DuckDB twin of [[bucket]]. */
  def bucketSql(col: String): String =
    s"CAST('0x' || substr(md5('$SampleSeed:' || CAST($col AS VARCHAR)), 1, 15) AS BIGINT) % 100"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Per-group cap: at most CapK documents per source, chosen by
    // deterministic hash order — the "limit each domain's contribution"
    // corpus-balancing op (a dominant crawl source must not swamp the
    // mix). Membership is a pure function of (doc_id, the group's other
    // members): reproducible across engines and partitionings, and
    // *stable under appends* for the kept prefix (a new doc displaces at
    // most the largest-hash survivor, never reshuffles the sample).
    // Scale shape: Spark's WindowGroupLimit pushes the rank bound BELOW
    // the full sort — each map task keeps ≤ CapK rows per group before
    // the exchange (plan-asserted), so the shuffle carries the capped
    // sample, not the corpus.
    "sp_group_cap" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      Relational.t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          graft.functions.HashFunctions.md5Long(GroupCapSeed, col("doc_id")).as("h"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("source").orderBy(col("h").asc, col("doc_id").asc)))
        .filter(col("rn") <= lit(GroupCapK))
        .select(col("doc_id"), col("source"))
        .orderBy("source", "doc_id")
    },

    // Deterministic 10% corpus sample: membership is a pure function of
    // doc_id. The filter is a narrow map — no shuffle, no RNG.
    "sp_hash_sample" -> { (s, dir) =>
      Relational.t(s, dir, "documents")
        .filter(bucket(col("doc_id")) < 10)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy("doc_id")
    },

    // Data-constrained EPOCH ALLOCATION (the Muennighoff et al. 2023
    // regime: when unique data is scarcer than the compute budget, sources
    // REPEAT — but bounded, because marginal value decays with epochs):
    // give every source the same base epoch count (budget div corpus,
    // capped at MaxEpochs), then spend the leftover as one extra epoch for
    // the largest sources whose CUMULATIVE size fits — a greedy prefix in
    // (n_tokens DESC, source ASC) order, so the whole allocation is
    // closed-form integer arithmetic (the pl_mixture_weights sibling, with
    // epochs instead of sampling weights). The prefix cumsum runs as the
    // |sources|² broadcast self-join (never a single-partition window);
    // everything after the one per-source token aggregate is
    // metadata-sized. Invariant (spec): Σ tokens_used ≤ budget and no
    // source exceeds MaxEpochs.
    "pl_epoch_alloc" -> { (s, dir) =>
      val st = Dedup.materialized(
        Relational.t(s, dir, "documents")
          .transform(Dedup.spread("doc_id"))
          .select(col("source"), size(TextOps.tokens(col("text"))).cast("long").as("nt"))
          .groupBy("source").agg(sum("nt").as("n_tokens")))
      val base = st.agg(sum("n_tokens").as("total"))
        .select(least(expr(s"$EpochBudget DIV total"), lit(MaxEpochs.toLong)).as("be"),
          col("total"))
        .select(col("be"), (lit(EpochBudget) - col("be") * col("total")).as("leftover"))
      val other = st.select(col("source").as("s2"), col("n_tokens").as("n2"))
      val extra = when(col("be") < MaxEpochs && col("cum") <= col("leftover"), 1L)
        .otherwise(0L)
      st.join(broadcast(other), // bounded: |sources| rows
          col("n2") > col("n_tokens") ||
            (col("n2") === col("n_tokens") && col("s2") <= col("source")))
        .groupBy("source", "n_tokens").agg(sum("n2").as("cum"))
        .crossJoin(broadcast(base)) // bounded: one row
        .select(col("source"), col("n_tokens"),
          (col("be") + extra).as("epochs"),
          ((col("be") + extra) * col("n_tokens")).as("tokens_used"))
        .orderBy("source")
    },

    // EXACT-k uniform sample without replacement via hash priorities — the
    // distributed form of reservoir sampling: assign every row the
    // cross-engine md5 priority and keep the k smallest (priority sampling
    // ≡ uniform k-subset since the hash order is exchangeable in the data).
    // The Bernoulli hash sample above cannot promise an exact count; this
    // promises exactly k at any scale with the same determinism. Plans as
    // TakeOrderedAndProject: per-partition k-heaps + driver merge — the
    // reservoir's merge step, no global sort, no RNG, no sequential state.
    "sp_reservoir_k" -> { (s, dir) =>
      import graft.functions.HashFunctions.md5Long
      Relational.t(s, dir, "orders")
        .select(col("o_orderkey"),
          md5Long(ReservoirSeed, col("o_orderkey").cast("string")).as("h"))
        .orderBy(col("h").asc, col("o_orderkey").asc)
        .limit(ReservoirK)
    },

    // Stratified sampling: a per-stratum rate (here per lang — the typical
    // "rebalance the language mix" corpus op) applied through the same
    // deterministic hash bucket. Still a narrow map: the rate lookup is a
    // CASE on the stratum column, membership stays a pure function of
    // doc_id, and per-stratum counts are exact-in-expectation with
    // reproducible membership (no RNG, no per-stratum reservoir state).
    "sp_stratified_sample" -> { (s, dir) =>
      Relational.t(s, dir, "documents")
        .filter(bucket(col("doc_id")) <
          when(col("lang") === "en", 50).when(col("lang") === "de", 20).otherwise(10))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
        .orderBy("lang")
    },

    // Train/val/test split assignment (80/10/10 by hash bucket): disjoint and
    // exhaustive by construction. Summarized per split; the per-doc
    // assignment is the same expression un-aggregated.
    "sp_split_assign" -> { (s, dir) =>
      Relational.t(s, dir, "documents")
        .select(
          when(bucket(col("doc_id")) < 80, "train")
            .when(bucket(col("doc_id")) < 90, "val")
            .otherwise("test").as("split"),
          col("n_chars"))
        .groupBy("split")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"))
        .orderBy("split")
    },

    // The assembled training-corpus pipeline — quality filter → exact dedup
    // (keep-first survivor per normalized-content hash) → deterministic
    // train/val/test split — as ONE declarative plan. Catalyst fuses both
    // filters into the scan projection (no materialization between stages);
    // the only shuffles are the dedup hash partition and the final
    // 6-group aggregate. This is the composition story: each stage is an
    // independently-verified operator (ta_quality, dd_survivors,
    // sp_split_assign), and the end-to-end chain gets its own oracle.
    "pl_train_corpus" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("h").orderBy("doc_id")
      Relational.t(s, dir, "documents")
        .filter(length(trim(col("text"))) > 0)
        .filter(TextOps.qualityScore(col("text")) >= QualityThreshold)
        .withColumn("h", md5(TextOps.normText(col("text"))))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(
          when(bucket(col("doc_id")) < 80, "train")
            .when(bucket(col("doc_id")) < 90, "val")
            .otherwise("test").as("split"),
          col("lang"),
          col("n_chars"))
        .groupBy("split", "lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"))
        .orderBy("split", "lang")
    },

    // The corpus RELEASE pipeline — the v2 composition over the round's new
    // operators: quality gate → exact-dedup survivors → per-source cap
    // (the sp_group_cap balance step, applied to the deduped stream so a
    // duplicated crawl cannot spend a source's budget twice) → split
    // assignment → per-(split, source) release manifest. One declarative
    // plan: Catalyst fuses the two scan filters; the shuffles are the
    // dedup hash partition, the per-source cap rank, and the final
    // aggregate. Every stage is an independently-gated operator
    // (ta_quality, dd_survivors, sp_group_cap, sp_split_assign) and the
    // chain carries its own end-to-end oracle.
    "pl_release_corpus" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val dedupW = Window.partitionBy("h").orderBy("doc_id")
      val capW = Window.partitionBy("source")
        .orderBy(graft.functions.HashFunctions.md5Long(GroupCapSeed, col("doc_id")).asc,
          col("doc_id").asc)
      Relational.t(s, dir, "documents")
        .filter(length(trim(col("text"))) > 0)
        .filter(TextOps.qualityScore(col("text")) >= QualityThreshold)
        .withColumn("h", md5(TextOps.normText(col("text"))))
        .withColumn("rk", row_number().over(dedupW))
        .filter(col("rk") === 1)
        .withColumn("cap_rk", row_number().over(capW))
        .filter(col("cap_rk") <= lit(GroupCapK))
        .select(
          when(bucket(col("doc_id")) < 80, "train")
            .when(bucket(col("doc_id")) < 90, "val")
            .otherwise("test").as("split"),
          col("source"),
          col("n_chars"))
        .groupBy("split", "source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"))
        .orderBy("split", "source")
    },

    // Token-budget shard packing: assign documents to fixed-token-budget
    // training shards by a running token total per language stream — the
    // step that turns a filtered corpus into the ~equal-sized sequential
    // shards a training job actually reads. A document lands in the shard
    // where its tokens START (floor((cum - n_tokens) / budget)), so shard
    // boundaries are deterministic, order-stable, and reproducible across
    // engines. Scale shape: one window per language partition — the
    // sequential dependency is INHERENT to packing, so parallelism comes
    // from the partition column (at 100 TB: lang × hash-bucket substreams,
    // each packed independently — same window, finer partition key).
    "pl_token_pack" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Relational.t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
        .withColumn("cum", sum(col("n_tokens")).over(w))
        .select(col("lang"),
          floor((col("cum") - col("n_tokens")) / lit(TokenShardBudget)).as("shard_id"),
          col("n_tokens"))
        .groupBy("lang", "shard_id")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("shard_tokens"))
        .orderBy("lang", "shard_id")
    },

    // Fixed-token-window chunking with overlap — the step that turns
    // documents into model-context-sized training sequences (chunk i covers
    // tokens [i·stride+1, i·stride+ChunkSize]; consecutive chunks share
    // ChunkSize−ChunkStride tokens so no span is split across a boundary
    // without also appearing whole in one chunk). Chunk count and membership
    // are pure functions of the token count, so the op is a narrow
    // explode — no shuffle, no state; the output sort is gate-only.
    // At 100 TB this is the highest-fan-out narrow op in the pipeline
    // (corpus × chunks-per-doc rows), which is exactly why it must NOT
    // shuffle: chunks flow straight into the downstream shard writer.
    "pl_chunk_tokens" -> { (s, dir) =>
      val n = size(col("ts"))
      val extra = greatest(lit(0L),
        ceil((n - lit(ChunkSize)).cast("double") / lit(ChunkStride.toDouble)))
      Relational.t(s, dir, "documents")
        .transform(Dedup.spread("doc_id"))
        .select(col("doc_id"), TextOps.tokens(col("text")).as("ts"))
        .filter(size(col("ts")) >= 1)
        .select(col("doc_id"), col("ts"),
          explode(sequence(lit(0L), extra)).as("chunk_id"))
        .select(
          col("doc_id"),
          col("chunk_id").cast("int").as("chunk_id"),
          size(slice(col("ts"), (col("chunk_id") * ChunkStride + 1).cast("int"), lit(ChunkSize)))
            .as("n_chunk_tokens"),
          concat_ws(" ",
            slice(col("ts"), (col("chunk_id") * ChunkStride + 1).cast("int"), lit(ChunkSize)))
            .as("chunk"))
        .orderBy("doc_id", "chunk_id")
    },

    // Stable global row numbering — the sequence-id assignment a training
    // run gives its examples. A naive ROW_NUMBER() OVER (ORDER BY key)
    // funnels the whole table through ONE partition; the scalable form is
    // two-phase: range-partition by the key (each partition owns a
    // contiguous key interval), count per partition, broadcast the prefix
    // offsets, then number locally — O(rows) work, no global sort funnel.
    // That is exactly what RDD.zipWithIndex implements (one counting job +
    // one numbering pass), applied after a repartitionByRange + in-partition
    // sort so the index order is the KEY order, deterministically. The
    // DuckDB oracle is the single-node ROW_NUMBER truth.
    // The dataset card a corpus release ships with (the datasheet/model-card
    // companion): per (lang, source) — and every ROLLUP subtotal up to the
    // corpus grand total — document count, exact distinct normalized-text
    // count (the dedup-rate numerator), and exact char/token volumes. ONE
    // aggregation over ONE scan produces every card row: the rollup is an
    // Expand (no re-scan per level), the distinct shares it, and the token
    // count is the narrow codegen'd TextOps pass. At 100 TB the card is a
    // single shuffle whose output is |langs|×|sources| rows — the provenance
    // artifact is strictly cheaper than any query it documents.
    "pl_dataset_card" -> { (s, dir) =>
      Relational.t(s, dir, "documents")
        .select(
          col("lang"), col("source"), col("n_chars"),
          md5(TextOps.normText(col("text"))).as("h"),
          size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
        .rollup("lang", "source")
        .agg(
          // grouping() indicators, not coalesce-on-NULL: a genuine NULL data
          // value must stay a leaf group, never collide with the rollup
          // subtotal's 'ALL' label. (grouping() is only legal inside the
          // rollup's aggregate list, so the labels resolve in the select.)
          grouping(col("lang")).as("gl"),
          grouping(col("source")).as("gs"),
          count(lit(1)).as("n_docs"),
          countDistinct(col("h")).as("n_unique_texts"),
          sum(col("n_chars")).as("total_chars"),
          sum(col("n_tokens")).as("total_tokens"))
        .select(
          when(col("gl") === 1, lit("ALL")).otherwise(col("lang")).as("lang"),
          when(col("gs") === 1, lit("ALL")).otherwise(col("source")).as("source"),
          col("n_docs"), col("n_unique_texts"), col("total_chars"),
          col("total_tokens"))
        .orderBy("lang", "source")
    },

    "sp_row_numbers" -> { (s, dir) =>
      Pipeline.globalRowNumbers(s,
        Relational.t(s, dir, "documents").select(col("doc_id"), col("lang")),
        "seq_id", col("doc_id"))
        .orderBy("seq_id")
    },

    // Deterministic Poisson bootstrap CI — error bars for corpus statistics
    // (here: per-source mean n_chars) the way they are computed AT SCALE:
    // resample weights are per-(doc, resample) Poisson(1) draws, so each
    // of the B resampled means is ONE map-side-combined aggregation over
    // the corpus — no sampling shuffle, no per-resample pass (the Poisson
    // bootstrap of Chamandy et al.; the B× row fan-out is a narrow
    // explode). Determinism: per doc only TWO md5 hashes are computed and
    // the B draws derive as ((h1 + b·h2) mod [[BootP]]) ppm — the
    // Kirsch-Mitzenmacher two-hash family the MinHash tier already proves
    // cross-engine, so the bootstrap's hash compute is O(n), not O(B·n) —
    // looked up in the LITERAL Poisson CDF table ([[PoissonCdfPpm]] —
    // shared textually with the oracle, zero libm). Each resample mean is
    // exact-integer sums + one IEEE division, and the 2.5/97.5 nearest
    // ranks come from a window over the B-row-per-source means frame
    // (B is a constant: the window input never grows with the corpus).
    // The point estimate rides the SAME pass as replicate b = −1 with
    // weight ≡ 1 (sum(1·x)/sum(1) is bit-identical to sum(x)/count), so
    // the corpus is touched exactly once.
    "sp_bootstrap_ci" -> { (s, dir) =>
      val loRank = (BootB + 39) / 40
      val hiRank = (39 * BootB + 39) / 40
      // The B× replicate fan-out is the heaviest map side in the sp tier —
      // parallelizeNarrowScan spreads it across the session's cores when
      // the file layout under-splits (single-file local table; no-op at
      // scale, where the table scans as thousands of splits).
      val docs = Relational.parallelizeNarrowScan(
        Relational.t(s, dir, "documents")
          .select(col("source"), col("doc_id"), col("n_chars")))
        .select(col("source"), col("n_chars"),
          (md5Long(concat(lit("boot1:"), col("doc_id").cast("string"))) % lit(BootP)).as("h1"),
          (md5Long(concat(lit("boot2:"), col("doc_id").cast("string"))) % lit(BootP)).as("h2"))
      val bs = s.range(-1, BootB).select(col("id").cast("int").as("b"))
      // b ∈ [0, B): h1 + b·h2 < 2³¹·(B+1) ≪ 2⁶³ — no overflow; the b = −1
      // branch never reads ppm (weight is the literal 1).
      // Known, accepted bias: layering mod 1e6 over mod (2³¹−1) leaves ppm
      // values < 483647 with a ~1/2147 higher probability (2³¹−1 is not a
      // multiple of 1e6). For a 200-replicate CI over nearest-rank
      // percentiles the effect is far below resolution, and removing it
      // (rejection sampling, or a modulus dividing P−1) would change the
      // oracle arithmetic for no measurable gain — judged not worth it
      // (ADVICE r10). If ever tightened, keep the SQL twin textually
      // identical.
      val ppm = ((col("h1") + col("b") * col("h2")) % lit(BootP)) % lit(1000000L)
      val wExpr = when(col("b") < 0, lit(1L)).otherwise(
        PoissonCdfPpm.zipWithIndex.foldRight(
          lit(PoissonCdfPpm.length.toLong): Column) {
          case ((thr, k), acc) => when(ppm < thr, lit(k.toLong)).otherwise(acc)
        })
      // (B+1)·|sources| rows — materialized so the CI and point-estimate
      // consumers share the one corpus aggregation (the module's
      // multi-consumer doctrine; the frame is constant-bounded).
      val grouped = Dedup.materialized(
        docs.crossJoin(broadcast(bs)) // bounded: BootB+1 constant replicate ids
          .select(col("source"), col("b"), wExpr.as("w"), col("n_chars"))
          .groupBy("source", "b")
          .agg((sum(col("w") * col("n_chars")).cast("double") /
            sum(col("w")).cast("double")).as("mean_b")))
      val wRk = Window.partitionBy("source").orderBy(col("mean_b").asc, col("b").asc)
      val ci = grouped.filter(col("b") >= 0)
        .withColumn("rk", row_number().over(wRk))
        .groupBy("source")
        .agg(count(lit(1)).as("n_resamples"),
          max(when(col("rk") === loRank, col("mean_b"))).as("ci_lo"),
          max(when(col("rk") === hiRank, col("mean_b"))).as("ci_hi"))
      val pt = grouped.filter(col("b") === -1)
        .select(col("source"), col("mean_b").as("mean"))
      pt.join(ci, "source")
        .select(col("source"), col("mean"), col("ci_lo"), col("ci_hi"),
          col("n_resamples"))
        .orderBy("source")
    },

    // Deterministic global shuffle — the reproducible pseudorandom corpus
    // permutation every training run applies before sharding (sequential
    // doc order correlates with crawl time/source; a model must not see
    // it). Position = global rank in (md5(seed:doc_id), doc_id) order:
    // the same cross-engine hash family as the samplers, so the ENTIRE
    // permutation is a pure function of (seed, ids) — re-runnable anywhere,
    // stable under partitioning, and a new seed is a fresh epoch order.
    // Ranks come from the range-partition numbering (hash values are
    // uniform, so range partitions are balanced by construction — the
    // ideal input for that machinery); no global-sort funnel.
    "pl_global_shuffle" -> { (s, dir) =>
      Pipeline.globalRowNumbers(s,
        Relational.t(s, dir, "documents")
          .select(col("doc_id"),
            graft.functions.HashFunctions.md5Long(ShuffleSeed, col("doc_id").cast("string")).as("h")),
        "shuffle_pos", col("h"), col("doc_id"))
        .select(col("doc_id"), col("shuffle_pos"))
        .orderBy("shuffle_pos")
    },

    // Temperature-scaled corpus mixture weights — the sampling distribution a
    // multi-source training run draws from. Raw proportional sampling lets
    // the biggest source drown the mixture; uniform sampling overfits tiny
    // sources. The standard compromise is w_i ∝ size_i^α with α ∈ (0,1);
    // α = 1/2 is the one temperature whose power is an EXACT IEEE operation
    // (sqrt is correctly rounded; pow/exp/log are libm, not bit-stable
    // across engines), so the whole weight table is oracle-checkable.
    // Normalization sums the sqrt masses through DECIMAL(38,18)
    // (order-independent), one double division per source, and an integer
    // floor allocation against the token budget. Shape: one narrow
    // aggregation to the checkpointed ~|sources|-row table, then the
    // normalizer is a broadcast ONE-ROW aggregate cross-joined back — no
    // unpartitioned window anywhere, so the corpus is scanned once and no
    // WindowExec warning can fire.
    "pl_mixture_weights" -> { (s, dir) =>
      val perSource = Dedup.materialized(Relational.t(s, dir, "documents")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(TextOps.tokens(col("text"))).cast("long")).as("n_tokens")))
      val total = perSource.agg(
        sum(sqrt(col("n_tokens")).cast(org.apache.spark.sql.types.DecimalType(38, 18)))
          .cast("double").as("sw"))
      val weight = sqrt(col("n_tokens")) / col("sw")
      perSource.crossJoin(broadcast(total)) // bounded: one row
        .select(col("source"), col("n_docs"), col("n_tokens"),
          weight.as("weight"),
          floor(weight * lit(MixTokenBudget)).cast("long").as("alloc_tokens"))
        .orderBy("source")
    },

    // Weighted sampling without replacement (Duffield–Lund–Thorup priority
    // sampling): each document draws a deterministic uniform u ∈ (0, 1] from
    // the cross-engine hash and gets priority w/u; the k largest priorities
    // are the sample. Selection probability rises with weight (here
    // n_chars — longer documents carry more training signal), membership is
    // a pure function of the row key (reproducible across engines, runs,
    // and partitionings — no RNG state), and the plan is a narrow map +
    // TakeOrderedAndProject: per-partition top-k, driver merge, no global
    // sort at any scale. Division is a single IEEE op, so priorities are
    // bit-identical in DuckDB (the log/pow forms of A-Res sampling are not).
    "sp_weighted_sample" -> { (s, dir) =>
      val u = (pmod(md5Long(WSampleSeed, col("doc_id").cast("string")), lit(1048576L)) + 1L)
        .cast("double") / lit(1048576.0)
      Relational.t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"),
          (col("n_chars").cast("double") / u).as("priority"))
        .orderBy(col("priority").desc, col("doc_id").asc)
        .limit(WSampleK)
    },

    // Curriculum ordering — the deterministic global order a training run
    // reads the mix in: rank documents within each source by quality
    // (descending, doc_id tie-break — the score is the engine-stable
    // qualityScore, so the rank order is reproducible), then interleave
    // round-robin across sources (round r emits every source's rank-r doc in
    // source order) so the stream front-loads quality AND never runs a long
    // single-source streak. The naive global position is
    // ROW_NUMBER() OVER (ORDER BY src_rank, source) — a single-partition
    // funnel over the whole corpus. The scalable form computes the SAME
    // position in closed form against the |sources|-row count table:
    //   pos = Σ_s min(src_rank−1, n_s)            (all docs of earlier rounds)
    //       + |{s : s < source ∧ n_s ≥ src_rank}| (this round, earlier sources)
    //       + 1
    // broadcast as a one-row sorted array (the mt_zorder bounds pattern), so
    // the op is one per-source rank window plus a narrow map — no global
    // sort at any scale. The HOF lambdas run interpreted, but over
    // |sources|-element arrays (5 here), not per-token data — O(|sources|)
    // per row, unlike the per-token lambdas TextOps bans. The DuckDB oracle
    // runs the naive ROW_NUMBER form: the hash-match proves the closed form
    // IS the global interleave order.
    "pl_curriculum" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val ranked = Relational.t(s, dir, "documents")
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"), col("source"),
          TextOps.qualityScore(col("text")).as("q"))
        .withColumn("src_rank", row_number().over(
          Window.partitionBy("source").orderBy(col("q").desc, col("doc_id").asc))
          .cast("long"))
      val counts = ranked.groupBy("source").agg(count(lit(1)).as("n"))
        .agg(sort_array(collect_list(struct(col("source"), col("n")))).as("srcs"))
      ranked
        .crossJoin(broadcast(counts)) // bounded: one row (|sources| list)
        .select(
          (aggregate(col("srcs"), lit(0L),
              (acc, x) => acc + least(col("src_rank") - 1, x.getField("n")))
            + size(filter(col("srcs"), x =>
                x.getField("source") < col("source") &&
                x.getField("n") >= col("src_rank"))).cast("long")
            + 1L).as("pos"),
          col("doc_id"), col("source"), col("src_rank"))
        .orderBy("pos")
    },

    // Quality-filter attrition funnel — the observability artifact every
    // corpus-cleaning pipeline ships beside its output: how many documents
    // each ORDERED filter stage removes, cumulatively (a doc is charged to
    // the FIRST stage it fails, exactly like a short-circuiting filter
    // chain). Stages are the engine's own per-doc signals with integer-
    // exact thresholds (ratios cross-multiplied, entropy compared in
    // integer quanta — no float threshold can flip a count): min token
    // count, stopword ratio ≥ 1/20, type-token ratio ≥ 1/3 (repetition
    // proxy), mean token entropy ≥ 2.8 nats (gibberish screen). Shape: ONE
    // token explode + two hash aggregations compute every per-doc signal,
    // one single-row aggregate computes every stage's removal count, and
    // the 4-row funnel is a literal-array explode of that broadcast row —
    // the report costs one corpus scan regardless of stage count, vs the
    // k-scans a naive "run each filter separately and count" pipeline pays.
    "pl_filter_funnel" -> { (s, dir) =>
      val perDoc = funnelSignals(s, dir)
      val Seq(p1, p2, p3, p4) = funnelStages
      def removedAt(pass: Column, prior: Column*): Column =
        sum(when(prior.foldLeft(!pass)((c, p) => c && p), 1L).otherwise(0L))
      val g = perDoc.agg(
        count(lit(1)).as("total"),
        removedAt(p1).as("r1"),
        removedAt(p2, p1).as("r2"),
        removedAt(p3, p1, p2).as("r3"),
        removedAt(p4, p1, p2, p3).as("r4"))
      def row(idx: Int, name: String, in: Column, removed: Column) =
        struct(lit(idx).as("stage_idx"), lit(name).as("stage"),
          in.as("n_in"), removed.as("n_removed"), (in - removed).as("n_out"))
      g.select(explode(array(
          row(1, "min_tokens", col("total"), col("r1")),
          row(2, "stopword_ratio", col("total") - col("r1"), col("r2")),
          row(3, "type_token_ratio", col("total") - col("r1") - col("r2"), col("r3")),
          row(4, "token_entropy",
            col("total") - col("r1") - col("r2") - col("r3"), col("r4"))))
          .as("f"))
        .select(col("f.*"))
        .orderBy("stage_idx")
    },

    // Per-document filter labels — the ROW-LEVEL artifact the funnel
    // aggregates: every doc gets keep=true or the NAME of the first stage
    // it fails (the reason code a curation UI or appeal/audit process
    // reads; also what a re-run diffs to see which docs a threshold change
    // flips). Same one-scan signal computation as pl_filter_funnel; the
    // label is a narrow CASE over the per-doc signal row.
    "pl_filter_labels" -> { (s, dir) =>
      val Seq(p1, p2, p3, p4) = funnelStages
      funnelSignals(s, dir)
        .select(col("doc_id"), col("n").as("n_tokens"),
          when(!p1, "min_tokens")
            .when(!p2, "stopword_ratio")
            .when(!p3, "type_token_ratio")
            .when(!p4, "token_entropy")
            .otherwise("pass").as("reason"))
        .withColumn("keep", col("reason") === "pass")
        .orderBy("doc_id")
    }
  )

  /** Per-document funnel signals (n, nd, sw, s1, eq) in ONE token explode +
    * two hash aggregations — shared by pl_filter_funnel and
    * pl_filter_labels.
    */
  private def funnelSignals(s: SparkSession, dir: String): DataFrame =
    Relational.t(s, dir, "documents")
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id").agg(
        sum(col("cnt")).as("n"),
        count(lit(1)).as("nd"),
        sum(when(col("tok").isInCollection(TextOps.Stopwords), col("cnt"))
          .otherwise(0L)).as("sw"),
        sum(col("cnt") * TextOps.qlog(col("cnt").cast("double"))).as("s1"))
      .withColumn("eq",
        col("n") * TextOps.qlog(col("n").cast("double")) - col("s1"))

  /** The four ordered stage predicates over [[funnelSignals]] columns. */
  private def funnelStages: Seq[Column] = Seq(
    col("n") >= FunnelMinTokens,
    col("sw") * 20L >= col("n"),
    col("nd") * 3L >= col("n"),
    col("eq") >= lit(FunnelMinEntropyQ) * col("n"))

  /** Funnel thresholds: minimum tokens per doc, and the minimum mean token
    * entropy in integer MILLIONTHS of a nat (2.8 nats — compared as
    * entropy_q ≥ FunnelMinEntropyQ·n, all integers).
    */
  val FunnelMinTokens = 20L
  val FunnelMinEntropyQ = 2800000L

  /** Chunking parameters for [[queries pl_chunk_tokens]]: window and stride
    * in tokens (overlap = ChunkSize − ChunkStride).
    */
  val ChunkSize = 64
  val ChunkStride = 48

  /** Priority-sample size and hash seed for [[queries sp_weighted_sample]]. */
  val WSampleK = 25
  val WSampleSeed = 13

  /** Epoch seed of [[queries pl_global_shuffle]] — a different seed is a
    * fresh, equally-deterministic epoch permutation.
    */
  val ShuffleSeed = 29

  /** Resample count of [[queries sp_bootstrap_ci]]. */
  val BootB = 200

  /** Modulus of the bootstrap's two-hash affine draw family (2³¹ − 1,
    * prime — the same modulus as the MinHash tier's Kirsch-Mitzenmacher
    * family): per doc only two md5 hashes are computed and the B
    * per-replicate draws derive as (h1 + b·h2) mod P, so at corpus scale
    * the bootstrap's hash compute is O(n), not O(B·n). Exact in both
    * engines' 64-bit integers (h1 + (B−1)·h2 < 2³¹·B ≪ 2⁶³).
    */
  val BootP = 2147483647L

  /** Poisson(1) CDF in integer ppm — the resample-weight table of the
    * deterministic Poisson bootstrap (weight k ⇔ hash-ppm lands in
    * [cdf(k−1), cdf(k))). Shared as LITERALS with the oracle SQL; the last
    * bucket absorbs the 1-ppm tail so weights cap at 9.
    */
  val PoissonCdfPpm: Seq[Long] =
    Seq(367879L, 735759L, 919699L, 981012L, 996340L, 999406L, 999917L, 999990L, 999999L)

  /** Tokens per training shard for [[queries pl_token_pack]]. */
  val TokenShardBudget = 2000L

  /** Mixture token budget allocated across sources in
    * [[queries pl_mixture_weights]].
    */
  val MixTokenBudget = 1000000L

  /** Retention threshold for [[queries pl_train_corpus]] — keeps ~60% of the
    * corpus (score distribution: min 0.2, median ≈ 0.32, max ≈ 0.64).
    */
  val QualityThreshold = 0.3

  /** Max documents kept per source by [[queries sp_group_cap]]. */
  val GroupCapK = 50

  /** Exact sample size and hash seed of [[queries sp_reservoir_k]]. */
  val ReservoirK = 100
  val ReservoirSeed = 17

  /** Token budget and per-source repetition cap of [[queries pl_epoch_alloc]]. */
  val EpochBudget = 60000L
  val MaxEpochs = 4

  /** Stable 1-based global row numbers in `keys` order, the scalable way:
    * range-partition by the keys (each partition owns a contiguous key
    * interval), sort within partitions, then `zipWithIndex` (one counting
    * job + one numbering pass — per-partition counts broadcast as prefix
    * offsets). O(rows) work, no ROW_NUMBER single-partition funnel. Shared
    * by `sp_row_numbers` and the Gini rank stage (`Analytics.an_gini`).
    */
  private[graft] def globalRowNumbers(
      s: SparkSession, df: DataFrame, numCol: String,
      keys: org.apache.spark.sql.Column*): DataFrame = {
    val sorted = df
      .repartitionByRange(s.sparkContext.defaultParallelism, keys: _*)
      .sortWithinPartitions(keys: _*)
    val schema = sorted.schema
    val numbered = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1))
    }
    s.createDataFrame(numbered,
      schema.add(org.apache.spark.sql.types.StructField(numCol,
        org.apache.spark.sql.types.LongType, nullable = false)))
  }

  /** DuckDB CASE form of [[PoissonCdfPpm]] over a column named `ppm`. */
  private def poissonCaseSql: String =
    PoissonCdfPpm.zipWithIndex
      .map { case (thr, k) => s"WHEN ppm < $thr THEN $k" }
      .mkString("CASE ", " ", s" ELSE ${PoissonCdfPpm.length} END")

  /** Exact global running sums of the LONG column `valueCol` in `keys`
    * order — the prefix-scan sibling of [[globalRowNumbers]]: range-
    * partition by the keys (contiguous key intervals per partition), sort
    * within partitions, ONE counting job collects per-partition totals
    * whose scan becomes the broadcast offset vector, then one pass adds
    * offset + running local sum. O(rows) with no single-partition window
    * funnel; exactness requires an integer value column (callers scale
    * decimals to cents first). The input is materialized once because the
    * totals job and the output pass both consume it.
    */
  private[operators] def globalPrefixSums(
      s: SparkSession, df: DataFrame, sumCol: String, valueCol: String,
      keys: org.apache.spark.sql.Column*): DataFrame = {
    val sorted = Dedup.materialized(df
      .repartitionByRange(s.sparkContext.defaultParallelism, keys: _*)
      .sortWithinPartitions(keys: _*))
    val idx = sorted.schema.fieldIndex(valueCol)
    val totals = sorted.rdd
      .mapPartitionsWithIndex { (i, it) =>
        Iterator((i, it.foldLeft(0L)((a, r) => a + r.getLong(idx))))
      }
      .collect().sortBy(_._1).map(_._2)
    val offs = s.sparkContext.broadcast(totals.scanLeft(0L)(_ + _)) // bounded: O(partitions) offsets
    val schema = sorted.schema.add(org.apache.spark.sql.types.StructField(
      sumCol, org.apache.spark.sql.types.LongType, nullable = false))
    val out = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = offs.value(i)
      it.map { r =>
        acc += r.getLong(idx)
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ acc)
      }
    }
    s.createDataFrame(out, schema)
  }

  val oracles: Map[String, String] = Map(
    // Same two-hash affine draw family → literal-CDF weight lookup; each
    // resample mean is integer sums + one division; nearest ranks over the
    // B-row means frame. The b = −1 replicate with weight ≡ 1 IS the point
    // estimate (sum(1·x)/sum(1) ≡ sum(x)/count in exact integers).
    "sp_bootstrap_ci" -> {
      val loRank = (BootB + 39) / 40
      val hiRank = (39 * BootB + 39) / 40
      s"""WITH bs AS (SELECT UNNEST(range(-1, $BootB)) AS b),
         |hx AS (
         |  SELECT source, n_chars,
         |    CAST('0x' || substr(md5('boot1:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % $BootP AS h1,
         |    CAST('0x' || substr(md5('boot2:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % $BootP AS h2
         |  FROM documents
         |), h AS (
         |  SELECT hx.source, bs.b, hx.n_chars,
         |    ((h1 + bs.b * h2) % $BootP) % 1000000 AS ppm
         |  FROM hx CROSS JOIN bs
         |), wts AS (
         |  SELECT source, b, n_chars,
         |    CASE WHEN b < 0 THEN 1 ELSE $poissonCaseSql END AS w
         |  FROM h
         |), m AS (
         |  SELECT source, b,
         |    CAST(SUM(w * n_chars) AS DOUBLE) / CAST(SUM(w) AS DOUBLE) AS mean_b
         |  FROM wts GROUP BY 1, 2
         |), r AS (
         |  SELECT source, b, mean_b,
         |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY mean_b ASC, b ASC) AS rk
         |  FROM m WHERE b >= 0
         |), ci AS (
         |  SELECT source, COUNT(*) AS n_resamples,
         |    MAX(CASE WHEN rk = $loRank THEN mean_b END) AS ci_lo,
         |    MAX(CASE WHEN rk = $hiRank THEN mean_b END) AS ci_hi
         |  FROM r GROUP BY source
         |), pt AS (
         |  SELECT source, mean_b AS mean FROM m WHERE b = -1
         |)
         |SELECT pt.source, mean, ci_lo, ci_hi, n_resamples
         |FROM pt JOIN ci ON pt.source = ci.source
         |ORDER BY pt.source""".stripMargin
    },
    "sp_group_cap" ->
      s"""WITH r AS (
         |  SELECT doc_id, source,
         |         ROW_NUMBER() OVER (
         |           PARTITION BY source
         |           ORDER BY CAST('0x' || substr(md5('$GroupCapSeed:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) ASC,
         |                    doc_id ASC) AS rn
         |  FROM documents
         |)
         |SELECT doc_id, source FROM r WHERE rn <= $GroupCapK
         |ORDER BY source, doc_id""".stripMargin,
    "sp_hash_sample" ->
      s"""SELECT doc_id, lang, source, n_chars FROM documents
         |WHERE ${bucketSql("doc_id")} < 10
         |ORDER BY doc_id""".stripMargin,
    // Allocator twin: same integer waterfall, window cumsum (the oracle may
    // window freely — it is the spec, not the plan).
    "pl_epoch_alloc" ->
      s"""WITH st AS (
         |  SELECT source,
         |    CAST(SUM(len(list_filter(string_split_regex(lower(text), ' +'), t -> t <> '')))
         |         AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY source
         |), tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total FROM st),
         |base AS (
         |  SELECT least($EpochBudget // total, $MaxEpochs) AS be,
         |    $EpochBudget - least($EpochBudget // total, $MaxEpochs) * total AS leftover
         |  FROM tot
         |), ranked AS (
         |  SELECT source, n_tokens,
         |    CAST(SUM(n_tokens) OVER (ORDER BY n_tokens DESC, source ASC
         |                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         |  FROM st
         |)
         |SELECT r.source, r.n_tokens,
         |  CAST(b.be + CASE WHEN b.be < $MaxEpochs AND r.cum <= b.leftover
         |              THEN 1 ELSE 0 END AS BIGINT) AS epochs,
         |  CAST((b.be + CASE WHEN b.be < $MaxEpochs AND r.cum <= b.leftover
         |               THEN 1 ELSE 0 END) * r.n_tokens AS BIGINT) AS tokens_used
         |FROM ranked r CROSS JOIN base b ORDER BY r.source""".stripMargin,
    "sp_reservoir_k" ->
      s"""SELECT o_orderkey,
         |  CAST('0x' || substr(md5('$ReservoirSeed:' || CAST(o_orderkey AS VARCHAR)), 1, 15)
         |       AS BIGINT) AS h
         |FROM orders
         |ORDER BY h ASC, o_orderkey ASC LIMIT $ReservoirK""".stripMargin,
    "sp_stratified_sample" ->
      s"""SELECT lang, COUNT(*) AS n_docs, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
         |FROM documents
         |WHERE ${bucketSql("doc_id")} < (CASE WHEN lang = 'en' THEN 50 WHEN lang = 'de' THEN 20 ELSE 10 END)
         |GROUP BY lang ORDER BY lang""".stripMargin,
    "sp_split_assign" ->
      s"""SELECT CASE WHEN ${bucketSql("doc_id")} < 80 THEN 'train'
         |            WHEN ${bucketSql("doc_id")} < 90 THEN 'val'
         |            ELSE 'test' END AS split,
         |  COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
         |FROM documents GROUP BY split ORDER BY split""".stripMargin,
    "pl_train_corpus" ->
      s"""WITH d AS (
         |  SELECT doc_id, lang, n_chars, text,
         |    list_filter(string_split_regex(lower(text), ' +'), t -> t <> '') AS ts,
         |    CAST(length(text) AS DOUBLE) AS nc,
         |    CAST(length(text) - length(regexp_replace(text, '[.,!?;:''"]', '', 'g')) AS DOUBLE) AS np
         |  FROM documents WHERE length(trim(text)) > 0
         |), q AS (
         |  SELECT doc_id, lang, n_chars, text FROM d
         |  WHERE greatest(0.0, least(1.0,
         |    0.2 + (CAST(len(list_filter(ts, t -> list_contains(['the','a','and','of','to','in','is'], t))) AS DOUBLE) / len(ts)) * 2.0
         |        - (np / nc) * 3.0)) >= 0.3
         |), surv AS (
         |  SELECT doc_id, lang, n_chars FROM q
         |  QUALIFY ROW_NUMBER() OVER (
         |    PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
         |    ORDER BY doc_id) = 1
         |)
         |SELECT CASE WHEN ${bucketSql("doc_id")} < 80 THEN 'train'
         |            WHEN ${bucketSql("doc_id")} < 90 THEN 'val'
         |            ELSE 'test' END AS split,
         |  lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
         |FROM surv GROUP BY split, lang ORDER BY split, lang""".stripMargin,
    "pl_release_corpus" ->
      s"""WITH d AS (
         |  SELECT doc_id, source, n_chars, text,
         |    list_filter(string_split_regex(lower(text), ' +'), t -> t <> '') AS ts,
         |    CAST(length(text) AS DOUBLE) AS nc,
         |    CAST(length(text) - length(regexp_replace(text, '[.,!?;:''"]', '', 'g')) AS DOUBLE) AS np
         |  FROM documents WHERE length(trim(text)) > 0
         |), q AS (
         |  SELECT doc_id, source, n_chars, text FROM d
         |  WHERE greatest(0.0, least(1.0,
         |    0.2 + (CAST(len(list_filter(ts, t -> list_contains(['the','a','and','of','to','in','is'], t))) AS DOUBLE) / len(ts)) * 2.0
         |        - (np / nc) * 3.0)) >= 0.3
         |), surv AS (
         |  SELECT doc_id, source, n_chars FROM q
         |  QUALIFY ROW_NUMBER() OVER (
         |    PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
         |    ORDER BY doc_id) = 1
         |), capped AS (
         |  SELECT doc_id, source, n_chars FROM surv
         |  QUALIFY ROW_NUMBER() OVER (
         |    PARTITION BY source
         |    ORDER BY CAST('0x' || substr(md5('$GroupCapSeed:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) ASC,
         |             doc_id ASC) <= $GroupCapK
         |)
         |SELECT CASE WHEN ${bucketSql("doc_id")} < 80 THEN 'train'
         |            WHEN ${bucketSql("doc_id")} < 90 THEN 'val'
         |            ELSE 'test' END AS split,
         |  source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
         |FROM capped GROUP BY split, source ORDER BY split, source""".stripMargin,
    "pl_token_pack" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang,
         |    len(list_filter(string_split_regex(lower(text), ' +'), x -> x <> '')) AS n_tokens
         |  FROM documents
         |), c AS (
         |  SELECT doc_id, lang, n_tokens,
         |    SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id) AS cum
         |  FROM t
         |)
         |SELECT lang, CAST(FLOOR((cum - n_tokens) / $TokenShardBudget) AS BIGINT) AS shard_id,
         |  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens
         |FROM c GROUP BY lang, shard_id ORDER BY lang, shard_id""".stripMargin,
    // Slice arithmetic (1-based inclusive, clamped at the array end on both
    // engines): chunk i covers ts[i*stride+1 : i*stride+ChunkSize].
    "pl_chunk_tokens" ->
      s"""WITH d AS (
         |  SELECT doc_id, list_filter(string_split_regex(lower(text), ' +'), t -> t <> '') AS ts
         |  FROM documents
         |), c AS (
         |  SELECT doc_id, ts,
         |    1 + greatest(0, CAST(ceil((len(ts) - $ChunkSize) / $ChunkStride.0) AS BIGINT)) AS k
         |  FROM d WHERE len(ts) >= 1
         |), e AS (
         |  SELECT doc_id, ts, UNNEST(range(0, k)) AS i FROM c
         |)
         |SELECT doc_id, CAST(i AS INT) AS chunk_id,
         |  CAST(len(ts[i*$ChunkStride+1 : i*$ChunkStride+$ChunkSize]) AS INT) AS n_chunk_tokens,
         |  array_to_string(ts[i*$ChunkStride+1 : i*$ChunkStride+$ChunkSize], ' ') AS chunk
         |FROM e ORDER BY doc_id, chunk_id""".stripMargin,
    "pl_dataset_card" ->
      """SELECT CASE WHEN GROUPING(lang) = 1 THEN 'ALL' ELSE lang END AS lang,
        |  CASE WHEN GROUPING(source) = 1 THEN 'ALL' ELSE source END AS source,
        |  COUNT(*) AS n_docs,
        |  COUNT(DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))) AS n_unique_texts,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(SUM(len(list_filter(string_split_regex(lower(text), ' +'), t -> t <> ''))) AS BIGINT) AS total_tokens
        |FROM documents GROUP BY ROLLUP(lang, source)
        |ORDER BY lang, source""".stripMargin,
    "sp_row_numbers" ->
      """SELECT doc_id, lang,
        |  ROW_NUMBER() OVER (ORDER BY doc_id) AS seq_id
        |FROM documents ORDER BY seq_id""".stripMargin,
    // Naive global ROW_NUMBER over the same hash order — the hash-match
    // proves the permutation is the pure (seed, id) function claimed.
    "pl_global_shuffle" ->
      s"""SELECT doc_id,
         |  ROW_NUMBER() OVER (
         |    ORDER BY CAST('0x' || substr(md5('$ShuffleSeed:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) ASC,
         |    doc_id ASC) AS shuffle_pos
         |FROM documents ORDER BY shuffle_pos""".stripMargin,
    // sqrt + one division + floor: every step is a single correctly-rounded
    // IEEE op; the normalizer sums through DECIMAL(38,18) in both engines.
    "pl_mixture_weights" ->
      s"""WITH t AS (
         |  SELECT source, COUNT(*) AS n_docs,
         |    CAST(SUM(len(list_filter(string_split_regex(lower(text), ' +'), x -> x <> ''))) AS BIGINT)
         |      AS n_tokens
         |  FROM documents GROUP BY source
         |)
         |SELECT source, n_docs, n_tokens,
         |  sqrt(n_tokens) / CAST(SUM(CAST(sqrt(n_tokens) AS DECIMAL(38,18))) OVER () AS DOUBLE)
         |    AS weight,
         |  CAST(FLOOR(sqrt(n_tokens) / CAST(SUM(CAST(sqrt(n_tokens) AS DECIMAL(38,18))) OVER () AS DOUBLE)
         |    * $MixTokenBudget) AS BIGINT) AS alloc_tokens
         |FROM t ORDER BY source""".stripMargin,
    "sp_weighted_sample" ->
      s"""SELECT doc_id, lang, n_chars,
         |  CAST(n_chars AS DOUBLE) /
         |    ((CAST('0x' || substr(md5('$WSampleSeed:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
         |      % 1048576 + 1) / 1048576.0) AS priority
         |FROM documents
         |ORDER BY priority DESC, doc_id ASC LIMIT $WSampleK""".stripMargin,
    // The naive single-node truth: a global ROW_NUMBER over the interleave
    // order. The engine's closed-form position must hash-match it exactly.
    "pl_curriculum" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split_regex(lower(text), ' +'), t -> t <> '') AS ts,
        |    CAST(length(text) AS DOUBLE) AS nc,
        |    CAST(length(text) - length(regexp_replace(text, '[.,!?;:''"]', '', 'g')) AS DOUBLE) AS np
        |  FROM documents WHERE length(trim(text)) > 0
        |), r AS (
        |  SELECT doc_id, source,
        |    ROW_NUMBER() OVER (
        |      PARTITION BY source
        |      ORDER BY greatest(0.0, least(1.0,
        |        0.2 + (CAST(len(list_filter(ts, t -> list_contains(['the','a','and','of','to','in','is'], t))) AS DOUBLE) / len(ts)) * 2.0
        |            - (np / nc) * 3.0)) DESC, doc_id ASC) AS src_rank
        |  FROM d
        |)
        |SELECT ROW_NUMBER() OVER (ORDER BY src_rank, source) AS pos,
        |  doc_id, source, src_rank
        |FROM r ORDER BY pos""".stripMargin,
    // Funnel twin: identical per-doc integer signals (the ta_entropy
    // identity for entropy_q), identical first-failing-stage attribution,
    // the four stage rows as UNION ALL over the one-row totals. COUNTs
    // cast to BIGINT (HUGEINT/driver-type lesson).
    "pl_filter_funnel" ->
      s"""$funnelSignalsSqlPrefix, g AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS total,
         |    CAST(COUNT(*) FILTER (NOT n >= $FunnelMinTokens) AS BIGINT) AS r1,
         |    CAST(COUNT(*) FILTER (n >= $FunnelMinTokens AND NOT sw * 20 >= n) AS BIGINT) AS r2,
         |    CAST(COUNT(*) FILTER (n >= $FunnelMinTokens AND sw * 20 >= n
         |                          AND NOT nd * 3 >= n) AS BIGINT) AS r3,
         |    CAST(COUNT(*) FILTER (n >= $FunnelMinTokens AND sw * 20 >= n AND nd * 3 >= n
         |                          AND NOT eq >= $FunnelMinEntropyQ * n) AS BIGINT) AS r4
         |  FROM f
         |)
         |SELECT 1 AS stage_idx, 'min_tokens' AS stage,
         |  total AS n_in, r1 AS n_removed, total - r1 AS n_out FROM g
         |UNION ALL SELECT 2, 'stopword_ratio', total - r1, r2, total - r1 - r2 FROM g
         |UNION ALL SELECT 3, 'type_token_ratio', total - r1 - r2, r3, total - r1 - r2 - r3 FROM g
         |UNION ALL SELECT 4, 'token_entropy', total - r1 - r2 - r3, r4,
         |  total - r1 - r2 - r3 - r4 FROM g
         |ORDER BY stage_idx""".stripMargin,
    // Labels twin: same signals prefix, first-failing-stage CASE per doc.
    "pl_filter_labels" ->
      s"""$funnelSignalsSqlPrefix
         |SELECT doc_id, n AS n_tokens,
         |  CASE WHEN NOT n >= $FunnelMinTokens THEN 'min_tokens'
         |       WHEN NOT sw * 20 >= n THEN 'stopword_ratio'
         |       WHEN NOT nd * 3 >= n THEN 'type_token_ratio'
         |       WHEN NOT eq >= $FunnelMinEntropyQ * n THEN 'token_entropy'
         |       ELSE 'pass' END AS reason,
         |  (n >= $FunnelMinTokens AND sw * 20 >= n AND nd * 3 >= n
         |   AND eq >= $FunnelMinEntropyQ * n) AS keep
         |FROM f ORDER BY doc_id""".stripMargin
  )

  /** Shared per-doc funnel-signal CTE prefix ending in
    * `f(doc_id, n, nd, sw, eq)` — one signal definition for the
    * pl_filter_funnel and pl_filter_labels oracles, mirroring the engine's
    * shared [[funnelSignals]].
    */
  private def funnelSignalsSqlPrefix: String =
    """WITH t AS (
      |  SELECT doc_id, UNNEST(list_filter(string_split_regex(lower(text), ' +'), x -> x <> '')) AS tok
      |  FROM documents
      |), c AS (
      |  SELECT doc_id, tok, COUNT(*) AS cnt FROM t GROUP BY doc_id, tok
      |), a AS (
      |  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n, COUNT(*) AS nd,
      |    CAST(SUM(CASE WHEN list_contains(['the','a','and','of','to','in','is'], tok)
      |                  THEN cnt ELSE 0 END) AS BIGINT) AS sw,
      |    CAST(SUM(cnt * CAST(round(1000000.0 * ln(cnt)) AS BIGINT)) AS BIGINT) AS s1
      |  FROM c GROUP BY doc_id
      |), f AS (
      |  SELECT doc_id, n, nd, sw,
      |    n * CAST(round(1000000.0 * ln(n)) AS BIGINT) - s1 AS eq
      |  FROM a
      |)""".stripMargin
}
