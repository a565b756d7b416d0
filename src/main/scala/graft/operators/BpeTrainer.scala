package graft.operators

import graft.functions.BpeMerge
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BPE (byte-pair-encoding) tokenizer training over the `documents` corpus
  * — the op that sits at the very front of an LLM data pipeline: learn the
  * merge table that defines the tokenizer everything downstream counts,
  * packs, and dedups with.
  *
  * Reference scope: nothing comparable exists in the reference (its only
  * text op is whitespace word count, `test/user_tasks.cc:12-23`); this is a
  * north-star extension. Its dataflow shape is the engine's third iterative
  * fixpoint family, after connected components (`Dedup.scala`) and
  * PageRank (`Similarity.scala`).
  *
  * Scale shape (100 TB): industrial BPE trainers never iterate over the
  * corpus — they iterate over the WORD-FREQUENCY table (|vocab| rows, built
  * by one corpus-sized aggregation with map-side combine) with each word
  * carrying its count. Every merge round is then (1) a vocab-sized pair
  * count weighted by word frequency (hash agg, partial map-side), (2) a
  * one-row argmax (TakeOrdered, deterministic tie-break), (3) a broadcast
  * of that single winner row into the symbol-array rewrite
  * ([[graft.functions.BpeMerge]], one native call per vocab entry). Corpus
  * size only ever enters through the initial word count. Rounds are
  * checkpointed like the other fixpoints so round k's plan does not inline
  * rounds 1..k−1.
  *
  * Determinism: counts are exact longs; the winning pair is chosen by
  * (count DESC, a ASC, b ASC) — total order, so ties cannot flip the merge
  * table across partitionings or engines.
  */
object BpeTrainer {

  /** Merge rounds for the gate query (a real tokenizer runs 30k–100k rounds
    * of exactly this dataflow; the cost is rounds × vocab-sized jobs).
    */
  val Merges = 8

  /** Result-list size for the weighted pair-count query. */
  val PairsK = 50

  /** (word, freq) — the one corpus-sized aggregation. */
  private def wordFreq(s: SparkSession, dir: String): DataFrame =
    Relational.t(s, dir, "documents")
      .transform(Dedup.spread("doc_id"))
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))

  /** A word column as its character-symbol array. */
  private def charSyms(w: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1)))

  /** Words as character-symbol arrays, frequency-weighted. */
  private def initSymbols(s: SparkSession, dir: String): DataFrame =
    wordFreq(s, dir).select(charSyms(col("w")).as("s"), col("f"))

  /** The per-round hot plan (weighted pair counting over the current
    * symbols), exposed for PlanAuditSpec: the stored-tier gate query reads
    * the trained table, so the ONE-TIME training dataflow is audited
    * directly, like the k-NN graph build.
    */
  private[graft] def trainingRoundPlan(s: SparkSession, dir: String): DataFrame =
    adjacentPairs(initSymbols(s, dir))

  /** Adjacent symbol pairs of `s`, one row per occurrence (overlapping —
    * the classic BPE count), weighted by the word frequency column `f`.
    */
  private def adjacentPairs(syms: DataFrame): DataFrame =
    syms.filter(size(col("s")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("s")) - 1),
        i => struct(element_at(col("s"), i).as("a"), element_at(col("s"), i + 1).as("b"))))
        .as("p"), col("f"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("f")).as("cnt"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Frequency-weighted adjacent character-pair counts — merge round 0's
    // statistics, oracle-checked (the iterative trainer below is the same
    // aggregation applied to evolving symbols).
    "ta_bpe_pairs" -> { (s, dir) =>
      wordFreq(s, dir)
        .filter(length(col("w")) >= 2)
        .select(explode(transform(sequence(lit(1), length(col("w")) - 1),
          i => col("w").substr(i, lit(2)))).as("pair"), col("f"))
        .groupBy("pair").agg(sum(col("f")).as("total"))
        .orderBy(col("total").desc, col("pair").asc)
        .limit(PairsK)
    },

    // The BPE merge table: Merges rounds of count → argmax → rewrite.
    // FULLY oracle-gated (round 7): the DuckDB twin unrolls the rounds as
    // CTEs ([[bpeChainCte]]) with the leftmost-non-overlapping rewrite as a
    // list_reduce fold — provably equivalent to the scan because a merged
    // token `ab` can never equal `a` (symbols are non-empty), so the fold's
    // last-element match is exactly the scan's unconsumed-position match.
    // BpeTrainerSpec additionally replays a reference Scala implementation.
    // Trained ONCE per corpus through the stored-structure tier — the
    // encode query below reads the same stored table, like a tokenizer
    // artifact shipped to the fleet.
    "ta_bpe_merges" -> { (s, dir) =>
      trainedMerges(s, dir).orderBy("round")
    },

    // BPE ENCODE: price the corpus under the learned vocab — tokens per
    // document after applying the stored merge table. Industrial shape
    // again: |encode(w)| is computed once per VOCABULARY word (the merge
    // table rides in as one broadcast array into a single native
    // [[graft.functions.BpeApply]] call per word), and documents join that
    // word→length map on their distinct-word counts — the corpus pays one
    // (doc_id, word) aggregation, never a per-occurrence re-encode.
    "ta_bpe_encode" -> { (s, dir) =>
      val mergeArr = mergeArray(s, dir)
      // ONE corpus tokenization pass: the vocabulary derives from the same
      // (doc_id, word) aggregate the final join consumes (materialized —
      // two consumers would otherwise each re-run the scan+tokenize).
      val docWords = Dedup.materialized(
        Relational.t(s, dir, "documents")
          .transform(Dedup.spread("doc_id"))
          .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("w"))
          .groupBy("doc_id", "w").agg(count(lit(1)).as("cnt")))
      val wordLens = docWords.select("w").distinct()
        .crossJoin(broadcast(mergeArr)) // bounded: one row (merge table)
        .select(col("w"),
          size(graft.functions.BpeApply(charSyms(col("w")), col("ms"))).as("len"))
      docWords.join(wordLens.hint("broadcast"), "w") // bounded: vocabulary-sized (distinct words)
        .groupBy("doc_id")
        .agg(sum(col("cnt") * col("len")).as("n_tokens"))
        .orderBy("doc_id")
    },

    // Tokenizer FERTILITY audit per language — the metric a tokenizer
    // review reads before committing a vocab (Ács/XLM-R analyses): tokens
    // per word (fertility — high values mean the vocab fragments that
    // language, inflating sequence length and cost) and characters per
    // token (compression). Same industrial shape as ta_bpe_encode: the
    // merge table prices each VOCABULARY word once, and the per-language
    // totals are one (lang, word) aggregation joined against that
    // word→length map — exact integer sums with the two ratios as
    // boundary divisions.
    "ta_bpe_fertility" -> { (s, dir) =>
      val mergeArr = mergeArray(s, dir)
      val langWords = Dedup.materialized(
        Relational.t(s, dir, "documents")
          .transform(Dedup.spread("doc_id"))
          .select(col("lang"), explode(TextOps.tokens(col("text"))).as("w"))
          .groupBy("lang", "w").agg(count(lit(1)).as("cnt")))
      val wordLens = langWords.select("w").distinct()
        .crossJoin(broadcast(mergeArr)) // bounded: one row (merge table)
        .select(col("w"), length(col("w")).cast("long").as("nch"),
          size(graft.functions.BpeApply(charSyms(col("w")), col("ms"))).cast("long").as("len"))
      langWords.join(wordLens.hint("broadcast"), "w") // bounded: vocabulary-sized (distinct words)
        .groupBy("lang")
        .agg(sum(col("cnt")).as("n_words"),
          sum(col("cnt") * col("len")).as("n_tokens"),
          sum(col("cnt") * col("nch")).as("n_chars"))
        .select(col("lang"), col("n_words"), col("n_tokens"),
          (col("n_tokens").cast("double") / col("n_words").cast("double")).as("fertility"),
          (col("n_chars").cast("double") / col("n_tokens").cast("double")).as("chars_per_token"))
        .orderBy("lang")
    }
  )

  /** Train (or read back) the stored merge table for `dir`. */
  private def trainedMerges(s: SparkSession, dir: String): DataFrame =
    graft.sources.Stored.materialize("bpe_merges", dir, s)(
      trainMergesFrom(initSymbols(s, dir)))

  /** The stored merge table collapsed to the one-row ordered (a, b) array
    * [[graft.functions.BpeApply]] consumes — shared by the encode and
    * fertility queries.
    */
  private def mergeArray(s: SparkSession, dir: String): DataFrame =
    trainedMerges(s, dir)
      .agg(array_sort(collect_list(struct(col("round"), col("a"), col("b")))).as("ms"))
      .select(transform(col("ms"), m => struct(m.getField("a").as("a"), m.getField("b").as("b"))).as("ms"))

  /** The training loop over an initial (symbols, freq) table. Stops early
    * when a round finds NO adjacent pair (a fully collapsed vocabulary —
    * e.g. a corpus of single-character words): the empty argmax would
    * otherwise cross-join every later round to nothing and silently
    * truncate the stored table. The winner is a materialized one-row
    * frame, so the emptiness probe costs one cached-lookup job.
    */
  private[graft] def trainMergesFrom(init: DataFrame): DataFrame = {
    var syms = Dedup.materialized(init)
    val rounds = Seq.newBuilder[DataFrame]
    var r = 1
    var exhausted = false
    while (r <= Merges && !exhausted) {
      val winner = Dedup.materialized(
        adjacentPairs(syms).orderBy(col("cnt").desc, col("a").asc, col("b").asc).limit(1))
      if (winner.isEmpty) { exhausted = true }
      else {
        syms = Dedup.materialized(
          syms.crossJoin(broadcast(winner.select(col("a").as("ma"), col("b").as("mb")))) // bounded: one row
            .select(BpeMerge(col("s"), col("ma"), col("mb")).as("s"), col("f")))
        rounds += winner.select(lit(r).as("round"), col("a"), col("b"), col("cnt"))
        r += 1
      }
    }
    val rs = rounds.result()
    if (rs.isEmpty)
      init.sparkSession.createDataFrame(
        init.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("round", org.apache.spark.sql.types.IntegerType, nullable = false),
          org.apache.spark.sql.types.StructField("a", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("b", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("cnt", org.apache.spark.sql.types.LongType))))
    else rs.reduce(_.union(_))
  }

  val oracles: Map[String, String] = Map(
    "ta_bpe_pairs" ->
      s"""WITH toks AS (
         |  SELECT unnest(list_filter(string_split_regex(lower(text), ' +'), t -> t <> '')) AS w
         |  FROM documents
         |), wf AS (
         |  SELECT w, COUNT(*) AS f FROM toks GROUP BY w
         |), pe AS (
         |  SELECT unnest([substr(w, i, 2) FOR i IN range(1, len(w))]) AS pair, f
         |  FROM wf WHERE len(w) >= 2
         |)
         |SELECT pair, CAST(SUM(f) AS BIGINT) AS total
         |FROM pe GROUP BY pair ORDER BY total DESC, pair LIMIT $PairsK""".stripMargin,
    // Full trainer twin: Merges unrolled count → argmax → rewrite rounds.
    "ta_bpe_merges" ->
      (s"WITH $bpeChainCte\n" +
        (1 to Merges).map(i => s"SELECT round, a, b, cnt FROM w$i")
          .mkString("\nUNION ALL ") +
        "\nORDER BY round"),
    // Encode twin: price each document under the round-Merges symbol state
    // — |encode(w)| is len(s) at the END of the shared chain (the same
    // vocabulary-level single-pass completeness argument as BpeApply), so
    // the per-doc token total is one distinct-word join against sMerges.
    "ta_bpe_encode" ->
      s"""WITH $bpeChainCte, dw AS (
         |  SELECT doc_id, w, COUNT(*) AS cnt FROM (
         |    SELECT doc_id,
         |      unnest(list_filter(string_split_regex(lower(text), ' +'), t -> t <> '')) AS w
         |    FROM documents
         |  ) GROUP BY doc_id, w
         |)
         |SELECT doc_id, CAST(SUM(cnt * len(s$Merges.s)) AS BIGINT) AS n_tokens
         |FROM dw JOIN s$Merges USING (w)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Fertility twin: the same chain priced per language; integer totals,
    // two boundary divisions.
    "ta_bpe_fertility" ->
      s"""WITH $bpeChainCte, lw AS (
         |  SELECT lang, w, COUNT(*) AS cnt FROM (
         |    SELECT lang,
         |      unnest(list_filter(string_split_regex(lower(text), ' +'), t -> t <> '')) AS w
         |    FROM documents
         |  ) GROUP BY lang, w
         |)
         |SELECT lang, CAST(SUM(cnt) AS BIGINT) AS n_words,
         |  CAST(SUM(cnt * len(s$Merges.s)) AS BIGINT) AS n_tokens,
         |  CAST(CAST(SUM(cnt * len(s$Merges.s)) AS BIGINT) AS DOUBLE)
         |    / CAST(CAST(SUM(cnt) AS BIGINT) AS DOUBLE) AS fertility,
         |  CAST(CAST(SUM(cnt * len(w)) AS BIGINT) AS DOUBLE)
         |    / CAST(CAST(SUM(cnt * len(s$Merges.s)) AS BIGINT) AS DOUBLE) AS chars_per_token
         |FROM lw JOIN s$Merges USING (w)
         |GROUP BY lang ORDER BY lang""".stripMargin
  )

  /** DuckDB CTE chain re-running the trainer: word frequencies, character
    * symbols `s0` (the word column `w` rides along so the encode oracle can
    * join back), then Merges unrolled rounds — per round the weighted
    * adjacent-pair count `pc`, the (cnt DESC, a ASC, b ASC) argmax `w`, and
    * the rewrite `s`. The rewrite is a list_reduce fold over singleton-
    * wrapped symbols (DuckDB's reduce seeds with the first element, and the
    * accumulator must share the element type): merge when the accumulator's
    * last symbol is `a` and the incoming symbol is `b` — equivalent to the
    * engine's left-to-right non-overlapping scan ([[graft.functions.BpeMerge]])
    * because a merged `ab` can never equal `a`, so a fold-merge consumes
    * exactly the scan's positions.
    */
  private lazy val bpeChainCte: String = {
    val rounds = (1 to Merges).map { i =>
      s"""pc$i AS (
         |  SELECT p.a AS a, p.b AS b, CAST(SUM(f) AS BIGINT) AS cnt FROM (
         |    SELECT unnest([{'a': s[i], 'b': s[i+1]} FOR i IN range(1, len(s))]) AS p, f
         |    FROM s${i - 1} WHERE len(s) >= 2
         |  ) GROUP BY p.a, p.b
         |), w$i AS (
         |  SELECT CAST($i AS INT) AS round, a, b, cnt
         |  FROM pc$i ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
         |), s$i AS (
         |  SELECT w,
         |    list_reduce(list_transform(s, x -> [x]),
         |      (acc, x) -> CASE WHEN acc[len(acc)] = m.a AND x[1] = m.b
         |                  THEN list_append(acc[1:len(acc)-1], m.a || m.b)
         |                  ELSE list_concat(acc, x) END) AS s,
         |    f
         |  FROM s${i - 1} CROSS JOIN w$i m
         |)""".stripMargin
    }.mkString(", ")
    s"""toks AS (
       |  SELECT unnest(list_filter(string_split_regex(lower(text), ' +'), t -> t <> '')) AS w
       |  FROM documents
       |), wf AS (
       |  SELECT w, COUNT(*) AS f FROM toks GROUP BY w
       |), s0 AS (
       |  SELECT w, [substr(w, i, 1) FOR i IN range(1, len(w)+1)] AS s, f FROM wf
       |), $rounds""".stripMargin
  }
}
