package graft.operators

import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Join operators Spark lacks as primitives (SURVEY.md §2.2 join row):
  * as-of join and range (band) join, composed from built-ins per the
  * preference order — no custom strategy needed.
  *
  * As-of is the union-merge formulation, not a non-equi join: tag both
  * streams, hash-partition by key, sort within partition by (key, time,
  * side), and carry the last right-side row forward with a running
  * `last(..., ignoreNulls)` window. Cost is one shuffle + one sort over
  * left+right — the same shape a dedicated as-of physical operator would
  * have, and it never materializes the quadratic ts-comparison the naive
  * `a.ts >= b.ts` join would. This is the formulation that survives 100 TB:
  * both sides shuffle on the join key only, window state is O(1) per row.
  *
  * The range join broadcasts the (tiny) band table and lets the executor
  * evaluate the interval predicate — a broadcast nested-loop with
  * O(rows × bands) cost, the right plan when bands ≪ rows.
  */
object Joins {

  /** For each left row, the latest right row with the same key and
    * rightTime ≤ leftTime. Output: left row + matched right id + gap.
    */
  def asOf(
      left: DataFrame, right: DataFrame,
      key: String, time: String, leftId: String, rightId: String
  ): DataFrame = {
    val l = left.select(col(key), col(time), col(leftId).as("l_id"))
      .withColumn("side", lit(1))
      .withColumn("r_id", lit(null).cast("long"))
      .withColumn("r_ts", lit(null).cast("timestamp"))
    val r = right.select(col(key), col(time), col(rightId).as("r_id"))
      .withColumn("side", lit(0))
      .withColumn("l_id", lit(null).cast("long"))
      .withColumn("r_ts", col(time))
      .select(col(key), col(time), col("l_id"), col("side"), col("r_id"), col("r_ts"))
    // At equal timestamps the right side sorts first (side 0 < 1): ties count
    // as "at or before". Within equal (ts, side), ids break ties.
    val w = Window.partitionBy(key)
      .orderBy(col(time), col("side"), coalesce(col("l_id"), col("r_id")))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.select(col(key), col(time), col("l_id"), col("side"), col("r_id"), col("r_ts"))
      .union(r)
      .withColumn("asof_id", last(col("r_id"), ignoreNulls = true).over(w))
      .withColumn("asof_ts", last(col("r_ts"), ignoreNulls = true).over(w))
      .filter(col("side") === 1 && col("asof_id").isNotNull)
      .select(
        col("l_id"),
        col(key),
        col("asof_id"),
        (unix_micros(col(time)) - unix_micros(col("asof_ts"))).as("gap_us")
      )
  }

  /** Bloom-filter semi-join reduction: prune the FACT side before the
    * shuffle join using a bloom filter built over the (filtered) dim keys.
    *
    * This is the declarative form of Spark's own `InjectRuntimeFilter`
    * rewrite, constructed explicitly so it fires deterministically instead
    * of depending on the optimizer's size thresholds (the built-in rule
    * requires a >10 GB application-side scan by default — exactly the 100 TB
    * regime, but untestable at sf0.1 without mutating session confs that
    * would leak into sibling queries). Mechanics: `bloom_filter_agg` over
    * `xxhash64(dimKey)` runs as a one-row scalar subquery (a small job over
    * the dim side only), the resulting filter ships to every fact-scan task
    * as a literal, and `might_contain(bf, xxhash64(factKey))` drops
    * non-joining fact rows BEFORE they reach the exchange. Blooms have no
    * false negatives, so the exact join downstream sees every joining row —
    * results are byte-identical to the unfiltered plan (the oracle proves
    * it); false positives only cost shuffle bytes. At 100 TB this is the
    * difference between shuffling the whole fact table and shuffling ~the
    * join's output.
    *
    * `estItems` sizes the filter (bits scale with it; the default false
    * positive rate is 3%) — derive it from the dim side's expected filtered
    * cardinality at deployment scale.
    */
  def bloomPreFilter(fact: DataFrame, factKey: String, dimKeys: DataFrame,
      estItems: Long): DataFrame = {
    val dimKeyCol = dimKeys.columns.head
    val bloomAgg = GraftSqlBridge.column(
      new BloomFilterAggregate(
        GraftSqlBridge.expression(xxhash64(col(dimKeyCol))), estItems)
        .toAggregateExpression())
    val bloomPlan = dimKeys.agg(bloomAgg.as("bf")).queryExecution.analyzed
    val might = BloomFilterMightContain(
      ScalarSubquery(bloomPlan),
      GraftSqlBridge.expression(xxhash64(col(factKey))))
    fact.filter(GraftSqlBridge.column(might))
  }

  /** Promo calendar of [[queries j5_interval_overlap]]: one 90-minute promo
    * window every 6 hours from the corpus's first day; the 6 h spacing
    * doubles as the bin width of the overlap decomposition.
    */
  /** Documented false-positive rate bound of [[queries j6_bloom_fp_audit]] —
    * Spark's `bloom_filter_agg` default fpp (the filter here is additionally
    * overprovisioned via estItems, so the realized rate sits far below it).
    */
  val BloomFpp = 0.03

  val PromoSpacingMicros: Long = 6L * 3600 * 1000000
  val PromoLenMicros: Long = 90L * 60 * 1000000

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // As-of: each error event matched to the user's most recent click.
    "j1_asof_error_click" -> { (s, dir) =>
      val ev = Relational.t(s, dir, "events")
      asOf(
        ev.filter(col("event_type") === "error"),
        ev.filter(col("event_type") === "click"),
        key = "user_id", time = "ts", leftId = "event_id", rightId = "event_id"
      )
        .select(col("l_id").as("error_id"), col("user_id"), col("asof_id").as("prev_click_id"), col("gap_us"))
        .orderBy("error_id")
    },

    // Bloom semi-join reduction: lineitem pruned by a bloom filter over the
    // urgent-finished order keys before the exact join. The oracle runs the
    // PLAIN join — a hash-match proves the bloom prefilter is semantically
    // free (no false negatives), while the fact rows crossing the exchange
    // drop to ~the matching subset.
    "j3_bloom_semijoin" -> { (s, dir) =>
      val dimPred = col("o_orderpriority") === "1-URGENT" && col("o_orderstatus") === "F"
      val dimKeys = Relational.t(s, dir, "orders").filter(dimPred).select(col("o_orderkey"))
      val fact = Relational.parallelizeNarrowScan(
        Relational.t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")))
      // Fresh dim scan for the exact join (independent exprIds from the
      // subquery's plan).
      val dim = Relational.t(s, dir, "orders").filter(dimPred)
        .select(col("o_orderkey"), col("o_orderpriority"))
      bloomPreFilter(fact, "l_orderkey", dimKeys, estItems = 1000000L)
        .join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n_items"),
          sum(Relational.dec(col("l_extendedprice"))
            * (lit(1).cast(DecimalType(18, 2)) - Relational.dec(col("l_discount"))))
            .cast("double").as("revenue"))
        .orderBy("o_orderpriority")
    },

    // Bloom-filter FALSE-POSITIVE audit ON the hash gate — the
    // sketch-contract shape (q24) applied to the join-pruning tier:
    // j3 proves the bloom prefilter loses no matching row (no false
    // negatives); this query proves the OTHER half of the bloom contract —
    // that the rows it fails to prune stay within the configured
    // false-positive rate. The engine counts fact rows, true matches
    // (exact semi join), and bloom survivors in one plan and emits
    // (n_fact, n_matched, within_bound) where within_bound checks
    // survivors − matches ≤ fpp · (n_fact − matches); the bloom's bit
    // pattern is engine-internal (never emitted), the oracle computes the
    // exact counts with literal TRUE. The filter is deterministic (xxhash64
    // family, OR-merge), so the verdict is stable across runs.
    "j6_bloom_fp_audit" -> { (s, dir) =>
      val dimPred = col("o_orderpriority") === "1-URGENT" && col("o_orderstatus") === "F"
      val dimKeys = Relational.t(s, dir, "orders").filter(dimPred).select(col("o_orderkey"))
      val fact = Relational.t(s, dir, "lineitem").select(col("l_orderkey"))
      val survivors = bloomPreFilter(fact, "l_orderkey", dimKeys, estItems = 1000000L)
        .agg(count(lit(1)).as("n_survivors"))
      val nFact = fact.agg(count(lit(1)).as("n_fact"))
      val nMatch = fact
        .join(Relational.t(s, dir, "orders").filter(dimPred).select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_semi")
        .agg(count(lit(1)).as("n_matched"))
      nFact.crossJoin(broadcast(nMatch)) // bounded: one row
        .crossJoin(broadcast(survivors)) // bounded: one row
        .select(col("n_fact"), col("n_matched"),
          ((col("n_survivors") - col("n_matched")).cast("double") <=
            lit(BloomFpp) * (col("n_fact") - col("n_matched")).cast("double"))
            .as("within_bound"))
    },

    // Dynamic partition pruning: the fact side is a hive-partitioned
    // (`lang=*/`) copy of documents; the dim side is a tiny lang→script
    // lookup filtered on a NON-join column (script), so no static filter on
    // `lang` can be inferred at plan time — only Spark's DPP subquery
    // (computed from the broadcast dim at runtime) can prune the fact's
    // partition directories. At 100 TB partition-level pruning is the
    // coarsest, cheapest filter tier: whole directories never enter the
    // file listing. PlanAuditSpec asserts the `dynamicpruning` expression
    // lands in the scan's PartitionFilters; the oracle (original flat
    // parquet, plain join) proves the pruned read loses no rows.
    "j4_dpp_partition_prune" -> { (s, dir) =>
      import s.implicits._
      val src = Relational.t(s, dir, "documents")
      val part = Connectors.tmp("documents_dpp")
      graft.sources.Formats.writePartitioned(src, part, "lang")
      val fact = s.read.parquet(part)
      // The lookup must be a SCANNED table (not an inline Seq): Catalyst
      // folds a filtered LocalRelation into a bare LocalTableScan, and the
      // PartitionPruning rule only fires off a surviving selective Filter.
      val dimPath = Connectors.tmp("lang_script_dim")
      Seq(("de", "latin"), ("en", "latin"), ("es", "latin"),
        ("fr", "latin"), ("zh", "cjk"))
        .toDF("lang", "script").coalesce(1)
        .write.mode("overwrite").parquet(dimPath)
      val dim = s.read.parquet(dimPath).filter(col("script") === "cjk")
      fact.join(broadcast(dim), "lang") // bounded: |langs| dimension
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"))
        .orderBy("lang")
    },

    // INTERVAL-OVERLAP join — the temporal/genomic join class (two interval
    // sets, pairs whose spans intersect) that neither the equi-join nor the
    // point-in-band range join (j2) covers: user sessions × a deterministic
    // promo-window calendar (every 6 h, 90 min long, from the corpus's
    // first day — the synthetic-dim device the spatial tier uses). The
    // naive plan is the |sessions|×|promos| cartesian with the overlap
    // predicate; this decomposes it into an EQUALITY join on fixed-width
    // time bins (the geo_radius_join grid in 1-D): each interval registers
    // in every bin it touches, candidates meet in shared bins, one
    // distinct + the exact overlap filter. Candidate volume is O(intervals
    // × bins-per-interval) with the bin width at the promo spacing; the
    // promo side is calendar-sized and broadcast. The oracle RUNS the
    // quadratic form, so the hash match proves the bin decomposition
    // lossless (no overlapping pair can span bins without sharing one —
    // both intervals intersect the bin containing the overlap point).
    // Intervals are CLOSED on both ends ([su,eu] × [ps,pe]).
    "j5_interval_overlap" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val W = PromoSpacingMicros
      val gap = graft.streaming.EventStreams.SessionGapMicros
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ev = Relational.t(s, dir, "events")
      val sess = Dedup.materialized(ev
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_us").isNull
            || (unix_micros(col("ts")) - col("prev_us")) > gap, 1L).otherwise(0L))
        .withColumn("sess_id", sum(col("new_sess")).over(run))
        .groupBy("user_id", "sess_id")
        .agg(min(unix_micros(col("ts"))).as("su"), max(unix_micros(col("ts"))).as("eu")))
      val promos = Dedup.materialized(
        ev.agg(expr("(min(unix_micros(ts)) DIV 86400000000) * 86400000000").as("base"),
            max(unix_micros(col("ts"))).as("mx"))
          .select(explode(sequence(lit(0L), expr(s"(mx - base) DIV $W"))).as("p"), col("base"))
          .select(col("p").cast("int").as("promo_id"),
            (col("base") + col("p") * W).as("ps"))
          .withColumn("pe", col("ps") + PromoLenMicros))
      val sessBins = sess
        .select(col("user_id"), col("sess_id"), col("su"), col("eu"),
          explode(sequence(expr(s"su DIV $W"), expr(s"eu DIV $W"))).as("bin"))
      val promoBins = promos
        .select(col("promo_id"), col("ps"), col("pe"),
          explode(sequence(expr(s"ps DIV $W"), expr(s"pe DIV $W"))).as("bin"))
      val hits = sessBins.join(broadcast(promoBins), "bin") // bounded: |promos| x bins (constant promo set)
        .select("promo_id", "user_id", "sess_id", "su", "eu", "ps", "pe")
        .distinct()
        .filter(col("su") <= col("pe") && col("ps") <= col("eu"))
      promos.select("promo_id")
        .join(hits.groupBy("promo_id")
          .agg(count(lit(1)).as("n_sessions"),
            countDistinct(col("user_id")).as("n_users")),
          Seq("promo_id"), "left_outer")
        .select(col("promo_id"),
          coalesce(col("n_sessions"), lit(0L)).as("n_sessions"),
          coalesce(col("n_users"), lit(0L)).as("n_users"))
        .orderBy("promo_id")
    },

    // Range join: parts bucketed into literal price bands.
    "j2_range_price_bands" -> { (s, dir) =>
      import s.implicits._
      val bands = Seq(
        ("band_900_925", 900.0, 925.0),
        ("band_925_950", 925.0, 950.0),
        ("band_950_975", 950.0, 975.0),
        ("band_975_1000", 975.0, 1000.0)
      ).toDF("band", "lo", "hi")
      Relational.t(s, dir, "part")
        .join(broadcast(bands), col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi")) // bounded: constant literal band table
        .groupBy("band")
        .agg(
          count(lit(1)).as("n_parts"),
          sum(col("p_retailprice").cast(DecimalType(18, 2))).cast("double").as("total_price")
        )
        .orderBy("band")
    }
  )

  val oracles: Map[String, String] = Map(
    // DuckDB has a native ASOF JOIN — the oracle uses it directly, so two
    // different algorithms (merge-window vs DuckDB's asof) must agree.
    "j1_asof_error_click" ->
      """SELECT a.event_id AS error_id, a.user_id, b.event_id AS prev_click_id,
        |  epoch_us(a.ts) - epoch_us(b.ts) AS gap_us
        |FROM (SELECT * FROM events WHERE event_type = 'error') a
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') b
        |  ON a.user_id = b.user_id AND a.ts >= b.ts
        |ORDER BY error_id""".stripMargin,
    // The PLAIN join — proving the bloom prefilter drops nothing.
    "j3_bloom_semijoin" ->
      """SELECT o_orderpriority, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // Sketch-contract gate: exact counts + literal TRUE; the engine's
    // within_bound proves the bloom survivors honored the fp rate.
    "j6_bloom_fp_audit" ->
      """SELECT (SELECT COUNT(*) FROM lineitem) AS n_fact,
        |  (SELECT COUNT(*) FROM lineitem
        |   WHERE l_orderkey IN (
        |     SELECT o_orderkey FROM orders
        |     WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F')) AS n_matched,
        |  TRUE AS within_bound""".stripMargin,
    // Original flat parquet + plain join — the pruned partitioned read must
    // lose nothing.
    "j4_dpp_partition_prune" ->
      """WITH langs(lang, script) AS (VALUES
        |  ('de','latin'), ('en','latin'), ('es','latin'),
        |  ('fr','latin'), ('zh','cjk'))
        |SELECT d.lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM documents d JOIN langs l ON d.lang = l.lang
        |WHERE l.script = 'cjk'
        |GROUP BY d.lang ORDER BY d.lang""".stripMargin,
    // Quadratic overlap-join twin (sessions rebuilt with the ev_sessions
    // window form): proves the bin decomposition lossless.
    "j5_interval_overlap" ->
      s"""WITH se AS (
         |  SELECT user_id, sess_id, min(epoch_us(ts)) AS su, max(epoch_us(ts)) AS eu FROM (
         |    SELECT user_id, ts,
         |      SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                          ROWS UNBOUNDED PRECEDING) AS sess_id
         |    FROM (
         |      SELECT user_id, ts, event_id,
         |        CASE WHEN prev_us IS NULL
         |          OR epoch_us(ts) - prev_us > ${graft.streaming.EventStreams.SessionGapMicros}
         |        THEN 1 ELSE 0 END AS new_sess
         |      FROM (
         |        SELECT user_id, ts, event_id,
         |          LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
         |        FROM events))
         |  ) GROUP BY user_id, sess_id
         |), b AS (
         |  SELECT (min(epoch_us(ts)) // 86400000000) * 86400000000 AS base,
         |    max(epoch_us(ts)) AS mx
         |  FROM events
         |), promos AS (
         |  -- range() rejects lateral column bounds; over-generate a fixed
         |  -- span (100k promos ≈ 68 years at 6 h) and filter to the corpus.
         |  SELECT CAST(t.p AS INT) AS promo_id,
         |    base + t.p * $PromoSpacingMicros AS ps,
         |    base + t.p * $PromoSpacingMicros + $PromoLenMicros AS pe
         |  FROM b, range(0, 100000) t(p)
         |  WHERE t.p <= (mx - base) // $PromoSpacingMicros
         |), hit AS (
         |  SELECT promo_id, user_id, sess_id
         |  FROM promos JOIN se ON su <= pe AND ps <= eu
         |)
         |SELECT p.promo_id, COALESCE(n_sessions, 0) AS n_sessions,
         |  COALESCE(n_users, 0) AS n_users
         |FROM promos p LEFT JOIN (
         |  SELECT promo_id, COUNT(*) AS n_sessions, COUNT(DISTINCT user_id) AS n_users
         |  FROM hit GROUP BY promo_id
         |) USING (promo_id)
         |ORDER BY p.promo_id""".stripMargin,
    "j2_range_price_bands" ->
      """WITH bands(band, lo, hi) AS (VALUES
        |  ('band_900_925', 900.0, 925.0),
        |  ('band_925_950', 925.0, 950.0),
        |  ('band_950_975', 950.0, 975.0),
        |  ('band_975_1000', 975.0, 1000.0))
        |SELECT band, COUNT(*) AS n_parts,
        |  CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
        |GROUP BY band ORDER BY band""".stripMargin
  )
}
