package graft.operators

import graft.streaming.EventStreams
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch-mode event-time operators over `events`, sharing plan builders with
  * the Structured Streaming surface ([[graft.streaming.EventStreams]]) so the
  * DuckDB oracle verifies the same logic the streams run.
  *
  * `ev_sessions` (window functions) and `ev_sessions_typed`
  * (groupByKey.flatMapGroups over the shared sessionizer core) intentionally
  * share one oracle: two independent implementations, one semantic.
  */
object Events {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Tumbling 1h windows × event_type (the streaming agg, batch-evaluated).
    "ev_window_agg" -> { (s, dir) =>
      EventStreams.windowedAgg(Relational.t(s, dir, "events"))
        .orderBy("window_start", "event_type")
    },

    // Sessionization via window functions: lag → gap flags → cumulative-sum ids.
    "ev_sessions" -> { (s, dir) =>
      val gap = EventStreams.SessionGapMicros
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Relational.t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
        .withColumn(
          "new_sess",
          when(col("prev_us").isNull || (unix_micros(col("ts")) - col("prev_us")) > gap, 1L).otherwise(0L)
        )
        .withColumn("sess_id", sum(col("new_sess")).over(run))
        .groupBy("user_id", "sess_id")
        .agg(
          count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end")
        )
        .orderBy("user_id", "sess_id")
    },

    // Same semantics through the typed UDF path (reference reduce-UDF shape).
    "ev_sessions_typed" -> { (s, dir) =>
      EventStreams.sessionizeBatch(Relational.t(s, dir, "events"))
        .orderBy("user_id", "sess_id")
    },

    // Third implementation of the same oracle: Spark's built-in
    // session_window operator (one hash aggregation with session merge —
    // also the streaming-native formulation). Spark extends a session iff
    // ts < last + gap (strict), while the shared semantics use
    // ts - last <= gap (inclusive); padding the gap by one microsecond (the
    // timestamp resolution) makes the two identical. Session ids are the
    // cumulative session number per user, recovered by ranking window starts.
    "ev_sessions_native" -> { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("sw.start"))
      Relational.t(s, dir, "events")
        .groupBy(
          col("user_id"),
          session_window(col("ts"), s"${EventStreams.SessionGapMicros + 1} microseconds").as("sw"))
        .agg(
          count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"))
        .withColumn("sess_id", row_number().over(w).cast("long"))
        .select("user_id", "sess_id", "n_events", "session_start", "session_end")
        .orderBy("user_id", "sess_id")
    },

    // Stream-static enrichment join (batch twin): events × broadcast
    // customer dim, aggregated by segment × event type. The streaming path
    // runs the same plan builder (EventStreamsSpec).
    "ev_enriched" -> { (s, dir) =>
      EventStreams.enriched(
          Relational.t(s, dir, "events"),
          Relational.t(s, dir, "customer"))
        .orderBy("c_mktsegment", "event_type")
    },

    // Stream-stream interval join (batch twin): all clicks within 5 minutes
    // after a same-user error. The streaming path runs the identical plan
    // builder with watermarks on both sides (EventStreamsSpec).
    "ev_error_click_pairs" -> { (s, dir) =>
      val ev = Relational.t(s, dir, "events")
      EventStreams.errorClickPairs(ev, ev)
        .orderBy("error_id", "click_id")
    },

    // LEFT OUTER stream-stream interval join (batch twin): every error,
    // with its follow-up click or the -1 sentinel. The streaming path runs
    // the identical plan builder with watermarks on both sides; unmatched
    // errors there emit only after the watermark passes their join window
    // (asserted with the closed-window bound in EventStreamsSpec).
    "ev_error_click_outer" -> { (s, dir) =>
      val ev = Relational.t(s, dir, "events")
      EventStreams.errorClickPairsOuter(ev, ev)
        .select("error_id", "click_id", "user_id")
        .orderBy("error_id", "click_id")
    },

    // Sliding 1h windows every 30min: each event lands in two windows.
    "ev_window_sliding" -> { (s, dir) =>
      Relational.t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("w.start").as("window_start"), col("event_type"), col("n_events"))
        .orderBy("window_start", "event_type")
    },

    // Ordered conversion funnel: view → click (strictly after the user's
    // first view) → purchase (strictly after that click). Three cascaded
    // per-user aggregates, each an equi-join on user_id — every stage
    // reuses the same key partitioning, the conversion predicate rides in
    // the join filter, and no window sort over the raw event stream is
    // needed. Output is one row per stage with the surviving-user count —
    // the product-analytics primitive behind every conversion dashboard.
    "ev_funnel" -> { (s, dir) =>
      val ev = Relational.t(s, dir, "events")
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("v_ts"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, Seq("user_id")).filter(col("ts") > col("v_ts"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("c_ts"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, Seq("user_id")).filter(col("ts") > col("c_ts"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("p_ts"))
      v.agg(count(lit(1)).as("n_users")).select(lit("1_view").as("stage"), col("n_users"))
        .unionByName(c.agg(count(lit(1)).as("n_users")).select(lit("2_click").as("stage"), col("n_users")))
        .unionByName(p.agg(count(lit(1)).as("n_users")).select(lit("3_purchase").as("stage"), col("n_users")))
        .orderBy("stage")
    },

    // TIME-BOUNDED conversion funnel: view → click → purchase where each
    // step follows the previous within FunnelWindowMicros. This is a
    // genuinely harder contract than ev_funnel's unbounded "after": greedy
    // earliest-step chaining is WRONG under windows (the earliest view may
    // time out while a later view converts), so reach is "EXISTS a chain".
    // The engine computes it as a per-user LINEAR scan with O(|steps|)
    // state — for each stage, the latest chain-completion time seen so
    // far; an arriving step-k event completes iff the latest stage-(k−1)
    // completion from a strictly earlier timestamp is within the window
    // (if the LATEST is too old, every completion is — the monotone
    // argument that makes O(1) state sufficient). Events at equal
    // timestamps update against pre-tick state only, so ts_{i+1} > ts_i is
    // structural. The quadratic EXISTS-join oracle proves the DP equals
    // the existential semantics. Shape: one user_id shuffle, per-user O(n)
    // compute, then a single-row aggregate exploded to the |steps|-row
    // report (the pl_filter_funnel shape).
    "ev_funnel_windowed" -> { (s, dir) =>
      val one = windowedFunnelReach(Relational.t(s, dir, "events")).agg(
        sum(when(col("max_stage") >= 1, 1L).otherwise(0L)).as("s1"),
        sum(when(col("max_stage") >= 2, 1L).otherwise(0L)).as("s2"),
        sum(when(col("max_stage") >= 3, 1L).otherwise(0L)).as("s3"))
      one.select(explode(array(
          struct(lit("1_view").as("stage"), col("s1").as("n_users")),
          struct(lit("2_click").as("stage"), col("s2").as("n_users")),
          struct(lit("3_purchase").as("stage"), col("s3").as("n_users")))).as("r"))
        .select(col("r.stage"), col("r.n_users"))
        .orderBy("stage")
    },

    // Stored mergeable distinct-count sketches (DataSketches HLL): build
    // one user sketch PER DAY — a tiny sketch table maintained
    // incrementally, the distinct-count analog of [[graft.plans.MatViews]]
    // — then answer weekly distinct users by UNIONING the daily sketches,
    // never rescanning the event stream. At 100 TB this turns "distinct
    // users over any date range" from a full-scan distinct into a merge of
    // O(days) KB-sized sketches. ON the hash gate via the sketch-contract
    // shape (q24): the engine joins the weekly merged-sketch estimate
    // against the exact weekly distinct and emits (exact, within_bound);
    // the oracle computes the exact with literal TRUE, so a hash match
    // proves the merged sketch landed within the documented 5% bound
    // (default lgK=12 on a few hundred distincts ⇒ rsd ≈1.6%). The join is
    // |weeks|-sized on both sides — calendar-bounded, metadata-narrow.
    "ev_hll_rollup" -> { (s, dir) =>
      val ev = Relational.t(s, dir, "events")
      val week = (c: org.apache.spark.sql.Column) =>
        floor(datediff(c, lit("2024-01-01").cast("date")) / 7).cast("int")
      val daily = ev
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .groupBy("day")
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      val approx = daily
        .groupBy(week(col("day")).as("week"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_users"))
      val exact = ev
        .select(week(to_date(col("ts"))).as("week"), col("user_id"))
        .groupBy("week")
        .agg(countDistinct(col("user_id")).as("exact_users"))
      exact.join(approx, Seq("week"))
        .select(col("week"), col("exact_users"),
          (abs(col("approx_users") - col("exact_users")) <=
            col("exact_users") * lit(0.05)).as("within_bound"))
        .orderBy("week")
    },

    // Single mean-shift LOCATION (AMOC — the binary-segmentation step
    // behind every multiple-changepoint recursion): for each event type's
    // daily revenue series, the split day maximizing the centered-CUSUM
    // statistic |S_t − (t/n)·S_n| — reported SCALED BY n as the exact
    // integer D_t = n·S_t − t·S_n (the ev_cusum/ev_anomaly doctrine: the
    // argmax must never sit on a float knife-edge, so the trajectory is
    // integer and the two segment means are the only — final, token-
    // identical — IEEE divisions). Complements ev_cusum: that detects and
    // locates sustained POSITIVE drift online with a tuned allowance; this
    // is the offline retrospective "WHERE did the level change" estimator
    // (maximum-likelihood under constant variance). Shape: one map-side-
    // combined daily aggregation, then windows over the |types|-partitioned
    // CALENDAR-BOUNDED frame (30 rows per type — bounded by wall-clock,
    // never event volume) and a WindowGroupLimit argmax with a
    // deterministic (|D| DESC, day ASC) tie-break.
    "ev_changepoint" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val d = org.apache.spark.sql.types.DecimalType(18, 2)
      val daily = Relational.t(s, dir, "events")
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          col("value").cast(d).multiply(lit(100)).cast("long").as("cents"))
        .groupBy("event_type", "day")
        .agg(sum(col("cents")).as("cents"))
      val w = Window.partitionBy("event_type").orderBy("day")
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val all = Window.partitionBy("event_type")
      daily
        .withColumn("t", row_number().over(w))
        .withColumn("s_t", sum(col("cents")).over(run))
        .withColumn("n", count(lit(1)).over(all))
        .withColumn("s_n", sum(col("cents")).over(all))
        .filter(col("t") < col("n"))
        .withColumn("absd", abs(col("n") * col("s_t") - col("t") * col("s_n")))
        .withColumn("rk", row_number().over(
          Window.partitionBy("event_type").orderBy(col("absd").desc, col("day").asc)))
        .filter(col("rk") === 1)
        .select(col("event_type"), col("n").cast("long").as("n_days"),
          col("day").as("split_day"), col("absd").as("dmax_scaled"),
          (col("s_t").cast("double") / (col("t") * 100)).as("mean_before"),
          ((col("s_n") - col("s_t")).cast("double") / ((col("n") - col("t")) * 100))
            .as("mean_after"))
        .orderBy("event_type")
    },

    // CUSUM changepoint detection (Page 1954) over the hourly series —
    // the drift detector beside ev_anomaly's point-outlier flag: the
    // one-sided cumulative sum s_t = max(0, s_{t−1} + (x_t − μ − k))
    // accumulates small sustained shifts a 2σ point test never sees; the
    // peak locates the drift. All arithmetic is SCALED BY n (the hour
    // count) into integers — s_t ← max(0, s_{t−1} + n·x_t − Σx − n·k) —
    // so the trajectory, peak value, and peak hour are exact (the
    // ev_anomaly stability argument applied to a RECURSION; the oracle
    // replays it as a recursive CTE). The recursion is inherently ordered,
    // so it runs as one linear scan per event type over the
    // CALENDAR-BOUNDED hourly frame (O(1) state; the per-type frame never
    // grows with event volume, only with wall-clock time).
    "ev_cusum" -> { (s, dir) =>
      import s.implicits._
      val hourly = EventStreams.windowedAgg(Relational.t(s, dir, "events"))
        .select(col("window_start"), col("event_type"), col("n_events"))
      val st = hourly.groupBy("event_type")
        .agg(count(lit(1)).as("n_w"), sum("n_events").as("tot"))
      hourly.join(broadcast(st), "event_type") // bounded: |event types| rows
        .select(col("event_type"), unix_micros(col("window_start")).as("h"),
          (col("n_w") * col("n_events") - col("tot") -
            col("n_w") * lit(CusumSlack)).as("dev"))
        .as[(String, Long, Long)]
        .groupByKey(_._1)
        .mapGroups { (t, it) =>
          val rows = it.toArray.sortBy(_._2)
          var acc = 0L
          var peak = 0L
          var peakH = rows.head._2
          rows.foreach { case (_, h, dev) =>
            acc = math.max(0L, acc + dev)
            if (acc > peak) { peak = acc; peakH = h }
          }
          (t, rows.length.toLong, peak, peakH)
        }
        .toDF("event_type", "n_hours", "peak_cusum", "peak_h")
        .select(col("event_type"), col("n_hours"), col("peak_cusum"),
          timestamp_micros(col("peak_h")).as("peak_hour"))
        .orderBy("event_type")
    },

    // Rate-anomaly detection: hourly event-type counts whose deviation from
    // that type's mean exceeds 2 sample standard deviations. The flag
    // condition is evaluated in EXACT integer arithmetic —
    // (x·n − S)²·(n−1) > 4·n·(n·ΣX² − S²) is (x−μ)² > 4·σ̂² cleared of
    // divisions — so window membership can never flip on a float
    // knife-edge and an external engine reproduces the row set exactly
    // (a real monitoring concern: alert sets must be stable across
    // recomputation). Shape: one windowed count, one per-type moment
    // aggregate (3 sums — broadcastable, |event types| rows), one broadcast
    // join back; the hourly subplan is shared by both consumers (reused
    // exchange), so events scan once. Hours with zero events of a type are
    // absent, not zero-filled — the series is the observed one.
    // Lag-1 autocorrelation of the daily event-count series — the
    // persistence screen beside an_runs (randomness) and an_seasonality
    // (weekday structure): r₁ near +1 means momentum/trend, near −1
    // oscillation; a pipeline reads it before treating days as i.i.d.
    // samples. Exactness: the lagged pairing is a SUCCESSOR equality join
    // on integer day numbers (dy ⋈ dy+1 — adjacency without a window;
    // calendar gaps simply contribute no pair, identically in both
    // engines); all five moments are integer sums riding DECIMAL(38,0),
    // and r₁ is ONE token-identical IEEE tree guarded NULL unless both
    // variance terms are strictly positive. O(|days|) after the one daily
    // aggregation — calendar-bounded everywhere.
    "ev_autocorr" -> { (s, dir) =>
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val d = (c: org.apache.spark.sql.Column) => c.cast("double")
      val daily = Dedup.materialized(Relational.t(s, dir, "events")
        .select(expr("unix_micros(ts) DIV 86400000000").as("dy"))
        .groupBy("dy").agg(count(lit(1)).as("n")))
      val pairs = daily.select(col("dy"), col("n").as("x"))
        .join(broadcast(daily.select((col("dy") - 1).as("dy"), col("n").as("y"))), "dy") // bounded: calendar-days frame
      val vx = col("np").cast(dec) * col("sxx") - col("sx") * col("sx")
      val vy = col("np").cast(dec) * col("syy") - col("sy") * col("sy")
      pairs.agg(
          count(lit(1)).as("np"),
          sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
          sum((col("x") * col("x")).cast(dec)).as("sxx"),
          sum((col("y") * col("y")).cast(dec)).as("syy"),
          sum((col("x") * col("y")).cast(dec)).as("sxy"))
        .select(col("np"),
          when(vx > 0 && vy > 0,
            (col("np").cast(dec) * col("sxy") - col("sx") * col("sy")).cast("double") /
              sqrt(vx.cast("double") * vy.cast("double"))).as("r1"))
    },

    "ev_anomaly" -> { (s, dir) =>
      val hourly = EventStreams.windowedAgg(Relational.t(s, dir, "events"))
        .select(col("window_start"), col("event_type"), col("n_events"))
      val stats = hourly.groupBy("event_type").agg(
        count(lit(1)).as("n_w"),
        sum(col("n_events")).as("s"),
        sum(col("n_events") * col("n_events")).as("s2"))
      // The squared moment terms overflow BIGINT once Σ counts reach ~3·10⁹
      // per type, so the comparison runs in DECIMAL(38,0) — still exact
      // integer arithmetic, matching DuckDB's automatic HUGEINT promotion
      // of SUM(BIGINT), with headroom to 10³⁸.
      val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val x = col("n_events").cast(d38)
      val nw = col("n_w").cast(d38)
      val sm = col("s").cast(d38)
      val s2m = col("s2").cast(d38)
      val dev = x * nw - sm
      hourly.join(broadcast(stats), "event_type") // bounded: |event types| rows
        .filter(col("n_w") > 1 &&
          dev * dev * (nw - lit(1).cast(d38)) >
            lit(4).cast(d38) * nw * (nw * s2m - sm * sm))
        .select(col("window_start"), col("event_type"), col("n_events"),
          (col("s").cast("double") / col("n_w")).as("mean_events"))
        .orderBy("window_start", "event_type")
    },

    // Robust outlier detection per event type: median / MAD (median
    // absolute deviation) instead of mean / stddev — the estimator that
    // does not move when the outliers it hunts contaminate it. Everything
    // is EXACT, including both medians: a median is selected by RANK, not
    // computed by interpolation — row_number against (n+1)÷2 and (n+2)÷2
    // picks the middle value(s); their SUM is 2×median as an exact
    // DECIMAL (the odd-n case selects the same rank twice). Deviations
    // stay in doubled units (dev2 = |2v − med2|) and the MAD in quadrupled
    // units (mad4 = sum of the two middle dev2), so the outlier test
    // |v − med| > 3·MAD becomes 2·dev2 > 3·mad4 — division-free decimal
    // comparison, the ev_anomaly stability argument applied to rank
    // statistics. Shape: ONE corpus aggregation to the (event_type, value)
    // HISTOGRAM — values are exact cents, so the grouped frame is bounded
    // by the value DOMAIN, not the corpus (the ev_ks value-grid argument:
    // ≤ |types|·|price grid| rows at any corpus size) — then every rank
    // selection (both medians, the MAD, the outlier census) is cumulative
    // arithmetic over the tiny histogram: the value at rank r is the one
    // grid row with cum − cnt < r ≤ cum (the (cum−cnt, cum] intervals
    // partition (0, n], so exactly one row fires per rank — identical to
    // rank selection over the expanded multiset). The deviation histogram
    // derives from the value histogram directly, so the corpus is touched
    // once where the rank formulation re-sorted it twice.
    "ev_mad_outliers" -> { (s, dir) =>
      val d = org.apache.spark.sql.types.DecimalType(18, 2)
      // The stored value grid ([[valueGridStore]]) feeds the median
      // selection AND the deviation histogram (which feeds the MAD
      // selection and the outlier census) — one shuffle aggregation over
      // the corpus per SESSION, shared with ev_winsorize.
      val hist = valueGridStore(s, dir)
      // Sum of the two middle-rank values ((n+1) div 2, (n+2) div 2 — equal
      // when n is odd, so the same grid row legitimately fires both sums).
      // Window.partitionBy(event_type) over the DOMAIN-BOUNDED histogram is
      // safe at any corpus size — over RAW rows the same window would cap
      // parallelism at |types| and sort corpus-sized partitions.
      def mid2(h0: DataFrame, vCol: String, out: String): DataFrame = {
        val wOrd = org.apache.spark.sql.expressions.Window
          .partitionBy("event_type").orderBy(vCol)
        val wAll = org.apache.spark.sql.expressions.Window
          .partitionBy("event_type")
        def hit(r: Column) = col("cum") - col("cnt") < r && r <= col("cum")
        h0.withColumn("cum", sum(col("cnt")).over(wOrd))
          .withColumn("n", sum(col("cnt")).over(wAll))
          .groupBy("event_type").agg(max(col("n")).as("n"),
            (sum(when(hit(expr("(n+1) div 2")), col(vCol)).otherwise(lit(0).cast(d))) +
              sum(when(hit(expr("(n+2) div 2")), col(vCol)).otherwise(lit(0).cast(d))))
              .as(out))
      }
      val med = mid2(hist, "v", "med2")
      val devh = hist
        .join(broadcast(med.select("event_type", "med2")), "event_type") // bounded: |event types| rows
        .select(col("event_type"), abs(col("v") * 2 - col("med2")).as("dev2"), col("cnt"))
        .groupBy("event_type", "dev2").agg(sum(col("cnt")).as("cnt"))
      val mad = mid2(devh, "dev2", "mad4").drop("n")
      val outliers = devh.join(broadcast(mad), "event_type") // bounded: |event types| rows
        .filter(col("dev2") * 2 > col("mad4") * 3)
        .groupBy("event_type").agg(sum(col("cnt")).as("n_out"))
      med.join(mad, "event_type")
        .join(outliers, Seq("event_type"), "left")
        .select(col("event_type"), col("n"),
          (col("med2").cast("double") / 2).as("median_value"),
          (col("mad4").cast("double") / 4).as("mad"),
          coalesce(col("n_out"), lit(0L)).as("n_outliers"))
        .orderBy("event_type")
    },

    // Winsorization at the exact [p05, p95] nearest-rank quantiles — the
    // outlier-clipping normalization a feature pipeline applies before
    // training. Quantiles are selected by RANK like the MAD medians (value
    // at row_number (n+19)÷20 resp. (19n+19)÷20 — ceil(n/20)/ceil(19n/20)
    // in EXACT integer arithmetic, never ceil(0.05·n) in floating point,
    // whose representation error can flip the rank at integer boundaries).
    // Output per type: the clip bounds, raw vs clipped exact sums, and how
    // many values were clipped. One corpus aggregation to the value-grid
    // histogram + one broadcast stats join — the ev_mad_outliers shape at
    // different ranks.
    "ev_winsorize" -> { (s, dir) =>
      // Same domain-bounded (event_type, value) histogram as
      // ev_mad_outliers — read from the shared stored grid
      // ([[valueGridStore]]): quantile ranks select grid values by
      // cumulative count, and the raw/clipped sums weight each grid value
      // by cnt — the corpus is aggregated once per session.
      val hist = valueGridStore(s, dir)
      val wOrd = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("v")
      val wAll = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type")
      def hit(r: Column) = col("cum") - col("cnt") < r && r <= col("cum")
      val qs = hist
        .withColumn("cum", sum(col("cnt")).over(wOrd))
        .withColumn("n", sum(col("cnt")).over(wAll))
        .groupBy("event_type")
        .agg(max("n").as("n"),
          sum(when(hit(expr("(n + 19) div 20")), col("v"))).as("p05"),
          sum(when(hit(expr("(19 * n + 19) div 20")), col("v"))).as("p95"))
      val clipped = least(greatest(col("v"), col("p05")), col("p95"))
      hist.join(broadcast(qs), "event_type") // bounded: |event types| rows
        .groupBy("event_type")
        .agg(max("n").as("n"),
          max(col("p05")).cast("double").as("p05"),
          max(col("p95")).cast("double").as("p95"),
          sum(col("v") * col("cnt")).cast("double").as("sum_raw"),
          sum(clipped * col("cnt")).cast("double").as("sum_clipped"),
          sum(when(col("v") < col("p05") || col("v") > col("p95"), col("cnt")).otherwise(0L)).as("n_clipped"))
        .orderBy("event_type")
    },

    // Exact two-sample Kolmogorov–Smirnov statistic per event type between
    // a deterministic A/B user split (hash buckets <50 vs ≥50 — the same
    // cross-engine family as sp_split_assign, so membership is
    // reproducible): the experiment-analysis primitive "did the metric's
    // DISTRIBUTION move", stronger than any mean/variance comparison.
    // D = max over v of |F_A(v) − F_B(v)| computed in pure integers:
    // max |ca(≤v)·n_b − cb(≤v)·n_a| over the VALUE-GRID frame (values are
    // exact cents, so the grouped (type, v) frame is bounded by the value
    // DOMAIN — ≤ |types|·|price grid| rows at any corpus size, so the
    // cumulative window input never grows with the event count — the same
    // histogram shape ev_mad_outliers/ev_winsorize select their ranks from).
    // The one IEEE division ks_num/(n_a·n_b) happens once at the end, so
    // the statistic is hash-exact across engines.
    "ev_ks_ab" -> { (s, dir) =>
      ksTwoSample(Relational.t(s, dir, "events"),
        when(Pipeline.bucket(col("user_id")) < 50, 1L).otherwise(0L))
    },

    // A/B conversion comparison — the companion to ev_ks_ab for BINARY
    // outcomes: per-user converted flag (heavy purchaser: ≥ ConvPurchases
    // purchase events — an intensive per-user property, so the ~46%
    // conversion rate is scale-stable; "≥1 purchase" would be degenerate
    // on this stream, every user qualifies), split by the same
    // deterministic hash family, tested with the 2×2 chi-square
    // χ² = N·(ad−bc)²/(r1·r2·c1·c2). The cross-product deviation ad−bc is
    // computed in pure integers (its SIGN — which arm wins — can never
    // flip on a float knife-edge), and χ² is one fixed IEEE tree over
    // integer-valued doubles (the an_chisq exactness argument). Shape: one
    // user-keyed aggregation over the event stream, then a single-row
    // reduction — nothing after the first aggregate scales with the data.
    "ev_ab_conversion" -> { (s, dir) =>
      val d = (c: Column) => c.cast("double")
      Relational.t(s, dir, "events")
        .groupBy("user_id")
        .agg((sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) >=
          ConvPurchases).cast("long").as("conv"))
        .select(when(Pipeline.bucket(col("user_id")) < 50, 1L).otherwise(0L).as("is_a"),
          col("conv"))
        .agg(
          sum(col("is_a")).as("n_a"),
          sum(lit(1L) - col("is_a")).as("n_b"),
          sum(col("is_a") * col("conv")).as("conv_a"),
          sum((lit(1L) - col("is_a")) * col("conv")).as("conv_b"))
        .select(col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
          (col("conv_a") * (col("n_b") - col("conv_b")) -
            col("conv_b") * (col("n_a") - col("conv_a"))).as("dev"),
          (d(col("conv_a")) / d(col("n_a"))).as("rate_a"),
          (d(col("conv_b")) / d(col("n_b"))).as("rate_b"),
          (d(col("n_a") + col("n_b")) *
            d(col("conv_a") * (col("n_b") - col("conv_b")) -
              col("conv_b") * (col("n_a") - col("conv_a"))) *
            d(col("conv_a") * (col("n_b") - col("conv_b")) -
              col("conv_b") * (col("n_a") - col("conv_a"))) /
            (d(col("n_a")) * d(col("n_b")) *
              d(col("conv_a") + col("conv_b")) *
              d(col("n_a") + col("n_b") - col("conv_a") - col("conv_b")))).as("chi2"))
    },

    // CUPED variance reduction (Deng, Xu, Kohavi & Walker, WSDM 2013) — the
    // experimentation-platform primitive beside ev_ks_ab / ev_ab_conversion:
    // adjust each user's experiment-period metric Y by their PRE-period
    // metric X (Y' = Y − θ(X − X̄), θ = cov(X,Y)/var(X) pooled), shrinking
    // metric variance by the pre/post correlation — the difference between
    // an experiment reading in days vs weeks. Periods are the corpus time
    // midpoint (integer micros DIV); X/Y are per-user EXACT cent sums
    // (zero when absent — every user carries a covariate); arms are the
    // ev_ks_ab hash family. All moments (Σx, Σy, Σxx, Σxy, Σyy per arm and
    // pooled) ride DECIMAL(38,0)/HUGEINT exactly; θ, the adjusted means,
    // both variances, and the reduction ratio are ONE token-identical IEEE
    // tree over those integer-valued doubles (the q22/an_mannwhitney
    // device). Shape: one user-keyed aggregation over the event stream
    // (map-side combined), then a 2-row arm frame and a 1-row pooled frame
    // — nothing after the first aggregate scales with the data.
    "ev_cuped" -> { (s, dir) =>
      val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val d = (c: Column) => c.cast("double")
      val ev = Relational.t(s, dir, "events")
      def us = unix_micros(col("ts"))
      val bounds = ev.agg(min(us).as("mn"), max(us).as("mx"))
      val perUser = ev.crossJoin(broadcast(bounds)) // bounded: one row
        .select(col("user_id"),
          (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
            .cast("long").as("cents"),
          (us < col("mn") + expr("(mx - mn) DIV 2")).as("pre"))
        .groupBy("user_id")
        .agg(sum(when(col("pre"), col("cents")).otherwise(0L)).as("x"),
          sum(when(!col("pre"), col("cents")).otherwise(0L)).as("y"))
        .select(
          when(Pipeline.bucket(col("user_id")) < 50, lit("A")).otherwise(lit("B"))
            .as("variant"),
          col("x"), col("y"))
      // Materialized (2 rows): `arms` feeds BOTH the pooled aggregate `g`
      // and the final crossJoin — without the checkpoint the corpus-scale
      // per-user aggregation executes once per consumer unless
      // ReusedExchange happens to fire (the dq_t_closeness `cell` posture).
      val arms = Dedup.materialized(perUser.groupBy("variant").agg(
        count(lit(1)).as("n"),
        sum(col("x").cast(dec38)).as("sx"),
        sum(col("y").cast(dec38)).as("sy"),
        sum(col("x").cast(dec38) * col("x").cast(dec38)).as("sxx"),
        sum(col("x").cast(dec38) * col("y").cast(dec38)).as("sxy"),
        sum(col("y").cast(dec38) * col("y").cast(dec38)).as("syy")))
      val g = arms.agg(
        sum(col("n")).as("gn"), sum(col("sx")).as("gsx"), sum(col("sy")).as("gsy"),
        sum(col("sxx")).as("gsxx"), sum(col("sxy")).as("gsxy"))
      arms.crossJoin(broadcast(g)) // bounded: one row (pooled moments)
        .withColumn("theta",
          (d(col("gn")) * d(col("gsxy")) - d(col("gsx")) * d(col("gsy"))) /
            (d(col("gn")) * d(col("gsxx")) - d(col("gsx")) * d(col("gsx"))))
        .withColumn("var_y",
          (d(col("syy")) - d(col("sy")) * d(col("sy")) / d(col("n"))) /
            (d(col("n")) - lit(1.0)))
        .withColumn("cov_xy",
          (d(col("sxy")) - d(col("sx")) * d(col("sy")) / d(col("n"))) /
            (d(col("n")) - lit(1.0)))
        .withColumn("var_x",
          (d(col("sxx")) - d(col("sx")) * d(col("sx")) / d(col("n"))) /
            (d(col("n")) - lit(1.0)))
        .withColumn("var_y_cuped",
          col("var_y") - lit(2.0) * col("theta") * col("cov_xy") +
            col("theta") * col("theta") * col("var_x"))
        .select(col("variant"), col("n"),
          (d(col("sy")) / d(col("n"))).as("mean_y"),
          (d(col("sy")) / d(col("n")) -
            col("theta") * (d(col("sx")) / d(col("n")) - d(col("gsx")) / d(col("gn"))))
            .as("mean_y_cuped"),
          col("theta"), col("var_y"), col("var_y_cuped"),
          (lit(1.0) - col("var_y_cuped") / col("var_y")).as("var_reduction"))
        .orderBy("variant")
    },

    // RFM user segmentation — the classic lifecycle-marketing score: per
    // user, Recency (days since last event, against the corpus max date),
    // Frequency (event count), Monetary (exact DECIMAL value sum), each
    // mapped to a 1-5 quintile score by EXACT rank arithmetic
    // ((rk−1)·5 div n + 1 — the equi-depth bucket formula, never
    // NTILE-over-a-global-ORDER-BY and never a float percentile), with
    // deterministic user_id tie-breaks so every score is cross-engine
    // reproducible. Shape: one events-sized aggregation shuffling on
    // user_id, then THREE range-partition numbering passes over the
    // |users|-row frame (the an_gini machinery — orders of magnitude
    // smaller than the event stream, and each pass is O(users) with no
    // single-partition funnel) joined back on user_id.
    "ev_rfm" -> { (s, dir) =>
      val d = org.apache.spark.sql.types.DecimalType(18, 2)
      val ev = Relational.t(s, dir, "events")
      val asOf = ev.agg(max(to_date(col("ts"))).as("as_of"))
      val base = Dedup.materialized(ev.groupBy("user_id")
        .agg(max(to_date(col("ts"))).as("last_day"),
          count(lit(1)).as("frequency"),
          sum(col("value").cast(d)).as("monetary"))
        .crossJoin(broadcast(asOf)) // bounded: one row
        .select(col("user_id"),
          datediff(col("as_of"), col("last_day")).cast("long").as("recency_days"),
          col("frequency"), col("monetary")))
      val n = base.agg(count(lit(1)).as("n_users"))
      // Quintile score of `key` ascending (higher key → higher score),
      // user_id tie-break; -recency makes "more recent" rank higher.
      def score(key: Column, out: String): DataFrame =
        Pipeline.globalRowNumbers(s, base.select(col("user_id"), key.as("k")),
            "rk", col("k"), col("user_id"))
          .crossJoin(broadcast(n)) // bounded: one row
          .select(col("user_id"),
            (expr("((rk - 1) * 5) div n_users") + 1).cast("int").as(out))
      base
        .join(score(-col("recency_days"), "r_score"), "user_id")
        .join(score(col("frequency"), "f_score"), "user_id")
        .join(score(col("monetary"), "m_score"), "user_id")
        .select(col("user_id"), col("recency_days"), col("frequency"),
          col("monetary").cast("double").as("monetary"),
          col("r_score"), col("f_score"), col("m_score"),
          concat(col("r_score").cast("string"), col("f_score").cast("string"),
            col("m_score").cast("string")).as("segment"))
        .orderBy("user_id")
    },

    // Gap-filled hourly series with LOCF (last-observation-carried-forward)
    // imputation — the time-series repair step before any model consumes a
    // metric stream: absent (hour, type) cells exist in the output, flagged
    // unobserved, and carry the most recent observed count (0 before the
    // first observation). Shape: the dense spine is |hours| × |types| —
    // generated from a ONE-ROW min/max aggregate broadcast into a
    // sequence() explode, never from the events table itself — left-joined
    // against the observed hourly aggregate, then one ordered window per
    // type for the carry-forward. All integers and truncated timestamps:
    // exact in both engines.
    "ev_locf" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val hourly = EventStreams.windowedAgg(Relational.t(s, dir, "events"))
        .select(col("window_start"), col("event_type"), col("n_events"))
      val bounds = hourly.agg(min("window_start").as("lo"), max("window_start").as("hi"))
      val types = hourly.select("event_type").distinct()
      val spine = types.crossJoin(broadcast(bounds)) // bounded: one row
        .select(col("event_type"),
          explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 HOUR"))).as("hour"))
      val w = Window.partitionBy("event_type").orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(hourly,
          spine("event_type") === hourly("event_type") && col("hour") === col("window_start"),
          "left_outer")
        .select(spine("event_type"), col("hour"), col("n_events"))
        .select(col("event_type"), col("hour"),
          col("n_events").isNotNull.as("observed"),
          coalesce(last("n_events", ignoreNulls = true).over(w), lit(0L)).as("imputed"))
        .orderBy("event_type", "hour")
    },

    // Per-event lag/rolling feature engineering — the sequence-model input
    // builder: for each event in its user's (ts, event_id) total order, the
    // previous value, the inter-event gap in integer microseconds, and a
    // trailing 3-row exact-DECIMAL sum/count. Everything is an integer, an
    // exact DECIMAL, or a boundary-only double cast, so the whole feature
    // frame is hash-exact. Shape: ONE shuffle on user_id (the
    // sessionization partitioning — high-cardinality, scales with users)
    // feeds every window; the rolling frame is ROWS-bounded so state per
    // open window is O(3).
    "ev_rolling_features" -> { (s, dir) =>
      val d = org.apache.spark.sql.types.DecimalType(18, 2)
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val w3 = w.rowsBetween(-2, Window.currentRow)
      Relational.t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("value").cast(d).as("v"))
        .select(col("event_id"), col("user_id"),
          lag(col("v"), 1).over(w).cast("double").as("prev_value"),
          (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)).as("gap_us"),
          sum(col("v")).over(w3).cast("double").as("roll3_sum"),
          count(lit(1)).over(w3).as("roll3_n"))
        .orderBy("event_id")
    },

    // Kaplan-Meier time-to-conversion curve — the survival-analysis
    // contract (Kaplan & Meier 1958) applied to activation: duration =
    // days from a user's first event to their first purchase; users with
    // no purchase are right-CENSORED at the corpus horizon (the standard
    // incomplete-observation correction a naive conversion-rate-by-day
    // cut gets wrong). At each observed conversion duration t: n_risk =
    // #{dur ≥ t} (censored users leave the risk set at their censor
    // time), n_conv = conversions at exactly t, and the survival estimate
    // rides in EXACT LOG SPACE: each factor ln(1 − d/n) = qlog(n−d) −
    // qlog(n) as integer millionths (the cl_lm_perplexity quantization
    // contract — a product of doubles would be order-dependent and a
    // final exp() is libm, not cross-engine), so km_log_q is an exact
    // integer sum and km_ln its one-division double form. S hits exactly 0
    // when the last level converts everyone at risk (n = d): ln is
    // undefined there, surfaced as NULL in both engines. Shape: one
    // user-level aggregate (corpus-sized, map-side combined), then
    // everything is |levels|-sized — levels are calendar-bounded (≤
    // observation days, the ev_cusum argument), so the at-risk census is
    // a broadcast inequality join of users × levels and the cumulative
    // sum a levels² broadcast self-join, never a global window funnel.
    "ev_survival" -> { (s, dir) =>
      val qln = TextOps.qlog _
      val day = expr("unix_micros(ts) DIV 86400000000")
      val ud = Relational.t(s, dir, "events")
        .select(col("user_id"), col("event_type"), day.as("d"))
        .groupBy("user_id")
        .agg(min(col("d")).as("fd"),
          min(when(col("event_type") === "purchase", col("d"))).as("fp"),
          max(col("d")).as("ld"))
      val mx = ud.agg(max(col("ld")).as("m"))
      val life = Dedup.materialized(ud.crossJoin(broadcast(mx)) // bounded: one row
        .select(
          when(col("fp").isNotNull, col("fp") - col("fd"))
            .otherwise(col("m") - col("fd")).as("dur"),
          col("fp").isNull.as("censored")))
      val lev = life.filter(!col("censored"))
        .groupBy(col("dur").as("t")).agg(count(lit(1)).as("n_conv"))
      val risk = life.join(broadcast(lev), col("dur") >= col("t")) // bounded: |levels| rows (calendar-bounded)
        .groupBy("t", "n_conv").agg(count(lit(1)).as("n_risk"))
      val term = Dedup.materialized(risk.select(col("t"), col("n_risk"), col("n_conv"),
        when(col("n_risk") > col("n_conv"),
          qln(col("n_risk") - col("n_conv")) - qln(col("n_risk"))).as("term_q")))
      val cum = term.select(col("t").as("tb"), col("term_q").as("tq"))
      term.join(broadcast(cum), col("tb") <= col("t")) // bounded: |levels| rows (calendar-bounded)
        .groupBy(col("t").as("dur"), col("n_risk"), col("n_conv"))
        .agg(when(count(lit(1)) === count(col("tq")), sum(col("tq")))
          .as("km_log_q"))
        .select(col("dur"), col("n_risk"), col("n_conv"), col("km_log_q"),
          (col("km_log_q").cast("double") / lit(1000000.0)).as("km_ln"))
        .orderBy("dur")
    },

    // Multi-touch purchase attribution (first-touch / last-touch) — the
    // marketing-analytics contract: each purchase is credited to the
    // earliest (first-touch) and latest (last-touch) non-purchase event of
    // the same user within the AttribWindowMicros lookback, 'none' when the
    // window is empty. Both assignments fall out of ONE value-RANGE window
    // pass: min/max over CASE-guarded (tsu, event_id, event_type) structs —
    // event_id makes the order total, and RANGE frames are tie-insensitive
    // (an equal-timestamp touch is in the window of its co-timestamped
    // purchase in both engines, deterministically). One user_id shuffle
    // (the sessionization partitioning), per-purchase rows materialized
    // once so the two model aggregates don't re-run the window, |models| ×
    // |types| output. The oracle runs the identical windowed form.
    "ev_attribution" -> { (s, dir) =>
      attributionModels(Relational.t(s, dir, "events"))
    },

    // Event-type transition matrix (first-order Markov counts): for each
    // user's event stream in (ts, event_id) total order — the id tiebreak
    // makes equal-timestamp ordering deterministic — count consecutive
    // (prev → next) type pairs, then keep the top transitions. The
    // behavioral-model input behind next-action prediction and funnel
    // discovery. Shape: ONE shuffle on user_id feeds the lag window (the
    // same partitioning every sessionization op here uses), the transition
    // aggregation is |types|² rows with map-side combine, and the top-k is
    // TakeOrdered. Invariant (spec-asserted): Σ counts = N − U, each user
    // contributing exactly (events − 1) transitions.
    "ev_transitions" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Relational.t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev_type", lag("event_type", 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type").as("next_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("prev_type").asc, col("next_type").asc)
        .limit(20)
    },

    // Stationary distribution of the behavioral Markov chain — where the
    // ev_transitions matrix SETTLES: MarkovIters synchronous power-
    // iteration rounds of π' = πP over the row-normalized observed
    // transition counts, from the uniform start — the long-run
    // time-in-state profile a product reads next to the raw counts (and
    // the |types|-sized cousin of ss_pagerank's corpus-sized iteration).
    // Per-term arithmetic is the fixed tree (π·cnt)/r with contributions
    // summed through DECIMAL(38,18) (exact, order-independent — the
    // pagerank contract), so four unrolled rounds land on identical
    // doubles in both engines. Every frame after the one lag-window
    // counting pass is |types|²-sized and broadcast. On this corpus every
    // type occurs as both source and target (row-stochastic over the
    // observed states); Σπ stays 1 up to per-round division ulps.
    "ev_markov_stationary" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val dec = org.apache.spark.sql.types.DecimalType(38, 18)
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val cm = Dedup.materialized(Relational.t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev_type", lag("event_type", 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type").as("next_type"))
        .agg(count(lit(1)).as("cnt")))
      val rows = cm.groupBy("prev_type").agg(sum("cnt").as("r"))
      val nS = rows.agg(count(lit(1)).cast("double").as("k"))
      val init = rows.select(col("prev_type").as("event_type"))
        .crossJoin(broadcast(nS)) // bounded: one row
        .select(col("event_type"), (lit(1.0) / col("k")).as("pi"))
      val mat = cm.join(rows, "prev_type")
      (1 to MarkovIters).foldLeft(init) { (pi, _) =>
        mat.join(broadcast(pi.withColumnRenamed("event_type", "prev_type")), "prev_type") // bounded: |event types| rows
          .select(col("next_type").as("event_type"),
            ((col("pi") * col("cnt").cast("double")) / col("r").cast("double"))
              .cast(dec).as("c"))
          .groupBy("event_type").agg(sum(col("c")).cast("double").as("pi"))
      }.orderBy("event_type")
    },

    // User growth curve: per day, first-time users and the cumulative
    // distinct-user count to date — the canonical top-line growth metric.
    // Exactness is structural (a user's FIRST event day is a min
    // aggregate; cumulative = Σ new), the interesting part is the
    // cumulative WITHOUT an unpartitioned window: the day frame is
    // calendar-bounded (the ev_ks_ab domain argument) but still ordered,
    // so the running sum stitches a per-MONTH partitioned window onto
    // broadcast month prefix-offsets computed by an inequality join over
    // the metadata-sized month frame — every stage is either partitioned
    // or O(|months|²) on a broadcast frame, nothing funnels corpus rows.
    "ev_user_growth" -> { (s, dir) =>
      userGrowth(Relational.t(s, dir, "events"))
    },

    // Engagement stickiness: per day, DAU, trailing-7-day active users
    // (WAU), and their ratio — the canonical habit metric. The trailing
    // distinct count never rescans the event stream: each (user, day)
    // activity fact CONTRIBUTES itself forward to the 7 windows that see
    // it (a constant-width explode — the inversion that turns a sliding
    // distinct into a plain hash aggregation with map-side combine), then
    // one distinct + count per window day. Integers + one final division.
    "ev_stickiness" -> { (s, dir) =>
      val act = Dedup.materialized(Relational.t(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct())
      val dau = act.groupBy("day").agg(count(lit(1)).as("dau"))
      val wau = act
        .select(col("user_id"),
          explode(sequence(col("day"), date_add(col("day"), 6))).as("day"))
        .distinct()
        .groupBy("day").agg(count(lit(1)).as("wau"))
      dau.join(wau, "day")
        .select(col("day").cast("timestamp").as("day"), col("dau"), col("wau"),
          (col("dau").cast("double") / col("wau").cast("double")).as("stickiness"))
        .orderBy("day")
    },

    // Cohort retention: users grouped by their first-signup week, counted
    // as active in each later week they emit ANY event. Weeks are integer
    // day-offsets / 7 from a fixed epoch — pure integer arithmetic both
    // engines compute identically (no locale/week-start semantics). Two
    // aggregates + one join on user_id; the distinct (user, week) activity
    // set is the only intermediate, already the minimal one.
    "ev_retention" -> { (s, dir) =>
      val ev = Relational.t(s, dir, "events")
      def week(ts: Column): Column =
        floor(datediff(to_date(ts), lit("2024-01-01").cast("date")) / 7).cast("int")
      val cohort = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(week(col("ts"))).as("cohort_week"))
      val active = ev.select(col("user_id"), week(col("ts")).as("week")).distinct()
      cohort.join(active, Seq("user_id"))
        .filter(col("week") >= col("cohort_week"))
        .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
        .orderBy("cohort_week", "week_offset")
    },

    // Cohort LIFETIME-VALUE curve — ev_retention's money sibling (the
    // unit-economics artifact: per signup cohort, revenue by week of age,
    // read as the cumulative-LTV numerator). Same signup-week cohort and
    // integer week arithmetic as ev_retention; revenue rides as EXACT
    // integer cents (the DECIMAL(18,2)·100 money contract) so every cell
    // is an exact integer — no division anywhere. Shape: the activity
    // stream is one narrow projection (week, cents-if-purchase), the
    // cohort frame is |users|-sized, and the cell aggregation map-side
    // combines; nothing rescans per cohort.
    "ev_cohort_ltv" -> { (s, dir) =>
      val d18 = org.apache.spark.sql.types.DecimalType(18, 2)
      val ev = Relational.t(s, dir, "events")
      def week(ts: Column): Column =
        floor(datediff(to_date(ts), lit("2024-01-01").cast("date")) / 7).cast("int")
      val cohort = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(week(col("ts"))).as("cohort_week"))
      val acts = ev.select(col("user_id"), week(col("ts")).as("week"),
        when(col("event_type") === "purchase",
          col("value").cast(d18).multiply(lit(100)).cast("long"))
          .otherwise(lit(0L)).as("cents"))
      cohort.join(acts, Seq("user_id"))
        .filter(col("week") >= col("cohort_week"))
        .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"),
          sum(col("cents")).as("purchase_cents"))
        .orderBy("cohort_week", "week_offset")
    }
  )

  /** CUSUM allowance k (events/hour) of [[queries ev_cusum]] — drift below
    * the slack is absorbed, sustained drift above it accumulates.
    */
  val CusumSlack = 2L

  /** Ordered step types of the windowed funnel. */
  val FunnelSteps: Seq[String] = Seq("view", "click", "purchase")

  /** Power-iteration rounds of [[queries ev_markov_stationary]]. */
  val MarkovIters = 4

  /** Attribution lookback of [[queries ev_attribution]] (24 h in micros):
    * wide enough that most purchases find a touch, tight enough that a
    * real 'none' tier survives at every SF.
    */
  val AttribWindowMicros: Long = 24L * 3600 * 1000000

  /** First/last-touch attribution core over a raw events frame (user_id,
    * ts, event_id, event_type) — see [[queries ev_attribution]]; factored
    * for the planted window-exclusion spec in EventsSpec.
    */
  private[graft] def attributionModels(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("tsu")
      .rangeBetween(-AttribWindowMicros, 0)
    val touch = when(col("event_type") =!= "purchase",
      struct(col("tsu"), col("event_id"), col("event_type")))
    val fr = Dedup.materialized(
      events
        .select(col("user_id"), unix_micros(col("ts")).as("tsu"),
          col("event_id"), col("event_type"))
        .transform(Dedup.spreadKeys("user_id"))
        .withColumn("lt", max(touch).over(w))
        .withColumn("ft", min(touch).over(w))
        .filter(col("event_type") === "purchase")
        .select(coalesce(col("ft.event_type"), lit("none")).as("ft_type"),
          coalesce(col("lt.event_type"), lit("none")).as("lt_type")))
    fr.select(lit("first").as("model"), col("ft_type").as("touch_type"))
      .unionByName(fr.select(lit("last").as("model"), col("lt_type").as("touch_type")))
      .groupBy("model", "touch_type").agg(count(lit(1)).as("n_purchases"))
      .orderBy("model", "touch_type")
  }

  /** Per-step window of [[queries ev_funnel_windowed]] (6 h in micros):
    * wide enough that some users chain, tight enough that most purchases
    * miss it — real attrition at every tier on this stream.
    */
  val FunnelWindowMicros: Long = 6L * 3600 * 1000000

  /** (event_type, value-cents) histogram of the event stream, pinned once
    * per (session, corpus) via [[graft.sources.Stored.pinnedIfBounded]] —
    * the value-grid frame the rank-statistic queries select from
    * (ev_mad_outliers' exact medians/MAD, ev_winsorize's quantile clips).
    * The pin rests on a DOMAIN assumption — values snapping to a
    * |types| × |price grid| lattice — that a corpus can break (the gate
    * corpus already half-breaks it: ~0.49 grid rows per event, measured at
    * sf0.01 and sf0.1), so the bound is CHECKED at pin time (ADVICE r11):
    * over [[ValueGridPinMaxRows]] the store logs loudly and returns the
    * live aggregation — consumers stay exact, the engine degrades to a
    * shuffle per query instead of pinning an O(|events|) frame in executor
    * memory for the context's lifetime. The aggregation SHAPE keeps a fully
    * live measurement elsewhere in the tier: ev_ks_ab builds the same grid
    * live with its arm split, so the one-live-measurement-per-tier doctrine
    * holds.
    */
  private def valueGridStore(s: SparkSession, dir: String): DataFrame =
    graft.sources.Stored.pinnedIfBounded("ev_value_grid", dir, s, ValueGridPinMaxRows) {
      Relational.t(s, dir, "events")
        .select(col("event_type"),
          col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)).as("v"))
        .groupBy("event_type", "v").agg(count(lit(1)).as("cnt"))
    }

  /** RAM bound for the value-grid pin: ~50 B/row × 2M ≈ 100 MB of block
    * manager — generous for any genuinely grid-snapped domain (10k price
    * points × 100 types = 1M), far below the O(|events|) frame a
    * near-continuous value column produces at lake scale.
    */
  val ValueGridPinMaxRows: Long = 2000000L

  /** Conversion threshold for [[queries ev_ab_conversion]]: a user counts
    * as converted with ≥ this many purchase events (the median per-user
    * purchase count is ~13 at every SF, so the split has real variation).
    */
  val ConvPurchases = 14

  /** Growth-curve core of [[queries ev_user_growth]], factored so the
    * multi-month planted spec can exercise the month-stitch (the corpus
    * spans one month, so the gate alone exercises a single partition).
    */
  def userGrowth(events: DataFrame): DataFrame = {
    val first = events
      .groupBy("user_id").agg(min(to_date(col("ts"))).as("day"))
    val daily = Dedup.materialized(
      first.groupBy("day").agg(count(lit(1)).as("n_new")))
    val m = daily.groupBy(trunc(col("day"), "month").as("month"))
      .agg(sum("n_new").as("m_tot"))
    val mOff = m.select(col("month"))
      .join(broadcast(m.select(col("month").as("pm"), col("m_tot"))), // bounded: calendar-months frame
        col("pm") < col("month"), "left_outer")
      .groupBy("month").agg(coalesce(sum("m_tot"), lit(0L)).as("m_off"))
    val w = Window.partitionBy("month").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.withColumn("month", trunc(col("day"), "month"))
      .join(broadcast(mOff), "month") // bounded: calendar-months frame
      .withColumn("cum_in_month", sum("n_new").over(w))
      // day emitted as midnight TIMESTAMP (the ev_window_agg convention —
      // DATE round-trips as a different physical type per engine).
      .select(col("day").cast("timestamp").as("day"), col("n_new"),
        (col("m_off") + col("cum_in_month")).as("n_cum_users"))
      .orderBy("day")
  }

  /** Per-user (user_id, max_stage) reach of the windowed funnel — the
    * linear-scan DP of [[queries ev_funnel_windowed]], factored out so the
    * planted specs (the greedy-earliest trap, equal-timestamp ticks) can
    * run it on hand-built streams.
    */
  def windowedFunnelReach(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val w = FunnelWindowMicros
    val steps = FunnelSteps
    events
      .filter(col("event_type").isin(steps: _*))
      .select(col("user_id"), unix_micros(col("ts")).as("tsu"), col("event_type"))
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .mapGroups { (uid, it) =>
        val sorted = it.toArray.sortBy(_._2)
        val l = Array.fill[Long](steps.length)(Long.MinValue)
        var idx = 0
        while (idx < sorted.length) {
          val ts = sorted(idx)._2
          val updates = Array.fill[Boolean](steps.length)(false)
          var j = idx
          while (j < sorted.length && sorted(j)._2 == ts) {
            val k = steps.indexOf(sorted(j)._3)
            val ok = k == 0 || (l(k - 1) != Long.MinValue && ts - l(k - 1) <= w)
            if (ok) updates(k) = true
            j += 1
          }
          var m = 0
          while (m < steps.length) {
            if (updates(m)) l(m) = ts
            m += 1
          }
          idx = j
        }
        (uid, l.lastIndexWhere(_ != Long.MinValue) + 1)
      }
      .toDF("user_id", "max_stage")
  }

  /** Exact two-sample KS core shared by the ev_ks_ab gate query and the
    * planted-distribution specs: per event_type, D between the rows where
    * `isA` = 1 and the rest, over `value` cast to exact cents. See the
    * ev_ks_ab query comment for the value-grid boundedness argument that
    * makes the cumulative window scale-safe.
    */
  def ksTwoSample(events: DataFrame, isA: Column): DataFrame = {
    val d = org.apache.spark.sql.types.DecimalType(18, 2)
    val e = events
      .select(col("event_type"), col("value").cast(d).as("v"), isA.as("is_a"))
    // Map-side-combined grid aggregation: the only corpus-sized pass.
    val g = e.groupBy("event_type", "v")
      .agg(sum(col("is_a")).as("da"), sum(lit(1L) - col("is_a")).as("db"))
    val w = Window.partitionBy("event_type").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = g.groupBy("event_type").agg(sum("da").as("n_a"), sum("db").as("n_b"))
    g.withColumn("ca", sum("da").over(w))
      .withColumn("cb", sum("db").over(w))
      .join(broadcast(tot), "event_type") // bounded: |event types| rows
      .groupBy(col("event_type"), col("n_a"), col("n_b"))
      .agg(max(abs(col("ca") * col("n_b") - col("cb") * col("n_a"))).as("ks_num"))
      .select(col("event_type"), col("n_a"), col("n_b"),
        col("ks_num"),
        (col("ks_num").cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("ks_stat"))
      .orderBy("event_type")
  }

  private val sessionsSql =
    s"""WITH x AS (
       |  SELECT user_id, ts, event_id,
       |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
       |              OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > ${EventStreams.SessionGapMicros}
       |         THEN 1 ELSE 0 END AS new_sess
       |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |), sx AS (
       |  SELECT user_id, ts,
       |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
       |  FROM x
       |)
       |SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id, COUNT(*) AS n_events,
       |  MIN(ts) AS session_start, MAX(ts) AS session_end
       |FROM sx GROUP BY user_id, sess_id ORDER BY user_id, sess_id""".stripMargin

  val oracles: Map[String, String] = Map(
    // Sketch-contract gate (the q24 shape): exact weekly distincts with a
    // literal TRUE; the engine's within_bound proves the merged daily
    // sketches landed inside the 5% bound.
    "ev_hll_rollup" ->
      """SELECT CAST(FLOOR(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) / 7) AS INT) AS week,
        |  COUNT(DISTINCT user_id) AS exact_users,
        |  TRUE AS within_bound
        |FROM events GROUP BY week ORDER BY week""".stripMargin,
    "ev_window_agg" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY window_start, event_type ORDER BY window_start, event_type""".stripMargin,
    // DuckDB promotes SUM(BIGINT) to HUGEINT, so the squared terms stay
    // exact 128-bit integers; the Spark side mirrors with DECIMAL(38,0).
    // Successor-join twin; HUGEINT moments, guarded one-tree division.
    "ev_autocorr" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS dy, COUNT(*) AS n
        |  FROM events GROUP BY 1
        |), pairs AS (
        |  SELECT a.n AS x, b.n AS y FROM daily a JOIN daily b ON b.dy = a.dy + 1
        |), m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS np,
        |    CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
        |    CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
        |    CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
        |    CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
        |  FROM pairs
        |)
        |SELECT np,
        |  CASE WHEN np * sxx - sx * sx > 0 AND np * syy - sy * sy > 0 THEN
        |    CAST(np * sxy - sx * sy AS DOUBLE) /
        |      sqrt(CAST(np * sxx - sx * sx AS DOUBLE) * CAST(np * syy - sy * sy AS DOUBLE))
        |  ELSE NULL END AS r1
        |FROM m""".stripMargin,
    "ev_anomaly" ->
      """WITH h AS (
        |  SELECT date_trunc('hour', ts) AS window_start, event_type, COUNT(*) AS n_events
        |  FROM events GROUP BY window_start, event_type
        |), st AS (
        |  SELECT event_type, COUNT(*) AS n_w, SUM(n_events) AS s, SUM(n_events * n_events) AS s2
        |  FROM h GROUP BY event_type
        |)
        |SELECT window_start, h.event_type, n_events, CAST(s AS DOUBLE) / n_w AS mean_events
        |FROM h JOIN st ON h.event_type = st.event_type
        |WHERE n_w > 1 AND
        |  (n_events * n_w - s) * (n_events * n_w - s) * (n_w - 1) > 4 * n_w * (n_w * s2 - s * s)
        |ORDER BY window_start, h.event_type""".stripMargin,
    // Identical window frames; DECIMAL sums cast to double only at the
    // output boundary, gaps in integer epoch micros.
    "ev_rolling_features" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id, CAST(value AS DECIMAL(18,2)) AS v FROM events
        |)
        |SELECT event_id, user_id,
        |  CAST(lag(v) OVER w AS DOUBLE) AS prev_value,
        |  epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us,
        |  CAST(SUM(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS roll3_sum,
        |  COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS roll3_n
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,
    // CUPED: HUGEINT moments per arm + pooled; θ, means, variances, and the
    // reduction mirror the Spark IEEE tree token-for-token.
    "ev_cuped" ->
      s"""WITH b AS (SELECT MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx FROM events),
         |e AS (
         |  SELECT user_id, CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         |    epoch_us(ts) < mn + (mx - mn) // 2 AS pre
         |  FROM events, b
         |), u AS (
         |  SELECT user_id,
         |    SUM(CASE WHEN pre THEN cents ELSE 0 END) AS x,
         |    SUM(CASE WHEN NOT pre THEN cents ELSE 0 END) AS y
         |  FROM e GROUP BY user_id
         |), v AS (
         |  SELECT CASE WHEN ${Pipeline.bucketSql("user_id")} < 50 THEN 'A' ELSE 'B' END AS variant,
         |    x, y FROM u
         |), arms AS (
         |  SELECT variant, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
         |    CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
         |    CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         |    CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
         |    CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
         |  FROM v GROUP BY variant
         |), g AS (
         |  SELECT CAST(SUM(n) AS BIGINT) AS gn, CAST(SUM(sx) AS HUGEINT) AS gsx,
         |    CAST(SUM(sy) AS HUGEINT) AS gsy, CAST(SUM(sxx) AS HUGEINT) AS gsxx,
         |    CAST(SUM(sxy) AS HUGEINT) AS gsxy
         |  FROM arms
         |), t AS (
         |  SELECT arms.*, g.*,
         |    (CAST(gn AS DOUBLE) * CAST(gsxy AS DOUBLE) - CAST(gsx AS DOUBLE) * CAST(gsy AS DOUBLE)) /
         |      (CAST(gn AS DOUBLE) * CAST(gsxx AS DOUBLE) - CAST(gsx AS DOUBLE) * CAST(gsx AS DOUBLE)) AS theta,
         |    (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) /
         |      (CAST(n AS DOUBLE) - 1.0) AS var_y,
         |    (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) /
         |      (CAST(n AS DOUBLE) - 1.0) AS cov_xy,
         |    (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) /
         |      (CAST(n AS DOUBLE) - 1.0) AS var_x
         |  FROM arms CROSS JOIN g
         |), t2 AS (
         |  SELECT t.*,
         |    var_y - 2.0 * theta * cov_xy + theta * theta * var_x AS var_y_cuped
         |  FROM t
         |)
         |SELECT variant, n,
         |  CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS mean_y,
         |  CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) -
         |    theta * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) - CAST(gsx AS DOUBLE) / CAST(gn AS DOUBLE)) AS mean_y_cuped,
         |  theta, var_y, var_y_cuped,
         |  1.0 - var_y_cuped / var_y AS var_reduction
         |FROM t2 ORDER BY variant""".stripMargin,
    // 2×2 chi-square with HUGEINT-safe casts; dev and the χ² tree mirror
    // the Spark plan token-for-token.
    "ev_ab_conversion" ->
      s"""WITH u AS (
         |  SELECT user_id,
         |    CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |              >= $ConvPurchases THEN 1 ELSE 0 END AS conv,
         |    CASE WHEN ${Pipeline.bucketSql("user_id")} < 50 THEN 1 ELSE 0 END AS is_a
         |  FROM events GROUP BY user_id
         |), t AS (
         |  SELECT CAST(SUM(is_a) AS BIGINT) AS n_a,
         |    CAST(SUM(1 - is_a) AS BIGINT) AS n_b,
         |    CAST(SUM(is_a * conv) AS BIGINT) AS conv_a,
         |    CAST(SUM((1 - is_a) * conv) AS BIGINT) AS conv_b
         |  FROM u
         |)
         |SELECT n_a, n_b, conv_a, conv_b,
         |  conv_a * (n_b - conv_b) - conv_b * (n_a - conv_a) AS dev,
         |  CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS rate_a,
         |  CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rate_b,
         |  CAST(n_a + n_b AS DOUBLE)
         |    * CAST(conv_a * (n_b - conv_b) - conv_b * (n_a - conv_a) AS DOUBLE)
         |    * CAST(conv_a * (n_b - conv_b) - conv_b * (n_a - conv_a) AS DOUBLE)
         |    / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
         |       * CAST(conv_a + conv_b AS DOUBLE)
         |       * CAST(n_a + n_b - conv_a - conv_b AS DOUBLE)) AS chi2
         |FROM t""".stripMargin,
    // Naive-window twin of the range-partition rank machinery: the
    // hash-match proves the three numbering passes ARE the global ranks.
    // Integer score arithmetic (// = floor div on positive operands);
    // DECIMAL monetary cast to DOUBLE only at the output boundary.
    "ev_rfm" ->
      """WITH u AS (
        |  SELECT user_id,
        |    date_diff('day', MAX(CAST(ts AS DATE)),
        |              (SELECT MAX(CAST(ts AS DATE)) FROM events)) AS recency_days,
        |    COUNT(*) AS frequency,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS monetary
        |  FROM events GROUP BY user_id
        |), n AS (SELECT COUNT(*) AS nu FROM u),
        |r AS (
        |  SELECT user_id, recency_days, frequency, monetary,
        |    ROW_NUMBER() OVER (ORDER BY recency_days DESC, user_id ASC) AS rr,
        |    ROW_NUMBER() OVER (ORDER BY frequency ASC, user_id ASC) AS rf,
        |    ROW_NUMBER() OVER (ORDER BY monetary ASC, user_id ASC) AS rm
        |  FROM u
        |)
        |SELECT user_id, CAST(recency_days AS BIGINT) AS recency_days, frequency,
        |  CAST(monetary AS DOUBLE) AS monetary,
        |  CAST((rr - 1) * 5 // nu + 1 AS INT) AS r_score,
        |  CAST((rf - 1) * 5 // nu + 1 AS INT) AS f_score,
        |  CAST((rm - 1) * 5 // nu + 1 AS INT) AS m_score,
        |  CAST((rr - 1) * 5 // nu + 1 AS VARCHAR)
        |    || CAST((rf - 1) * 5 // nu + 1 AS VARCHAR)
        |    || CAST((rm - 1) * 5 // nu + 1 AS VARCHAR) AS segment
        |FROM r, n ORDER BY user_id""".stripMargin,
    // Cumulative A/B counts over the value grid in exact integers; HUGEINT
    // window sums cast to BIGINT at the output boundary (the an_chisq
    // lesson), the one division shared verbatim with the Spark plan.
    "ev_ks_ab" ->
      s"""WITH e AS (
         |  SELECT event_type, CAST(value AS DECIMAL(18,2)) AS v,
         |    CASE WHEN ${Pipeline.bucketSql("user_id")} < 50 THEN 1 ELSE 0 END AS is_a
         |  FROM events
         |), g AS (
         |  SELECT event_type, v, SUM(is_a) AS da, SUM(1 - is_a) AS db
         |  FROM e GROUP BY 1, 2
         |), c AS (
         |  SELECT event_type, v, da, db,
         |    SUM(da) OVER (PARTITION BY event_type ORDER BY v) AS ca,
         |    SUM(db) OVER (PARTITION BY event_type ORDER BY v) AS cb
         |  FROM g
         |), t AS (
         |  SELECT event_type, CAST(SUM(da) AS BIGINT) AS n_a,
         |    CAST(SUM(db) AS BIGINT) AS n_b
         |  FROM g GROUP BY 1
         |)
         |SELECT c.event_type, n_a, n_b,
         |  CAST(MAX(abs(ca * n_b - cb * n_a)) AS BIGINT) AS ks_num,
         |  CAST(MAX(abs(ca * n_b - cb * n_a)) AS DOUBLE)
         |    / CAST(n_a * n_b AS DOUBLE) AS ks_stat
         |FROM c JOIN t ON c.event_type = t.event_type
         |GROUP BY c.event_type, n_a, n_b
         |ORDER BY c.event_type""".stripMargin,
    // The recursion replayed as a recursive CTE in the same scaled
    // integers; argmax with the earliest-hour tie-break.
    "ev_changepoint" ->
      """WITH daily AS (
        |  SELECT event_type,
        |         epoch_us(ts) // 86400000000 AS day,
        |         CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY event_type, day
        |), pre AS (
        |  SELECT event_type, day, cents,
        |    ROW_NUMBER() OVER w AS t,
        |    SUM(cents) OVER w AS s_t,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n,
        |    SUM(cents) OVER (PARTITION BY event_type) AS s_n
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |), d AS (
        |  SELECT event_type, day, t, n, s_t, s_n,
        |    abs(n * s_t - t * s_n) AS absd
        |  FROM pre WHERE t < n
        |), best AS (
        |  SELECT event_type, day, t, n, s_t, s_n, absd,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY absd DESC, day ASC) AS rk
        |  FROM d
        |)
        |SELECT event_type, CAST(n AS BIGINT) AS n_days, day AS split_day,
        |  CAST(absd AS BIGINT) AS dmax_scaled,
        |  CAST(s_t AS DOUBLE) / (t * 100) AS mean_before,
        |  CAST(s_n - s_t AS DOUBLE) / ((n - t) * 100) AS mean_after
        |FROM best WHERE rk = 1 ORDER BY event_type""".stripMargin,
    "ev_cusum" ->
      s"""WITH RECURSIVE h0 AS (
         |  SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS x
         |  FROM events GROUP BY 1, 2
         |), st AS (
         |  SELECT event_type, COUNT(*) AS n_w, SUM(x) AS tot FROM h0 GROUP BY 1
         |), hr AS (
         |  SELECT h0.event_type, hour,
         |    CAST(n_w * x - tot - n_w * $CusumSlack AS BIGINT) AS dev,
         |    ROW_NUMBER() OVER (PARTITION BY h0.event_type ORDER BY hour) AS rn
         |  FROM h0 JOIN st USING (event_type)
         |), c AS (
         |  SELECT event_type, rn, hour, GREATEST(CAST(0 AS BIGINT), dev) AS s
         |  FROM hr WHERE rn = 1
         |  UNION ALL
         |  SELECT hr.event_type, hr.rn, hr.hour,
         |    GREATEST(CAST(0 AS BIGINT), c.s + hr.dev)
         |  FROM c JOIN hr ON hr.event_type = c.event_type AND hr.rn = c.rn + 1
         |), nh AS (
         |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hours FROM hr GROUP BY 1
         |)
         |SELECT c.event_type, n_hours, s AS peak_cusum, hour AS peak_hour
         |FROM c JOIN nh ON c.event_type = nh.event_type
         |QUALIFY ROW_NUMBER() OVER (
         |  PARTITION BY c.event_type ORDER BY s DESC, hour ASC) = 1
         |ORDER BY c.event_type""".stripMargin,
    "ev_winsorize" ->
      """WITH e AS (
        |  SELECT event_type, CAST(value AS DECIMAL(18,2)) AS v FROM events
        |), r AS (
        |  SELECT event_type, v,
        |         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v) AS rn,
        |         COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM e
        |), q AS (
        |  -- p05/p95 pinned to DECIMAL(18,2): DuckDB's SUM otherwise widens
        |  -- and the clip expression below silently promotes to DOUBLE,
        |  -- accumulating FP error the engine's exact DECIMAL sum never has
        |  -- (round-5 driver-gate failure: 94355.48000000019 vs 94355.48).
        |  SELECT event_type, MAX(n) AS n,
        |         CAST(SUM(CASE WHEN rn = (n + 19)//20 THEN v END) AS DECIMAL(18,2)) AS p05,
        |         CAST(SUM(CASE WHEN rn = (19 * n + 19)//20 THEN v END) AS DECIMAL(18,2)) AS p95
        |  FROM r GROUP BY event_type
        |)
        |SELECT e.event_type, MAX(q.n) AS n,
        |       CAST(MAX(q.p05) AS DOUBLE) AS p05,
        |       CAST(MAX(q.p95) AS DOUBLE) AS p95,
        |       CAST(SUM(e.v) AS DOUBLE) AS sum_raw,
        |       CAST(SUM(CAST(least(greatest(e.v, q.p05), q.p95) AS DECIMAL(18,2))) AS DOUBLE)
        |         AS sum_clipped,
        |       CAST(SUM(CASE WHEN e.v < q.p05 OR e.v > q.p95 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_clipped
        |FROM e JOIN q USING (event_type)
        |GROUP BY e.event_type
        |ORDER BY e.event_type""".stripMargin,
    "ev_locf" ->
      """WITH h AS (
        |  SELECT date_trunc('hour', ts) AS window_start, event_type, COUNT(*) AS n_events
        |  FROM events GROUP BY 1, 2
        |), b AS (
        |  SELECT MIN(window_start) AS lo, MAX(window_start) AS hi FROM h
        |), spine AS (
        |  SELECT t.event_type, s.hour
        |  FROM (SELECT DISTINCT event_type FROM h) t
        |  CROSS JOIN (SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM b) s
        |)
        |SELECT spine.event_type, spine.hour,
        |       h.n_events IS NOT NULL AS observed,
        |       COALESCE(last_value(h.n_events IGNORE NULLS) OVER (
        |         PARTITION BY spine.event_type ORDER BY spine.hour
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS imputed
        |FROM spine LEFT JOIN h
        |  ON spine.event_type = h.event_type AND spine.hour = h.window_start
        |ORDER BY spine.event_type, spine.hour""".stripMargin,
    // Stationary twin: the lag-window counting CTE, then MarkovIters
    // unrolled π' = πP rounds with the identical (π·cnt)/r tree and
    // DECIMAL(38,18)-exact contribution sums (built programmatically like
    // the ss_pagerank oracle).
    "ev_markov_stationary" -> {
      val rounds = (1 to MarkovIters).map { i =>
        s"""p$i AS (
           |  SELECT cm.next_type AS event_type,
           |    CAST(SUM(CAST((p.pi * CAST(cm.cnt AS DOUBLE)) / CAST(rw.r AS DOUBLE)
           |                  AS DECIMAL(38,18))) AS DOUBLE) AS pi
           |  FROM cm JOIN rw USING (prev_type)
           |  JOIN p${i - 1} p ON p.event_type = cm.prev_type
           |  GROUP BY cm.next_type
           |)""".stripMargin
      }.mkString(", ")
      s"""WITH t AS (
         |  SELECT user_id, event_type,
         |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
         |  FROM events
         |), cm AS (
         |  SELECT prev_type, event_type AS next_type, COUNT(*) AS cnt
         |  FROM t WHERE prev_type IS NOT NULL GROUP BY 1, 2
         |), rw AS (
         |  SELECT prev_type, SUM(cnt) AS r FROM cm GROUP BY prev_type
         |), kk AS (
         |  SELECT CAST(COUNT(*) AS DOUBLE) AS k FROM rw
         |), p0 AS (
         |  SELECT prev_type AS event_type, 1.0 / k AS pi FROM rw CROSS JOIN kk
         |), $rounds
         |SELECT event_type, pi FROM p$MarkovIters ORDER BY event_type""".stripMargin
    },
    // Kaplan-Meier twin: identical integer day/duration arithmetic, the
    // same qlog quantization, NULL at the S=0 terminal level via the
    // count-vs-count guard.
    "ev_survival" ->
      """WITH ud AS (
        |  SELECT user_id, min(epoch_us(ts) // 86400000000) AS fd,
        |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) // 86400000000 END) AS fp,
        |    max(epoch_us(ts) // 86400000000) AS ld
        |  FROM events GROUP BY user_id
        |), mx AS (SELECT max(ld) AS m FROM ud),
        |life AS (
        |  SELECT CASE WHEN fp IS NOT NULL THEN fp - fd ELSE m - fd END AS dur,
        |    fp IS NULL AS censored
        |  FROM ud CROSS JOIN mx
        |), lev AS (
        |  SELECT dur AS t, COUNT(*) AS n_conv FROM life WHERE NOT censored GROUP BY dur
        |), risk AS (
        |  SELECT lev.t, lev.n_conv, COUNT(*) AS n_risk
        |  FROM life JOIN lev ON life.dur >= lev.t GROUP BY lev.t, lev.n_conv
        |), term AS (
        |  SELECT t, n_risk, n_conv,
        |    CASE WHEN n_risk > n_conv THEN
        |      CAST(round(1000000 * ln(n_risk - n_conv)) AS BIGINT) -
        |      CAST(round(1000000 * ln(n_risk)) AS BIGINT) END AS term_q
        |  FROM risk
        |)
        |SELECT a.t AS dur, a.n_risk, a.n_conv,
        |  CASE WHEN COUNT(*) = COUNT(b.term_q) THEN CAST(SUM(b.term_q) AS BIGINT) END AS km_log_q,
        |  CAST(CASE WHEN COUNT(*) = COUNT(b.term_q) THEN CAST(SUM(b.term_q) AS BIGINT) END
        |       AS DOUBLE) / 1000000.0 AS km_ln
        |FROM term a JOIN term b ON b.t <= a.t
        |GROUP BY a.t, a.n_risk, a.n_conv ORDER BY dur""".stripMargin,
    // Attribution twin: the identical RANGE window over CASE-guarded row
    // structs; ft/lt[3] is the struct's event_type field.
    "ev_attribution" ->
      s"""WITH ev AS (
         |  SELECT user_id, epoch_us(ts) AS tsu, event_id, event_type,
         |    event_type <> 'purchase' AS is_touch
         |  FROM events
         |), fr AS (
         |  SELECT event_type,
         |    max(CASE WHEN is_touch THEN (tsu, event_id, event_type) END) OVER w AS lt,
         |    min(CASE WHEN is_touch THEN (tsu, event_id, event_type) END) OVER w AS ft
         |  FROM ev
         |  WINDOW w AS (PARTITION BY user_id ORDER BY tsu
         |               RANGE BETWEEN $AttribWindowMicros PRECEDING AND CURRENT ROW)
         |), p AS (
         |  SELECT lt, ft FROM fr WHERE event_type = 'purchase'
         |)
         |SELECT model, touch_type, COUNT(*) AS n_purchases FROM (
         |  SELECT 'first' AS model, COALESCE(ft[3], 'none') AS touch_type FROM p
         |  UNION ALL
         |  SELECT 'last', COALESCE(lt[3], 'none') FROM p
         |) GROUP BY model, touch_type ORDER BY model, touch_type""".stripMargin,
    "ev_transitions" ->
      """WITH t AS (
        |  SELECT user_id, event_type,
        |         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events
        |)
        |SELECT prev_type, event_type AS next_type, COUNT(*) AS n
        |FROM t WHERE prev_type IS NOT NULL
        |GROUP BY 1, 2
        |ORDER BY n DESC, prev_type ASC, next_type ASC
        |LIMIT 20""".stripMargin,
    "ev_mad_outliers" ->
      """WITH e AS (
        |  SELECT event_type, CAST(value AS DECIMAL(18,2)) AS v FROM events
        |), r AS (
        |  SELECT event_type, v,
        |         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v) AS rn,
        |         COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM e
        |), m AS (
        |  SELECT event_type, MAX(n) AS n,
        |         SUM(CASE WHEN rn = (n+1)//2 THEN v ELSE CAST(0 AS DECIMAL(18,2)) END) +
        |         SUM(CASE WHEN rn = (n+2)//2 THEN v ELSE CAST(0 AS DECIMAL(18,2)) END) AS med2
        |  FROM r GROUP BY event_type
        |), d AS (
        |  SELECT e.event_type, abs(e.v * 2 - m.med2) AS dev2
        |  FROM e JOIN m USING (event_type)
        |), r2 AS (
        |  SELECT event_type, dev2,
        |         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dev2) AS rn,
        |         COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM d
        |), mm AS (
        |  SELECT event_type,
        |         SUM(CASE WHEN rn = (n+1)//2 THEN dev2 ELSE 0 END) +
        |         SUM(CASE WHEN rn = (n+2)//2 THEN dev2 ELSE 0 END) AS mad4
        |  FROM r2 GROUP BY event_type
        |), o AS (
        |  SELECT d.event_type, COUNT(*) AS n_out
        |  FROM d JOIN mm USING (event_type)
        |  WHERE d.dev2 * 2 > mm.mad4 * 3
        |  GROUP BY d.event_type
        |)
        |SELECT m.event_type, m.n,
        |       CAST(med2 AS DOUBLE) / 2 AS median_value,
        |       CAST(mad4 AS DOUBLE) / 4 AS mad,
        |       COALESCE(o.n_out, 0) AS n_outliers
        |FROM m JOIN mm USING (event_type) LEFT JOIN o USING (event_type)
        |ORDER BY m.event_type""".stripMargin,
    "ev_sessions" -> sessionsSql,
    "ev_sessions_typed" -> sessionsSql,
    "ev_sessions_native" -> sessionsSql,
    "ev_enriched" ->
      """SELECT c_mktsegment, event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment, event_type
        |ORDER BY c_mktsegment, event_type""".stripMargin,
    // epoch_us truncates TIMESTAMP_NS to the same micro precision Spark's
    // timestamps carry (the corpus has no sub-microsecond components —
    // verified — so this is an identity, kept for robustness).
    "ev_error_click_pairs" ->
      """SELECT e.event_id AS error_id, c.event_id AS click_id, e.user_id
        |FROM events e JOIN events c
        |  ON e.user_id = c.user_id
        |  AND e.event_type = 'error' AND c.event_type = 'click'
        |  AND epoch_us(c.ts) >= epoch_us(e.ts)
        |  AND epoch_us(c.ts) <= epoch_us(e.ts) + 300000000
        |ORDER BY error_id, click_id""".stripMargin,
    "ev_window_sliding" ->
      """SELECT window_start, event_type, COUNT(*) AS n_events
        |FROM (
        |  SELECT ts, event_type, time_bucket(INTERVAL '30 minutes', ts) AS s0 FROM events
        |), LATERAL (SELECT UNNEST([s0, s0 - INTERVAL '30 minutes']) AS window_start)
        |GROUP BY window_start, event_type ORDER BY window_start, event_type""".stripMargin,
    "ev_error_click_outer" ->
      """SELECT e.event_id AS error_id, COALESCE(c.event_id, -1) AS click_id, e.user_id
        |FROM events e LEFT JOIN events c
        |  ON e.user_id = c.user_id
        |  AND c.event_type = 'click'
        |  AND epoch_us(c.ts) >= epoch_us(e.ts)
        |  AND epoch_us(c.ts) <= epoch_us(e.ts) + 300000000
        |WHERE e.event_type = 'error'
        |ORDER BY error_id, click_id""".stripMargin,
    "ev_funnel" ->
      """WITH v AS (
        |  SELECT user_id, MIN(ts) AS v_ts FROM events WHERE event_type = 'view' GROUP BY user_id
        |), c AS (
        |  SELECT e.user_id, MIN(e.ts) AS c_ts
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.v_ts GROUP BY e.user_id
        |), p AS (
        |  SELECT e.user_id, MIN(e.ts) AS p_ts
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts GROUP BY e.user_id
        |)
        |SELECT '1_view' AS stage, COUNT(*) AS n_users FROM v
        |UNION ALL SELECT '2_click', COUNT(*) FROM c
        |UNION ALL SELECT '3_purchase', COUNT(*) FROM p
        |ORDER BY stage""".stripMargin,
    // The existential-chain truth the linear DP must equal: a user reaches
    // stage k iff SOME chain of step events satisfies every pairwise
    // window — the brute-force join over all candidate chains.
    "ev_funnel_windowed" ->
      s"""WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
         |c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
         |p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
         |s1 AS (SELECT DISTINCT user_id FROM v),
         |s2 AS (
         |  SELECT DISTINCT c.user_id FROM c JOIN v ON c.user_id = v.user_id
         |    AND c.ts > v.ts AND epoch_us(c.ts) - epoch_us(v.ts) <= $FunnelWindowMicros
         |),
         |s3 AS (
         |  SELECT DISTINCT p.user_id FROM p
         |  JOIN c ON p.user_id = c.user_id
         |    AND p.ts > c.ts AND epoch_us(p.ts) - epoch_us(c.ts) <= $FunnelWindowMicros
         |  JOIN v ON c.user_id = v.user_id
         |    AND c.ts > v.ts AND epoch_us(c.ts) - epoch_us(v.ts) <= $FunnelWindowMicros
         |)
         |SELECT '1_view' AS stage, COUNT(*) AS n_users FROM s1
         |UNION ALL SELECT '2_click', COUNT(*) FROM s2
         |UNION ALL SELECT '3_purchase', COUNT(*) FROM s3
         |ORDER BY stage""".stripMargin,
    // Forward-contribution twin: each activity fact feeds the 7 windows
    // that observe it; inner join restricts to observed days.
    "ev_stickiness" ->
      """WITH a AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        |), dau AS (
        |  SELECT day, COUNT(*) AS dau FROM a GROUP BY day
        |), wx AS (
        |  SELECT DISTINCT user_id, day + CAST(i AS INT) AS day
        |  FROM a, (SELECT UNNEST(range(0, 7)) AS i)
        |), wau AS (
        |  SELECT day, COUNT(*) AS wau FROM wx GROUP BY day
        |)
        |SELECT CAST(dau.day AS TIMESTAMP) AS day, dau, wau,
        |  CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE) AS stickiness
        |FROM dau JOIN wau ON dau.day = wau.day
        |ORDER BY day""".stripMargin,
    // Naive global running-sum twin: the hash-match proves the month-stitch
    // IS the ordered cumulative.
    "ev_user_growth" ->
      """WITH f AS (
        |  SELECT user_id, MIN(CAST(ts AS DATE)) AS day FROM events GROUP BY user_id
        |), d AS (
        |  SELECT day, COUNT(*) AS n_new FROM f GROUP BY day
        |)
        |SELECT CAST(day AS TIMESTAMP) AS day, n_new,
        |  CAST(SUM(n_new) OVER (ORDER BY day) AS BIGINT) AS n_cum_users
        |FROM d ORDER BY day""".stripMargin,
    "ev_retention" ->
      """WITH cohort AS (
        |  SELECT user_id,
        |    MIN(CAST(FLOOR(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) / 7) AS INT)) AS cohort_week
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id
        |), active AS (
        |  SELECT DISTINCT user_id,
        |    CAST(FLOOR(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) / 7) AS INT) AS week
        |  FROM events
        |)
        |SELECT cohort_week, week - cohort_week AS week_offset,
        |  COUNT(DISTINCT a.user_id) AS n_active
        |FROM cohort c JOIN active a ON c.user_id = a.user_id
        |WHERE week >= cohort_week
        |GROUP BY cohort_week, week_offset
        |ORDER BY cohort_week, week_offset""".stripMargin,
    "ev_cohort_ltv" ->
      """WITH cohort AS (
        |  SELECT user_id,
        |    MIN(CAST(FLOOR(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) / 7) AS INT)) AS cohort_week
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id
        |), acts AS (
        |  SELECT user_id,
        |    CAST(FLOOR(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) / 7) AS INT) AS week,
        |    CASE WHEN event_type = 'purchase'
        |         THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) ELSE 0 END AS cents
        |  FROM events
        |)
        |SELECT cohort_week, week - cohort_week AS week_offset,
        |  COUNT(DISTINCT a.user_id) AS n_active,
        |  CAST(SUM(cents) AS BIGINT) AS purchase_cents
        |FROM cohort c JOIN acts a ON c.user_id = a.user_id
        |WHERE week >= cohort_week
        |GROUP BY cohort_week, week_offset
        |ORDER BY cohort_week, week_offset""".stripMargin
  )
}
