package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Second tranche of relational coverage (SURVEY.md §2.2 completeness):
  * range window frames, explicit GROUPING SETS, moment statistics computed
  * deterministically, exact percentiles, approximate distinct counting, and
  * the reference's UDF execution path surfaced as an oracle-checked query.
  */
object Relational2 {
  import Relational.{dec, dsum, parallelizeNarrowScan, t}

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // RANGE frame: for each order, revenue of all orders of the same customer
    // within ±30 days (value-based frame, not row-based).
    "q20_window_range_frame" -> { (s, dir) =>
      val day = 86400L
      val w = Window
        .partitionBy("o_custkey")
        .orderBy(col("o_epoch"))
        .rangeBetween(-30 * day, 30 * day)
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          col("o_custkey"),
          // o_orderdate is TIMESTAMP_NTZ in parquet; cast to session-tz (UTC)
          // timestamp for unix_micros. Integer DIV, not double divide+cast:
          // double division rounds before the cast truncates, which would
          // shift RANGE-frame membership for non-midnight timestamps (the
          // same micros-precision rationale as sources/Tables.scala).
          expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 1000000").as("o_epoch"),
          col("o_totalprice")
        )
        .select(
          col("o_orderkey"),
          col("o_custkey"),
          sum(dec(col("o_totalprice"))).over(w).cast("double").as("nearby_revenue"),
          count(lit(1)).over(w).as("nearby_orders")
        )
        .orderBy("o_orderkey")
    },

    // Explicit GROUPING SETS (finer than rollup/cube): by nation, by status,
    // and grand total — via the SQL path like q12.
    "q21_grouping_sets" -> { (s, dir) =>
      t(s, dir, "orders").createOrReplaceTempView("q21_orders")
      t(s, dir, "customer").createOrReplaceTempView("q21_customer")
      t(s, dir, "nation").createOrReplaceTempView("q21_nation")
      s.sql(
        """SELECT COALESCE(n_name, 'ALL') AS nation, COALESCE(o_orderstatus, 'ALL') AS status,
          |  COUNT(*) AS n_orders,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          |FROM q21_orders JOIN q21_customer ON o_custkey = c_custkey
          |  JOIN q21_nation ON c_nationkey = n_nationkey
          |GROUP BY GROUPING SETS ((n_name), (o_orderstatus), ())
          |ORDER BY nation, status""".stripMargin
      )
    },

    // Variance / stddev via explicit decimal moments: the built-in Welford
    // merge is float-order-dependent (nondeterministic across partitionings),
    // so both engines compute (Σx² − (Σx)²/n)/(n−1) from exact decimal sums.
    "q22_variance_stats" -> { (s, dir) =>
      val sx = sum(dec(col("l_quantity"))).cast("double")
      val sxx = sum(dec(col("l_quantity")) * dec(col("l_quantity"))).cast("double")
      val n = count(lit(1)).cast("double")
      // Decimal moment sums are the compute-heavy map side — see
      // Relational.parallelizeNarrowScan (no-op at scale).
      parallelizeNarrowScan(
        t(s, dir, "lineitem").select(col("l_returnflag"), col("l_quantity")))
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n_items"),
          (sx / n).as("mean_qty"),
          ((sxx - sx * sx / n) / (n - 1)).as("var_qty"),
          sqrt((sxx - sx * sx / n) / (n - 1)).as("std_qty")
        )
        .orderBy("l_returnflag")
    },

    // Correlation / covariance from exact decimal moments (same rationale as
    // q22: the built-in corr/covar merge is float-order-dependent, so both
    // engines combine exact decimal sums in one fixed double expression).
    "q35_corr_stats" -> { (s, dir) =>
      val x = dec(col("l_quantity"))
      val y = dec(col("l_extendedprice"))
      val n = count(lit(1)).cast("double")
      val sx = sum(x).cast("double")
      val sy = sum(y).cast("double")
      val sxy = sum(x * y).cast("double")
      val sxx = sum(x * x).cast("double")
      val syy = sum(y * y).cast("double")
      // Five decimal moment sums per group — see parallelizeNarrowScan.
      parallelizeNarrowScan(
        t(s, dir, "lineitem").select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice")))
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n_items"),
          ((sxy - sx * sy / n) / (n - 1)).as("cov_qty_price"),
          ((n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)))
            .as("corr_qty_price"))
        .orderBy("l_returnflag")
    },

    // Exact percentiles over integral-valued doubles with power-of-two
    // fractions: the linear interpolation is exact in both engines.
    "q23_percentiles" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_linestatus")
        .agg(
          expr("percentile(l_quantity, 0.25)").as("p25_qty"),
          expr("percentile(l_quantity, 0.5)").as("p50_qty"),
          expr("percentile(l_quantity, 0.75)").as("p75_qty"),
          count(lit(1)).as("n_items")
        )
        .orderBy("l_linestatus")
    },

    // Approximate distinct (HLL++) ON the hash gate: sketch internals have
    // no cross-engine twin, but the sketch's CONTRACT does — the engine
    // computes estimate AND exact in one plan and emits (exact,
    // within_bound); the oracle computes the exact value with a literal
    // TRUE, so a hash match proves the estimate met its documented error
    // bound (default rsd 5%, 3× slack for small cardinalities — the
    // RelationalSpec bound, now driver-checked). The sketch and exact
    // aggregates run as two separate one-row frames cross-joined (mixing
    // approx with exact countDistinct in one agg forced an Expand ×2
    // multi-distinct plan).
    "q24_approx_distinct" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val approx = li.agg(
        approx_count_distinct(col("l_partkey")).as("ap"),
        approx_count_distinct(col("l_orderkey")).as("ao"))
      val exact = li.agg(
        countDistinct(col("l_partkey")).as("exact_parts"),
        countDistinct(col("l_orderkey")).as("exact_orders"))
      exact.crossJoin(broadcast(approx)) // bounded: one row (sketch frame)
        .select(col("exact_parts"), col("exact_orders"),
          (abs(col("ap") - col("exact_parts")) <= col("exact_parts") * lit(0.15) &&
            abs(col("ao") - col("exact_orders")) <= col("exact_orders") * lit(0.15))
            .as("within_bound"))
    },

    // Exact twin of q24: oracle-checked countDistinct over the same columns.
    "q24_exact_distinct" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .agg(
          countDistinct(col("l_partkey")).as("exact_parts"),
          countDistinct(col("l_orderkey")).as("exact_orders")
        )
    },

    // Approximate percentiles (the KLL/GK quantile-sketch tier, partial-
    // aggregable like HLL) ON the hash gate via the q24 contract shape:
    // sketch and exact percentiles computed in ONE aggregate pass, output
    // is (exact quantiles, within_bound) where the bound is the
    // RelationalSpec one — accuracy 1000 caps rank error at n/1000, which
    // on this integer-valued column keeps every estimate within one value
    // of the true quantile. The oracle computes the exact quantiles with a
    // literal TRUE, so the hash match drives the sketch's error contract
    // through the gate.
    "q36_approx_quantiles" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_linestatus")
        .agg(
          expr("percentile(l_quantity, 0.25)").as("p25_qty"),
          expr("percentile(l_quantity, 0.5)").as("p50_qty"),
          expr("percentile(l_quantity, 0.75)").as("p75_qty"),
          expr("approx_percentile(l_quantity, 0.25, 1000)").as("ap25"),
          expr("approx_percentile(l_quantity, 0.5, 1000)").as("ap50"),
          expr("approx_percentile(l_quantity, 0.75, 1000)").as("ap75"),
          count(lit(1)).as("n_items")
        )
        .select(col("l_linestatus"), col("p25_qty"), col("p50_qty"), col("p75_qty"),
          col("n_items"),
          (abs(col("ap25") - col("p25_qty")) <= lit(1.0) &&
            abs(col("ap50") - col("p50_qty")) <= lit(1.0) &&
            abs(col("ap75") - col("p75_qty")) <= lit(1.0)).as("within_bound"))
        .orderBy("l_linestatus")
    },

    // Remaining window-function families (ntile / percent_rank / lead /
    // first_value) + math scalars in one pass over suppliers' lineitems.
    // percent_rank = (rank-1)/(n-1): integer division, exact in both engines.
    "q25_window_misc" -> { (s, dir) =>
      val w = Window.partitionBy("l_suppkey").orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      t(s, dir, "lineitem")
        .filter(col("l_suppkey") <= 5)
        .select(
          col("l_suppkey"),
          col("l_orderkey"),
          col("l_linenumber"),
          ntile(4).over(w).as("price_quartile"),
          percent_rank().over(w).as("price_pct_rank"),
          lead(col("l_orderkey"), 1).over(w).as("next_orderkey"),
          first_value(col("l_orderkey")).over(w).as("cheapest_orderkey"),
          abs(col("l_discount") - 0.05).as("disc_dist"),
          floor(col("l_extendedprice") / 1000).cast("long").as("price_k"),
          pmod(col("l_orderkey"), lit(7L)).as("okmod7")
        )
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    },

    // Correlated scalar subquery: orders priced above their own customer's
    // average (vs q18's global average). DataFrame form: window-computed
    // per-customer mean; oracle form: a correlated subquery — two different
    // evaluation strategies, one semantic.
    "q26_above_customer_avg" -> { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
      t(s, dir, "orders")
        .withColumn("cust_avg", sum(dec(col("o_totalprice"))).over(w).cast("double") / count(lit(1)).over(w))
        .filter(col("o_totalprice") > col("cust_avg"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
        .orderBy("o_orderstatus")
    },

    // Bag-semantics set operations (INTERSECT ALL / EXCEPT ALL): an element
    // with multiplicities m and n appears min(m,n) resp. max(0, m−n) times —
    // genuinely different operators from q14's set-semantics tier. Tagged,
    // unioned, and aggregated to multiplicity counts for a scalar result.
    "q34_setops_all" -> { (s, dir) =>
      val a = t(s, dir, "orders")
        .filter(col("o_orderstatus") === "F").select("o_orderpriority")
      val b = t(s, dir, "orders")
        .filter(year(col("o_orderdate")) >= 1998).select("o_orderpriority")
      a.intersectAll(b).withColumn("op", lit("intersect_all"))
        .union(a.exceptAll(b).withColumn("op", lit("except_all")))
        .groupBy("op", "o_orderpriority")
        .agg(count(lit(1)).as("n_rows"))
        .orderBy("op", "o_orderpriority")
    },

    // Array aggregation (collect_set + sort_array + array_join): the list is
    // sorted then joined to a string so the cross-engine comparison stays on
    // scalar columns. Deterministic: set semantics + total sort order.
    "q32_array_agg" -> { (s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n_orders"),
          concat_ws(",", sort_array(collect_set(col("o_orderstatus")))).as("statuses"))
        .orderBy("o_orderpriority")
    },

    // PIVOT: revenue by priority × order year, with the pivot values pinned
    // (scale posture: explicit values skip the extra distinct-scan job Spark
    // otherwise runs to discover them, and fix the output schema).
    "q30_pivot_sales" -> { (s, dir) =>
      t(s, dir, "orders")
        .select(
          col("o_orderpriority"),
          year(col("o_orderdate")).as("o_year"),
          col("o_totalprice"))
        .groupBy("o_orderpriority")
        .pivot("o_year", PivotYears)
        .agg(dsum(col("o_totalprice")))
        .orderBy("o_orderpriority")
    },

    // UNPIVOT (melt): wide per-returnflag aggregates back to long
    // (metric, value) form — the inverse reshaping operator.
    "q31_unpivot_metrics" -> { (s, dir) =>
      // Three decimal sums per group — see parallelizeNarrowScan.
      parallelizeNarrowScan(
        t(s, dir, "lineitem")
          .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"), col("l_discount")))
        .groupBy("l_returnflag")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base"),
          dsum(col("l_discount")).as("sum_disc"))
        .unpivot(
          Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_base"), col("sum_disc")),
          "metric",
          "value")
        .orderBy("l_returnflag", "metric")
    },

    // Exact top-3 parts per brand by revenue via the native bounded-heap
    // aggregate ([[graft.functions.TopKRows]]): partial aggregation shrinks
    // every map task's share of a brand to ≤3 entries BEFORE the exchange,
    // so the shuffle carries O(brands × k) rows instead of every
    // (brand, part) revenue row the `row_number()` window form (q8) ships
    // and sorts. Oracle ranks identically (`ord DESC, payload-string ASC`).
    "q37_topk_pergroup" -> { (s, dir) =>
      parallelizeNarrowScan(
        t(s, dir, "lineitem").select(col("l_partkey"), col("l_extendedprice"), col("l_discount")))
        .join(
          broadcast(t(s, dir, "part").select(col("p_partkey"), col("p_brand"))), // bounded: part dimension (star-join build side)
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_partkey")
        .agg(
          sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
            .cast("double").as("revenue"))
        .groupBy("p_brand")
        .agg(graft.functions.TopKRows(3, col("revenue"), col("p_partkey").cast("string")).as("top"))
        .select(col("p_brand"), posexplode(col("top")))
        .select(
          col("p_brand"),
          (col("pos") + 1).cast("int").as("rank"),
          col("col.payload").cast("long").as("p_partkey"),
          col("col.ord").as("revenue"))
        .orderBy("p_brand", "rank")
    },

    // Recursive CTE (Spark 4.1 `WITH RECURSIVE`): generate the 1995-2001
    // month spine declaratively and LEFT JOIN the monthly order aggregates
    // onto it, zero-filling months with no orders — the calendar-dimension
    // gap-fill every reporting warehouse runs, and a q16 (orders by month)
    // that CANNOT silently drop empty months. The recursion is acyclic
    // (date strictly increases to a bound), the engine-supported shape;
    // cyclic closures (dd_clusters) stay on the iterative operators.
    "q40_month_spine" -> { (s, dir) =>
      t(s, dir, "orders").createOrReplaceTempView("graft_spine_orders")
      s.sql("""
        WITH RECURSIVE months(d) AS (
          SELECT DATE '1995-01-01' AS d
          UNION ALL SELECT d + INTERVAL '1' MONTH FROM months WHERE d < DATE '2001-12-01'
        ),
        m AS (SELECT CAST(YEAR(d) AS INT) AS yr, CAST(MONTH(d) AS INT) AS mo FROM months),
        o AS (
          SELECT CAST(YEAR(o_orderdate) AS INT) AS yr, CAST(MONTH(o_orderdate) AS INT) AS mo,
            COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS t
          FROM graft_spine_orders GROUP BY 1, 2
        )
        SELECT m.yr, m.mo,
          CAST(COALESCE(o.n, 0) AS BIGINT) AS n_orders,
          CAST(COALESCE(o.t, 0.0) AS DOUBLE) AS total
        FROM m LEFT JOIN o ON m.yr = o.yr AND m.mo = o.mo
        ORDER BY m.yr, m.mo""")
    },

    // The WINDOW-form top-k a user would naturally write — which the
    // engine's injected optimizer rule ([[graft.plans.TopKRewrite]])
    // rewrites into the q37-style bounded-heap aggregate automatically:
    // same ROW_NUMBER() oracle, no Window node in the optimized plan
    // (asserted in PlanAuditSpec). The coalesce wrappers pin ord/tie
    // non-nullable — the provable-equivalence precondition the rule checks.
    "q38_topk_rewrite" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val spend = t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("c_name"))
        .agg(coalesce(sum(dec(col("o_totalprice"))).cast("double"), lit(0.0)).as("total_spend"))
        .select(
          col("c_mktsegment"),
          col("total_spend"),
          coalesce(col("c_name"), lit("")).as("c_name"))
      spend
        .withColumn("rn", row_number().over(
          Window.partitionBy("c_mktsegment")
            .orderBy(col("total_spend").desc, col("c_name").asc)))
        .filter(col("rn") <= 3)
        .orderBy("c_mktsegment", "rn")
    },

    // Ratio-to-report: each nation's share of its region's revenue — the
    // percent-of-total reporting idiom. The share divides two EXACT decimal
    // sums (nation-level aggregate, then a windowed region total over the
    // ~25 aggregated rows — the window runs over the rollup, never the fact
    // table), so the double division is deterministic cross-engine.
    "q44_revenue_share" -> { (s, dir) =>
      val w = Window.partitionBy("r_name")
      val byNation = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey")) // bounded: nation dimension (25 rows)
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey")) // bounded: region dimension (5 rows)
        .groupBy("r_name", "n_name")
        .agg(sum(dec(col("l_extendedprice"))).as("rev_dec"))
      byNation
        .select(col("r_name"), col("n_name"),
          col("rev_dec").cast("double").as("revenue"),
          (col("rev_dec").cast("double") / sum(col("rev_dec")).over(w).cast("double"))
            .as("region_share"))
        .orderBy("r_name", "n_name")
    },

    // Fixed-width histogram: the profiling primitive behind every numeric
    // column summary. Bucket ids are integer floor-division — a narrow map
    // — and the per-bucket stats are algebraic, so the whole histogram is
    // one partial-aggregated pass at scan speed; empty buckets are absent
    // by construction (sparse form). Exact bucket edges (integer division
    // of decimal-cast cents) keep both engines bit-identical.
    "q43_price_histogram" -> { (s, dir) =>
      val bucketWidth = 50000L
      t(s, dir, "orders")
        .select((floor(dec(col("o_totalprice")) / lit(bucketWidth)).cast("long")).as("bucket"),
          col("o_totalprice"))
        .groupBy("bucket")
        .agg(
          count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("total"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"))
        .orderBy("bucket")
    },

    // Aggregate navigation: the user-shaped grouped aggregate over the BASE
    // table, with a materialized view registered for (lang, source) partials
    // — the engine's MatViewReroute rule proves the substitution and the
    // plan reads the view (GBs at scale) instead of the base (TBs), rolling
    // the source dimension up from the stored partials. The oracle
    // recomputes from the base `documents` table, so the gate hash-match is
    // end-to-end evidence the reroute is semantically invisible. Plan
    // substitution + decline guards are asserted in MatViewsSpec.
    "mv_agg_reroute" -> { (s, dir) =>
      val base = Connectors.tmp("documents_mvbase")
      t(s, dir, "documents").write.mode("overwrite").parquet(base)
      val mv = Connectors.tmp("documents_mv")
      graft.plans.MatViews.buildAndRegister(s, base, mv, Seq("lang", "source"), Seq("n_chars"))
      s.read.parquet(base)
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"))
        .orderBy("lang")
    },

    // Incremental view maintenance: an append batch lands in the base table
    // and FOLDS into the materialized view (partials are mergeable — that is
    // why the view stores partials, not finals), so refresh cost is
    // O(batch) + O(view), independent of base size. The user query then
    // reroutes to the refreshed view; the oracle recomputes from the FULL
    // base, so the gate hash-match proves merged-increment == recompute.
    // The version flip (v1 → v2 path) never overwrites the view being read.
    "mv_incremental_refresh" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val base = Connectors.tmp("documents_mvincr_base")
      docs.filter(col("doc_id") < 400).write.mode("overwrite").parquet(base)
      val mv1 = Connectors.tmp("documents_mvincr_v1")
      graft.plans.MatViews.buildAndRegister(s, base, mv1, Seq("lang", "source"), Seq("n_chars"))
      val batch = docs.filter(col("doc_id") >= 400)
      batch.write.mode("append").parquet(base)
      val mv2 = Connectors.tmp("documents_mvincr_v2")
      graft.plans.MatViews.refreshAppend(s, base, batch, mv2)
      s.read.parquet(base)
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"))
        .orderBy("lang")
    },

    // Incremental JOIN-view maintenance ([[graft.plans.JoinViews]] — the
    // delta-join sibling of mv_incremental_refresh): the stored
    // orders ⋈ customer view absorbs an append batch on BOTH sides via
    // the bilinear delta rule (ΔA⋈B₀ ∪ A₀⋈ΔB ∪ ΔA⋈ΔB appended; the
    // stored A₀⋈B₀ never re-runs), and the gate query aggregates FROM THE
    // VIEW parquet. The oracle recomputes the full join from the base
    // tables, so the hash match proves build + three-delta refresh equals
    // the monolithic join — nothing lost at either delta boundary, no row
    // double-joined. Money in exact cents.
    "mv_join_incremental" -> { (s, dir) =>
      val cents = col("o_totalprice").cast(DecimalType(18, 2))
        .multiply(lit(100)).cast("long").as("cents")
      val orders = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"), cents)
      val cust = t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
      val a0 = orders.filter(pmod(col("o_orderkey"), lit(3L)) =!= 0)
      val da = orders.filter(pmod(col("o_orderkey"), lit(3L)) === 0)
      val b0 = cust.filter(pmod(col("c_custkey"), lit(2L)) === 0)
      val db = cust.filter(pmod(col("c_custkey"), lit(2L)) =!= 0)
      val view = Connectors.tmp("orders_cust_jv")
      graft.plans.JoinViews.build(a0, b0, "o_custkey", "c_custkey", view)
      graft.plans.JoinViews.refreshAppend(a0, da, b0, db, "o_custkey", "c_custkey", view)
      s.read.parquet(view)
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("total_cents"))
        .orderBy("c_nationkey")
    },

    // Six-table star-schema join (TPC-H Q5 shape): regional revenue where
    // the customer's and the supplier's nation COINCIDE — the classic
    // optimizer workout. Plan discipline for 100 TB: the region filter
    // reduces nation to a ~5-row broadcast BEFORE any fact is touched; the
    // date filter is pushed into the orders scan; the fact stream then
    // re-shuffles once per join key as it shrinks (lineitem⋈orders on
    // orderkey → ⋈customer on custkey → ⋈supplier on suppkey with the
    // same-nation predicate inside the join condition, never a post-filter
    // over a wider join). Dims broadcast, facts sort-merge — Catalyst + AQE
    // pick per-side strategies from real sizes at runtime.
    "q41_regional_revenue" -> { (s, dir) =>
      val nation = broadcast( // bounded: nation dimension (25 rows)
        t(s, dir, "nation")
          .join(broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA")), // bounded: region dimension (5 rows)
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name")))
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val li = t(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      val cust = t(s, dir, "customer")
        .join(nation, col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
      val sup = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .groupBy("n_name")
        .agg(
          sum(dec(col("l_extendedprice")) *
            (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("n_name").asc)
    },

    // Correlated scalar subqueries (the decorrelation tier): orders whose
    // price exceeds their own customer's average order price. Written as TWO
    // correlated aggregates over the same group (count and sum) so Catalyst
    // exercises both RewriteCorrelatedScalarSubquery (each per-row subquery
    // becomes an aggregate + left join on the correlation key — the plan has
    // joins, never a per-row re-execution) and MergeScalarSubqueries (both
    // aggregates collapse into ONE pass over orders). The comparison is the
    // division-free form price × count > sum — DECIMAL-exact in both
    // engines, so no avg() precision knife-edge can flip a row.
    "q45_corr_subquery" -> { (s, dir) =>
      t(s, dir, "orders").createOrReplaceTempView("q45_orders")
      s.sql(
        """SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS price
          |FROM q45_orders o
          |WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
          |    (SELECT COUNT(*) FROM q45_orders o2 WHERE o2.o_custkey = o.o_custkey)
          |  > (SELECT SUM(CAST(o2.o_totalprice AS DECIMAL(18,2)))
          |     FROM q45_orders o2 WHERE o2.o_custkey = o.o_custkey)
          |ORDER BY o_orderkey""".stripMargin)
    },

    // LATERAL join (correlated derived table with ORDER BY + LIMIT): the two
    // busiest nations per region. The correlation predicate is an EQUALITY on
    // r_regionkey, so decorrelation plans a hash join plus a per-region
    // bounded rank — never a nested-loop re-execution of the subquery per
    // outer row (no CartesianProduct; covered by PlanAuditSpec's blanket
    // assertion). Deterministic: the LIMIT is tie-broken by n_name.
    "q46_lateral_topn" -> { (s, dir) =>
      t(s, dir, "region").createOrReplaceTempView("q46_region")
      t(s, dir, "nation").createOrReplaceTempView("q46_nation")
      t(s, dir, "customer").createOrReplaceTempView("q46_customer")
      s.sql(
        """SELECT r_name, l.n_name, l.n_cust
          |FROM q46_region r,
          |LATERAL (
          |  SELECT n_name, COUNT(*) AS n_cust
          |  FROM q46_nation JOIN q46_customer ON c_nationkey = n_nationkey
          |  WHERE n_regionkey = r.r_regionkey
          |  GROUP BY n_name ORDER BY n_cust DESC, n_name LIMIT 2
          |) l
          |ORDER BY r_name, n_cust DESC, n_name""".stripMargin)
    },

    // NOT IN with a NULLABLE subquery column — the null-aware anti join.
    // Three-valued logic makes `x NOT IN S` never-true when S contains a
    // NULL, so the planner cannot use a plain anti join keyed on equality:
    // it must also check the build side for nulls (Spark's
    // BroadcastHashJoin ... isNullAware=true, asserted in PlanAuditSpec).
    // The NULLIF wraps a sentinel no order matches, so the OUTPUT equals the
    // plain anti join's — but the plan must still be null-aware because the
    // planner cannot prove NULLIF never fires. Scale: single-key NAAJ
    // broadcasts the subquery side; the probe is one narrow pass, no
    // shuffle of the big side.
    "q47_notin_nullaware" -> { (s, dir) =>
      t(s, dir, "customer").createOrReplaceTempView("q47_customer")
      t(s, dir, "orders").createOrReplaceTempView("q47_orders")
      s.sql(
        """SELECT c_custkey, c_name
          |FROM q47_customer
          |WHERE c_custkey NOT IN (
          |  SELECT NULLIF(o_custkey, -1) FROM q47_orders WHERE o_orderstatus = 'F'
          |)
          |ORDER BY c_custkey""".stripMargin)
    },

    // Value-based RANGE window frames: per customer, each order's trailing
    // 30-day order count and exact DECIMAL spend — the rolling-lookback
    // feature a churn model reads. RANGE (unlike ROWS) frames are
    // TIE-INSENSITIVE by definition: all peers of the current day are in
    // or out together, so no tie-break column is needed for cross-engine
    // determinism — the complementary contract to ev_rolling_features'
    // ROWS frames. The order key is integer days since epoch (date
    // arithmetic both engines share bit-for-bit); one shuffle on
    // o_custkey feeds the window. The frame is −29..0: a RANGE bound is
    // INCLUSIVE at both ends, so 29 PRECEDING spans exactly the 30
    // distinct day values the column names advertise.
    "q48_range_frame" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val d = org.apache.spark.sql.types.DecimalType(18, 2)
      val day = datediff(col("o_orderdate"), lit("1992-01-01").cast("date"))
      val w = Window.partitionBy("o_custkey").orderBy("day").rangeBetween(-29, 0)
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), day.as("day"),
          col("o_totalprice").cast(d).as("p"))
        .select(col("o_orderkey"), col("o_custkey"),
          count(lit(1)).over(w).as("n_30d"),
          sum(col("p")).over(w).cast("double").as("spend_30d"))
        .orderBy("o_orderkey")
    },

    // PK-FK join ELIMINATION on the gate: the query a BI layer generates
    // against a star schema — it joins `orders` but consumes only lineitem
    // columns, so under the declared RELY constraints (l_orderkey NOT NULL
    // REFERENCES the unique o_orderkey) the join is the identity on
    // lineitem and [[graft.plans.JoinElimination]] removes it: the
    // optimized plan scans ONE table, no join at all (asserted in
    // PlanAuditSpec). The DuckDB oracle RUNS the join — so the hash match
    // simultaneously proves the rewrite sound AND the declared constraints
    // true on the data, which is exactly the contract an unenforced
    // lakehouse constraint needs checked.
    "q49_join_elim" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n_items"),
          Relational.dsum(col("l_quantity")).as("total_qty"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // The PURE-SQL deployment surface on the gate: the engine's native
    // expressions (md5Long, ShingleSet, Fnv64) registered through
    // SparkSessionExtensions and invoked from a plain spark.sql string —
    // exactly what a SQL-only user of the library writes. The oracle
    // re-derives every function from its public cross-engine definition
    // (md5 hex prefix, the shingle CTE, the HUGEINT FNV replay over the
    // RAW text), so the hash match proves the SQL registration dispatches
    // to the same kernels the DataFrame API uses. Signed %997 folding keeps
    // the aggregates bounded; both engines take the dividend's sign.
    "q50_sql_functions" -> { (s, dir) =>
      t(s, dir, "documents").createOrReplaceTempView("q50_docs")
      s.sql(
        """SELECT lang, COUNT(*) AS n_docs,
          |  SUM(graft_md5long(text) % 997) AS md5_mod_sum,
          |  SUM(size(graft_shingles(text, 3))) AS n_shingles,
          |  SUM(graft_fnv64(text) % 997) AS fnv_mod_sum
          |FROM q50_docs GROUP BY lang ORDER BY lang""".stripMargin)
    },

    // Eager aggregation ON the gate: a count/sum aggregate over an inner
    // equi-join, written the naive way a user writes it — the
    // [[graft.plans.EagerAggregation]] optimizer rule decomposes it so
    // BOTH inputs collapse to their key-level cardinalities before the
    // join (customer pre-aggregates per (segment, custkey), orders to a
    // per-custkey count; the join never sees an order row). The oracle is
    // the plain join-then-aggregate statement, so the hash match proves
    // the rewrite exact; PlanAuditSpec asserts both join children are
    // aggregates. The sum column rides from the GROUPED side
    // (Σ c_nationkey over join rows = nationkey × order count per
    // customer), exercising the cl·cr multiply non-trivially.
    "q51_eager_agg" -> { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("c_nationkey")).as("nationkey_weighted"))
        .orderBy("c_mktsegment")
    },

    // The reference's opaque-UDF execution path (scan → flatMap map-UDF →
    // hash shuffle → sorted streaming reduce-UDF), driver-verified against
    // the same oracle as the declarative q19: the engine's two execution
    // tiers must produce identical results.
    "mr_wordcount" -> { (s, dir) =>
      import s.implicits._
      val lines = t(s, dir, "documents").select(col("text")).as[String]
      val reduced = graft.core.MapReduceJob.reduceSorted(
        graft.core.MapReduceJob.mapPhase(lines, graft.tasks.WordCount),
        graft.tasks.WordCount,
        numOutputs = s.sparkContext.defaultParallelism
      )
      reduced
        .select(col("_1").as("word"), col("_2").cast("long").as("cnt"))
        .orderBy("word")
    }
  )

  /** Order years present in the corpus (pinned pivot values). */
  val PivotYears: Seq[Int] = 1995 to 2001

  val oracles: Map[String, String] = Map(
    "q45_corr_subquery" ->
      """SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS price
        |FROM orders o
        |WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
        |    (SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |  > (SELECT SUM(CAST(o2.o_totalprice AS DECIMAL(18,2)))
        |     FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q46_lateral_topn" ->
      """SELECT r_name, l.n_name, l.n_cust
        |FROM region r,
        |LATERAL (
        |  SELECT n_name, COUNT(*) AS n_cust
        |  FROM nation JOIN customer ON c_nationkey = n_nationkey
        |  WHERE n_regionkey = r.r_regionkey
        |  GROUP BY n_name ORDER BY n_cust DESC, n_name LIMIT 2
        |) l
        |ORDER BY r_name, n_cust DESC, n_name""".stripMargin,
    // Identical integer-day RANGE frame; DECIMAL sum cast at the boundary.
    "q48_range_frame" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey,
        |    date_diff('day', DATE '1992-01-01', o_orderdate) AS day,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS p
        |  FROM orders
        |)
        |SELECT o_orderkey, o_custkey,
        |  COUNT(*) OVER w AS n_30d,
        |  CAST(SUM(p) OVER w AS DOUBLE) AS spend_30d
        |FROM o
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY day
        |             RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,
    "q47_notin_nullaware" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE c_custkey NOT IN (
        |  SELECT NULLIF(o_custkey, -1) FROM orders WHERE o_orderstatus = 'F'
        |)
        |ORDER BY c_custkey""".stripMargin,
    // Plain join-then-aggregate: the definitional form the eager-aggregation
    // rewrite must reproduce bit-for-bit.
    "q51_eager_agg" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |  CAST(SUM(c_nationkey) AS BIGINT) AS nationkey_weighted
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    // SQL-surface twin: every graft_ function re-derived from its public
    // definition (raw text — no normalization — for md5/FNV here).
    "q50_sql_functions" ->
      """WITH fnv AS (
        |  SELECT doc_id, lang,
        |    list_reduce(
        |      list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |        [CAST(CAST('0x' || substr(hx, 2*i-1, 2) AS INT) AS HUGEINT)
        |         FOR i IN range(1, len(hx)//2 + 1)]),
        |      (h, b) -> ((h - h % 256 + xor(CAST(h % 256 AS BIGINT), CAST(b AS BIGINT)))
        |                 * 1099511628211) % CAST(18446744073709551616 AS HUGEINT)
        |    ) AS hu
        |  FROM (SELECT doc_id, lang, hex(encode(text)) AS hx FROM documents)
        |), fp AS (
        |  SELECT doc_id, lang,
        |    CAST(CASE WHEN hu >= CAST(9223372036854775808 AS HUGEINT)
        |         THEN hu - CAST(18446744073709551616 AS HUGEINT) ELSE hu END AS BIGINT) AS fnv
        |  FROM fnv
        |), per_doc AS (
        |  SELECT d.doc_id, d.lang,
        |    CAST('0x' || substr(md5(d.text), 1, 15) AS BIGINT) AS m,
        |    len(list_distinct([array_to_string(ts[i:i+2], ' ') FOR i IN range(1, len(ts)-1)])) AS nsh
        |  FROM (SELECT doc_id, lang, text,
        |          list_filter(string_split_regex(lower(text), ' +'), t -> t <> '') AS ts
        |        FROM documents) d
        |)
        |SELECT p.lang, COUNT(*) AS n_docs,
        |  CAST(SUM(p.m % 997) AS BIGINT) AS md5_mod_sum,
        |  CAST(SUM(p.nsh) AS BIGINT) AS n_shingles,
        |  CAST(SUM(f.fnv % 997) AS BIGINT) AS fnv_mod_sum
        |FROM per_doc p JOIN fp f USING (doc_id)
        |GROUP BY p.lang ORDER BY p.lang""".stripMargin,
    // Join-elimination twin RUNS the join the engine eliminated: equality
    // proves both the rewrite and the declared RI constraints on the data.
    "q49_join_elim" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q44_revenue_share" ->
      """WITH byn AS (
        |  SELECT r_name, n_name,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev_dec
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY r_name, n_name
        |)
        |SELECT r_name, n_name, CAST(rev_dec AS DOUBLE) AS revenue,
        |  CAST(rev_dec AS DOUBLE) / CAST(SUM(rev_dec) OVER (PARTITION BY r_name) AS DOUBLE)
        |    AS region_share
        |FROM byn ORDER BY r_name, n_name""".stripMargin,
    "q43_price_histogram" ->
      """SELECT CAST(FLOOR(CAST(o_totalprice AS DECIMAL(18,2)) / 50000) AS BIGINT) AS bucket,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
        |FROM orders GROUP BY bucket ORDER BY bucket""".stripMargin,
    "mv_agg_reroute" ->
      """SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "mv_incremental_refresh" ->
      """SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    // The monolithic join the incrementally-maintained view must equal.
    "mv_join_incremental" ->
      """SELECT c_nationkey, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS total_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q41_regional_revenue" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name ASC""".stripMargin,
    "q40_month_spine" ->
      """WITH RECURSIVE months(d) AS (
        |  SELECT DATE '1995-01-01'
        |  UNION ALL SELECT d + INTERVAL 1 MONTH FROM months WHERE d < DATE '2001-12-01'
        |),
        |m AS (SELECT CAST(YEAR(d) AS INT) AS yr, CAST(MONTH(d) AS INT) AS mo FROM months),
        |o AS (
        |  SELECT CAST(YEAR(o_orderdate) AS INT) AS yr, CAST(MONTH(o_orderdate) AS INT) AS mo,
        |    COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS t
        |  FROM orders GROUP BY 1, 2
        |)
        |SELECT m.yr, m.mo,
        |  CAST(COALESCE(o.n, 0) AS BIGINT) AS n_orders,
        |  CAST(COALESCE(o.t, 0.0) AS DOUBLE) AS total
        |FROM m LEFT JOIN o ON m.yr = o.yr AND m.mo = o.mo
        |ORDER BY m.yr, m.mo""".stripMargin,
    "q38_topk_rewrite" ->
      """SELECT c_mktsegment, total_spend, c_name, rn FROM (
        |  SELECT c_mktsegment, c_name,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
        |    ROW_NUMBER() OVER (
        |      PARTITION BY c_mktsegment
        |      ORDER BY CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) DESC,
        |               c_name ASC) AS rn
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY c_mktsegment, c_name
        |) WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin,
    "q37_topk_pergroup" ->
      """SELECT p_brand, CAST(rnk AS INT) AS rank, p_partkey, revenue FROM (
        |  SELECT p_brand, p_partkey,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |             * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |    ROW_NUMBER() OVER (
        |      PARTITION BY p_brand
        |      ORDER BY CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) DESC,
        |               CAST(p_partkey AS VARCHAR) ASC) AS rnk
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY p_brand, p_partkey
        |) WHERE rnk <= 3 ORDER BY p_brand, rank""".stripMargin,
    "q34_setops_all" ->
      """SELECT op, o_orderpriority, COUNT(*) AS n_rows FROM (
        |  SELECT 'intersect_all' AS op, o_orderpriority FROM (
        |    SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
        |    INTERSECT ALL
        |    SELECT o_orderpriority FROM orders WHERE YEAR(o_orderdate) >= 1998)
        |  UNION ALL
        |  SELECT 'except_all' AS op, o_orderpriority FROM (
        |    SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
        |    EXCEPT ALL
        |    SELECT o_orderpriority FROM orders WHERE YEAR(o_orderdate) >= 1998)
        |) GROUP BY op, o_orderpriority ORDER BY op, o_orderpriority""".stripMargin,
    "q32_array_agg" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
        |  array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',') AS statuses
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q30_pivot_sales" -> {
      val cols = PivotYears.map(y =>
        s"""CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE YEAR(o_orderdate) = $y) AS DOUBLE) AS "$y"""")
        .mkString(",\n  ")
      s"""SELECT o_orderpriority,
         |  $cols
         |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
    },
    "q31_unpivot_metrics" ->
      """WITH agg AS (
        |  SELECT l_returnflag,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
        |    CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc
        |  FROM lineitem GROUP BY l_returnflag
        |)
        |SELECT l_returnflag, metric, value FROM (
        |  SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM agg
        |  UNION ALL SELECT l_returnflag, 'sum_base', sum_base FROM agg
        |  UNION ALL SELECT l_returnflag, 'sum_disc', sum_disc FROM agg
        |) ORDER BY l_returnflag, metric""".stripMargin,
    "q20_window_range_frame" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS nearby_revenue,
        |  COUNT(*) OVER w AS nearby_orders
        |FROM (SELECT o_orderkey, o_custkey, o_totalprice,
        |        epoch_us(o_orderdate) // 1000000 AS o_epoch
        |      FROM orders)
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_epoch
        |             RANGE BETWEEN 2592000 PRECEDING AND 2592000 FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin,
    "q21_grouping_sets" ->
      """SELECT COALESCE(n_name, 'ALL') AS nation, COALESCE(o_orderstatus, 'ALL') AS status,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY GROUPING SETS ((n_name), (o_orderstatus), ())
        |ORDER BY nation, status""".stripMargin,
    "q22_variance_stats" ->
      """SELECT l_returnflag, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS mean_qty,
        |  (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |     - CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) * CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))
        |    / (COUNT(*) - 1) AS var_qty,
        |  sqrt((CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |     - CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) * CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))
        |    / (COUNT(*) - 1)) AS std_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q35_corr_stats" ->
      """WITH m AS (
        |  SELECT l_returnflag,
        |    CAST(COUNT(*) AS DOUBLE) AS n,
        |    COUNT(*) AS n_items,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
        |  FROM lineitem GROUP BY l_returnflag
        |)
        |SELECT l_returnflag, n_items,
        |  (sxy - sx * sy / n) / (n - 1) AS cov_qty_price,
        |  (n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS corr_qty_price
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "q23_percentiles" ->
      """SELECT l_linestatus,
        |  quantile_cont(l_quantity, 0.25) AS p25_qty,
        |  quantile_cont(l_quantity, 0.5) AS p50_qty,
        |  quantile_cont(l_quantity, 0.75) AS p75_qty,
        |  COUNT(*) AS n_items
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    // Sketch-contract gates: the oracle computes the EXACT values and a
    // literal TRUE; the engine emits exact + its in-plan bound check, so
    // the hash match proves the estimate honored its error contract.
    "q24_approx_distinct" ->
      """SELECT COUNT(DISTINCT l_partkey) AS exact_parts,
        |  COUNT(DISTINCT l_orderkey) AS exact_orders,
        |  TRUE AS within_bound
        |FROM lineitem""".stripMargin,
    "q36_approx_quantiles" ->
      """SELECT l_linestatus,
        |  quantile_cont(l_quantity, 0.25) AS p25_qty,
        |  quantile_cont(l_quantity, 0.5) AS p50_qty,
        |  quantile_cont(l_quantity, 0.75) AS p75_qty,
        |  COUNT(*) AS n_items,
        |  TRUE AS within_bound
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q24_exact_distinct" ->
      """SELECT COUNT(DISTINCT l_partkey) AS exact_parts,
        |  COUNT(DISTINCT l_orderkey) AS exact_orders
        |FROM lineitem""".stripMargin,
    "q26_above_customer_avg" ->
      """SELECT o_orderstatus, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders o
        |WHERE o_totalprice > (
        |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |  FROM orders i WHERE i.o_custkey = o.o_custkey)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q25_window_misc" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(NTILE(4) OVER w AS INT) AS price_quartile,
        |  PERCENT_RANK() OVER w AS price_pct_rank,
        |  LEAD(l_orderkey, 1) OVER w AS next_orderkey,
        |  FIRST_VALUE(l_orderkey) OVER w AS cheapest_orderkey,
        |  abs(l_discount - 0.05) AS disc_dist,
        |  CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k,
        |  l_orderkey % 7 AS okmod7
        |FROM lineitem WHERE l_suppkey <= 5
        |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_extendedprice, l_orderkey, l_linenumber)
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,
    "mr_wordcount" ->
      """SELECT word, COUNT(*) AS cnt FROM (
        |  SELECT UNNEST(string_split_regex(text, '[ ,."'']+')) AS word FROM documents
        |) WHERE word <> '' GROUP BY word ORDER BY word""".stripMargin
  )
}
