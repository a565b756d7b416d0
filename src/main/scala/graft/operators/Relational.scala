package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The relational operator surface: every operator family the reference lacks
  * (SURVEY.md §2.2 — joins, aggregation, windows, sort/limit/top-k, set ops,
  * scalar functions), expressed as declarative DataFrame plans so Catalyst owns
  * pushdown, pruning, join selection, and partial aggregation.
  *
  * Determinism contract with the DuckDB oracle (the driver hash-compares values):
  * every floating-point aggregate is computed by casting the input column to
  * `DECIMAL(18,2)` first, aggregating exactly (decimal arithmetic is exact and
  * order-independent, unlike float addition), and casting the final result to
  * double. The oracle SQL applies the identical pattern, so both engines produce
  * bit-identical doubles regardless of partitioning or aggregation order.
  *
  * Scale notes: dimension tables (`region`, `nation`, `part`, `supplier`) are
  * broadcast explicitly — at 100 TB the fact tables shuffle on join keys while
  * dims ship to executors. Aggregations are algebraic (sum/count/min/max), so
  * Spark's partial (map-side) aggregation bounds shuffle volume by
  * O(groups × partitions), not O(rows).
  */
object Relational {

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.Tables.t(s, dir, name)

  /** Exact-arithmetic money column: double → DECIMAL(18,2). */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Order-independent deterministic sum of a double column (see class doc). */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Round-robin-repartition `df` ONLY when its scan collapsed to fewer
    * input partitions than half the cores (the driver corpus ships each
    * table as a single parquet row group, so compute-heavy aggregations
    * would otherwise run their map side on one task). The condition makes
    * this a no-op at scale: a 100 TB table scans as thousands of splits, the
    * branch is never taken, and the map-side partial aggregation keeps its
    * place BELOW the first exchange — unconditionally repartitioning would
    * move the full table through a shuffle that the partial agg exists to
    * avoid. Inspecting the partition count plans the (pruned) scan but runs
    * no job.
    */
  def parallelizeNarrowScan(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p / 2) df.repartition(p) else df
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // O5/O6 analog at the relational tier: multi-aggregate scan with partial agg.
    "q1_pricing_summary" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
      // Seven decimal aggregates per group are the compute-heavy map side —
      // see parallelizeNarrowScan (no-op at scale; filter stays pushed to
      // the scan below the barrier).
      parallelizeNarrowScan(
        li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
            col("l_extendedprice"), col("l_discount"), col("l_tax")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          sum(
            dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))) *
              (lit(1).cast(DecimalType(18, 2)) + dec(col("l_tax")))
          ).cast("double").as("sum_charge"),
          (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
          (sum(dec(col("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"),
          count(lit(1)).as("count_order")
        )
        .orderBy("l_returnflag", "l_linestatus")
    },

    // Highly selective filter + single-row agg: predicate pushdown to parquet.
    "q2_filter_revenue" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
            col("l_discount") >= 0.02 && col("l_discount") <= 0.06 &&
            col("l_quantity") < 24
        )
        .agg(
          sum(dec(col("l_extendedprice")) * dec(col("l_discount"))).cast("double").as("revenue"),
          count(lit(1)).as("n_items")
        )
    },

    // 4-way join: two shuffle joins on fact keys + two broadcast dims.
    "q3_revenue_by_nation" -> { (s, dir) =>
      // Broadcast dims mean the whole join+partial-agg chain is map-side —
      // see parallelizeNarrowScan (conditional; no-op at scale).
      val li = parallelizeNarrowScan(
        t(s, dir, "lineitem").select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")))
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey")) // bounded: nation dimension (25 rows)
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey")) // bounded: region dimension (5 rows)
        .groupBy("r_name", "n_name")
        .agg(
          sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items")
        )
        .orderBy("r_name", "n_name")
    },

    // Broadcast hash join against a dimension + grouped agg.
    "q4_brand_volume" -> { (s, dir) =>
      parallelizeNarrowScan(
        t(s, dir, "lineitem").select(col("l_partkey"), col("l_quantity"), col("l_extendedprice")))
        .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey")) // bounded: part dimension (star-join build side)
        .groupBy("p_brand")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("revenue"),
          count(lit(1)).as("n_items")
        )
        .orderBy("p_brand")
    },

    // Left-semi join with a non-equi conjunct (EXISTS).
    "q5_order_priority" -> { (s, dir) =>
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      o.join(li, col("o_orderkey") === col("l_orderkey") && col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    // Left-anti join (NOT EXISTS): customers with no orders since 2000, by nation.
    "q6_customers_no_orders" -> { (s, dir) =>
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      val n = t(s, dir, "nation")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey")) // bounded: nation dimension (25 rows)
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("total_acctbal"))
        .orderBy("n_name")
    },

    // Left-outer join preserving empty orders + distribution-of-counts (Q13 style).
    "q7_order_size_distribution" -> { (s, dir) =>
      // Aggregate BELOW the join: counting lineitems per l_orderkey first lets
      // the partial (map-side) count shrink the fact table before its exchange,
      // so the join moves one row per order instead of one per item — the same
      // answer as join-then-count, proven by the left-outer + coalesce(0) for
      // orders with no items. At 100 TB this is the difference between
      // shuffling the item table and shuffling the order-cardinality rollup.
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      val perOrder = li.groupBy(col("l_orderkey")).agg(count(lit(1)).as("cnt"))
      o.join(perOrder, col("o_orderkey") === col("l_orderkey"), "left_outer")
        .select(coalesce(col("cnt"), lit(0L)).as("n_items"))
        .groupBy("n_items")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("n_items")
    },

    // Window ranking: top-3 customers by spend within each market segment.
    "q8_top_customers_per_segment" -> { (s, dir) =>
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val spend = o
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment", "c_custkey", "c_name")
        .agg(dsum(col("o_totalprice")).as("total_spend"))
      val w = Window.partitionBy("c_mktsegment").orderBy(col("total_spend").desc, col("c_custkey").asc)
      spend
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select("c_mktsegment", "rk", "c_custkey", "c_name", "total_spend")
        .orderBy("c_mktsegment", "rk")
    },

    // Analytic window: running revenue per supplier in ship order.
    "q9_running_revenue_by_supplier" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val w = Window
        .partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      li.filter(col("l_suppkey") <= 10)
        .select(
          col("l_suppkey"),
          col("l_orderkey"),
          col("l_linenumber"),
          sum(dec(col("l_extendedprice"))).over(w).cast("double").as("running_revenue"),
          row_number().over(w).as("seq")
        )
        .orderBy("l_suppkey", "seq")
    },

    // Top-k: global sort + limit with deterministic tie-break.
    "q10_top_parts_by_revenue" -> { (s, dir) =>
      parallelizeNarrowScan(
        t(s, dir, "lineitem").select(col("l_partkey"), col("l_extendedprice"), col("l_discount")))
        .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey")) // bounded: part dimension (star-join build side)
        .groupBy("p_partkey", "p_name")
        .agg(
          sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
            .cast("double").as("revenue")
        )
        .orderBy(col("revenue").desc, col("p_partkey").asc)
        .limit(10)
    },

    // Distinct aggregation (exact).
    "q11_distinct_stats" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_suppliers"),
          count(lit(1)).as("n_items")
        )
        .orderBy("l_returnflag")
    },

    // ROLLUP hierarchy totals via the SQL entry path (NULL markers coalesced for
    // oracle stability). DataFrame-side rollup + coalesce on the grouping columns
    // trips Spark's ambiguous-self-join check (the Expand node duplicates the
    // grouping attributes), so this one runs through spark.sql over temp views.
    "q12_rollup_sales" -> { (s, dir) =>
      t(s, dir, "orders").createOrReplaceTempView("q12_orders")
      t(s, dir, "customer").createOrReplaceTempView("q12_customer")
      t(s, dir, "nation").createOrReplaceTempView("q12_nation")
      s.sql(
        """SELECT COALESCE(n_name, 'ALL') AS nation, COALESCE(o_orderstatus, 'ALL') AS status,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_sales, COUNT(*) AS n_orders
          |FROM q12_orders JOIN q12_customer ON o_custkey = c_custkey JOIN q12_nation ON c_nationkey = n_nationkey
          |GROUP BY ROLLUP(n_name, o_orderstatus) ORDER BY nation, status""".stripMargin
      )
    },

    // CUBE over two low-cardinality dims.
    "q13_cube_returns" -> { (s, dir) =>
      // Decomposable-aggregate rewrite: SUM/COUNT distribute over re-grouping,
      // so aggregate to the base (returnflag, linestatus) groups FIRST and run
      // the CUBE's Expand(×4) over those ~12 rows instead of the full table.
      // At 100 TB the Expand multiplier then touches O(groups), not O(rows);
      // decimal sums keep the result exact and order-free either way.
      val base = parallelizeNarrowScan(
        t(s, dir, "lineitem")
          .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum(dec(col("l_quantity"))).as("qty_dec"), count(lit(1)).as("n"))
      base
        .cube("l_returnflag", "l_linestatus")
        .agg(sum(col("qty_dec")).cast("double").as("sum_qty"), sum(col("n")).as("n_items"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("sum_qty"),
          col("n_items")
        )
        .orderBy("returnflag", "linestatus")
    },

    // Set operators: nations with customers vs nations with suppliers.
    "q14_setops_nations" -> { (s, dir) =>
      val c = t(s, dir, "customer")
      val sup = t(s, dir, "supplier")
      val n = t(s, dir, "nation")
      val custN = c.join(broadcast(n), col("c_nationkey") === col("n_nationkey")).select("n_name").distinct() // bounded: nation dimension (25 rows)
      val supN = sup.join(broadcast(n), col("s_nationkey") === col("n_nationkey")).select("n_name").distinct() // bounded: nation dimension (25 rows)
      custN.intersect(supN).withColumn("tag", lit("both"))
        .union(custN.except(supN).withColumn("tag", lit("cust_only")))
        .union(supN.except(custN).withColumn("tag", lit("supp_only")))
        .select("tag", "n_name")
        .orderBy("tag", "n_name")
    },

    // Scalar string functions (codegen'd, no UDFs).
    "q15_string_funcs" -> { (s, dir) =>
      t(s, dir, "part")
        .groupBy(col("p_type"))
        .agg(
          count(lit(1)).as("n_parts"),
          sum(length(col("p_name")).cast("long")).as("total_name_len"),
          sum(when(upper(col("p_name")).like("%A%"), 1L).otherwise(0L)).as("names_with_a"),
          min(substring(col("p_name"), 1, 3)).as("min_prefix"),
          max(regexp_extract(col("p_brand"), "#(\\d+)", 1).cast("long")).as("max_brand_num")
        )
        .orderBy("p_type")
    },

    // Date/time functions: month bucketing.
    "q16_orders_by_month" -> { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo")
        )
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
        .orderBy("yr", "mo")
    },

    // Semi-structured: JSON field extraction from the events props column.
    "q17_json_extract" -> { (s, dir) =>
      t(s, dir, "events")
        .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"), sum(col("k")).as("sum_k"), max(col("k")).as("max_k"))
        .orderBy("event_type")
    },

    // The same extraction on Spark 4's VARIANT type: `parse_json` decodes
    // the string ONCE into the shredded binary encoding, `variant_get`
    // then reads the typed subfield without re-parsing. At 100 TB this is
    // the semi-structured scale path — ingest parses once, every
    // downstream query does typed offset access (and parquet variant
    // shredding turns subfields into prunable columns) — where
    // `get_json_object` re-parses the full JSON string per row per field.
    // Same oracle as q17: two extraction tiers, one truth.
    "q39_variant_extract" -> { (s, dir) =>
      t(s, dir, "events")
        .select(
          col("event_type"),
          expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"), sum(col("k")).as("sum_k"), max(col("k")).as("max_k"))
        .orderBy("event_type")
    },

    // Scalar subquery: orders above the global average price, per status.
    "q18_above_avg_orders" -> { (s, dir) =>
      val o = t(s, dir, "orders")
      val avgPrice = o.agg((sum(dec(col("o_totalprice"))).cast("double") / count(lit(1))).as("a"))
      o.join(broadcast(avgPrice)) // bounded: one row
        .filter(col("o_totalprice") > col("a"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
        .orderBy("o_orderstatus")
    },

    // The reference's flagship workload (test/user_tasks.cc:12-34) on documents:
    // declarative word count with the reference's delimiter set.
    "q19_wordcount" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(explode(split(col("text"), "[ ,.\"']+")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("word")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("word")
    }
  )

  val oracles: Map[String, String] = {
    val d = "CAST(%s AS DECIMAL(18,2))"
    def dc(c: String) = d.format(c)
    Map(
      "q1_pricing_summary" ->
        s"""SELECT l_returnflag, l_linestatus,
           |  CAST(SUM(${dc("l_quantity")}) AS DOUBLE) AS sum_qty,
           |  CAST(SUM(${dc("l_extendedprice")}) AS DOUBLE) AS sum_base_price,
           |  CAST(SUM(${dc("l_extendedprice")} * (1 - ${dc("l_discount")})) AS DOUBLE) AS sum_disc_price,
           |  CAST(SUM(${dc("l_extendedprice")} * (1 - ${dc("l_discount")}) * (1 + ${dc("l_tax")})) AS DOUBLE) AS sum_charge,
           |  CAST(SUM(${dc("l_quantity")}) AS DOUBLE) / COUNT(*) AS avg_qty,
           |  CAST(SUM(${dc("l_extendedprice")}) AS DOUBLE) / COUNT(*) AS avg_price,
           |  COUNT(*) AS count_order
           |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
           |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
      "q2_filter_revenue" ->
        s"""SELECT CAST(SUM(${dc("l_extendedprice")} * ${dc("l_discount")}) AS DOUBLE) AS revenue,
           |  COUNT(*) AS n_items
           |FROM lineitem
           |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
           |  AND l_discount >= 0.02 AND l_discount <= 0.06 AND l_quantity < 24""".stripMargin,
      "q3_revenue_by_nation" ->
        s"""SELECT r_name, n_name,
           |  CAST(SUM(${dc("l_extendedprice")} * (1 - ${dc("l_discount")})) AS DOUBLE) AS revenue,
           |  COUNT(*) AS n_items
           |FROM lineitem
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation ON c_nationkey = n_nationkey
           |JOIN region ON n_regionkey = r_regionkey
           |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
      "q4_brand_volume" ->
        s"""SELECT p_brand,
           |  CAST(SUM(${dc("l_quantity")}) AS DOUBLE) AS sum_qty,
           |  CAST(SUM(${dc("l_extendedprice")}) AS DOUBLE) AS revenue,
           |  COUNT(*) AS n_items
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
      "q5_order_priority" ->
        """SELECT o_orderpriority, COUNT(*) AS order_count
          |FROM orders
          |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
      "q6_customers_no_orders" ->
        s"""SELECT n_name, COUNT(*) AS n_customers,
           |  CAST(SUM(${dc("c_acctbal")}) AS DOUBLE) AS total_acctbal
           |FROM customer JOIN nation ON c_nationkey = n_nationkey
           |WHERE NOT EXISTS (SELECT 1 FROM orders
           |                  WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
           |GROUP BY n_name ORDER BY n_name""".stripMargin,
      "q7_order_size_distribution" ->
        """SELECT n_items, COUNT(*) AS n_orders FROM (
          |  SELECT o_orderkey, COUNT(l_orderkey) AS n_items
          |  FROM orders LEFT OUTER JOIN lineitem ON o_orderkey = l_orderkey
          |  GROUP BY o_orderkey
          |) GROUP BY n_items ORDER BY n_items""".stripMargin,
      "q8_top_customers_per_segment" ->
        s"""SELECT c_mktsegment, rk, c_custkey, c_name, total_spend FROM (
           |  SELECT c_mktsegment, c_custkey, c_name,
           |    CAST(SUM(${dc("o_totalprice")}) AS DOUBLE) AS total_spend,
           |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY CAST(SUM(${dc("o_totalprice")}) AS DOUBLE) DESC, c_custkey ASC) AS rk
           |  FROM orders JOIN customer ON o_custkey = c_custkey
           |  GROUP BY c_mktsegment, c_custkey, c_name
           |) WHERE rk <= 3 ORDER BY c_mktsegment, rk""".stripMargin,
      "q9_running_revenue_by_supplier" ->
        s"""SELECT l_suppkey, l_orderkey, l_linenumber,
           |  CAST(SUM(${dc("l_extendedprice")}) OVER w AS DOUBLE) AS running_revenue,
           |  ROW_NUMBER() OVER w AS seq
           |FROM lineitem WHERE l_suppkey <= 10
           |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
           |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |ORDER BY l_suppkey, seq""".stripMargin,
      "q10_top_parts_by_revenue" ->
        s"""SELECT p_partkey, p_name,
           |  CAST(SUM(${dc("l_extendedprice")} * (1 - ${dc("l_discount")})) AS DOUBLE) AS revenue
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |GROUP BY p_partkey, p_name
           |ORDER BY revenue DESC, p_partkey ASC LIMIT 10""".stripMargin,
      "q11_distinct_stats" ->
        """SELECT l_returnflag,
          |  COUNT(DISTINCT l_partkey) AS n_parts,
          |  COUNT(DISTINCT l_suppkey) AS n_suppliers,
          |  COUNT(*) AS n_items
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
      "q12_rollup_sales" ->
        s"""SELECT COALESCE(n_name, 'ALL') AS nation, COALESCE(o_orderstatus, 'ALL') AS status,
           |  CAST(SUM(${dc("o_totalprice")}) AS DOUBLE) AS total_sales, COUNT(*) AS n_orders
           |FROM orders JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey
           |GROUP BY ROLLUP(n_name, o_orderstatus) ORDER BY nation, status""".stripMargin,
      "q13_cube_returns" ->
        s"""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag, COALESCE(l_linestatus, 'ALL') AS linestatus,
           |  CAST(SUM(${dc("l_quantity")}) AS DOUBLE) AS sum_qty, COUNT(*) AS n_items
           |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus) ORDER BY returnflag, linestatus""".stripMargin,
      "q14_setops_nations" ->
        """WITH custN AS (SELECT DISTINCT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey),
          |     supN AS (SELECT DISTINCT n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey)
          |SELECT 'both' AS tag, n_name FROM (SELECT n_name FROM custN INTERSECT SELECT n_name FROM supN)
          |UNION ALL
          |SELECT 'cust_only' AS tag, n_name FROM (SELECT n_name FROM custN EXCEPT SELECT n_name FROM supN)
          |UNION ALL
          |SELECT 'supp_only' AS tag, n_name FROM (SELECT n_name FROM supN EXCEPT SELECT n_name FROM custN)
          |ORDER BY tag, n_name""".stripMargin,
      "q15_string_funcs" ->
        """SELECT p_type, COUNT(*) AS n_parts,
          |  CAST(SUM(LENGTH(p_name)) AS BIGINT) AS total_name_len,
          |  CAST(SUM(CASE WHEN UPPER(p_name) LIKE '%A%' THEN 1 ELSE 0 END) AS BIGINT) AS names_with_a,
          |  MIN(SUBSTR(p_name, 1, 3)) AS min_prefix,
          |  CAST(MAX(CAST(regexp_extract(p_brand, '#(\d+)', 1) AS BIGINT)) AS BIGINT) AS max_brand_num
          |FROM part GROUP BY p_type ORDER BY p_type""".stripMargin,
      "q16_orders_by_month" ->
        s"""SELECT CAST(YEAR(o_orderdate) AS INT) AS yr, CAST(MONTH(o_orderdate) AS INT) AS mo,
           |  COUNT(*) AS n_orders, CAST(SUM(${dc("o_totalprice")}) AS DOUBLE) AS total
           |FROM orders GROUP BY yr, mo ORDER BY yr, mo""".stripMargin,
      "q17_json_extract" ->
        """SELECT event_type, COUNT(*) AS n_events,
          |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
          |  CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
      "q39_variant_extract" ->
        """SELECT event_type, COUNT(*) AS n_events,
          |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
          |  CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
      "q18_above_avg_orders" ->
        s"""SELECT o_orderstatus, COUNT(*) AS n_orders,
           |  CAST(SUM(${dc("o_totalprice")}) AS DOUBLE) AS total
           |FROM orders
           |WHERE o_totalprice > (SELECT CAST(SUM(${dc("o_totalprice")}) AS DOUBLE) / COUNT(*) FROM orders)
           |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
      "q19_wordcount" ->
        """SELECT word, COUNT(*) AS cnt FROM (
          |  SELECT UNNEST(string_split_regex(text, '[ ,."'']+')) AS word FROM documents
          |) WHERE word <> '' GROUP BY word ORDER BY word""".stripMargin
    )
  }
}
