package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Planted-frame semantics for [[EagerAggregation]] — the cases the gate
  * corpus exercises only statistically: null join keys (must drop
  * identically in both shapes), duplicate keys on both sides (the cl·cr
  * multiply), the grouped side sitting on either side of the user's join,
  * and the decimal guard (bit-exactness forbids re-associating non-integer
  * sums).
  */
class EagerAggregationSpec extends SparkSpec {

  private def left = {
    import spark.implicits._
    Seq(
      (Option(1L), "a", 10L), (Option(1L), "a", 20L), (Option(2L), "b", 5L),
      (Option.empty[Long], "a", 7L), (Option(9L), "c", 1L)
    ).toDF("k", "g", "x")
  }

  private def right = {
    import spark.implicits._
    Seq(Option(1L), Option(1L), Option(1L), Option(2L), Option.empty[Long], Option(8L))
      .toDF("rk")
  }

  test("rewritten count/sum equals the naive aggregate over null and duplicate keys") {
    val q = left.join(right, col("k") === col("rk"))
      .groupBy("g")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
    assert(q.queryExecution.optimizedPlan.toString.contains("graft_cl"),
      "rule must fire on the provable shape")
    val got = q.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // k=1 matches 3 right rows (g=a: 2 left rows, Σx=30 → n=6, sx=90);
    // k=2 matches 1 (g=b: n=1, sx=5); null keys and unmatched k=9 drop.
    assert(got == Set(("a", 6L, 90L), ("b", 1L, 5L)))
  }

  test("grouped side on the RIGHT of the user's join is matched by the mirrored orientation") {
    val q = right.join(left, col("rk") === col("k"))
      .groupBy("g")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
    assert(q.queryExecution.optimizedPlan.toString.contains("graft_cl"),
      "mirrored orientation must fire")
    val got = q.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("a", 6L, 90L), ("b", 1L, 5L)))
  }

  test("group by the join key itself needs no extra key column") {
    val q = left.join(right, col("k") === col("rk"))
      .groupBy("k")
      .agg(count(lit(1)).as("n"))
    assert(q.queryExecution.optimizedPlan.toString.contains("graft_cl"))
    val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 6L), (2L, 1L)))
  }

  test("decimal sums are NOT rewritten (re-association would widen precision)") {
    val q = left.withColumn("d", col("x").cast("decimal(18,2)"))
      .join(right, col("k") === col("rk"))
      .groupBy("g")
      .agg(sum(col("d")).as("sd"))
    assert(!q.queryExecution.optimizedPlan.toString.contains("graft_cl"),
      "decimal guard must decline the rewrite")
  }

  test("a second join predicate declines the rewrite") {
    val q = left.join(right, col("k") === col("rk") && col("k") > 0)
      .groupBy("g")
      .agg(count(lit(1)).as("n"))
    // The extra predicate may be pushed down by Catalyst (leaving a pure
    // equi-join, where firing is sound) — the assertion is that results
    // stay correct either way.
    val got = q.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("a", 6L), ("b", 1L)))
  }
}
