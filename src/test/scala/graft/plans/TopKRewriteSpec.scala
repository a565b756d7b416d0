package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Guard tests for the window-top-k → heap-aggregate rewrite: the rule must
  * fire on exactly the provable shape and NOTHING else — a misfire on a
  * near-miss pattern would silently change semantics (null ranking, lost
  * passthrough columns, numeric-vs-lexicographic tie order).
  */
class TopKRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def base: DataFrame = Seq(
    ("a", 3.0, "x"), ("a", 5.0, "y"), ("a", 4.0, "b"), ("a", 1.0, "z"),
    ("b", 2.0, "p"), ("b", 7.0, "q")
  ).toDF("g", "ord", "tie")
    .select(col("g"), coalesce(col("ord"), lit(0.0)).as("ord"),
      coalesce(col("tie"), lit("")).as("tie"))

  private def planOf(df: DataFrame): String = df.queryExecution.optimizedPlan.toString

  test("fires on the exact shape and matches the window result") {
    val w = Window.partitionBy("g").orderBy(col("ord").desc, col("tie").asc)
    val q = base.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
    val p = planOf(q)
    assert(!p.contains("Window") && p.contains("graft_topk_rows"), p)
    val got = q.as[(String, Double, String, Int)].collect().toSet
    assert(got == Set(
      ("a", 5.0, "y", 1), ("a", 4.0, "b", 2),
      ("b", 7.0, "q", 1), ("b", 2.0, "p", 2)))
  }

  test("does not fire when an extra passthrough column exists") {
    val df = base.withColumn("extra", lit(1))
    val w = Window.partitionBy("g").orderBy(col("ord").desc, col("tie").asc)
    val q = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
    assert(planOf(q).contains("Window"), "4-column child must keep the window plan")
  }

  test("does not fire on ascending order, nullable keys, or rank()") {
    val wAsc = Window.partitionBy("g").orderBy(col("ord").asc, col("tie").asc)
    val qAsc = base.withColumn("rn", row_number().over(wAsc)).filter(col("rn") <= 2)
    assert(planOf(qAsc).contains("Window"), "ASC ord must not rewrite")

    // Nullable ord (no coalesce): row_number ranks nulls, the heap drops
    // them — the rule must leave the window plan alone.
    val nullable = Seq(("a", Some(1.0), "x")).toDF("g", "ord", "tie")
    val w = Window.partitionBy("g").orderBy(col("ord").desc, col("tie").asc)
    val qNull = nullable.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
    assert(planOf(qNull).contains("Window"), "nullable ord must not rewrite")

    val qRank = base.withColumn("rn", rank().over(w)).filter(col("rn") <= 2)
    assert(planOf(qRank).contains("Window"), "rank() has different tie semantics — no rewrite")
  }
}
