package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKRowsSpec extends SparkSpec {
  import spark.implicits._

  test("exact top-k per group with (ord desc, payload asc) ranking") {
    val df = Seq(
      ("a", 3.0, "x"), ("a", 5.0, "y"), ("a", 5.0, "b"), ("a", 1.0, "z"),
      ("b", 2.0, "p"), ("b", 2.0, "q")
    ).toDF("g", "ord", "id")

    val got = df.groupBy("g")
      .agg(TopKRows(2, col("ord"), col("id")).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), col("pos"), col("col.ord"), col("col.payload"))
      .as[(String, Int, Double, String)]
      .collect().sortBy(r => (r._1, r._2))

    // a: 5.0 ties broken by payload asc → "b" before "y"; b: only 2 rows.
    assert(got.toSeq == Seq(
      ("a", 0, 5.0, "b"), ("a", 1, 5.0, "y"),
      ("b", 0, 2.0, "p"), ("b", 1, 2.0, "q")))
  }

  test("NaN ords rank FIRST, matching Spark's double sort order") {
    // Spark sorts NaN greater than every double; primitive >/== comparisons
    // would drop NaN from the heap while row_number() keeps it at rank 1.
    val df = Seq(
      ("a", 9.0, "x"), ("a", Double.NaN, "n"), ("a", 8.0, "y"), ("a", Double.NaN, "m")
    ).toDF("g", "ord", "id")
    val got = df.groupBy("g")
      .agg(TopKRows(3, col("ord"), col("id")).as("top"))
      .select(posexplode(col("top")))
      .select(col("pos"), col("col.payload"))
      .as[(Int, String)].collect().sortBy(_._1).map(_._2).toSeq
    // Two NaNs tie (payload asc: m before n), then 9.0.
    assert(got == Seq("m", "n", "x"))

    // And the window form agrees exactly.
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("g").orderBy(col("ord").desc, col("id").asc)
    val win = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .orderBy("rn").select("id").as[String].collect().toSeq
    assert(win == got)
  }

  test("groups smaller than k return all rows; null ord/payload rows skipped") {
    val df = Seq(
      (Some("a"), Some(1.0), Some("x")),
      (Some("a"), None, Some("dropped")),
      (Some("a"), Some(2.0), None)
    ).toDF("g", "ord", "id")

    val got = df.groupBy("g")
      .agg(TopKRows(5, col("ord"), col("id")).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.ord"), col("e.payload"))
      .as[(Double, String)].collect()

    assert(got.toSeq == Seq((1.0, "x")))
  }

  test("agrees with the row_number window form on a larger random-ish input") {
    // Deterministic pseudo-random input via hash arithmetic (no Math.random).
    val df = spark.range(5000).select(
      pmod(xxhash64(col("id")), lit(7)).cast("string").as("g"),
      pmod(xxhash64(col("id"), lit(1)), lit(97)).cast("double").as("ord"),
      col("id").cast("string").as("pid"))

    val viaAgg = df.groupBy("g")
      .agg(TopKRows(4, col("ord"), col("pid")).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).as("rk"), col("col.ord").as("ord"),
        col("col.payload").as("pid"))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("ord").desc, col("pid").asc)
    val viaWindow = df
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 4)
      .select(col("g"), col("rk"), col("ord"), col("pid"))

    assert(viaAgg.except(viaWindow).isEmpty && viaWindow.except(viaAgg).isEmpty)
  }

  test("plan runs partial aggregation: both ObjectHashAggregate phases present") {
    val df = Seq(("a", 1.0, "x")).toDF("g", "ord", "id")
    val plan = df.groupBy("g").agg(TopKRows(2, col("ord"), col("id")))
      .queryExecution.executedPlan.toString
    // TypedImperativeAggregate plans as ObjectHashAggregate with a partial
    // phase before the exchange — the map-side shrink that makes the shuffle
    // O(groups × k) instead of O(rows).
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert(plan.toLowerCase.contains("partial_graft_topk_rows"), plan)
  }

  test("buffer respects the k bound with deterministic tie-breaks") {
    val a = new TopKRows.Buffer(3)
    Seq(1.0 -> "a", 9.0 -> "b", 5.0 -> "c", 7.0 -> "d", 9.0 -> "a").foreach {
      case (o, p) => a.add(o, p)
    }
    val kept = a.sortedBestFirst.toSeq
    assert(kept == Seq(
      TopKRows.Entry(9.0, "a"), TopKRows.Entry(9.0, "b"), TopKRows.Entry(7.0, "d")))
  }
}
