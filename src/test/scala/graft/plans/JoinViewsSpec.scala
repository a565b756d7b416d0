package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JoinViewsSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toVector).toVector.sortBy(_.mkString("|"))

  test("delta refresh lands exactly the monolithic join, duplicates included") {
    import spark.implicits._
    // Planted bases with DUPLICATE join keys on both sides so multiplicity
    // errors (a row double-joined across delta terms) cannot hide.
    val a = Seq((1L, 10L), (2L, 10L), (3L, 20L), (4L, 30L), (5L, 40L))
      .toDF("a_id", "k")
    val b = Seq((100L, 10L), (101L, 10L), (102L, 20L), (103L, 50L))
      .toDF("b_id", "bk")
    val a0 = a.filter(col("a_id") <= 3); val da = a.filter(col("a_id") > 3)
    val b0 = b.filter(col("b_id") <= 101); val db = b.filter(col("b_id") > 101)
    val view = graft.operators.Connectors.tmp("jv_spec")
    JoinViews.build(a0, b0, "k", "bk", view)
    JoinViews.refreshAppend(a0, da, b0, db, "k", "bk", view)
    val monolithic = a.join(b, col("k") === col("bk"))
    assert(rows(spark.read.parquet(view)) == rows(monolithic),
      "incrementally maintained view diverges from the full join")
  }

  test("an empty delta is a no-op refresh") {
    import spark.implicits._
    val a = Seq((1L, 10L), (2L, 20L)).toDF("a_id", "k")
    val b = Seq((100L, 10L)).toDF("b_id", "bk")
    val view = graft.operators.Connectors.tmp("jv_spec_empty")
    JoinViews.build(a, b, "k", "bk", view)
    val before = rows(spark.read.parquet(view))
    JoinViews.refreshAppend(a, a.limit(0), b, b.limit(0), "k", "bk", view)
    assert(rows(spark.read.parquet(view)) == before)
  }

  test("one-sided append folds in without touching the stored rows") {
    import spark.implicits._
    val a = Seq((1L, 10L), (2L, 20L)).toDF("a_id", "k")
    val b = Seq((100L, 10L), (101L, 20L)).toDF("b_id", "bk")
    val da = Seq((3L, 20L)).toDF("a_id", "k")
    val view = graft.operators.Connectors.tmp("jv_spec_oneside")
    JoinViews.build(a, b, "k", "bk", view)
    JoinViews.refreshAppend(a, da, b, b.limit(0), "k", "bk", view)
    val monolithic = a.unionByName(da).join(b, col("k") === col("bk"))
    assert(rows(spark.read.parquet(view)) == rows(monolithic))
  }
}
