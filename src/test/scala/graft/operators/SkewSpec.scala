package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("salted join result equals plain join result") {
    val e = Relational.t(spark, sf(), "events")
    val dim = e.groupBy("event_type")
      .agg((sum(Relational.dec(col("value"))).cast("double") / count(lit(1))).as("avg_value"))
    val plain = e.join(dim, "event_type")
      .filter(col("value") > col("avg_value"))
      .groupBy("event_type").agg(count(lit(1)).as("n_above"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.queries("sp_salted_join")(spark, sf()).collect()
      .map(r => r.getString(0) -> r.getLong(r.fieldIndex("n_above"))).toMap
    assert(salted == plain)
  }

  test("salted join plans a shuffle join on (key, salt), not a broadcast") {
    val plan = Skew.queries("sp_salted_join")(spark, sf()).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"), "salting demo must not degenerate to broadcast")
    assert(plan.contains("ShuffledHashJoin"), s"expected a shuffled hash join in:\n$plan")
    assert(plan.contains("__salt"), "join keys should include the salt column")
  }

  test("salted two-phase distinct equals plain countDistinct") {
    val plain = Relational.t(spark, sf(), "events")
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.queries("sp_salted_distinct")(spark, sf()).collect()
      .map(r => r.getString(0) -> r.getLong(r.fieldIndex("n_users"))).toMap
    assert(salted == plain)
  }

  test("salts are deterministic and balanced across buckets") {
    val e = Relational.t(spark, sf(), "events")
      .withColumn("__salt", pmod(col("event_id"), lit(Skew.saltR(spark).toLong)).cast("int"))
    val counts = e.groupBy("__salt").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet == (0 until Skew.saltR(spark)).toSet, "every salt bucket populated")
    val (mn, mx) = (counts.values.min, counts.values.max)
    assert(mx < mn * 2, s"salt buckets should be balanced, got $counts")
  }
}
