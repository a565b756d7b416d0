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

  test("AQE splits a runtime-skewed sort-merge join (the automatic tier beside salting)") {
    // Manual salting (above) handles skew the planner can predict; AQE's
    // skew-join split handles skew discovered at RUNTIME from map-output
    // sizes — at 100 TB both tiers matter, so the engine must demonstrably
    // run with the automatic one live. Thresholds are lowered so a ~4 MB
    // hot key counts as skewed in a test-sized shuffle; the assertion is
    // Spark's own `skew=true` annotation on the final adaptive plan.
    val keys = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32768")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      import spark.implicits._
      // Deterministic skew: half of 120k rows share key 0, padded to ~70 B.
      val hot = spark.range(0, 120000).select(
        when($"id" % 2 === 0, 0L).otherwise($"id").as("k"),
        rpad($"id".cast("string"), 64, "p").as("pad"))
      val dim = spark.range(0, 1000).select($"id".as("k"), ($"id" * 2).as("v"))
      // collect() (not a noop write, which clones the QueryExecution) so
      // THIS plan's AdaptiveSparkPlan finalizes and carries the annotation.
      val j = hot.join(dim, "k").select(sum(length($"pad") + $"v").as("chk"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed partition at runtime:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
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
