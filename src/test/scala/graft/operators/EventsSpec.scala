package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EventsSpec extends SparkSpec {

  test("hll rollup: merged daily sketches track exact weekly distincts") {
    val est = Events.queries("ev_hll_rollup")(spark, sf()).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap

    val exact = Relational.t(spark, sf(), "events")
      .groupBy(floor(datediff(to_date(col("ts")), lit("2024-01-01").cast("date")) / 7)
        .cast("int").as("week"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

    assert(est.keySet == exact.keySet, s"week sets differ: $est vs $exact")
    exact.foreach { case (w, n) =>
      val e = est(w)
      // Default lgK=12 HLL on a few hundred distincts: ≈exact; allow 5%.
      assert(math.abs(e - n).toDouble / n <= 0.05, s"week $w: est $e vs exact $n")
    }

    // Merging daily sketches must estimate like one sketch built from the
    // raw week — the lossless-merge property that makes the sketch table a
    // valid distinct-count materialized view.
    val direct = Relational.t(spark, sf(), "events")
      .groupBy(floor(datediff(to_date(col("ts")), lit("2024-01-01").cast("date")) / 7)
        .cast("int").as("week"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("e"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    direct.foreach { case (w, d) =>
      assert(math.abs(est(w) - d).toDouble / math.max(d, 1) <= 0.01,
        s"week $w: merged ${est(w)} vs direct $d")
    }
  }
}
