package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JoinsSpec extends SparkSpec {

  test("bloom prefilter keeps every joining fact row (no false negatives)") {
    val dir = sf()
    val dimPred = col("o_orderpriority") === "1-URGENT"
    val dimKeys = Relational.t(spark, dir, "orders").filter(dimPred).select(col("o_orderkey"))
    val fact = Relational.t(spark, dir, "lineitem").select(col("l_orderkey"), col("l_quantity"))
    val dim = Relational.t(spark, dir, "orders").filter(dimPred).select(col("o_orderkey"))

    val plain = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
    val bloomed = Joins.bloomPreFilter(fact, "l_orderkey", dimKeys, estItems = 100000L)
      .join(Relational.t(spark, dir, "orders").filter(dimPred).select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"))
    assert(plain.count() > 0, "test needs a non-empty join")
    assert(bloomed.exceptAll(plain).isEmpty && plain.exceptAll(bloomed).isEmpty,
      "bloom prefilter must be semantically free")
  }

  test("bloom fp audit: verdict true, exact counts match an independent recompute") {
    val r = Joins.queries("j6_bloom_fp_audit")(spark, sf()).head()
    val fact = Relational.t(spark, sf(), "lineitem")
    val keys = Relational.t(spark, sf(), "orders")
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_orderstatus") === "F")
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val matched = fact.select("l_orderkey").collect().count(x => keys(x.getLong(0)))
    assert(r.getLong(0) == fact.count() && r.getLong(1) == matched,
      "exact columns must match the driver-side recompute")
    assert(r.getBoolean(2), "bloom survivors exceeded the documented fp rate")
  }

  test("interval overlap equals a driver-side quadratic recompute over the session set") {
    import org.apache.spark.sql.functions._
    val got = graft.operators.Joins.queries("j5_interval_overlap")(spark, sf()).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // Rebuild sessions + promo calendar directly and intersect brute-force.
    val sess = graft.streaming.EventStreams
      .sessionizeBatch(graft.operators.Relational.t(spark, sf(), "events"))
      .select(col("user_id"), unix_micros(col("session_start")).as("su"),
        unix_micros(col("session_end")).as("eu"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ts = graft.operators.Relational.t(spark, sf(), "events")
      .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
    val base = ts.getLong(0) / 86400000000L * 86400000000L
    val W = graft.operators.Joins.PromoSpacingMicros
    val L = graft.operators.Joins.PromoLenMicros
    val nPromos = ((ts.getLong(1) - base) / W).toInt + 1
    val exp = (0 until nPromos).map { p =>
      val (ps, pe) = (base + p * W, base + p * W + L)
      val hits = sess.filter { case (_, su, eu) => su <= pe && ps <= eu }
      p -> ((hits.length.toLong, hits.map(_._1).distinct.length.toLong))
    }.toMap
    assert(got == exp)
  }

  test("bloom prefilter over an empty dim side yields the (empty) join result") {
    val dir = sf()
    // No orders match: bloom_filter_agg over zero rows evaluates to a null
    // filter, might_contain(null, x) is null, and the filter drops every
    // fact row — exactly the empty join the plain plan produces.
    val dimKeys = Relational.t(spark, dir, "orders")
      .filter(col("o_orderpriority") === "NO-SUCH-PRIORITY").select(col("o_orderkey"))
    val fact = Relational.t(spark, dir, "lineitem").select(col("l_orderkey"))
    assert(Joins.bloomPreFilter(fact, "l_orderkey", dimKeys, estItems = 10L).isEmpty)
  }
}
