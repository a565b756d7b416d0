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
