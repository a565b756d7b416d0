package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpec {

  test("k-anonymity: reported groups are exactly those under K") {
    val flagged = Quality.queries("dq_k_anonymity")(spark, sf()).collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    val all = Relational.t(spark, sf(), "customer")
      .groupBy("c_nationkey", "c_mktsegment").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(flagged == all.filter(_._2 < Quality.KAnonymity))
    flagged.values.foreach(n => assert(n > 0 && n < Quality.KAnonymity))
  }

  test("t-closeness: tvd in [0,1], covers every QI group, matches a driver-side recompute") {
    val rows = Quality.queries("dq_t_closeness")(spark, sf()).collect()
    val fact = Relational.t(spark, sf(), "customer")
      .join(Relational.t(spark, sf(), "orders"), col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey"), col("c_mktsegment"), col("o_orderpriority"))
      .collect().map(r => ((r.getInt(0), r.getString(1)), r.getString(2)))
    val bigN = fact.length.toLong
    val globalDist = fact.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(rows.map(r => (r.getInt(0), r.getString(1))).toSet ==
      fact.map(_._1).toSet, "one row per observed QI group")
    rows.foreach { r =>
      val key = (r.getInt(0), r.getString(1))
      val n = r.getLong(r.fieldIndex("n"))
      val tvd = r.getDouble(r.fieldIndex("tvd"))
      assert(tvd >= 0.0 && tvd <= 1.0)
      // Exact recompute of D = Σ_v |ns·N − Ns·n| over the full value set,
      // including values the group is missing.
      val grpDist = fact.filter(_._1 == key).groupBy(_._2).view.mapValues(_.length.toLong).toMap
      assert(n == grpDist.values.sum)
      val dNum = globalDist.map { case (v, gs) =>
        (BigInt(grpDist.getOrElse(v, 0L)) * bigN - BigInt(gs) * n).abs
      }.sum
      val expected = dNum.toDouble / (2.0 * n.toDouble * bigN.toDouble)
      assert(math.abs(tvd - expected) < 1e-12, s"$key: $tvd vs $expected")
    }
  }

  test("pseudonymized join preserves cleartext join cardinalities; no cleartext ids survive") {
    val out = Quality.queries("dq_pseudonymize")(spark, sf())
    assert(out.columns.toSeq == Seq("pid", "c_mktsegment", "n_events", "total_value"))
    val rows = out.collect()
    // The surrogate is an opaque 32-hex digest, never the source integer.
    rows.foreach(r => assert(r.getString(0).matches("[0-9a-f]{32}")))
    // Injective on this domain: one surrogate per distinct cleartext user.
    val ev = Relational.t(spark, sf(), "events")
    val users = ev.select(countDistinct(col("user_id"))).collect().head.getLong(0)
    assert(rows.map(_.getString(0)).distinct.length.toLong == users)
    // The pseudonymous join loses no fact rows vs the cleartext join.
    val cleartext = ev.join(
      Relational.t(spark, sf(), "customer"),
      col("user_id") === col("c_custkey")).count()
    assert(rows.map(_.getLong(2)).sum == cleartext)
  }

  test("erasure audit counts are the exact pre/post contract of a versioned REPLACE purge") {
    import graft.sources.Versioned
    val audit = Quality.queries("dq_erasure")(spark, sf()).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(audit.keySet == Set("customer", "orders", "lineitem"))
    // Cascade sanity: some rows purge at every level, none purge fully.
    audit.values.foreach { case (before, purged, after) =>
      assert(purged > 0 && purged < before && after == before - purged)
    }
    // Apply the purge physically: REPLACE-commit the surviving customers
    // into a versioned table; the new version must hold exactly n_after
    // rows and zero requested keys, while time travel still reads the
    // pre-purge version in full (the audit trail survives the erasure).
    val dir = java.nio.file.Files.createTempDirectory("erasure").toString
    val cust = Relational.t(spark, sf(), "customer")
    val req = cust.filter(Pipeline.bucket(col("c_custkey")) < Quality.ErasurePct)
      .select(col("c_custkey").as("k"))
    val v0 = Versioned.append(cust, dir)
    val v1 = Versioned.replace(
      cust.join(req, col("c_custkey") === col("k"), "left_anti"), dir)
    assert(Versioned.readVersion(spark, dir, v1).count() == audit("customer")._3)
    assert(Versioned.readVersion(spark, dir, v1)
      .join(req, col("c_custkey") === col("k")).count() == 0)
    assert(Versioned.readVersion(spark, dir, v0).count() == audit("customer")._1)
  }

  test("profile stats match directly computed column facts") {
    val rows = Quality.queries("dq_profile")(spark, sf()).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(rows.keySet == Set("l_quantity", "l_extendedprice", "l_returnflag", "l_shipdate"))
    val li = Relational.t(spark, sf(), "lineitem")
    val n = li.count()
    rows.values.foreach { case (gn, nNull, nDist, minV, maxV) =>
      assert(gn == n)
      assert(nNull == 0) // corpus has no nulls in the profiled columns
      assert(nDist > 0 && nDist <= n)
      assert(minV.nonEmpty && maxV.nonEmpty)
    }
    val flagDist = li.select(countDistinct("l_returnflag")).collect().head.getLong(0)
    assert(rows("l_returnflag")._3 == flagDist)
    val qtyMin = li.select(min(col("l_quantity").cast(
      org.apache.spark.sql.types.DecimalType(18, 2)))).collect().head.getDecimal(0)
    assert(rows("l_quantity")._4 == qtyMin.toString)
  }
}
