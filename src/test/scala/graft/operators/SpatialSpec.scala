package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpatialSpec extends SparkSpec {

  test("radius join: grid decomposition equals the brute-force all-pairs result") {
    val grid = Spatial.queries("geo_radius_join")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // Brute force over the same derived points, computed independently.
    val pts = Relational.t(spark, sf(), "customer").select(
      col("c_custkey"),
      (graft.functions.HashFunctions.md5Long(41, col("c_custkey")) % Spatial.Extent).as("x"),
      (graft.functions.HashFunctions.md5Long(42, col("c_custkey")) % Spatial.Extent).as("y")
    ).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = for {
      (a, ax, ay) <- pts; (b, bx, by) <- pts
      if a < b
      d2 = (ax - bx) * (ax - bx) + (ay - by) * (ay - by)
      if d2 <= Spatial.Radius * Spatial.Radius
    } yield (a, b, d2)
    assert(grid.toSet == brute.toSet)
    assert(grid.nonEmpty, "radius must capture at least one pair at sf0.001")
  }

  test("nearest neighbor: symmetric pair membership and minimality") {
    val nn = Spatial.queries("geo_nn")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(nn.nonEmpty)
    val pairs = Spatial.queries("geo_radius_join")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // Each directed nn edge appears (in some orientation) in the radius join,
    // with the same distance.
    val undirected = pairs.flatMap { case (a, b, d) => Seq((a, b, d), (b, a, d)) }.toSet
    nn.foreach { case (a, b, d) => assert(undirected.contains((a, b, d)), s"$a->$b") }
    // Minimality: no strictly closer neighbor for any point.
    val byPoint = undirected.groupBy(_._1)
    nn.foreach { case (a, _, d) =>
      assert(byPoint(a).forall(_._3 >= d), s"point $a has a closer neighbor than $d")
    }
    // Tie-break: among equal-distance neighbors the lowest id wins.
    nn.foreach { case (a, b, d) =>
      val ties = byPoint(a).filter(_._3 == d).map(_._2)
      assert(ties.min == b, s"tie-break for $a")
    }
  }

  test("core points: neighbor counts consistent with the radius-join pair set") {
    val cores = Spatial.queries("geo_core_points")(spark, sf()).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Undirected pairs → per-point degree.
    val deg = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    Spatial.queries("geo_radius_join")(spark, sf()).collect().foreach { r =>
      deg(r.getLong(0)) += 1; deg(r.getLong(1)) += 1
    }
    val expected = deg.toMap.filter(_._2 >= Spatial.MinPts)
    assert(cores == expected, s"census differs: got $cores want $expected")
    cores.values.foreach(n => assert(n >= Spatial.MinPts))
  }

  test("dbscan: clusters equal a driver-side union-find over the pair set") {
    val got = Spatial.queries("geo_dbscan")(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val pairs = Spatial.queries("geo_radius_join")(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val deg = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    pairs.foreach { case (a, b) => deg(a) += 1; deg(b) += 1 }
    val cores = deg.filter(_._2 >= Spatial.MinPts).keySet.toSet
    // Union-find over core-core edges.
    val parent = scala.collection.mutable.Map(cores.map(c => c -> c).toSeq: _*)
    def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    pairs.foreach { case (a, b) =>
      if (cores(a) && cores(b)) parent(find(a)) = find(b)
    }
    val coreCluster = cores.map(c => c -> cores.filter(d => find(d) == find(c)).min).toMap
    val borderCluster = pairs.flatMap { case (a, b) =>
      Seq(a -> b, b -> a).collect { case (p, c) if !cores(p) && cores(c) => p -> coreCluster(c) }
    }.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val exp = (coreCluster.values.map(c => c -> ((1L, 0L))) ++
      borderCluster.values.map(c => c -> ((0L, 1L))))
      .groupBy(_._1).map { case (c, xs) =>
        (c, xs.map(_._2._1).sum, xs.map(_._2._2).sum)
      }.toSeq.sortBy(_._1)
    assert(got.toSeq == exp, s"got ${got.toSeq} want $exp")
    // Border points are never cores; every cluster id IS a core id.
    got.foreach { case (cid, nc, _) => assert(cores(cid) && nc >= 1) }
  }

  test("salted neighborhood join: identical pairs, hot cell spread r ways") {
    import spark.implicits._
    // Planted urban skew: 240 points packed into a 200×200 corner of cell
    // (0,0) — every pair qualifies (max distance < Radius) — plus 60
    // scattered points, one per distant cell. Unsalted, the hot cell's
    // whole candidate volume lands on ONE (cx, cy) shuffle key/task.
    val hot = (0 until 240).map(i => (i.toLong, (i % 20) * 10L, (i / 20) * 10L))
    val sparse = (0 until 60).map(i => (1000L + i, 5000L + 3000L * i, 7000L + 3000L * i))
    val pts = (hot ++ sparse).toDF("id", "x", "y")
      .withColumn("cx", floor(col("x") / Spatial.Radius))
      .withColumn("cy", floor(col("y") / Spatial.Radius))
    val keep = col("a") < col("b")
    val r = 8
    val plain = Spatial.neighborhoodPairsOf(pts, keep)
      .select(col("a"), col("b")).collect().map(x => (x.getLong(0), x.getLong(1)))
    val salted = Spatial.saltedNeighborhoodPairsOf(pts, keep, r)
    val saltedPairs = salted.select(col("a"), col("b")).collect().map(x => (x.getLong(0), x.getLong(1)))
    // Salting is semantically free: exactly the same pair set, no dup/loss.
    assert(saltedPairs.length == plain.length && saltedPairs.toSet == plain.toSet)
    assert(plain.count { case (a, b) => a < 240 && b < 240 } == 240 * 239 / 2,
      "the planted hot cell must contribute its full quadratic pair set")
    // The per-task bound, measured in the 100 TB regime (broadcast off —
    // at scale neither side of the self-join fits in memory): unsalted,
    // the (cx, cy) shuffle key puts the ENTIRE hot cell on one partition;
    // salted, its pairs spread across the r salt shards.
    // Coalescing off too: AQE folds a toy-sized shuffle into ONE partition,
    // which would mask the spread being measured (at real scale partitions
    // exceed the advisory size and stay apart).
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = (keys :+ "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> spark.conf.getOption(k))
    try {
      keys.foreach(spark.conf.set(_, "-1"))
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      def maxPartitionRows(df: org.apache.spark.sql.DataFrame): Long =
        df.groupBy(org.apache.spark.sql.functions.spark_partition_id().as("p"))
          .count().agg(max("count")).head().getLong(0)
      val plainMax = maxPartitionRows(Spatial.neighborhoodPairsOf(pts, keep))
      val saltedShuffle = Spatial.saltedNeighborhoodPairsOf(pts, keep, r)
      val saltedMax = maxPartitionRows(saltedShuffle)
      assert(plainMax >= 240 * 239 / 2, s"unsalted hot cell should own one task, got $plainMax")
      assert(saltedMax * 2 <= plainMax,
        s"salting must spread the hot cell: salted max $saltedMax vs unsalted $plainMax")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("cell stats: occupancy sums to points living in multi-point cells") {
    val rows = Spatial.queries("geo_cell_stats")(spark, sf()).collect()
    rows.foreach { r =>
      val n = r.getLong(r.fieldIndex("n"))
      assert(n >= 2)
      // min/max stay inside the cell's coordinate range.
      val cx = r.getLong(r.fieldIndex("cx")); val cy = r.getLong(r.fieldIndex("cy"))
      assert(r.getLong(r.fieldIndex("min_x")) >= cx * Spatial.Radius)
      assert(r.getLong(r.fieldIndex("max_x")) < (cx + 1) * Spatial.Radius)
      assert(r.getLong(r.fieldIndex("min_y")) >= cy * Spatial.Radius)
      assert(r.getLong(r.fieldIndex("max_y")) < (cy + 1) * Spatial.Radius)
    }
  }
}
