package graft.tools

import graft.operators.Relational
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: dq_profile shape A/B — (a) the gate's single-scan shared
  * Expand (4 exact distincts), (b) the same scan WITHOUT the distincts
  * (isolates the Expand's share), (c) four independent column-pruned
  * subtrees unioned (the dq_referential local-overlap shape). Quiet JVM.
  */
object ProfileProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val s = graft.EngineSession.local(cpus)
    def noop(df: DataFrame): Unit = df.write.mode("overwrite").format("noop").save()
    val d2 = org.apache.spark.sql.types.DecimalType(18, 2)
    def scan = Relational.parallelizeNarrowScan(
      Relational.t(s, dir, "lineitem")
        .select("l_quantity", "l_extendedprice", "l_returnflag", "l_shipdate"))

    def full = scan.agg(
      count(lit(1)).as("n"),
      (count(lit(1)) - count(col("l_quantity"))).as("qty_null"),
      countDistinct(col("l_quantity")).as("qty_dist"),
      min(col("l_quantity").cast(d2)).cast("string").as("qty_min"),
      max(col("l_quantity").cast(d2)).cast("string").as("qty_max"),
      (count(lit(1)) - count(col("l_extendedprice"))).as("price_null"),
      countDistinct(col("l_extendedprice")).as("price_dist"),
      min(col("l_extendedprice").cast(d2)).cast("string").as("price_min"),
      max(col("l_extendedprice").cast(d2)).cast("string").as("price_max"),
      (count(lit(1)) - count(col("l_returnflag"))).as("flag_null"),
      countDistinct(col("l_returnflag")).as("flag_dist"),
      min(col("l_returnflag")).as("flag_min"),
      max(col("l_returnflag")).as("flag_max"),
      (count(lit(1)) - count(col("l_shipdate"))).as("date_null"),
      countDistinct(col("l_shipdate")).as("date_dist"),
      min(col("l_shipdate")).cast("string").as("date_min"),
      max(col("l_shipdate")).cast("string").as("date_max"))

    def noDistinct = scan.agg(
      count(lit(1)).as("n"),
      (count(lit(1)) - count(col("l_quantity"))).as("qty_null"),
      min(col("l_quantity").cast(d2)).cast("string").as("qty_min"),
      max(col("l_quantity").cast(d2)).cast("string").as("qty_max"),
      (count(lit(1)) - count(col("l_extendedprice"))).as("price_null"),
      min(col("l_extendedprice").cast(d2)).cast("string").as("price_min"),
      max(col("l_extendedprice").cast(d2)).cast("string").as("price_max"),
      (count(lit(1)) - count(col("l_returnflag"))).as("flag_null"),
      min(col("l_returnflag")).as("flag_min"),
      max(col("l_returnflag")).as("flag_max"),
      (count(lit(1)) - count(col("l_shipdate"))).as("date_null"),
      min(col("l_shipdate")).cast("string").as("date_min"),
      max(col("l_shipdate")).cast("string").as("date_max"))

    def union4 = Seq("l_quantity", "l_extendedprice", "l_returnflag", "l_shipdate").map { c =>
      Relational.parallelizeNarrowScan(Relational.t(s, dir, "lineitem").select(c)).agg(
        count(lit(1)).as("n"),
        (count(lit(1)) - count(col(c))).as("n_null"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_value"),
        max(col(c)).cast("string").as("max_value"))
        .select(lit(c).as("column_name"), col("n"), col("n_null"),
          col("n_distinct"), col("min_value"), col("max_value"))
    }.reduce(_.unionByName(_)).orderBy("column_name")

    // Single scan, NO Expand: the three domain-bounded columns' exact
    // distinct counts ride size(collect_set) (state bounded by the domain),
    // the one high-cardinality column keeps countDistinct — a SOLE distinct
    // aggregate plans as a two-phase group-by, not an Expand.
    def hybrid = scan.agg(
      count(lit(1)).as("n"),
      (count(lit(1)) - count(col("l_quantity"))).as("qty_null"),
      size(collect_set(col("l_quantity"))).as("qty_dist"),
      min(col("l_quantity").cast(d2)).cast("string").as("qty_min"),
      max(col("l_quantity").cast(d2)).cast("string").as("qty_max"),
      (count(lit(1)) - count(col("l_extendedprice"))).as("price_null"),
      countDistinct(col("l_extendedprice")).as("price_dist"),
      min(col("l_extendedprice").cast(d2)).cast("string").as("price_min"),
      max(col("l_extendedprice").cast(d2)).cast("string").as("price_max"),
      (count(lit(1)) - count(col("l_returnflag"))).as("flag_null"),
      size(collect_set(col("l_returnflag"))).as("flag_dist"),
      min(col("l_returnflag")).as("flag_min"),
      max(col("l_returnflag")).as("flag_max"),
      (count(lit(1)) - count(col("l_shipdate"))).as("date_null"),
      size(collect_set(col("l_shipdate"))).as("date_dist"),
      min(col("l_shipdate")).cast("string").as("date_min"),
      max(col("l_shipdate")).cast("string").as("date_max"))

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "full_expand" -> (() => full),
      "no_distinct" -> (() => noDistinct),
      "union4" -> (() => union4),
      "hybrid" -> (() => hybrid))
    variants.foreach { case (_, f) => noop(f()) }
    (1 to 3).foreach { p =>
      variants.foreach { case (n, f) =>
        val t0 = System.nanoTime()
        noop(f())
        println(f"[dqprobe] pass$p $n%-12s ${(System.nanoTime() - t0) / 1e9}%6.3f s")
      }
    }
    s.stop()
  }
}
