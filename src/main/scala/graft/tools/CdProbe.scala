package graft.tools

import graft.operators.{Changes, Dedup, Relational}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev probe: one-variable attribution of the cd_* pair's cost — (a) the
  * spreadKeys pin on/off, (b) the md5 changelog derivation in isolation,
  * (c) the output orderBy on/off. Run in a QUIET JVM; numbers recorded in
  * README "Performance measurement notes" (r12). The variants deliberately
  * re-state the cd_* plans inline (rather than calling Changes.queries) so
  * each knob is a one-line difference; if Changes.scala's plans change,
  * update these to match before re-measuring.
  */
object CdProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val s = graft.EngineSession.local(cpus)
    def noop(df: DataFrame): Unit = df.write.mode("overwrite").format("noop").save()

    def scd2(pin: Boolean, sort: Boolean): DataFrame = {
      val log0 = Changes.changelog(Relational.t(s, dir, "orders")).filter(col("op") === "U")
      val log = if (pin) log0.transform(Dedup.spreadKeys("key")) else log0
      val w = Window.partitionBy("key").orderBy(col("ts").asc, col("seq").asc)
      val core = log.select(
        col("key").as("c_custkey"), col("new_bal").as("bal"),
        col("ts").as("valid_from"), lead(col("ts"), 1).over(w).as("valid_to"), col("seq"))
      (if (sort) core.orderBy("c_custkey", "valid_from", "seq") else core).drop("seq")
    }
    def applyLog(pin: Boolean, sort: Boolean): DataFrame = {
      val base = Relational.t(s, dir, "customer")
      val log0 = Changes.changelog(Relational.t(s, dir, "orders"))
      val log = if (pin) log0.transform(Dedup.spreadKeys("key")) else log0
      val w = Window.partitionBy("key").orderBy(col("ts").desc, col("seq").desc)
      val latest = log.withColumn("rk", row_number().over(w)).filter(col("rk") === 1).drop("rk")
      val merged = base.join(latest, base("c_custkey") === latest("key"), "full_outer")
        .filter(col("op").isNull || col("op") =!= "D")
        .select(
          coalesce(col("c_custkey"), col("key")).as("c_custkey"),
          coalesce(col("c_name"), concat(lit("cust#"), col("key"))).as("c_name"),
          when(col("op").isNotNull, col("new_bal")).otherwise(col("c_acctbal")).as("c_acctbal"))
      if (sort) merged.orderBy("c_custkey") else merged
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "changelog_only" -> (() => Changes.changelog(Relational.t(s, dir, "orders"))),
      "scd2_full" -> (() => scd2(pin = true, sort = true)),
      "scd2_nopin" -> (() => scd2(pin = false, sort = true)),
      "scd2_nosort" -> (() => scd2(pin = true, sort = false)),
      "apply_full" -> (() => applyLog(pin = true, sort = true)),
      "apply_nopin" -> (() => applyLog(pin = false, sort = true)),
      "apply_nosort" -> (() => applyLog(pin = true, sort = false)),
    )
    // Warm every variant once (JIT/codegen), then 3 timed passes each.
    variants.foreach { case (_, f) => noop(f()) }
    (1 to 3).foreach { p =>
      variants.foreach { case (n, f) =>
        val t0 = System.nanoTime()
        noop(f())
        println(f"[cdprobe] pass$p $n%-14s ${(System.nanoTime() - t0) / 1e9}%6.3f s")
      }
    }
    s.stop()
  }
}
