package graft.tools

import graft.SparkEntry

/** Dev tool: time a comma-separated list of queries sequentially in ONE JVM
  * against the noop sink — reproduces the bench's accumulated-session-state
  * conditions for a subset of queries.
  * Usage: TimeMany <q1,q2,...> <sfDir>
  */
object TimeMany {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    // Bisection knob for perf diagnosis (dev tool only): core scheduler
    // confs are frozen at context creation, so the override must precede it.
    val spark =
      if (sys.env.contains("SPARK_GRAFT_NOSPEC")) {
        import org.apache.spark.sql.SparkSession
        val b0 = SparkSession.builder()
          .master(s"local[$cpus]")
        val b1 = if (sys.env.contains("SPARK_GRAFT_NOEXT")) b0
          else b0.withExtensions(new graft.plans.GraftExtensions)
        val s: SparkSession = b1
          .config("spark.sql.shuffle.partitions", cpus)
          .config("spark.sql.session.timeZone", "UTC")
          .config("spark.sql.adaptive.enabled", "true")
          .config("spark.ui.enabled", "false")
          .config("spark.speculation", "false")
          .getOrCreate()
        s.sparkContext.setLogLevel("WARN")
        s
      } else graft.EngineSession.local(cpus)
    names.foreach { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
      println(f"[time] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
