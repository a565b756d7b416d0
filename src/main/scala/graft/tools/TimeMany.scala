package graft.tools

import graft.SparkEntry

/** Dev tool: time a comma-separated list of queries sequentially in ONE JVM
  * (the bench's session + accumulated-state conditions) against the noop
  * sink. Unlike [[TimeQuery]], the timer covers query CONSTRUCTION too —
  * operators that materialize state eagerly (trained ANN indexes, layout
  * rewrites, MV builds) do that work at construction, and excluding it
  * understates their cost.
  * Usage: TimeMany <q1,q2,...> <sfDir>
  */
object TimeMany {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val spark = graft.EngineSession.local(cpus)
    names.foreach { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
      println(f"[time] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
