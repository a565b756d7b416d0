package graft.tools

import java.nio.file.{Files, Paths}

/** Dev tool: write each named query's `.explain("formatted")` text to
  * `<outDir>/<name>_<suffix>.txt` — the optimization-round evidence format
  * (plans/rNN/<query>_before.txt / _after.txt). Build-only: plans are
  * captured without executing the query, so a snapshot run is cheap and
  * does not disturb a concurrent measurement.
  * Usage: PlanSnap <outDir> <suffix> <sfDir> <q1,q2,...>
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    if (args.length < 4) {
      System.err.println("usage: PlanSnap <outDir> <suffix> <sfDir> <q1,q2,...>")
      sys.exit(2)
    }
    val (outDir, suffix, sfDir) = (args(0), args(1), args(2))
    val names = args(3).split(",").toSeq
    val spark = graft.EngineSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString))
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), txt)
        println(s"[plansnap] wrote $outDir/${name}_$suffix.txt (${txt.linesIterator.size} lines)")
      } catch { case e: Throwable =>
        System.err.println(s"[plansnap] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
