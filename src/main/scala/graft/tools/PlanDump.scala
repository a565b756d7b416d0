package graft.tools
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.EngineSession.local("8")
    val p = graft.SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    p.linesIterator.filter(_.toLowerCase.contains("window")).foreach(l => println("LINE: " + l))
    spark.stop()
  }
}
