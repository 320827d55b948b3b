package graft.tools

/** Debug CLI: execute one `SparkEntry` query and dump its FINAL adaptive
  * physical plan (AQE only finalizes spans after execution). Usage:
  * `runMain graft.tools.PlanDump <query> [sfDir]`. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = graft.GraftSession.get(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"), "plan-dump")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
