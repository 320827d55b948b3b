package graft.tools

/** Throwaway measurements (not part of the engine). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get("32", "scratch")
    val df = graft.SparkEntry.queries("v44_approx_distinct")(spark, "/root/testdata/sf0.1")
    df.write.mode("overwrite").format("noop").save()
    val plan = df.queryExecution.executedPlan.toString
    "ShuffleQueryStage [0-9]+".r.findAllIn(plan).toSeq.groupBy(identity)
      .foreach { case (s, v) => println(s"[scratch] $s x${v.size}") }
    println("[scratch] scan count: " + "Scan parquet".r.findAllIn(plan).size)
    spark.stop()
  }
}
