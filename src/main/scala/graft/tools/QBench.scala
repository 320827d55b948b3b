package graft.tools

/** Ad-hoc per-query micro-bench: reps of named SparkEntry queries in one
  * JVM (noop sink), min + median — for isolating regressions from this VM's
  * run-to-run drift. Usage: QBench <sfDir> <reps> <query...> */
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = graft.GraftSession.get(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-qbench")
    spark.read.parquet(s"$sfDir/region.parquet").count()
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).write.mode("overwrite").format("noop").save() // warm
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[qbench] $name: min=${ts.head}%.2f med=${ts(ts.size / 2)}%.2f (n=$reps)")
    }
    spark.stop()
  }
}
