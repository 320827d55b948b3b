package graft

import org.apache.spark.sql.SparkSession

/** Extra benchmark harness for optimization work (guide §1.4): times the
  * NAMED queries in isolation with repeats, noop sink, labelled jobs.
  * Separate from the frozen `Bench` — numbers cited in OPTIMIZATION_r06.md.
  *
  * Usage: runMain graft.BenchExtra <query> [<query> ...]
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, GRAFT_BENCH_REPS (default 3).
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("GRAFT_BENCH_REPS", "3").toInt
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.get(cpus, "graft-bench-extra")
    spark.read.parquet(s"$sfDir/region.parquet").count()
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      val times = (1 to reps).map { i =>
        spark.sparkContext.setJobDescription(s"$name rep $i")
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      spark.sparkContext.setJobDescription(null)
      println(f"""{"query":"$name","times":[${times.map(t => f"$t%.3f").mkString(",")}],"min":${f"${times.min}%.3f"}}""")
    }
    spark.stop()
  }
}
