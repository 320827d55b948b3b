package graft

import java.nio.file.{Files, Paths}

/** Dumps `.explain("formatted")` of the NAMED queries to
  * `plans/r06/<query>_<tag>.txt` — the optimization round's plan evidence.
  *
  * Usage: runMain graft.PlanDump <tag> <query> [<query> ...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val tag = args.head
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.get(cpus, "graft-plan-dump")
    Files.createDirectories(Paths.get("plans/r06"))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"plans/r06/${name}_$tag.txt"), plan)
      println(s"wrote plans/r06/${name}_$tag.txt")
    }
    spark.stop()
  }
}
