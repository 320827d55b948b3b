package graft.tools

import graft.core.Violations
import graft.global.{Referential, Uniqueness}
import graft.sources.TokenGen
import graft.stats.ColumnStats
import org.apache.spark.sql.SparkSession

/** Per-component scaling probe: times each audit stage separately at one
  * parallelism level. Usage: ComponentBench <cores> <dataDir> [reps] */
object ComponentBench {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val dataDir = args(1)
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = graft.GraftSession.get(cores.toString, "graft-component")
    val facts = spark.read.parquet(dataDir)
    val dim = TokenGen.allowedSources(spark)
    val pack = AuditCli.tokenRulePack(maxLen = 8192)

    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[component] $name@$cores: ${ts.min}%.2f s")
    }

    time("scan_only")(facts.count())
    time("decode_tokens")(facts.agg(org.apache.spark.sql.functions.sum(
      org.apache.spark.sql.functions.size(org.apache.spark.sql.functions.col("tokens")))).collect())
    time("validate")(Violations.validate(facts, pack, Seq("doc_id")).count())
    time("uniqueness")(Uniqueness.duplicateKeys(facts, Seq("doc_id")).count())
    time("uniqueness_hashed")(Uniqueness.duplicateKeysHashed(facts, Seq("doc_id")).count())
    time("referential")(Referential.violations(facts, "source", dim, "source").count())
    time("stats")(ColumnStats.profile(facts).count())
    spark.stop()
  }
}
