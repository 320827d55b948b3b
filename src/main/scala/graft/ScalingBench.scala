package graft

import graft.core.Violations
import graft.global.{Referential, Uniqueness}
import graft.sources.TokenGen
import graft.stats.ColumnStats
import graft.tools.AuditCli
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** Scaling-efficiency evidence for the north rule: the same flagship audit
  * job on IDENTICAL parquet input at two parallelism levels (local[N] and
  * local[4N] stand in for N and 4N executors in this sandbox — driver
  * mandate), reporting rows/s at both plus
  * efficiency = throughput@4N / (4 × throughput@N). Target ≥ 0.8.
  *
  * Writes BENCH/BASELINE.md. Usage: ScalingBench [nRows] [maxLen] [n] [reps]
  */
object ScalingBench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** The audited workload: one full pass of row-local rules + stats, plus
    * the uniqueness and referential global rules. */
  private def audit(spark: SparkSession, dataDir: String): Long = {
    val facts = spark.read.parquet(dataDir)
    val dim = TokenGen.allowedSources(spark)
    val pack = AuditCli.tokenRulePack(maxLen = 8192)
    val nViol = Violations.validate(facts, pack, Seq("doc_id")).count()
    val nDup = Uniqueness.duplicateKeys(facts, Seq("doc_id")).count()
    val nRef = Referential.violations(facts, "source", dim, "source").count()
    val nStats = ColumnStats.profile(facts).count()
    nViol + nDup + nRef + nStats
  }

  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(2000000L)
    val maxLen = args.lift(1).map(_.toLong).getOrElse(128L)
    val small = args.lift(2).map(_.toInt).getOrElse(8)
    val reps = args.lift(3).map(_.toInt).getOrElse(3)
    val big = small * 4

    // materialize identical input once (keyed by size so reruns at a new
    // scale regenerate)
    val dataDir = s"/tmp/graft-scaling-input-$n-$maxLen"
    val gen = session(big)
    if (!Files.exists(Paths.get(s"$dataDir/_SUCCESS"))) {
      TokenGen.tokenSequences(gen, n, numPartitions = big * 4, maxLen = maxLen)
        .write.mode("overwrite").parquet(dataDir)
    }
    val rows = gen.read.parquet(dataDir).count()
    gen.stop()

    def measure(cores: Int): Double = {
      val s = session(cores)
      audit(s, dataDir) // warm-up (codegen + page cache)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        audit(s, dataDir)
        (System.nanoTime() - t0) / 1e9
      }
      s.stop()
      times.min
    }

    val tSmall = measure(small)
    val tBig = measure(big)
    val thrSmall = rows / tSmall
    val thrBig = rows / tBig
    val eff = thrBig / (4.0 * thrSmall)

    val report =
      f"""# BENCH — scaling efficiency (north rule evidence)
         |
         |Flagship audit job (row-local rule pack + uniqueness + referential +
         |column stats) on identical parquet input, same JVM size, two
         |parallelism levels (local[N] threads stand in for N executors in
         |this single-node sandbox).
         |
         || metric | value |
         ||---|---|
         || input rows | $rows |
         || input | $dataDir (maxLen=$maxLen tokens/row) |
         || wall @ local[$small] (best of $reps) | $tSmall%.2f s |
         || wall @ local[$big] (best of $reps) | $tBig%.2f s |
         || throughput @ local[$small] | ${thrSmall / 1e6}%.3f M rows/s |
         || throughput @ local[$big] | ${thrBig / 1e6}%.3f M rows/s |
         || scaling efficiency thr@4N/(4·thr@N) | $eff%.3f |
         || target | ≥ 0.8 |
         |
         |Config: spark.sql.shuffle.partitions = cores,
         |AQE on, noop-free counts (full materialization of violations,
         |dup keys, referential anti-join, stats).
         |""".stripMargin

    Files.createDirectories(Paths.get("BENCH"))
    Files.writeString(Paths.get("BENCH/BASELINE.md"), report)
    println(report)
    println(f"""{"metric":"scaling_efficiency","value":$eff%.3f,"rows":$rows,"thr_small":$thrSmall%.0f,"thr_big":$thrBig%.0f}""")
  }
}
