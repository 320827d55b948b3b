package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for training-data pipelines. Every
  * assignment is a pure function of the row's id (md5-derived unit-interval
  * hash) — no RNG state, so splits are reproducible across runs, engines
  * (the DuckDB oracle recomputes them) and cluster layouts, and a document
  * NEVER migrates between train and eval when the corpus grows (the
  * property per-partition `rand()` sampling lacks). */
object Sampling {

  /** Uniform [0,1) hash of an id: first 32 md5 bits / 2^32. Portable:
    * `('0x' || substr(md5('split<seed>:' || id), 1, 8))::BIGINT / 4294967296.0`. */
  def unitHash(id: Column, seed: Int = 0): Column =
    conv(substring(md5(concat(lit(s"split$seed:"), id.cast("string")).cast("binary")), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)

  /** Split label from cumulative fractions, e.g.
    * `splitLabel(col("id"), Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))`.
    * The last label absorbs rounding remainder. */
  def splitLabel(id: Column, fractions: Seq[(String, Double)], seed: Int = 0): Column = {
    require(fractions.nonEmpty && math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "fractions must sum to 1")
    val u = unitHash(id, seed)
    val cum = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
    fractions.map(_._1).zip(cum).init
      .foldRight(lit(fractions.last._1): Column) { case ((label, hi), acc) =>
        when(u < hi, lit(label)).otherwise(acc)
      }
  }

  /** Keep a deterministic `rate` fraction of rows (hash threshold). */
  def sample(df: DataFrame, idCol: String, rate: Double, seed: Int = 0): DataFrame =
    df.where(unitHash(col(idCol), seed) < rate)

  /** Per-stratum deterministic rates (e.g. downsample boilerplate-heavy
    * sources harder): strata missing from `rates` keep `defaultRate`. */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0, seed: Int = 0): DataFrame = {
    val rateCol = rates.foldLeft(lit(defaultRate)) { case (acc, (stratum, r)) =>
      when(col(stratumCol) === stratum, lit(r)).otherwise(acc)
    }
    df.where(unitHash(col(idCol), seed) < rateCol)
  }
}
