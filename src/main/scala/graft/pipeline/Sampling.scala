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

  /** Temperature-mixture keep-rates (the multinomial source-rebalancing
    * step of multilingual/multi-source pretraining, Lample & Conneau-style):
    * given per-group sizes c_i, target mixture p_i ∝ c_i^alpha (alpha < 1
    * upweights the tail), and a total budget of `totalBudget` rows, the
    * keep-rate for group i is min(1, p_i · totalBudget / c_i). Rates are
    * rounded to 6 decimals so the engine-portable threshold compare is
    * immune to last-ulp libm differences (alpha = 0.5 is exactly IEEE-sqrt
    * and the DuckDB oracle reproduces it bit-for-bit).
    *
    * Pure driver-side arithmetic over ONE tiny (group, count) aggregate —
    * the group order is sorted before the normalizing sum so the float
    * fold is deterministic and engine-reproducible. */
  def temperatureRates(counts: Seq[(String, Long)], alpha: Double,
      totalBudget: Long): Seq[(String, Double)] = {
    val sorted = counts.sortBy(_._1)
    val weights = sorted.map { case (g, c) => g -> math.pow(c.toDouble, alpha) }
    val z = weights.map(_._2).sum
    sorted.zip(weights).map { case ((g, c), (_, w)) =>
      val raw = math.min(1.0, w / z * totalBudget / c.toDouble)
      // half-away-from-zero at 6 decimals — DuckDB round() semantics
      g -> BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
  }

  /** [[stratifiedSample]] with rates derived by [[temperatureRates]] from
    * the corpus' own group counts: one counter aggregation (collected —
    * one row per GROUP), then a pure hash-threshold projection. Groups
    * outside the counted set keep nothing (rate 0 — the budget was
    * allocated over the observed groups); a NULL group value is excluded
    * from the allocation the same way (rate 0 — rows with no stratum are
    * dropped, never NPE the driver-side sort). */
  def temperatureSample(df: DataFrame, groupCol: String, idCol: String,
      alpha: Double, totalBudget: Long, seed: Int = 0): DataFrame = {
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("c"))
      .collect().filterNot(_.isNullAt(0))
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    val rates = temperatureRates(counts, alpha, totalBudget).toMap
    stratifiedSample(df, groupCol, idCol, rates, defaultRate = 0.0, seed)
  }
}
