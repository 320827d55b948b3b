package graft.streaming

import graft.core.{Rule, RuleCompiler}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured Streaming surface of the engine (the reference is purely
  * synchronous single-document — SURVEY.md §2.9; this is the engine-side
  * extension for continuous ingest validation).
  *
  * Row-local rules are stateless projections, so the exact same compiled
  * Catalyst expressions run unchanged on a stream; the dataset-global rules
  * become windowed aggregates with watermarks (bounded state). Uniqueness
  * over an unbounded stream is necessarily windowed — global uniqueness
  * belongs to the batch/snapshot path.
  */
object StreamingValidate {

  /** Violations on a stream: same compile as batch, filter-before-explode.
    * Append-mode safe (no aggregation). */
  def violations(stream: DataFrame, rule: Rule, idCols: Seq[String],
      ctx: RuleCompiler.Ctx = RuleCompiler.Ctx()): DataFrame = {
    val rowCol = struct(stream.columns.map(col): _*)
    val errs = RuleCompiler.compile(rule, stream.schema, rowCol, lit(""), ctx)
    val keep = idCols.map(col)
    stream.select(keep :+ errs.as("_errs"): _*)
      .select(keep :+ explode(col("_errs")).as("_e"): _*)
      .select(keep ++ Seq(
        when(col("_e.path") === "", "/").otherwise(col("_e.path")).as("path"),
        col("_e.rule_id").as("rule_id"),
        col("_e.observed").as("observed")): _*)
  }

  /** Tumbling-window pass/fail verdicts with a watermark: the streaming
    * analog of the per-partition verdict table. State is bounded by the
    * watermark horizon. */
  def windowedVerdicts(stream: DataFrame, rule: Rule, tsCol: String,
      windowDuration: String, watermark: String,
      ctx: RuleCompiler.Ctx = RuleCompiler.Ctx()): DataFrame = {
    val rowCol = struct(stream.columns.map(col): _*)
    val errs = RuleCompiler.compile(rule, stream.schema, rowCol, lit(""), ctx)
    stream
      .withColumn("__failed", (size(errs) > 0).cast("long"))
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDuration))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("__failed")).as("n_failed"))
      .select(
        col("window.start").as("window_start"),
        col("n_rows"), col("n_failed"),
        when(col("n_failed") === 0, "pass").otherwise("fail").as("verdict"))
  }
}
