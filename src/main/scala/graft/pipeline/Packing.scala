package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the GPT-style pretraining layout step: documents are
  * laid end-to-end in a deterministic total order (numeric id) and cut into
  * fixed `budget`-token bins. Each document is assigned the bin and offset
  * where it STARTS, plus how many bins it spans (a document straddling a
  * boundary is split across bins by the downstream writer — concat-and-cut
  * semantics, no padding waste).
  *
  * Scale design — a global running sum over 10¹² docs cannot be one
  * window: this is the classic DISTRIBUTED PREFIX SUM, in plain DataFrame
  * ops:
  *   1. docs bucket by id range (`id div bucketSize`) — pure projection;
  *   2. per-bucket subtotals: partial-aggregated groupBy (counters only);
  *   3. bucket prefix offsets: one window over the TINY bucket table
  *      (N/bucketSize rows — the only single-partition step, and it never
  *      sees data rows);
  *   4. per-bucket running sum: window partitioned BY BUCKET — every
  *      bucket computes in parallel — plus the broadcast bucket offset.
  * Total data-row shuffles: one hash exchange by bucket (the window), with
  * the subtotal/prefix legs riding counter-sized tables.
  */
object Packing {

  /** Per-document packing assignment over a numeric-id table.
    * Output `(id, n_tok, start_bin, bin_offset, bins_spanned)`:
    * `start_bin = floor(cum_before / budget)`, `bin_offset = cum_before %
    * budget`, `bins_spanned = floor((cum_before + n_tok − 1)/budget) −
    * start_bin + 1` (0 for an empty document). Deterministic and
    * partition-invariant: the order is the id order, nothing physical. */
  def packSequences(df: DataFrame, idCol: String, nTokCol: String,
      budget: Long, bucketSize: Long = 100000L): DataFrame = {
    require(budget > 0 && bucketSize > 0)
    val base = df.select(col(idCol).cast("long").as("id"),
        col(nTokCol).cast("long").as("n_tok"))
      .withColumn("__bucket", floor(col("id") / bucketSize).cast("long"))
    val subtotals = base.groupBy("__bucket").agg(sum("n_tok").as("__btot"))
    // tiny table: one row per id-range bucket; the window never touches
    // data rows, so the single partition is fine at any corpus size
    val prefixWin = Window.orderBy("__bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixes = subtotals.select(col("__bucket"),
      coalesce(sum(col("__btot")).over(prefixWin), lit(0L)).as("__boffset"))
    val runWin = Window.partitionBy("__bucket").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(broadcast(prefixes), Seq("__bucket"))
      .withColumn("__cum_before",
        col("__boffset") + coalesce(sum(col("n_tok")).over(runWin), lit(0L)))
      // `div` is exact 64-bit integral division (all operands non-negative
      // here, so div == floor-div). floor(long/long) would divide as
      // DOUBLE: beyond 2^53 cumulative tokens — real at 10¹²-doc scale —
      // rounding near bin boundaries could disagree with the exact pmod
      // offset and with the oracle's integer `//`
      .select(col("id"), col("n_tok"),
        expr(s"__cum_before div ${budget}L").as("start_bin"),
        pmod(col("__cum_before"), lit(budget)).as("bin_offset"),
        when(col("n_tok") === 0, lit(0L)).otherwise(
          expr(s"(__cum_before + n_tok - 1) div ${budget}L")
            - expr(s"__cum_before div ${budget}L") + 1L)
          .as("bins_spanned"))
  }

  /** Bin-level report: how full each bin is — the packing-efficiency
    * observability hook (`fill_frac` ≈ 1 everywhere is the point of
    * concat-and-cut; the final bin is the only short one). Derived from
    * the total token count alone — no per-bin shuffle. */
  def binReport(packed: DataFrame, budget: Long): DataFrame = {
    packed.agg(sum(col("n_tok")).as("total_tokens")).select(
      col("total_tokens"),
      ceil(col("total_tokens").cast("double") / budget).cast("long").as("n_bins"),
      (col("total_tokens").cast("double")
        / (ceil(col("total_tokens").cast("double") / budget) * budget))
        .as("fill_frac"))
  }
}
