package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event log: consecutive events of the same
  * entity belong to one session while the inter-event gap stays under
  * `gapSeconds`; a larger gap starts a new session.
  *
  * Shape at scale: ONE shuffle (hash partition by the entity key), then two
  * ordered window passes over each partition — `lag` to flag session starts
  * and a running `sum` to number them. State per entity is O(1); nothing is
  * collected to the driver, and skewed entities cost their own row count,
  * never a cross product. Timestamps are compared at microsecond precision
  * as exact integers (`unix_micros`), so session boundaries are
  * engine-portable (no floating-point epoch arithmetic).
  */
object Sessions {

  /** Adds `session_idx` (1-based per entity, in `(tsCol, tieCol)` order).
    * `tieCol` must make the ordering total — equal timestamps otherwise
    * leave the running numbering nondeterministic across partitionings.
    * Contract: `tsCol` must be non-null (a NULL timestamp has no position
    * in event time; filter or repair upstream — the null-count stats rule
    * is the detector). */
  def sessionize(df: DataFrame, userCol: String, tsCol: String, tieCol: String,
      gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    // NTZ columns cast through TIMESTAMP (UTC session zone — GraftSession
    // pins it) so unix_micros applies; monotone, so ordering is unchanged
    val us = unix_micros(col(tsCol).cast("timestamp"))
    val prev = lag(us, 1).over(w)
    val newSession =
      when(prev.isNull || us - prev > gapSeconds * 1000000L, 1L).otherwise(0L)
    df.withColumn("session_idx",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }
}
