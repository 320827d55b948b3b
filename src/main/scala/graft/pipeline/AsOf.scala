package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — each left row picks the latest right row of
  * the same key with `rightTime <= leftTime`. Spark has no native ASOF
  * join; the naive formulation (range join + per-row max) explodes into a
  * cross product per key before pruning. This is the scalable composition:
  *
  *  1. project both sides onto a common `(key, time, side, payload)` shape
  *     and UNION them — no join node at all;
  *  2. ONE hash shuffle on the key, one ordered window pass;
  *  3. `last(payload, ignoreNulls)` carried forward over
  *     `rowsBetween(unboundedPreceding, current)` hands every left row the
  *     most recent right payload; right rows sort BEFORE left rows at equal
  *     timestamps, so the match is inclusive (`>=`), exactly DuckDB/ASOF
  *     semantics.
  *
  * Cost is |L|+|R| rows through one shuffle+sort — no row explosion, skewed
  * keys cost their own row count. State per partition is one payload struct.
  *
  * `right` must be unique per `(key, time)` (pre-aggregate ties away);
  * otherwise which tied row wins is partition-order dependent.
  */
object AsOf {

  /** Left columns + `asof_<payload fields>` (NULL when no right row is at or
    * before the left row's time). */
  def joinAsOf(left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      payload: Seq[String]): DataFrame = {
    val reserved = Set("__k", "__t", "__is_left", "__l", "__r", "__rc")
    require(!left.columns.exists(reserved), s"left side uses a reserved column name (${reserved.mkString(", ")})")
    val leftStruct  = struct(left.columns.toIndexedSeq.map(col): _*)
    val rightStruct = struct(payload.map(col): _*)
    val rightType   = right.select(rightStruct).schema.head.dataType
    val leftType    = left.select(leftStruct).schema.head.dataType

    val l2 = left.select(col(leftKey).as("__k"), col(leftTime).as("__t"),
      lit(1).as("__is_left"), leftStruct.as("__l"),
      lit(null).cast(rightType).as("__r"))
    // ASOF semantics: a right row with a NULL key or NULL time can never
    // match (`t >= NULL` is never true) — drop them, or the carry-forward
    // would hand their payload to every left row in the NULL partition
    val r2 = right
      .where(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(col(rightKey).as("__k"), col(rightTime).as("__t"),
        lit(0).as("__is_left"), lit(null).cast(leftType).as("__l"),
        rightStruct.as("__r"))

    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l2.unionByName(r2)
      .withColumn("__rc", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__is_left") === 1)

    val leftCols = left.columns.toIndexedSeq.map(c => col(s"__l.$c").as(c))
    val payCols  = payload.map(c => col(s"__rc.$c").as(s"asof_$c"))
    carried.select(leftCols ++ payCols: _*)
  }
}
