package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-containment (range) join — `point.time ∈ [start, end)` —
  * without the non-equi trap. Spark plans a raw range predicate as
  * BroadcastNestedLoopJoin (or a cartesian), which is O(|points|·|intervals|)
  * compares: unusable once neither side broadcasts.
  *
  * The scalable form is the standard bucketize trick: time is cut into
  * fixed `bucketSeconds` buckets; every interval replicates into the
  * buckets it covers (replication factor = ⌈len/bucket⌉ + 1 — pick the
  * bucket near the median interval length to keep it small); every point
  * carries its single bucket. The join is then a plain EQUI join on the
  * bucket (hash/sort-merge/broadcast — Catalyst's choice, never a nested
  * loop), post-filtered by the exact containment predicate. Each matching
  * (point, interval) pair meets in exactly ONE bucket — the point's — so
  * no dedup pass is needed.
  *
  * Skew: a bucket with many points is the same hot-key story as any
  * equi-join (AQE skew-join splits it); an interval spanning the whole
  * corpus timeline replicates into every bucket — cap interval lengths or
  * raise `bucketSeconds` for such dimension rows.
  *
  * Column names must be disjoint between the two inputs (standard join
  * hygiene; the operator adds and drops only `__bucket`).
  */
object RangeJoin {

  def joinPointInInterval(points: DataFrame, pointTime: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0)
    val p = points.withColumn("__bucket",
      expr(s"unix_timestamp(`$pointTime`) div ${bucketSeconds}L"))
    val iv = intervals.withColumn("__bucket", explode(sequence(
      expr(s"unix_timestamp(`$startCol`) div ${bucketSeconds}L"),
      expr(s"unix_timestamp(`$endCol`) div ${bucketSeconds}L"))))
    p.join(iv, Seq("__bucket"))
      .where(col(pointTime) >= col(startCol) && col(pointTime) < col(endCol))
      .drop("__bucket")
  }
}
