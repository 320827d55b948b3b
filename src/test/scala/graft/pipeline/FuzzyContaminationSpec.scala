package graft.pipeline

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[Dedup.fuzzyContaminationTokens]]: exact leakage scores 16/16, token
  * dropped near-copies clear the gate, disjoint-vocabulary docs never
  * pair, and the bench side rides broadcast joins (no cartesian, no
  * shuffled bench). */
class FuzzyContaminationSpec extends SparkSuite {
  import spark.implicits._

  private def tokens(seed: Int): Seq[Int] =
    (0 until 40).map(j => (seed * 37 + j * 11) % 5000)

  test("exact, near and clean bench docs score as designed") {
    val train = (0L until 30L).map(i => (i, tokens(i.toInt))).toDF("doc_id", "tokens")
    val bench = Seq(
      (100L, tokens(3)),                    // exact copy of train 3
      (101L, tokens(5).drop(2)),            // near copy of train 5
      (102L, tokens(7).map(_ + 50000))      // disjoint vocabulary
    ).toDF("doc_id", "tokens")
    val out = Dedup.fuzzyContaminationTokens(train, bench, "doc_id", "tokens",
        shingleK = 3, numHashes = 16, bands = 8, minAgree = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((3L, 100L)) === 16L)
    assert(out.contains((5L, 101L)) && out((5L, 101L)) >= 8L)
    assert(!out.keys.exists(_._2 == 102L))
  }

  test("plan: bench side broadcast, no cartesian product") {
    val train = (0L until 30L).map(i => (i, tokens(i.toInt))).toDF("doc_id", "tokens")
    val bench = Seq((100L, tokens(3))).toDF("doc_id", "tokens")
    val df = Dedup.fuzzyContaminationTokens(train, bench, "doc_id", "tokens",
      shingleK = 3, numHashes = 16, bands = 8, minAgree = 8)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }
}
