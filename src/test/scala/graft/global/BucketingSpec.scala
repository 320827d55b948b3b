package graft.global

import graft.SparkSuite
import graft.sources.TokenGen
import org.apache.spark.sql.functions._

/** Co-located joins via bucketing (SURVEY.md §2.4 / the partitioning
  * checklist): a fact table bucketed on the join key joins bucket-to-bucket
  * with NO shuffle exchange — the plan shape that makes repeated large-large
  * joins affordable at 100 TB (pay the shuffle once at write time). */
class BucketingSpec extends SparkSuite {

  test("bucketed self-join runs without a shuffle exchange") {
    val facts = TokenGen.tokenSequences(spark, 20000, numPartitions = 4, maxLen = 16)
    spark.sql("DROP TABLE IF EXISTS facts_bucketed")
    facts.write.bucketBy(8, "doc_id").sortBy("doc_id")
      .format("parquet").saveAsTable("facts_bucketed")

    val t = spark.table("facts_bucketed")
    val joined = t.as("a").join(t.as("b"), "doc_id")
      .select(col("doc_id"), col("a.n_tok"), col("b.source"))

    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle; plan:\n$plan")

    // correctness: planted duplicates join 2x2
    val nDup = TokenGen.expectedPlantCount(20000, TokenGen.DupPeriod)
    assert(joined.count() === 20000L + 2 * nDup) // each dup key contributes 4 instead of 2
  }

  test("bucketed join with a differently-bucketed side still works (one-sided shuffle)") {
    val other = TokenGen.tokenSequences(spark, 5000, numPartitions = 3, maxLen = 16)
      .select(col("doc_id"), col("n_tok").as("other_n"))
    val t = spark.table("facts_bucketed")
    val joined = t.join(other, "doc_id")
    // only the unbucketed side shuffles
    val plan = joined.queryExecution.executedPlan.toString
    assert(joined.count() >= 5000L)
    assert(plan.contains("Exchange") || plan.contains("Broadcast")) // other side repartitions/broadcasts
  }
}
