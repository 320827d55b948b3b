package graft.stats

import graft.SparkSuite
import graft.functions.HistogramSketch
import graft.sources.TokenGen
import org.apache.spark.sql.functions._

class HistogramSketchSpec extends SparkSuite {
  import spark.implicits._

  private lazy val facts = TokenGen.tokenSequences(spark, 20000, numPartitions = 7, maxLen = 64)

  test("one-pass sketch equals the groupBy histogram") {
    val a = Drift.histogram(facts, "n_tok", 0, 64, 16)
      .orderBy("bin").as[(Int, Long)].collect().toSeq
    val b = Drift.histogramOnePass(facts, "n_tok", 0, 64, 16)
      .orderBy("bin").as[(Int, Long)].collect().toSeq
    assert(a === b)
    assert(a.map(_._2).sum === 20000L)
  }

  test("sketch works inside groupBy (per-source histograms, one job)") {
    HistogramSketch.register(spark)
    val perSource = facts.groupBy("source")
      .agg(HistogramSketch.histogramSketch(col("n_tok"), 0, 64, 16).as("hist"),
        count(lit(1)).as("n"))
    val row = perSource.where(col("source") === "web-common").head()
    val hist = row.getSeq[Long](1)
    assert(hist.length === 16)
    assert(hist.sum === row.getLong(2)) // mass conservation per group
  }

  test("sketch is partition-invariant (merge correctness)") {
    val a = Drift.histogramOnePass(TokenGen.tokenSequences(spark, 9999, 3, 64), "n_tok", 0, 64, 8)
      .orderBy("bin").as[(Int, Long)].collect().toSeq
    val b = Drift.histogramOnePass(TokenGen.tokenSequences(spark, 9999, 17, 64), "n_tok", 0, 64, 8)
      .orderBy("bin").as[(Int, Long)].collect().toSeq
    assert(a === b)
  }

  test("SQL surface: histogram_sketch callable from spark.sql") {
    HistogramSketch.register(spark)
    facts.createOrReplaceTempView("facts_hs")
    val viaSql = spark.sql(
      "SELECT histogram_sketch(CAST(n_tok AS DOUBLE), 0, 64, 4) AS h FROM facts_hs")
      .head().getSeq[Long](0)
    assert(viaSql.length === 4 && viaSql.sum === 20000L)
  }
}
