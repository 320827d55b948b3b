package graft.stats

import graft.SparkSuite
import graft.core.{Rule, Violations}
import org.apache.spark.sql.functions._

class PackInferenceSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private val cols = Seq("doc_id", "lang", "source", "n_chars")

  test("LAW: the inferred pack validates its own corpus with ZERO violations") {
    val pack = PackInference.infer(docs, cols)
    assert(Violations.validate(docs, pack, Seq("doc_id")).count() === 0)
  }

  test("inferred bounds and enums actually bite on drifted data") {
    val pack = PackInference.infer(docs, cols)
    // numeric drift beyond the observed max → maximum violations
    val overflow = docs.withColumn("n_chars", col("n_chars") + lit(10000000L))
    assert(Violations.validate(overflow, pack, Seq("doc_id"))
      .where(col("rule_id") === "maximum").count() === docs.count())
    // an unseen language → enum violations (lang is low-cardinality)
    val alien = docs.withColumn("lang", lit("xx"))
    assert(Violations.validate(alien, pack, Seq("doc_id"))
      .where(col("rule_id") === "enum").count() === docs.count())
  }

  test("profile artifact: types from schema, requireds from nulls, enum gating by cardinality") {
    val rows = PackInference.inferredProfile(docs, cols, enumThreshold = 16)
      .orderBy("column").collect()
    val byCol = rows.map(r => r.getString(0) -> r).toMap
    assert(byCol("doc_id").getString(1) === "integer")
    assert(byCol("lang").getString(1) === "string")
    // numeric bounds populated for numerics only
    assert(!byCol("n_chars").isNullAt(4) && byCol("lang").isNullAt(4))
    // enum list is sorted and within the threshold
    val langs = byCol("lang").getString(6).split(",").toSeq
    assert(langs === langs.sorted && langs.size <= 16)
    // a high-cardinality column must NOT become an enum
    val wide = PackInference.inferredProfile(docs, Seq("lang"), enumThreshold = 1)
      .collect().head
    assert(wide.isNullAt(6))
  }
}
