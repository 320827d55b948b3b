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

  test("robust inference: one corrupted outlier cannot stretch the bounds; min/max would") {
    // inject a single absurd row into a copy of the corpus
    val corrupted = docs.unionByName(
      docs.limit(1).withColumn("doc_id", lit(999999L))
        .withColumn("n_chars", lit(1000000000L)))
    val loose = PackInference.infer(corrupted, cols)
    // at 501 rows p99.9 INTERPOLATES into the single outlier (R-7 index
    // 499.5 of 500) — a small corpus needs a wider margin, so p1/p99 here
    val tight = PackInference.inferRobust(corrupted, cols, loQ = 0.01, hiQ = 0.99)
    // the min/max pack accepts a mid-range garbage value; the robust pack
    // rejects it (its p99.9 sits inside the real data)
    val midGarbage = docs.limit(1).withColumn("n_chars", lit(500000000L))
    assert(Violations.validate(midGarbage, loose, Seq("doc_id")).count() === 0,
      "min/max inference was stretched by the outlier, as expected")
    assert(Violations.validate(midGarbage, tight, Seq("doc_id"))
      .where(col("rule_id") === "maximum").count() === 1)
    // and the robust pack still accepts ~all of the real corpus (roughly
    // 2% per numeric column can fall outside the 1–99 percentile band)
    val nOut = Violations.validate(docs, tight, Seq("doc_id"))
      .where(col("rule_id").isin("minimum", "maximum"))
      .select("doc_id").distinct().count()
    assert(nOut <= math.ceil(docs.count() * 0.06).toLong, s"robust pack rejected $nOut rows")
  }

  test("profile artifact: types from schema, requireds from nulls, enum gating by cardinality") {
    val rows = PackInference.inferredProfile(docs, cols, enumThreshold = 16)
      .orderBy("column").collect()
    val byCol = rows.map(r => r.getString(0) -> r).toMap
    assert(byCol("doc_id").getString(1) === "integer")
    assert(byCol("lang").getString(1) === "string")
    // numeric bounds populated for numerics only
    assert(!byCol("n_chars").isNullAt(4) && byCol("lang").isNullAt(4))
    // enum list is a JSON array, sorted, within the threshold
    val langs = graft.core.JValue.parse(byCol("lang").getString(6)) match {
      case graft.core.JArr(items) => items.map(_.asInstanceOf[graft.core.JStr].value)
      case other => fail(s"enum_vals is not a JSON array: $other")
    }
    assert(langs === langs.sorted && langs.size <= 16)
    // a high-cardinality column must NOT become an enum
    val wide = PackInference.inferredProfile(docs, Seq("lang"), enumThreshold = 1)
      .collect().head
    assert(wide.isNullAt(6))
  }

  test("enum values containing the old join delimiter survive inference intact") {
    // regression (round-4 advice): comma-joined enum profiles split a
    // value like "a,b" into bogus members, so the inferred pack rejected
    // its own corpus — breaking the LAW on plausible data
    val df = Seq((1L, "foo, inc."), (2L, "bar, llc"), (3L, "foo, inc."))
      .toDF("id", "org")
    val pack = PackInference.infer(df, Seq("id", "org"))
    assert(Violations.validate(df, pack, Seq("id")).count() === 0)
    // and the artifact renders them unambiguously as a JSON array
    val vals = PackInference.inferredProfile(df, Seq("org")).collect().head.getString(6)
    assert(vals === """["bar, llc","foo, inc."]""")
  }

  test("sketch mode: HLL-gated profile emits the same pack as the exact path on clean data") {
    val exact = PackInference.infer(docs, cols)
    val approx = PackInference.infer(docs, cols, sketch = true)
    assert(approx === exact, "sketch inference changed the pack on a clean corpus")
    // LAW holds in sketch mode too: enum gate is re-applied exactly in
    // pass 2 and min/max stay exact counters
    assert(Violations.validate(docs, approx, Seq("doc_id")).count() === 0)
    // robust sketch bounds still reject mid-range garbage
    val tight = PackInference.inferRobust(docs, cols, loQ = 0.01, hiQ = 0.99, sketch = true)
    val midGarbage = docs.limit(1).withColumn("n_chars", lit(500000000L))
    assert(Violations.validate(midGarbage, tight, Seq("doc_id"))
      .where(col("rule_id") === "maximum").count() === 1)
  }

  test("high-cardinality string columns are never collected (pass-1 gate)") {
    // `text` has ~one distinct value per row; the profile must produce a
    // NULL enum without ever collecting the value set — asserted by the
    // artifact shape plus the pass-2 candidate filter (no agg is planned
    // when nothing qualifies, so this also runs in one pass)
    val p = PackInference.inferredProfile(docs, Seq("text"), enumThreshold = 16)
      .collect().head
    assert(p.isNullAt(6) && p.getLong(3) > 16)
  }
}
