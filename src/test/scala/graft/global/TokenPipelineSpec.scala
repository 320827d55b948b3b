package graft.global

import graft.SparkSuite
import graft.core.{Rule, Violations}
import graft.core.Rule._
import graft.sources.TokenGen
import graft.stats.{ColumnStats, Drift}
import org.apache.spark.sql.functions._

/** The minimum end-to-end slice of SURVEY.md §7.4: synthesize the token
  * table, run the full rule pack (row-local + uniqueness + referential +
  * stats + drift), assert the planted-violation counts in closed form, and
  * assert determinism across partitionings (the engine analog of
  * t/predictable-errors.t).
  */
class TokenPipelineSpec extends SparkSuite {
  import spark.implicits._

  private val N = 50000L
  private lazy val facts = TokenGen.tokenSequences(spark, N, numPartitions = 8, maxLen = 64).cache()
  private lazy val dim = TokenGen.allowedSources(spark)

  private def plants(p: Long): Long = TokenGen.expectedPlantCount(N, p)

  /** The flagship row-local rule pack (SURVEY.md §7.4). */
  private val rowPack: Rule = All(Seq(
    Properties(Seq(
      "n_tok" -> All(Seq(TypeIs(Seq("integer")), Minimum(0), Maximum(8192))),
      "doc_id" -> All(Seq(TypeIs(Seq("string")), Pattern("^doc-\\d{12}$"))),
      "tokens" -> Items(All(Seq(Minimum(0), Maximum(TokenGen.VocabSize - 1)))))),
    Required(Seq("doc_id", "source", "n_tok")),
    Predicate("n_tok_invariant", "n_tok must equal size(tokens)",
      row => row.getField("n_tok") === size(row.getField("tokens")))))

  test("row-local violations match closed-form planted counts") {
    val v = Violations.validate(facts, rowPack, Seq("doc_id")).cache()
    val byRule = v.groupBy("rule_id").count().as[(String, Long)].collect().toMap
    assert(byRule.getOrElse("pattern", 0L) === plants(TokenGen.BadIdPeriod))
    assert(byRule.getOrElse("required", 0L) === plants(TokenGen.NullSourcePeriod))
    // token -1 fails minimum; token 50257 fails maximum; invariant rows
    // fail n_tok==size; empty rows fail nothing row-local except invariant? no:
    // empty plant keeps n_tok=size=0 → consistent
    assert(byRule.getOrElse("minimum", 0L) === plants(TokenGen.TokenMinPeriod))
    assert(byRule.getOrElse("maximum", 0L) === plants(TokenGen.TokenMaxPeriod))
    assert(byRule.getOrElse("n_tok_invariant", 0L) === plants(TokenGen.InvariantPeriod))
    v.unpersist()
  }

  test("uniqueness: two-phase dup detection finds exactly the planted dups") {
    val dupKeys = Uniqueness.duplicateKeys(facts, Seq("doc_id"))
    assert(dupKeys.count() === plants(TokenGen.DupPeriod))
    // each dup key has exactly 2 rows → 2 violation rows per planted dup
    val v = Uniqueness.violations(facts, Seq("doc_id"))
    assert(v.count() === 2 * plants(TokenGen.DupPeriod))
    assert(Uniqueness.verdict(facts, Seq("doc_id")).select("verdict").as[String].head() === "fail")
  }

  test("hash-first uniqueness equals the direct groupBy path") {
    val a = Uniqueness.duplicateKeys(facts, Seq("doc_id"))
      .orderBy("doc_id").collect().toSeq
    val b = Uniqueness.duplicateKeysHashed(facts, Seq("doc_id"))
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("referential: broadcast anti-join finds unregistered sources, excludes NULLs") {
    val v = Referential.violations(facts, "source", dim, "source")
    assert(v.count() === plants(TokenGen.UnregisteredPeriod))
  }

  test("referential: salted shuffle anti-join gives the identical violation set") {
    val plain = Referential.violations(facts, "source", dim, "source", broadcastDim = false)
      .select("doc_id").as[String].collect().sorted.toSeq
    val salted = Referential.violationsSalted(facts, "source", dim, "source", saltBy = "doc_id", saltBuckets = 8)
      .select("doc_id").as[String].collect().sorted.toSeq
    assert(plain === salted)
    assert(salted.size === plants(TokenGen.UnregisteredPeriod).toInt)
  }

  test("stats profile: one-pass per-column stats") {
    val p = ColumnStats.profile(facts).collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(p("doc_id")._1 === N)
    assert(p("doc_id")._2 === 0L)
    assert(p("source")._2 === plants(TokenGen.NullSourcePeriod)) // planted NULLs
    val wide = ColumnStats.wide(facts, Seq("n_tok")).collect().head
    assert(wide.getAs[Long]("n_tok__n_nonnull") === N)
  }

  test("drift: same distribution passes, shifted distribution fires PSI rule") {
    val refHist = Drift.histogram(facts, "n_tok", 0, 64, 16)
    val same = TokenGen.tokenSequences(spark, 20000, numPartitions = 4, maxLen = 64)
    val shifted = TokenGen.tokenSequences(spark, 20000, numPartitions = 4, maxLen = 32)
    val samePsi = Drift.psiRule(refHist, Drift.histogram(same, "n_tok", 0, 64, 16), "drift:n_tok")
      .select("verdict").as[String].head()
    val shiftPsi = Drift.psiRule(refHist, Drift.histogram(shifted, "n_tok", 0, 64, 16), "drift:n_tok")
      .select("verdict").as[String].head()
    assert(samePsi === "pass")
    assert(shiftPsi === "fail")
  }

  test("determinism: identical violations at different partitionings (t/predictable-errors.t analog)") {
    val a = TokenGen.tokenSequences(spark, 10000, numPartitions = 3, maxLen = 64)
    val b = TokenGen.tokenSequences(spark, 10000, numPartitions = 13, maxLen = 64)
    def run(df: org.apache.spark.sql.DataFrame): Seq[(String, String, String)] =
      Violations.sorted(Violations.validate(df, rowPack, Seq("doc_id")), Seq("doc_id"))
        .select("doc_id", "rule_id", "observed").as[(String, String, String)]
        .collect().toSeq
    assert(run(a) === run(b))
  }

  test("non-mutation invariant: validated output tokens identical to input (input_hint)") {
    // the engine never mutates: validate() projects violations from the same
    // rows; token arrays in the source are byte-identical after validation
    val before = facts.select("doc_id", "tokens").orderBy("doc_id").limit(100).collect()
    Violations.validate(facts, rowPack, Seq("doc_id")).count()
    val after = facts.select("doc_id", "tokens").orderBy("doc_id").limit(100).collect()
    assert(before.sameElements(after))
  }
}
