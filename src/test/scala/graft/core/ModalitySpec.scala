package graft.core

import graft.SparkSuite
import graft.core.Rule._
import org.apache.spark.sql.functions.col

/** OpenAPI modality (readOnly/writeOnly) and collectionFormat splitting
  * (reference OpenAPIv2.pm:245-256, 401-408; OpenAPIv3.pm:356-396). */
class ModalitySpec extends SparkSuite {
  import spark.implicits._

  test("readOnly rules skip request validation, apply to responses") {
    // id is server-assigned (readOnly): requests may omit it, responses must
    // have it — the presence demand is a Modal(Required) at row level
    // (property sub-rules skip absent/null fields by design)
    val rule = All(Seq(
      Properties(Seq("name" -> TypeIs(Seq("string")))),
      Modal(Required(Seq("id")), Response)))
    val requestRow = Seq((Some("x"), Option.empty[Int])).toDF("name", "id")
    val reqCtx = RuleCompiler.Ctx(direction = Request)
    val respCtx = RuleCompiler.Ctx(direction = Response)
    assert(Violations.validate(requestRow, rule, Seq(), reqCtx).count() === 0)
    assert(Violations.validate(requestRow, rule, Seq(), respCtx).count() === 1)
    // direction Both applies everything
    assert(Violations.validate(requestRow, rule, Seq()).count() === 1)
  }

  test("readOnly property present in a request reports 'Read-only.' (OpenAPIv3.pm:363)") {
    val rule = Properties(Seq("id" -> Rule.readOnly(TypeIs(Seq("integer")))))
    val present = Seq((Some(7), "x")).toDF("id", "name")
    val reqCtx = RuleCompiler.Ctx(direction = Request)
    val errs = Violations.validate(present, rule, Seq(), reqCtx)
      .select("path", "message").as[(String, String)].collect().toSeq
    assert(errs === Seq("/id" -> "Read-only."))
    // absent in the request: fine; present in a response: fine
    val absent = Seq((Option.empty[Int], "x")).toDF("id", "name")
    assert(Violations.validate(absent, rule, Seq(), reqCtx).count() === 0)
    assert(Violations.validate(present, rule, Seq(),
      RuleCompiler.Ctx(direction = Response)).count() === 0)
    // plain (Both) validation has no request/response split → inert
    assert(Violations.validate(present, rule, Seq()).count() === 0)
  }

  test("present-and-invalid readOnly property yields BOTH errors in a request (OpenAPIv3.pm:363-374)") {
    // the reference pushes "Read-only." and then still runs the normal
    // properties pass — error-set parity requires 2 errors, not 1
    val rule = Properties(Seq("id" -> Rule.readOnly(All(Seq(TypeIs(Seq("integer")), Maximum(5))))))
    val invalid = Seq((Some(7), "x")).toDF("id", "name")
    val reqErrs = Violations.validate(invalid, rule, Seq(), RuleCompiler.Ctx(direction = Request))
      .select("path", "message").as[(String, String)].collect().toSeq.sorted
    assert(reqErrs === Seq("/id" -> "7 > maximum(5)", "/id" -> "Read-only."))
    // the schema also constrains responses (only `required` is
    // direction-stripped, not the property schema)
    val respErrs = Violations.validate(invalid, rule, Seq(), RuleCompiler.Ctx(direction = Response))
      .select("message").as[String].collect().toSeq
    assert(respErrs === Seq("7 > maximum(5)"))
  }

  test("required strips readOnly props for requests, writeOnly for responses (OpenAPIv3.pm:367,388)") {
    val pack = graft.rulepack.RulePack.parse(
      """{"type":"object",
        | "properties":{"id":{"type":"integer","readOnly":true},
        |               "secret":{"type":"string","writeOnly":true},
        |               "name":{"type":"string"}},
        | "required":["id","secret","name"]}""".stripMargin)
    val row = Seq((Option.empty[Int], Option.empty[String], Some("x"))).toDF("id", "secret", "name")
    // request: id (readOnly) not demanded, secret (writeOnly) is
    val reqErrs = Violations.validate(row, pack, Seq(), RuleCompiler.Ctx(direction = Request))
      .select("path").as[String].collect().toSeq
    assert(reqErrs === Seq("/secret"))
    // response: secret not demanded, id is
    val respErrs = Violations.validate(row, pack, Seq(), RuleCompiler.Ctx(direction = Response))
      .select("path").as[String].collect().toSeq
    assert(respErrs === Seq("/id"))
  }

  test("items type error suppresses sibling keyword errors per element (Schema.pm:410)") {
    val rule = Items(All(Seq(TypeIs(Seq("integer")), Maximum(5))))
    val df = Seq(Tuple1(Seq(6.5, 2.0, 7.0))).toDF("value")
    val errs = Violations.validateColumn(df, rule, "value", Seq())
      .select("path", "rule_id").as[(String, String)].collect().toSeq.sorted
    // 6.5 → type error ONLY (maximum suppressed); 2.0 passes; 7.0 is a
    // whole double (passes integer) → maximum error
    assert(errs === Seq("/0" -> "type", "/2" -> "maximum"))
  }

  test("collectionFormat splits csv/ssv/tsv/pipes (OpenAPIv2.pm:245-256)") {
    val df = Seq(("a,b,c", "a b c", "a\tb\tc", "a|b|c")).toDF("csv", "ssv", "tsv", "pipes")
    val out = df.select(
      Coerce.splitCollection(col("csv"), "csv").as("c"),
      Coerce.splitCollection(col("ssv"), "ssv").as("s"),
      Coerce.splitCollection(col("tsv"), "tsv").as("t"),
      Coerce.splitCollection(col("pipes"), "pipes").as("p")).head()
    (0 to 3).foreach(i => assert(out.getSeq[String](i) === Seq("a", "b", "c")))
    assertThrows[IllegalArgumentException](Coerce.splitCollection(col("csv"), "nope"))
  }

  test("split collection feeds array rules end-to-end") {
    val df = Seq("NW,SE,NW").toDF("dirs")
      .select(Coerce.splitCollection(col("dirs"), "csv").as("value"))
    val rule = All(Seq(Items(Enum(Seq(JStr("NW"), JStr("NE"), JStr("SW"), JStr("SE")))), UniqueItems))
    val v = Violations.validateColumn(df, rule, "value", Seq())
    assert(v.select("rule_id").as[String].collect().toSeq === Seq("uniqueItems"))
  }
}
