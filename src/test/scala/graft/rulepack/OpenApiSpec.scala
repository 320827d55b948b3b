package graft.rulepack

import graft.SparkSuite
import graft.core.{RuleCompiler, Violations}
import graft.core.Rule
import graft.core.Rule._

/** OpenAPI-shaped integration: a petstore-style component schema (the
  * reference's layer-4 fixtures, t/spec/v3-petstore.json + t/openapiv3-*.t)
  * loaded from YAML, compiled from a component pointer with sibling refs
  * resolving against the whole spec, and validated in both request and
  * response directions. */
class OpenApiSpec extends SparkSuite {
  import spark.implicits._

  private val petstoreYaml =
    """---
      |openapi: "3.0.0"
      |components:
      |  schemas:
      |    Pet:
      |      required: [id, name]
      |      properties:
      |        id:
      |          type: integer
      |          format: int64
      |          readOnly: true
      |        name:
      |          type: string
      |        tag:
      |          type: string
      |          nullable: true
      |        age:
      |          type: integer
      |          minimum: 0
      |    Pets:
      |      type: array
      |      items:
      |        $ref: "#/components/schemas/Pet"
      |""".stripMargin

  private lazy val doc = graft.core.JValue.parseAny(petstoreYaml)
  private lazy val petRule = RulePack.fromPointer(doc, "/components/schemas/Pet")

  test("openapi v3 pet component validates a typed table (t/openapiv3 shape)") {
    val pets = Seq(
      (Some(1L), Some("cat"), Some("feline"), Some(3)),
      (Some(2L), Option.empty[String], Option.empty[String], Some(-1)), // name missing, age negative
      (Option.empty[Long], Some("dog"), Option.empty[String], Some(2)) // id missing
    ).toDF("id", "name", "tag", "age")

    // response direction: id (readOnly) is demanded, so the id-less row fails
    val respErrs = Violations.validate(pets, petRule, Seq(),
        RuleCompiler.Ctx(direction = Rule.Response))
      .select("path", "message").as[(String, String)].collect().toSeq
    assert(respErrs.toSet === Set(
      "/name" -> "Missing property.",
      "/age" -> "-1 < minimum(0)",
      "/id" -> "Missing property."))

    // request direction: absent id is fine, PRESENT ids are 'Read-only.'
    val reqErrs = Violations.validate(pets, petRule, Seq(),
        RuleCompiler.Ctx(direction = Rule.Request))
      .select("path", "message").as[(String, String)].collect().toSeq
    assert(reqErrs.count(e => e == ("/id" -> "Read-only.")) === 2)
    assert(!reqErrs.contains("/id" -> "Missing property."))
  }

  test("component $refs resolve against the whole spec document (fromPointer)") {
    val petsRule = RulePack.fromPointer(doc, "/components/schemas/Pets")
    // array-of-Pet: the ref reached the sibling component
    petsRule match {
      case All(rs) =>
        assert(rs.contains(TypeIs(Seq("array"))))
        assert(rs.exists(_.isInstanceOf[Items]))
      case other => fail(s"unexpected: $other")
    }
    // end-to-end: an array column of pet structs, one bad element
    val df = Seq(Tuple1(Seq((1L, "ok"), (2L, null.asInstanceOf[String])))).toDF("value")
    val errs = Violations.validateColumn(
        df.selectExpr("transform(value, x -> named_struct('id', x._1, 'name', x._2)) AS value"),
        petsRule, "value", Seq(), RuleCompiler.Ctx(direction = Rule.Response))
      .select("path", "message").as[(String, String)].collect().toSeq
    assert(errs === Seq("/1/name" -> "Missing property."))
  }
}
