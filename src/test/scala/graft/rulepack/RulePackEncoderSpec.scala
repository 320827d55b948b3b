package graft.rulepack

import graft.SparkSuite
import graft.core._
import graft.core.Rule._
import graft.joi.joi

/** Bundle/serialization round-trips (Schema.pm:44-65 analog), discriminator
  * dispatch, and rule-pack linting (is_invalid analog). */
class RulePackEncoderSpec extends SparkSuite {
  import spark.implicits._

  private def roundTrip(json: String): Unit = {
    val r1 = RulePack.parse(json)
    val encoded = RulePackEncoder.encodeToJson(r1)
    val r2 = RulePack.parse(encoded)
    assert(r1 === r2, s"round-trip mismatch for $json → $encoded")
  }

  test("encode/parse round-trips for representative packs (bundle analog)") {
    roundTrip("""{"type":"integer","minimum":0,"maximum":100,"multipleOf":5}""")
    roundTrip("""{"type":"array","items":{"enum":["a","b"]},"minItems":1,"uniqueItems":true}""")
    roundTrip("""{"type":"object","properties":{"a":{"type":"string","pattern":"^x"}},"required":["a"],"additionalProperties":false}""")
    roundTrip("""{"oneOf":[{"multipleOf":5},{"multipleOf":3}]}""")
    roundTrip("""{"if":{"minimum":10},"then":{"multipleOf":2},"else":{"multipleOf":3}}""")
    roundTrip("""{"type":["string","null"],"format":"date-time"}""")
    roundTrip("""{"contains":{"type":"number"},"minContains":2,"maxContains":3}""")
  }

  test("$ref packs encode closed (inlined, no references)") {
    val withRef = """{"definitions":{"n":{"type":"string","minLength":2}},
      "type":"object","properties":{"a":{"$ref":"#/definitions/n"}}}"""
    val bundled = RulePackEncoder.encodeToJson(RulePack.parse(withRef))
    assert(!bundled.contains("$ref"))
    assert(bundled.contains("minLength"))
    roundTrip(bundled)
  }

  test("discriminator dispatches rule by column value (OpenAPIv2.pm:410-416)") {
    val rule = Discriminator("kind",
      Seq(
        "big" -> Properties(Seq("v" -> Minimum(100))),
        "small" -> Properties(Seq("v" -> Maximum(10)))),
      default = Some(Never))
    val df = Seq(("big", 150), ("big", 50), ("small", 5), ("small", 50), ("other", 1))
      .toDF("kind", "v")
    val got = Violations.sortedHelper(rule, df)
    assert(got === Seq(
      ("big", "/v", "minimum"), ("other", "/", "not"), ("small", "/v", "maximum")))
  }

  test("x-discriminator JSON round-trip") {
    val json = """{"x-discriminator":{"propertyName":"src",
      "mapping":{"a":{"properties":{"v":{"minimum":1}}},"b":true},
      "default":false}}"""
    roundTrip(json)
  }

  test("lint catches structural problems before launch (is_invalid analog)") {
    assert(RulePack.lint(RulePack.parse("""{"type":"integer","minimum":10,"maximum":5}""")).nonEmpty)
    assert(RulePack.lint(Pattern("[unclosed")).nonEmpty)
    assert(RulePack.lint(Enum(Seq.empty)).nonEmpty)
    assert(RulePack.lint(RulePack.parse("""{"contains":{"type":"number"},"minContains":3,"maxContains":1}""")).nonEmpty)
    assert(RulePack.lint(RulePack.parse("""{"type":"integer","minimum":0,"maximum":10}""")).isEmpty)
  }

  test("typed lint names enum/const constants dropped by typed equality") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("k", IntegerType),
      StructField("tags", ArrayType(StringType))))
    // enum mixes an int (fine) with a string (can never equal an int column)
    val pack = RulePack.parse(
      """{"properties": {"k": {"enum": [1, "oops"]},
        |                "tags": {"items": {"const": 7}}}}""".stripMargin)
    val warnings = RulePack.lint(pack, schema)
    assert(warnings.exists(w => w.contains("/k") && w.contains("\"oops\"")))
    assert(warnings.exists(w => w.contains("/tags/items") && w.contains("7")))
    // a family-compatible pack is clean
    val ok = RulePack.parse(
      """{"properties": {"k": {"enum": [1, 2]}, "tags": {"items": {"const": "a"}}}}""")
    assert(RulePack.lint(ok, schema).isEmpty)
  }

  test("draft dialect sniffing from $schema/swagger/openapi (Validator.pm:103-124)") {
    def d(json: String) = RulePack.detectDialect(JValue.parse(json))
    assert(d("""{"$schema":"http://json-schema.org/draft-04/schema#"}""") === "draft4")
    assert(d("""{"$schema":"http://json-schema.org/draft-07/schema#"}""") === "draft7")
    assert(d("""{"$schema":"https://json-schema.org/draft/2019-09/schema"}""") === "draft2019-09")
    assert(d("""{"swagger":"2.0"}""") === "openapiv2")
    assert(d("""{"openapi":"3.0.1"}""") === "openapiv3")
    assert(d("""{"type":"string"}""") === "draft7") // reference default
  }

  test("x-predicate markers fail loudly on parse") {
    assertThrows[IllegalArgumentException](RulePack.parse("""{"x-predicate":"my_rule"}"""))
    // but encoding a Predicate produces the marker
    val enc = RulePackEncoder.encodeToJson(Predicate("inv", "msg", c => c.isNotNull))
    assert(enc.contains("x-predicate"))
  }
}

private object Violations {
  import graft.core.{Violations => V}
  def sortedHelper(rule: Rule, df: org.apache.spark.sql.DataFrame): Seq[(String, String, String)] = {
    import df.sparkSession.implicits._
    V.sorted(V.validate(df, rule, Seq("kind")), Seq("kind"))
      .select("kind", "path", "rule_id").as[(String, String, String)].collect().toSeq
  }
}
