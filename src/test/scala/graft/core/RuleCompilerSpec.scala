package graft.core

import graft.SparkSuite
import graft.core.Rule._
import graft.rulepack.RulePack
import org.apache.spark.sql.DataFrame

/** Keyword-level parity tests: each case mirrors a `validate_ok data,
  * schema, E(path, msg)` assertion from the reference's t/jv-*.t suites
  * (reference t/Helper.pm:86-94) — complete sorted (path, message) list must
  * match. */
class RuleCompilerSpec extends SparkSuite {
  import spark.implicits._

  /** Run a schema (JSON text) against a one-column DataFrame; return sorted
    * (path, message) pairs. */
  private def checkCol(df: DataFrame, schemaJson: String): Seq[(String, String)] = {
    val rule = RulePack.parse(schemaJson)
    Violations.sorted(Violations.validateColumn(df, rule, "value", Seq("value")), Seq())
      .select("path", "message").as[(String, String)].collect().toSeq
  }

  private def checkRow(df: DataFrame, schemaJson: String): Seq[(String, String)] = {
    val rule = RulePack.parse(schemaJson)
    Violations.sorted(Violations.validate(df, rule, Seq()), Seq())
      .select("path", "message").as[(String, String)].collect().toSeq
  }

  test("type: string vs integer column (t/jv-basic.t semantics)") {
    val df = Seq(42).toDF("value")
    // "got number", not "got integer": the reference's data_type reports
    // integer only when a candidate schema requests it (Util.pm:66-69)
    assert(checkCol(df, """{"type":"string"}""") == Seq("/" -> "Expected string - got number."))
    assert(checkCol(df, """{"type":"integer"}""").isEmpty)
    assert(checkCol(df, """{"type":"number"}""").isEmpty)
  }

  test("type union favors pass; null handling (t/jv-oneof.t:23-26)") {
    val df = Seq(Some("2024-01-01T10:00:00Z"), None).toDF("value")
    assert(checkCol(df, """{"type":["string","null"],"format":"date-time"}""").isEmpty)
    val bad = Seq(Some("not-a-date")).toDF("value")
    assert(checkCol(bad, """{"type":["string","null"],"format":"date-time"}""") ==
      Seq("/" -> "Does not match date-time format."))
  }

  test("integer on fractional column: whole passes, fraction fails") {
    assert(checkCol(Seq(3.0).toDF("value"), """{"type":"integer"}""").isEmpty)
    assert(checkCol(Seq(3.5).toDF("value"), """{"type":"integer"}""") ==
      Seq("/" -> "Expected integer - got number."))
  }

  test("minimum/maximum messages (t/jv-number.t semantics)") {
    val df = Seq(1).toDF("value")
    assert(checkCol(df, """{"type":"integer","minimum":2}""") == Seq("/" -> "1 < minimum(2)"))
    assert(checkCol(Seq(3).toDF("value"), """{"type":"integer","maximum":2}""") ==
      Seq("/" -> "3 > maximum(2)"))
    assert(checkCol(Seq(2).toDF("value"), """{"exclusiveMinimum":2}""") ==
      Seq("/" -> "2 <= minimum(2)"))
    assert(checkCol(Seq(2).toDF("value"), """{"minimum":2}""").isEmpty)
  }

  test("multipleOf (t/jv-number.t)") {
    assert(checkCol(Seq(15).toDF("value"), """{"multipleOf":5}""").isEmpty)
    assert(checkCol(Seq(13).toDF("value"), """{"multipleOf":5}""") ==
      Seq("/" -> "Not multiple of 5."))
    assert(checkCol(Seq(4.02).toDF("value"), """{"multipleOf":0.01}""").isEmpty)
  }

  test("enum/const (t/jv-enum.t, t/jv-const.t semantics)") {
    val df = Seq("nick").toDF("value")
    assert(checkCol(df, """{"enum":["monkey","donkey"]}""") ==
      Seq("/" -> "Not in enum list: monkey, donkey."))
    assert(checkCol(df, """{"enum":["nick","donkey"]}""").isEmpty)
    assert(checkCol(df, """{"const":"monkey"}""") ==
      Seq("/" -> """Does not match const: "monkey"."""))
  }

  test("string length + pattern (t/jv-string.t semantics)") {
    val df = Seq("superduperlong").toDF("value")
    assert(checkCol(df, """{"maxLength":5}""") == Seq("/" -> "String is too long: 14/5."))
    assert(checkCol(Seq("ab").toDF("value"), """{"minLength":3}""") ==
      Seq("/" -> "String is too short: 2/3."))
    assert(checkCol(Seq("abc").toDF("value"), """{"pattern":"^a"}""").isEmpty)
    assert(checkCol(Seq("xbc").toDF("value"), """{"pattern":"^a"}""") ==
      Seq("/" -> "String does not match ^a."))
    // Perl partial-match semantics: unanchored
    assert(checkCol(Seq("xabc").toDF("value"), """{"pattern":"abc"}""").isEmpty)
  }

  test("array: min/maxItems, uniqueItems (t/jv-array.t:7-25)") {
    val one = Seq(Seq(1)).toDF("value")
    val schema = """{"type":"array","uniqueItems":true,"minItems":2,"maxItems":2}"""
    assert(checkCol(one, schema) == Seq("/" -> "Not enough items: 1/2."))
    val dup = Seq(Seq(1, 1)).toDF("value")
    assert(checkCol(dup, schema) == Seq("/" -> "Unique items required."))
    val three = Seq(Seq(1, 2, 3)).toDF("value")
    assert(checkCol(three, schema) == Seq("/" -> "Too many items: 3/2."))
    assert(checkCol(Seq(Seq(1, 2)).toDF("value"), schema).isEmpty)
  }

  test("array items single schema with per-element paths (t/jv-array.t)") {
    val df = Seq(Seq(1, 200, 3, 300)).toDF("value")
    val schema = """{"type":"array","items":{"type":"integer","maximum":100}}"""
    assert(checkCol(df, schema) == Seq(
      "/1" -> "200 > maximum(100)", "/3" -> "300 > maximum(100)"))
  }

  test("tuple items + additionalItems:false (t/jv-array.t:9-32)") {
    // [1600, "Pennsylvania", "Avenue", "NW", "extra"] vs 4 positional schemas
    val df = Seq(Seq("1600", "Pennsylvania", "Avenue", "NW", "extra")).toDF("value")
    val schema =
      """{"type":"array","items":[
        |{"type":"string"},{"type":"string"},
        |{"enum":["Street","Avenue","Boulevard"]},{"enum":["NW","NE","SW","SE"]}],
        |"additionalItems":false}""".stripMargin
    assert(checkCol(df, schema) == Seq("/" -> "Invalid number of items: 5/4."))
    val ok = Seq(Seq("1600", "Pennsylvania", "Avenue", "NW")).toDF("value")
    assert(checkCol(ok, schema).isEmpty)
    val badEnum = Seq(Seq("1600", "Pennsylvania", "Lane", "NW")).toDF("value")
    assert(checkCol(badEnum, schema) ==
      Seq("/2" -> "Not in enum list: Street, Avenue, Boulevard."))
  }

  test("contains incl. empty-array failure (t/jv-array.t:34-36,84)") {
    val schema = """{"type":"array","contains":{"enum":["NW"]}}"""
    assert(checkCol(Seq(Seq("SE", "NW")).toDF("value"), schema).isEmpty)
    assert(checkCol(Seq(Seq("SE", "SW")).toDF("value"), schema) ==
      Seq("/" -> "No items contained."))
    assert(checkCol(Seq(Seq.empty[String]).toDF("value"), schema) ==
      Seq("/" -> "No items contained."))
  }

  test("minContains/maxContains (draft2019-09, Draft201909.pm:70-90)") {
    val df = Seq(Seq(2, 4, 5, 6)).toDF("value")
    val schema = """{"type":"array","contains":{"multipleOf":2},"minContains":2,"maxContains":3}"""
    assert(checkCol(df, schema).isEmpty)
    assert(checkCol(Seq(Seq(2, 3)).toDF("value"), schema) ==
      Seq("/" -> "Contains not enough items: 1/2."))
    assert(checkCol(Seq(Seq(2, 4, 6, 8)).toDF("value"), schema) ==
      Seq("/" -> "Contains too many items: 4/3."))
  }

  test("object: required as null-check + properties (t/jv-object.t)") {
    val df = Seq((Some("Nick"), Option.empty[String], Some(42))).toDF("name", "city", "age")
    val schema =
      """{"type":"object",
        |"properties":{"name":{"type":"string"},"city":{"type":"string"},"age":{"maximum":10}},
        |"required":["name","city"]}""".stripMargin
    assert(checkRow(df, schema) == Seq("/age" -> "42 > maximum(10)", "/city" -> "Missing property."))
  }

  test("dependencies array form (t/jv-object.t:53-60)") {
    val df = Seq((Some("Nick"), Some("1234"), Option.empty[String]))
      .toDF("name", "credit_card", "billing_address")
    val schema =
      """{"type":"object","required":["name"],
        |"dependencies":{"credit_card":["billing_address"]}}""".stripMargin
    assert(checkRow(df, schema) ==
      Seq("/billing_address" -> "Missing property. Dependee: credit_card."))
    val ok = Seq((Some("N"), Option.empty[String], Option.empty[String]))
      .toDF("name", "credit_card", "billing_address")
    assert(checkRow(ok, schema).isEmpty)
  }

  test("additionalProperties:false lists extras (t/jv-object.t:6-46)") {
    val df = Seq(("x", "y", "z")).toDF("number", "direction", "foo")
    val schema =
      """{"type":"object","properties":{"number":{"type":"string"}},
        |"additionalProperties":false}""".stripMargin
    assert(checkRow(df, schema) == Seq("/" -> "Properties not allowed: direction, foo."))
  }

  test("not (t/jv-not.t semantics)") {
    assert(checkCol(Seq(5).toDF("value"), """{"not":{"type":"integer"}}""") ==
      Seq("/" -> "Should not match."))
    assert(checkCol(Seq("s").toDF("value"), """{"not":{"type":"integer"}}""").isEmpty)
  }

  test("oneOf: pass, all_rules_match, n_rules_match, branch errors (t/jv-oneof.t:9-19)") {
    val schema = """{"oneOf":[{"multipleOf":5},{"multipleOf":3}]}"""
    assert(checkCol(Seq(10).toDF("value"), schema).isEmpty)
    assert(checkCol(Seq(15).toDF("value"), schema) ==
      Seq("/" -> "All of the oneOf rules match."))
    assert(checkCol(Seq(13).toDF("value"), schema) == Seq(
      "/" -> "/oneOf/0 Not multiple of 5.", "/" -> "/oneOf/1 Not multiple of 3."))
  }

  test("oneOf n_rules_match indices (Schema.pm:506-536)") {
    val schema = """{"oneOf":[{"multipleOf":5},{"multipleOf":3},{"multipleOf":7}]}"""
    assert(checkCol(Seq(15).toDF("value"), schema) ==
      Seq("/" -> "oneOf rules 0, 1 match."))
  }

  test("allOf type-error collapse (Schema.pm:438-447)") {
    val schema = """{"allOf":[{"type":"string"},{"type":"number"}]}"""
    assert(checkCol(Seq(true).toDF("value"), schema) ==
      Seq("/" -> "/allOf Expected string/number - got boolean."))
    // non-type error survives with prefix
    val schema2 = """{"allOf":[{"type":"integer"},{"minimum":10}]}"""
    assert(checkCol(Seq(5).toDF("value"), schema2) ==
      Seq("/" -> "/allOf/1 5 < minimum(10)"))
  }

  test("anyOf passes if any branch passes; else reports (t/jv-anyof.t semantics)") {
    val schema = """{"anyOf":[{"type":"string","maxLength":5},{"type":"number","minimum":0}]}"""
    assert(checkCol(Seq("short").toDF("value"), schema).isEmpty)
    assert(checkCol(Seq(12).toDF("value"), schema).isEmpty)
    // on total failure every branch error is reported, prefixed
    // (Schema.pm:472-496 _validate_any_of)
    assert(checkCol(Seq("toolongstring").toDF("value"), schema) == Seq(
      "/" -> "/anyOf/0 String is too long: 13/5.",
      "/" -> "/anyOf/1 Expected number - got string."))
  }

  test("if/then/else (t/jv-if-then-else.t semantics)") {
    val schema = """{"if":{"minimum":10},"then":{"multipleOf":2},"else":{"multipleOf":3}}"""
    assert(checkCol(Seq(12).toDF("value"), schema).isEmpty)
    assert(checkCol(Seq(13).toDF("value"), schema) == Seq("/" -> "Not multiple of 2."))
    assert(checkCol(Seq(7).toDF("value"), schema) == Seq("/" -> "Not multiple of 3."))
    assert(checkCol(Seq(6).toDF("value"), schema).isEmpty)
  }

  test("boolean schemas (Schema.pm:369)") {
    assert(checkCol(Seq(1).toDF("value"), "true").isEmpty)
    assert(checkCol(Seq(1).toDF("value"), "false") == Seq("/" -> "Should not match."))
  }

  test("$ref resolution through definitions (t/bundle.t:12-26 semantics)") {
    val df = Seq((Some("Nick"), Some(7))).toDF("surname", "age")
    val schema =
      """{"type":"object",
        |"definitions":{"name":{"type":"string","minLength":2}},
        |"properties":{"surname":{"$ref":"#/definitions/name"},"age":{"type":"integer"}}}""".stripMargin
    assert(checkRow(df, schema).isEmpty)
    val bad = Seq((Some("N"), Some(7))).toDF("surname", "age")
    assert(checkRow(bad, schema) == Seq("/surname" -> "String is too short: 1/2."))
  }

  test("recursive $ref rejected at parse time (vs runtime guard Schema.pm:372-376)") {
    val schema = """{"definitions":{"a":{"$ref":"#/definitions/a"}},"$ref":"#/definitions/a"}"""
    assertThrows[IllegalArgumentException](RulePack.parse(schema))
  }

  test("nullable bypasses wrapped rule (OpenAPIv3.pm:307-401)") {
    val df = Seq(Some("x"), None).toDF("value")
    assert(checkCol(df, """{"type":"string","minLength":2,"nullable":true}""" ) ==
      Seq("/" -> "String is too short: 1/2."))
  }

  test("propertyNames: static for structs, runtime for maps (Draft6.pm:111-122)") {
    // struct: field names are static — "credit_card" fails maxLength 8
    val df = Seq(("a", "b")).toDF("name", "credit_card")
    assert(checkRow(df, """{"propertyNames":{"maxLength":8}}""") ==
      Seq("/credit_card" -> "Does not match propertyNames."))
    assert(checkRow(df, """{"propertyNames":{"pattern":"^[a-z_]+$"}}""").isEmpty)
    // map: runtime key check
    val mdf = Seq(Map("ok" -> 1, "Bad Key" -> 2)).toDF("value")
    assert(checkCol(mdf, """{"propertyNames":{"pattern":"^[a-z]+$"}}""").size === 1)
    // map property counts
    assert(checkCol(mdf, """{"maxProperties":1}""") == Seq("/" -> "Too many properties: 2/1."))
    assert(checkCol(mdf, """{"minProperties":3}""") == Seq("/" -> "Not enough properties: 2/3."))
  }

  test("unicode strings in enum + messages (t/unicode-multibyte.t:16-24)") {
    val df = Seq("foo♫bar").toDF("value")
    assert(checkCol(df, """{"enum":["foo♫bar"]}""").isEmpty)
    assert(checkCol(Seq("foobar").toDF("value"), """{"enum":["foo♫bar"]}""") ==
      Seq("/" -> "Not in enum list: foo♫bar."))
    // length is char-based, not byte-based
    assert(checkCol(df, """{"maxLength":7}""").isEmpty)
  }

  test("dynamic objects: object keywords over MapType columns (reference hash regime)") {
    import org.apache.spark.sql.functions.{col, from_json}
    import org.apache.spark.sql.types.{MapType, StringType}
    val df = Seq(
        """{"a":"x","b":"5","extra":"y"}""",
        """{"a":"x"}""",
        """{"a":"x","b":"nope","xk":"1","xq":"zz"}""")
      .toDF("j")
      .select(from_json(col("j"), MapType(StringType, StringType)).as("value"))
    val rule = All(Seq(
      Properties(Seq("b" -> Pattern("^[0-9]+$"))),
      PatternProperties(Seq("^x" -> Pattern("^[0-9]+$"))),
      Required(Seq("a", "b")),
      DependentRequired(Seq("b" -> Seq("a"))),
      ClosedWorld(Seq("a", "b"), Seq("^x"), None)))
    val got = Violations.validateColumn(df, rule, "value", Seq())
      .select("path", "message").as[(String, String)].collect().toSeq.sorted
    assert(got === Seq(
      "/" -> "Properties not allowed: extra.",          // row 1 extra key
      "/b" -> "Missing property.",                       // row 2
      "/b" -> "String does not match ^[0-9]+$.",         // row 3 properties
      "/xq" -> "String does not match ^[0-9]+$."))       // row 3 patternProperties (xk passes)
  }
}
