package graft.core

import graft.SparkSuite
import graft.rulepack.RulePack
import org.apache.spark.sql.DataFrame

/** Table-driven parity battery: `(schema json, one-column instance, expected
  * sorted (path, message) list)` triples re-expressing reference t/jv-*
  * assertions (t/Helper.pm:86-94 `validate_ok` compares the complete sorted
  * error list). Instances are typed per group — the engine validates typed
  * columns, so each reference JSON instance maps to a column of the
  * corresponding Spark type. */
class ReferenceParitySpec extends SparkSuite {
  import spark.implicits._

  private def check(df: DataFrame, schema: String, expected: Seq[(String, String)]): Unit = {
    val got = Violations.sorted(
      Violations.validateColumn(df, RulePack.parse(schema), "value", Seq()), Seq())
      .select("path", "message").as[(String, String)].collect().toSeq
    assert(got === expected, s"schema=$schema")
  }

  // ---- integers (t/jv-integer.t, t/jv-number.t) ----
  private val intCases: Seq[(String, Long, Seq[(String, String)])] = Seq(
    ("""{"type":"integer","multipleOf":2}""", 7, Seq("/" -> "Not multiple of 2.")),
    ("""{"type":"integer","minimum":-2}""", -3, Seq("/" -> "-3 < minimum(-2)")),
    ("""{"exclusiveMaximum":5}""", 5, Seq("/" -> "5 >= maximum(5)")),
    ("""{"enum":[1,2,3]}""", 4, Seq("/" -> "Not in enum list: 1, 2, 3.")),
    ("""{"const":42}""", 41, Seq("/" -> "Does not match const: 42.")),
    ("""{"anyOf":[{"minimum":10},{"multipleOf":3}]}""", 9, Seq()),
    ("""{"allOf":[{"minimum":0},{"maximum":10}]}""", 5, Seq()),
    ("""{"not":{"minimum":0}}""", 5, Seq("/" -> "Should not match.")),
    ("""{"oneOf":[{"type":"string"},{"type":"number"}]}""", 5, Seq()),
    // draft4 boolean-style exclusive (Draft4.pm:26-42)
    ("""{"minimum":3,"exclusiveMinimum":true}""", 3, Seq("/" -> "3 <= minimum(3)")),
    ("""{"minimum":3,"exclusiveMinimum":true}""", 4, Seq()))

  test("integer keyword battery") {
    intCases.foreach { case (schema, v, expected) => check(Seq(v).toDF("value"), schema, expected) }
  }

  // ---- strings (t/jv-string.t, t/jv-formats.t) ----
  private val strCases: Seq[(String, String, Seq[(String, String)])] = Seq(
    ("""{"type":"string","minLength":2,"maxLength":4}""", "x", Seq("/" -> "String is too short: 1/2.")),
    ("""{"type":"string","pattern":"^a+$"}""", "bbb", Seq("/" -> "String does not match ^a+$.")),
    ("""{"format":"email"}""", "a@b.c", Seq()),
    ("""{"format":"email"}""", "a@@b", Seq("/" -> "Does not match email format.")),
    ("""{"format":"ipv4"}""", "255.255.255.255", Seq()),
    ("""{"format":"ipv4"}""", "256.1.1.1", Seq("/" -> "Does not match ipv4 format.")),
    ("""{"format":"date"}""", "2024-02-30", Seq("/" -> "Does not match date format.")),
    ("""{"format":"date"}""", "2024-02-29", Seq()),
    ("""{"format":"uri"}""", "https://example.com/x?y=1#z", Seq()),
    ("""{"format":"uri"}""", "not a uri", Seq("/" -> "Does not match uri format.")),
    ("""{"format":"uuid"}""", "ca761232-ed42-11ce-bacd-00aa0057b223", Seq()),
    ("""{"format":"duration"}""", "P3Y6M4DT12H30M5S", Seq()),
    ("""{"format":"duration"}""", "4 days", Seq("/" -> "Does not match duration format.")),
    ("""{"format":"json-pointer"}""", "/a/~1b/~0c", Seq()),
    ("""{"format":"time"}""", "23:59:60", Seq()), // leap second, timegm-accepted
    ("""{"format":"byte"}""", "c3VyZS4=", Seq()),
    ("""{"format":"hostname"}""", "example-host.name", Seq()),
    ("""{"format":"hostname"}""", "-bad.example", Seq("/" -> "Does not match hostname format.")),
    ("""{"format":"int32"}""", "2147483648", Seq("/" -> "Does not match int32 format.")),
    ("""{"format":"int32"}""", "2147483647", Seq()),
    ("""{"format":"int64"}""", "9223372036854775807", Seq()),
    ("""{"format":"relative-json-pointer"}""", "0#", Seq()),
    ("""{"format":"regex"}""", "^ab+c$", Seq()),
    // unknown format passes with the permissive default registry
    ("""{"format":"martian-date"}""", "whatever", Seq()))

  test("string/format keyword battery") {
    strCases.foreach { case (schema, v, expected) => check(Seq(v).toDF("value"), schema, expected) }
  }

  // ---- arrays (t/jv-array.t) ----
  test("array keyword battery") {
    check(Seq(Seq(1, 2, 2)).toDF("value"),
      """{"items":{"type":"integer"},"uniqueItems":true}""",
      Seq("/" -> "Unique items required."))
    check(Seq(Seq.empty[Int]).toDF("value"), """{"minItems":1}""",
      Seq("/" -> "Not enough items: 0/1."))
    // boolean schema as items: items:false rejects any element
    check(Seq(Seq(1)).toDF("value"), """{"items":false}""",
      Seq("/0" -> "Should not match."))
    check(Seq(Seq.empty[Int]).toDF("value"), """{"items":false}""", Seq())
    // nested arrays: per-element sub-arrays with their own rules
    check(Seq(Seq(Seq(1, 2), Seq(3))).toDF("value"),
      """{"items":{"minItems":2}}""",
      Seq("/1" -> "Not enough items: 1/2."))
  }

  // ---- oneOf specials (t/jv-oneof.t) ----
  test("type failure emits ONE error, enum suppressed (issue-22 duplicate-error-messages)") {
    // reference t/issue-22-duplicate-error-messages.t: 123 against
    // {type: string, enum: [bar, baz]} must report ONLY the type error
    check(Seq(123L).toDF("value"),
      """{"type":"string","enum":["bar","baz"]}""",
      Seq("/" -> "Expected string - got number."))
    // and a type-valid value still reaches the enum check
    check(Seq("x").toDF("value"),
      """{"type":"string","enum":["bar","baz"]}""",
      Seq("/" -> "Not in enum list: bar, baz."))
  }

  test("oneOf boolean-schema battery (t/jv-oneof.t:33-39)") {
    check(Seq(1).toDF("value"), """{"oneOf":[true,false]}""", Seq())
    check(Seq(1).toDF("value"), """{"oneOf":[true,true]}""",
      Seq("/" -> "All of the oneOf rules match."))
    check(Seq(1).toDF("value"), """{"oneOf":[false,false]}""",
      Seq("/" -> "/oneOf/0 Should not match.", "/" -> "/oneOf/1 Should not match."))
  }

  // ---- unicode multibyte (t/unicode-multibyte.t:16-24) ----
  test("multibyte enum matching and char-based length/pattern semantics") {
    // enum: JVM strings are already unicode, so the reference's
    // encoded-bytes mismatch case maps to a plain not-in-enum case
    check(Seq("foo♫bar").toDF("value"), """{"enum":["foo♫bar"]}""", Seq())
    check(Seq("foo?bar").toDF("value"), """{"enum":["foo♫bar"]}""",
      Seq("/" -> "Not in enum list: foo♫bar."))
    // replacement char is a perfectly ordinary code point
    check(Seq("replacement�char").toDF("value"),
      """{"enum":["replacement�char"]}""", Seq())
    // length counts CHARACTERS, not bytes: "世界" is 2 chars / 6 UTF-8 bytes
    check(Seq("世界").toDF("value"), """{"minLength":2,"maxLength":2}""", Seq())
    check(Seq("世").toDF("value"), """{"minLength":2}""",
      Seq("/" -> "String is too short: 1/2."))
    // astral plane: one code point, 4 UTF-8 bytes, 2 UTF-16 units → length 1
    check(Seq("💩").toDF("value"), """{"maxLength":1}""", Seq())
    // patterns match on characters too
    check(Seq("a♫b").toDF("value"), """{"pattern":"^a.b$"}""", Seq())
  }

  // ---- nested combinator prefixes through $refs (t/issue-103-one-of.t) ----
  test("oneOf/allOf prefix composition matches the reference exactly (issue-103)") {
    val schema =
      """{"oneOf": [
        |  {"$ref": "#/definitions/template_1"},
        |  {"$ref": "#/definitions/bar_header"},
        |  {"type": "string"}],
        | "definitions": {
        |  "hwho": {"required": ["who_id"],
        |           "properties": {"who_id": {"type": "string"}, "sub_who_id": {"type": "string"}}},
        |  "header": {"required": ["sym", "expire"],
        |             "properties": {"sym": {"type": "string"}, "expire": {"type": "string"}}},
        |  "foo_header": {"allOf": [
        |    {"$ref": "#/definitions/header"},
        |    {"required": ["amount", "desc"],
        |     "properties": {"amount": {"type": "integer"}, "desc": {"enum": ["foo"]}}}]},
        |  "template_1": {"allOf": [
        |    {"$ref": "#/definitions/foo_header"},
        |    {"$ref": "#/definitions/hwho"},
        |    {"required": ["template"], "properties": {"template": {"type": "string"}}}]},
        |  "bar_header": {"allOf": [
        |    {"$ref": "#/definitions/header"},
        |    {"required": ["amount", "desc"],
        |     "properties": {"amount": {"type": "integer"}, "desc": {"enum": ["foo"]}}}]}}}""".stripMargin
    val rule = RulePack.parse(schema)

    // sym and template absent → the reference's four errors, message-exact
    val partial = Seq(("WHO", "2018-01-01", 1000, "foo")).toDF("who_id", "expire", "amount", "desc")
    val errs = Violations.sorted(Violations.validate(partial, rule, Seq()), Seq())
      .select("path", "message").as[(String, String)].collect().toSet
    assert(errs === Set(
      "/" -> "/oneOf/2 Expected string - got object.",
      "/sym" -> "/oneOf/0/allOf/0/allOf/0 Missing property.",
      "/sym" -> "/oneOf/1/allOf/0 Missing property.",
      "/template" -> "/oneOf/0/allOf/2 Missing property."))

    // everything present → branches 0 AND 1 both match
    val full = Seq(("a", "b", 1, "foo", "c", "d"))
      .toDF("sym", "expire", "amount", "desc", "who_id", "template")
    val errs2 = Violations.validate(full, rule, Seq())
      .select("path", "message").as[(String, String)].collect().toSeq
    assert(errs2 === Seq("/" -> "oneOf rules 0, 1 match."))
  }

  // ---- determinism across partitionings (t/predictable-errors.t) ----
  test("violation order is stable across input partitionings") {
    val rows = (1 to 500).map(i => (i.toLong, s"v$i", i % 97))
    def run(parts: Int): Seq[(Long, String, String)] = {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(r => org.apache.spark.sql.Row(r._1, r._2, r._3)), parts),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("name", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("score", org.apache.spark.sql.types.IntegerType))))
      val rule = RulePack.parse(
        """{"properties":{"name":{"pattern":"^v[0-4]"},"score":{"maximum":50}}}""")
      Violations.sorted(Violations.validate(df, rule, Seq("id")), Seq("id"))
        .select("id", "path", "rule_id")
        .as[(Long, String, String)].collect().toSeq
    }
    assert(run(2) === run(11))
  }
}
