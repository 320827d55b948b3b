package graft.rulepack

import graft.core._
import org.scalatest.funsuite.AnyFunSuite

/** Driver-side meta-schema validation — parity with the reference's
  * `load_and_validate_schema` / `Schema->errors` surface
  * (t/validate-schema.t, t/validate-draft07.t, t/issue-158), plus the
  * walker's own keyword/message semantics against reference-pinned
  * expectations. Pure driver code: no SparkSession.
  */
class JsonValidateSpec extends AnyFunSuite {

  private def v(data: String, schema: String,
      coerce: JsonValidate.Coercion = JsonValidate.Coercion()): Seq[String] =
    JsonValidate.validate(JValue.parse(data), JValue.parse(schema), coerce = coerce)
      .map(_.toString)

  // ---- t/validate-schema.t ------------------------------------------------

  /** The exact __DATA__ fixture of t/validate-schema.t:24-34. */
  private val invalidDoc = """{
    "$schema": "http://json-schema.org/draft-04/schema#",
    "title": "Example Schema That Should Fail To Load",
    "description": "There is an array as the value of an object property, which should not be allowed.",
    "type": "object",
    "properties": {
      "foo": { "type": "integer" },
      "should_fail": []
    }
  }"""

  test("validate-schema.t: the invalid property element error, verbatim") {
    val errs = JsonValidate.schemaErrors(JValue.parse(invalidDoc))
    assert(errs.map(_.toString) ===
      Seq("/properties/should_fail: Expected object - got array."))
  }

  test("validate-schema.t: load_and_validate_schema dies with the reference wording") {
    val e = intercept[IllegalArgumentException](
      JsonValidate.loadAndValidateSchema(invalidDoc))
    assert(e.getMessage.startsWith("Invalid JSON specification"))
    assert(e.getMessage.contains("Expected object - got array"))
  }

  test("load_and_validate_schema compiles a clean pack") {
    val rule = JsonValidate.loadAndValidateSchema(
      """{"type": "object", "properties": {"foo": {"type": "integer"}}, "required": ["foo"]}""")
    assert(rule !== null)
  }

  // ---- t/validate-draft07.t + issue-158: the meta-schemas self-validate ---

  test("draft-04 meta-schema validates itself clean") {
    assert(JsonValidate.schemaErrors(MetaSchemas.draft04) === Seq.empty)
  }
  test("draft-06 meta-schema validates itself clean") {
    assert(JsonValidate.schemaErrors(MetaSchemas.draft06) === Seq.empty)
  }
  test("draft-07 meta-schema validates itself clean (t/validate-draft07.t)") {
    assert(JsonValidate.schemaErrors(MetaSchemas.draft07) === Seq.empty)
  }

  // ---- meta-gate semantics ------------------------------------------------

  test("spec validation coerces numbers (Schema.pm:17): string bounds pass") {
    assert(JsonValidate.schemaErrors(JValue.parse("""{"minimum": "5"}""")) === Seq.empty)
  }

  test("non-numeric bound is caught with the reference message") {
    assert(JsonValidate.schemaErrors(JValue.parse("""{"minimum": false}""")).map(_.toString) ===
      Seq("/minimum: Expected number - got boolean."))
  }

  test("draft-04 dependencies: exclusiveMaximum without maximum") {
    assert(JsonValidate.schemaErrors(
      JValue.parse("""{"exclusiveMaximum": true}""")).map(_.toString) ===
      Seq("/maximum: Missing property. Dependee: exclusiveMaximum."))
  }

  test("bogus type name: the anyOf branches surface prefixed") {
    val errs = JsonValidate.schemaErrors(JValue.parse("""{"type": "nope"}""")).map(_.toString)
    assert(errs === Seq(
      "/type: /anyOf/0 Not in enum list: array, boolean, integer, null, number, object, string.",
      "/type: /anyOf/1 Expected array - got string."))
  }

  test("a draft-07 document is validated against the draft-07 meta-schema") {
    // exclusiveMaximum is numeric-style in draft-07: a boolean violates it
    val doc = """{"$schema": "http://json-schema.org/draft-07/schema#", "exclusiveMaximum": true}"""
    assert(JsonValidate.schemaErrors(JValue.parse(doc)).map(_.toString) ===
      Seq("/exclusiveMaximum: Expected number - got boolean."))
  }

  // ---- walker semantics (reference-pinned) --------------------------------

  test("type union collapse (issue-22 wording)") {
    assert(v("42", """{"type": ["string", "boolean"]}""") ===
      Seq("/: Expected string/boolean - got number."))
  }

  test("allOf pure-type collapse vs mixed prefixing") {
    assert(v("42", """{"allOf": [{"type": "string"}, {"type": "boolean"}]}""") ===
      Seq("/: /allOf Expected string/boolean - got number."))
    assert(v("\"ab\"", """{"allOf": [{"type": "string", "minLength": 3}, {"type": "boolean"}]}""") ===
      Seq("/: /allOf/0 String is too short: 2/3.", "/: /allOf/1 Expected boolean - got string."))
  }

  test("anyOf favors the non-type branch errors, prefixed") {
    assert(v("\"ab\"", """{"anyOf": [{"type": "string", "minLength": 3}, {"type": "boolean"}]}""") ===
      Seq("/: /anyOf/0 String is too short: 2/3.", "/: /anyOf/1 Expected boolean - got string."))
    assert(v("\"abc\"", """{"anyOf": [{"type": "string", "minLength": 3}, {"type": "boolean"}]}""") === Seq.empty)
  }

  test("oneOf specials: all_rules_match and n_rules_match") {
    assert(v("2", """{"oneOf": [{"type": "integer"}, {"type": "number"}]}""") ===
      Seq("/: All of the oneOf rules match."))
    assert(v("2", """{"oneOf": [{"type": "integer"}, {"minimum": 1}, {"type": "string"}]}""") ===
      Seq("/: oneOf rules 0, 1 match."))
    assert(v("2", """{"oneOf": [{"type": "integer"}, {"type": "string"}]}""") === Seq.empty)
  }

  test("not: Should not match") {
    assert(v("\"x\"", """{"not": {"type": "string"}}""") === Seq("/: Should not match."))
    assert(v("42", """{"not": {"type": "string"}}""") === Seq.empty)
  }

  test("Perl scalar unification: number and its string form compare equal") {
    // uniqueItems: [1, "1"] IS a duplicate pair under data_checksum
    assert(v("""[1, "1"]""", """{"uniqueItems": true}""") === Seq("/: Unique items required."))
    // enum: 5 matches "5"
    assert(v("5", """{"enum": ["5"]}""") === Seq.empty)
    assert(v("5", """{"enum": [6]}""") === Seq("/: Not in enum list: 6."))
  }

  test("multipleOf uses the stringified-quotient check (fp parity)") {
    assert(v("2.4", """{"multipleOf": 0.8}""") === Seq.empty) // 2.4/0.8 stringifies "3"
    assert(v("7", """{"multipleOf": 2}""") === Seq("/: Not multiple of 2."))
  }

  test("minLength counts codepoints, not UTF-16 units") {
    assert(v("\"𝄞\"", """{"minLength": 2}""") ===
      Seq("/: String is too short: 1/2."))
  }

  test("closed world discards other object errors and lists sorted keys (issue-71 wording)") {
    assert(v("""{"zz": 1, "aa": 2, "link": "http://a"}""",
      """{"required": ["link"], "type": "object", "additionalProperties": false,
         "properties": {"link": {"format": "uri"}}}""") ===
      Seq("/: Properties not allowed: aa, zz."))
  }

  test("required + dependencies paths") {
    assert(v("""{}""", """{"type": "object", "required": ["a", "b"]}""") ===
      Seq("/a: Missing property.", "/b: Missing property."))
    assert(v("""{"credit_card": 1}""",
      """{"type": "object", "dependencies": {"credit_card": ["billing_address"]}}""") ===
      Seq("/billing_address: Missing property. Dependee: credit_card."))
  }

  test("tuple items + additionalItems cap") {
    assert(v("""[1, "x", true]""",
      """{"items": [{"type": "integer"}, {"type": "string"}], "additionalItems": false}""") ===
      Seq("/: Invalid number of items: 3/2."))
    assert(v("""[1, "x"]""",
      """{"items": [{"type": "integer"}, {"type": "boolean"}]}""") ===
      Seq("/1: Expected boolean - got string."))
  }

  test("$ref resolution inside the document (issue-59 shape: oneOf of object|boolean)") {
    val schema = """{
      "definitions": {"item": {"oneOf": [{"type": "object"}, {"type": "boolean"}]}},
      "type": "object",
      "properties": {"prop1": {"$ref": "#/definitions/item"},
                     "prop2": {"$ref": "#/definitions/item"}}
    }"""
    assert(v("""{"prop1": false, "prop2": false}""", schema) === Seq.empty)
    assert(v("""{"prop1": "nope"}""", schema) ===
      Seq("/prop1: /oneOf Expected object/boolean - got string."))
  }

  test("schema_type inference applies keywords only to matching data") {
    // {properties:…} on an array: guessed object, array data → no object error
    assert(v("""[1, 2]""", """{"properties": {"x": {"type": "integer"}}}""") === Seq.empty)
    // {minItems:2} on a string passes; on a short array errors
    assert(v("\"ab\"", """{"minItems": 2}""") === Seq.empty)
    assert(v("[1]", """{"minItems": 2}""") === Seq("/: Not enough items: 1/2."))
  }

  test("errors sort by path (Schema.pm:154-155)") {
    val errs = v("""{"b": "x", "a": "y"}""",
      """{"type": "object", "properties": {"b": {"type": "integer"}, "a": {"type": "integer"}}}""")
    assert(errs === Seq("/a: Expected integer - got string.",
      "/b: Expected integer - got string."))
  }

  // ---- official acceptance slice through the driver walker ----------------

  private def loadSlice(resource: String): Seq[(String, JValue, Seq[(String, JValue, Boolean)])] = {
    val text = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream(resource), "UTF-8").mkString
    JValue.parse(text) match {
      case JArr(groups) => groups.map { case g: JObj =>
        val desc = g.get("description").collect { case JStr(s) => s }.get
        val schema = g.get("schema").get
        val tests = g.get("tests") match {
          case Some(JArr(ts)) => ts.map { case t: JObj =>
            (t.get("description").collect { case JStr(s) => s }.get,
              t.get("data").getOrElse(JNull),
              t.get("valid").contains(JBool(true)))
          case other => sys.error(s"bad test: $other")
          }
          case other => sys.error(s"bad tests: $other")
        }
        (desc, schema, tests)
      case other => sys.error(s"bad group: $other")
      }
      case other => sys.error(s"bad suite: $other")
    }
  }

  /** Official-suite cases where the REFERENCE itself diverges from the
    * spec and the walker mirrors the reference (each entry names the
    * reference behavior it pins). Empty until proven otherwise. */
  private val referenceQuirks: Set[String] = Set.empty

  test("draft-7 acceptance slice verdicts match through the driver walker") {
    val suite = loadSlice("/jsonschema-suite/draft7-slice.json")
    var run = 0
    val failures = Seq.newBuilder[String]
    for ((gdesc, schema, tests) <- suite; (tdesc, data, expectValid) <- tests) {
      val name = s"$gdesc :: $tdesc"
      if (!referenceQuirks.contains(name)) {
        run += 1
        val got = JsonValidate.validate(data, schema).isEmpty
        if (got != expectValid)
          failures += s"$name (expected valid=$expectValid, schema=${schema.render}, data=${data.render})"
      }
    }
    val bad = failures.result()
    assert(bad.isEmpty, s"${bad.size}/$run diverged:\n${bad.mkString("\n")}")
    assert(run >= 150)
  }

  test("2019-09 delta slice verdicts match through the driver walker (ref-sibling dialect)") {
    val suite = loadSlice("/jsonschema-suite/draft2019-slice.json")
    var run = 0
    val failures = Seq.newBuilder[String]
    for ((gdesc, schema, tests) <- suite; (tdesc, data, expectValid) <- tests) {
      run += 1
      val got = JsonValidate.validate(data, schema,
        refSiblings = Some(true)).isEmpty
      if (got != expectValid)
        failures += s"$gdesc :: $tdesc (expected valid=$expectValid, schema=${schema.render}, data=${data.render})"
    }
    val bad = failures.result()
    assert(bad.isEmpty, s"${bad.size}/$run diverged:\n${bad.mkString("\n")}")
    assert(run >= 40)
  }
}
