package graft.rulepack

import graft.SparkSuite
import graft.core.Rule
import graft.core.Rule._
import graft.core.{JInt, JObj, JStr, JValue}

/** `$id`/`$anchor` registration and base-URI-aware `$ref` resolution —
  * reference t/id-keyword-draft4.t, t/id-keyword-draft7.t,
  * t/relative-ref.t, t/deep-mixed-ref.t semantics (Schema.pm:337-364). */
class RulePackRefSpec extends SparkSuite {

  test("joinUri resolves relative/fragment/absolute refs (RFC 3986)") {
    assert(RulePack.joinUri("http://e.com/root.json", "b.json") === "http://e.com/b.json")
    assert(RulePack.joinUri("http://e.com/b.json", "t/inner.json") === "http://e.com/t/inner.json")
    assert(RulePack.joinUri("http://e.com/a/b.json", "../c.json") === "http://e.com/c.json")
    assert(RulePack.joinUri("http://e.com/root.json", "#x") === "http://e.com/root.json#x")
    assert(RulePack.joinUri("http://e.com/root.json", "urn:uuid:ee56") === "urn:uuid:ee56")
    assert(RulePack.joinUri("", "defs.json") === "defs.json")
  }

  test("subschema ids rebase: b.json#bx resolves through two id hops (t/id-keyword-draft4.t fixture)") {
    // the reference fixture, with constraints added so resolution is
    // observable in the built rule
    val rule = RulePack.parse(
      """{"id": "http://example.com/relative-to-the-root.json",
        | "definitions": {
        |  "A": { "id": "#a", "minimum": 1 },
        |  "B": { "id": "b.json",
        |         "definitions": {
        |           "X": { "id": "#bx", "maximum": 5 },
        |           "Y": { "id": "t/inner.json", "minimum": 7 } } },
        |  "C": { "id": "c.json",
        |         "definitions": {
        |           "X": { "id": "urn:uuid:ee564b8a-7a87-4125-8c96-e9f123d6766f", "maximum": 9 } } }
        | },
        | "properties": {
        |  "r1": { "$ref": "b.json#bx" },
        |  "r2": { "$ref": "#a" },
        |  "r3": { "$ref": "urn:uuid:ee564b8a-7a87-4125-8c96-e9f123d6766f" },
        |  "r4": { "$ref": "t/inner.json" }
        | }}""".stripMargin)
    val props = rule match {
      case Properties(ps) => ps.toMap
      case All(rs)        => rs.collectFirst { case Properties(ps) => ps.toMap }.get
      case other          => fail(s"unexpected: $other")
    }
    assert(props("r1") === Maximum(5))                 // b.json + #bx anchor
    assert(props("r2") === Minimum(1))                 // root anchor-form id
    assert(props("r3") === Maximum(9))                 // urn id, location-independent
    assert(props("r4") === Minimum(7))                 // id relative to b.json, NOT the root
  }

  test("cross-document '#/' fragments resolve against the OWNING document (Schema.pm base_url)") {
    // the store doc's internal ref must hit ITS definitions — the entry
    // document has a decoy at the same pointer with different semantics
    val defs = JValue.parse(
      """{"definitions": {
        |  "pos": { "minimum": 0 },
        |  "agelike": { "$ref": "#/definitions/pos" } }}""".stripMargin)
    val store = RulePack.Store(Map("http://x/defs.json" -> defs))
    val rule = RulePack.parse(
      """{"definitions": { "pos": { "maximum": 999 } },
        | "properties": { "age": { "$ref": "http://x/defs.json#/definitions/agelike" } }}""".stripMargin,
      store)
    val props = rule match {
      case Properties(ps) => ps.toMap
      case other          => fail(s"unexpected: $other")
    }
    assert(props("age") === Minimum(0)) // NOT Maximum(999) from the entry root
  }

  test("relative cross-doc refs join against the root id (t/relative-ref.t shape)") {
    val age = JValue.parse("""{"type": "integer", "minimum": 0}""")
    val store = RulePack.Store(Map("http://e.com/definitions/age.json" -> age))
    val rule = RulePack.parse(
      """{"$id": "http://e.com/spec/with-relative-ref.json",
        | "type": "object",
        | "properties": { "age": { "$ref": "../definitions/age.json#" } }}""".stripMargin,
      store)
    val props = rule match {
      case All(rs) => rs.collectFirst { case Properties(ps) => ps.toMap }.get
      case other   => fail(s"unexpected: $other")
    }
    assert(props("age") === All(Seq(TypeIs(Seq("integer")), Minimum(0))))
  }

  test("$anchor registers under base#name (draft2019-09)") {
    val rule = RulePack.parse(
      """{"$id": "http://e.com/a.json",
        | "$defs": { "p": { "$anchor": "positive", "minimum": 0 } },
        | "properties": { "n": { "$ref": "#positive" } }}""".stripMargin)
    val props = rule match {
      case Properties(ps) => ps.toMap
      case All(rs)        => rs.collectFirst { case Properties(ps) => ps.toMap }.get
      case other          => fail(s"unexpected: $other")
    }
    assert(props("n") === Minimum(0))
  }

  test("root id validation: fragment and relative root ids are rejected (t/id-keyword-draft4.t)") {
    val fragErr = intercept[IllegalArgumentException](
      RulePack.parse("""{"id": "http://example.com/x.json#cannot_be_here"}"""))
    assert(fragErr.getMessage.contains("Fragment not allowed"))
    val relErr = intercept[IllegalArgumentException](
      RulePack.parse("""{"id": "whatever"}"""))
    assert(relErr.getMessage.contains("Relative URL not allowed"))
  }

  test("YAML packs parse to the identical Rule as their JSON twin (t/load-yaml.t)") {
    val yaml =
      """---
        |title: Example Schema
        |type: object
        |required:
        |  - firstName
        |  - lastName
        |properties:
        |  firstName:
        |    type: string
        |  lastName:
        |    type: string
        |  age:
        |    type: integer
        |    minimum: 0
        |    description: Age in years
        |""".stripMargin
    val json =
      """{"title": "Example Schema", "type": "object",
        | "required": ["firstName", "lastName"],
        | "properties": {
        |   "firstName": {"type": "string"},
        |   "lastName": {"type": "string"},
        |   "age": {"type": "integer", "minimum": 0, "description": "Age in years"}}}""".stripMargin
    assert(RulePack.parseYaml(yaml) === RulePack.parse(json))
    // str2data sniffing: '{' → JSON, else YAML (Util.pm:163-167)
    assert(RulePack.parseAny(yaml) === RulePack.parseAny(json))

    // the reference test's semantics: {firstName: 'yikes!'} → one error,
    // /lastName 'Missing property.'
    import spark.implicits._
    val df = Seq((Some("yikes!"), Option.empty[String], Option.empty[Int]))
      .toDF("firstName", "lastName", "age")
    val errs = graft.core.Violations.validate(df, RulePack.parseYaml(yaml), Seq())
      .select("path", "message").as[(String, String)].collect().toSeq
    assert(errs === Seq("/lastName" -> "Missing property."))
  }

  test("schema-map keys shadowing data keywords still register their ids") {
    // a property literally named "default" holds a schema with an $id —
    // the registration walk must not mistake the KEY for the keyword
    val rule = RulePack.parse(
      """{"$id": "http://e.com/r.json",
        | "definitions": { "default": { "$id": "http://e.com/d.json", "minimum": 3 } },
        | "properties": { "x": { "$ref": "http://e.com/d.json" } }}""".stripMargin)
    val props = rule match {
      case Properties(ps) => ps.toMap
      case All(rs)        => rs.collectFirst { case Properties(ps) => ps.toMap }.get
      case other          => fail(s"unexpected: $other")
    }
    assert(props("x") === Minimum(3))
  }

  test("modality packs (readOnly/writeOnly + required) encode/parse round-trip") {
    val json =
      """{"type":"object",
        | "properties":{"id":{"type":"integer","readOnly":true},
        |               "secret":{"type":"string","writeOnly":true},
        |               "name":{"type":"string"}},
        | "required":["id","secret","name"]}""".stripMargin
    val rule = RulePack.parse(json)
    val reparsed = RulePack.parse(RulePackEncoder.encodeToJson(rule))
    assert(reparsed === rule)
  }

  test("pointer get: escapes, $ref-merged view, wildcard fan-out (t/get.t)") {
    val doc = JValue.parse(
      """{"$defs": {"z1": {"$ref": "#/$defs/z2", "minLength": 1},
        |           "z2": {"type": "string"}},
        | "properties": {
        |   "bar": {"items": [{"properties": {"y": {"$ref": "#/$defs/z1"}, "x": {"type": "integer"}}}]},
        |   "foo": {"items": [{"properties": {"y": {"type": "string"}}}]},
        |   "x/~y": {"type": "boolean"}}}""".stripMargin)

    // plain navigation + ~1/~0 escapes + undef for missing paths
    assert(RulePack.getResolved(doc, "/properties/foo/items/0/properties/y/type") === Some(JStr("string")))
    assert(RulePack.getResolved(doc, "/$defs/baz") === None)
    assert(RulePack.getResolved(doc, "/properties/baz") === None)
    assert(RulePack.getResolved(doc, "/properties/x~1~0y/type") === Some(JStr("boolean")))

    // $ref-merged view: y resolves through z1 -> z2, siblings merged
    val y = RulePack.getResolved(doc, "/properties/bar/items/0/properties/y").get.asInstanceOf[JObj]
    assert(y.get("type") === Some(JStr("string")))
    assert(y.get("minLength") === Some(JInt(1)))
    assert(y.fields.map(_._1).toSet === Set("type", "minLength"))
    // ...unless the path addresses $ref itself
    assert(RulePack.getResolved(doc, "/properties/bar/items/0/properties/y/$ref")
      === Some(JStr("#/$defs/z1")))
    // mid-path refs resolve too: navigate THROUGH y into the merged target
    assert(RulePack.getResolved(doc, "/properties/bar/items/0/properties/y/minLength") === Some(JInt(1)))
    assert(RulePack.getResolved(doc, "/properties/bar/items/0/properties/y/type") === Some(JStr("string")))

    // wildcard fan-out with concrete paths (the callback contract)
    val hits = RulePack.pointerAll(doc,
      Seq(Some("properties"), None, Some("items"), Some("0"), Some("properties"), None, Some("type")))
    assert(hits.toSet === Set(
      JStr("integer") -> "/properties/bar/items/0/properties/x/type",
      JStr("string") -> "/properties/foo/items/0/properties/y/type"))
  }

  test("unresolvable and recursive refs still fail fast") {
    intercept[IllegalArgumentException](
      RulePack.parse("""{"$ref": "#/nope"}"""))
    intercept[IllegalArgumentException](
      RulePack.parse("""{"definitions": {"a": {"$ref": "#/definitions/a"}}, "$ref": "#/definitions/a"}"""))
    // indirect A→B→A cycle with no structural descent is equally degenerate
    intercept[IllegalArgumentException](
      RulePack.parse(
        """{"definitions": {"a": {"allOf": [{"$ref": "#/definitions/b"}]},
          |                 "b": {"$ref": "#/definitions/a"}},
          | "$ref": "#/definitions/a"}""".stripMargin))
  }

  test("$recursiveRef tree resolves through a cross-document $ref (t/draft2019-09.t:25-36)") {
    // the reference's own recursiveRef test: recursiveRef.json is just a
    // $ref to tree.json, whose children items carry {"$recursiveRef": "#"}
    // that must resolve to tree.json's OWN $id scope (urn:x-test:tree)
    val tree = JValue.parse(
      """{"$schema": "https://json-schema.org/draft/2019-09/schema",
        | "$id": "urn:x-test:tree",
        | "type": "object",
        | "properties": {
        |   "data": {"type": "integer"},
        |   "children": {"type": "array", "items": {"$recursiveRef": "#"}}},
        | "required": ["data"]}""".stripMargin)
    val rule = RulePack.parse(
      """{"$schema": "https://json-schema.org/draft/2019-09/schema",
        | "$id": "urn:x-test:recursiveRef",
        | "$ref": "urn:x-test:tree"}""".stripMargin,
      RulePack.Store(Map("urn:x-test:tree" -> tree)))

    import spark.implicits._
    // nested tree rows via SQL struct literals — the grandchild level checks
    // that the unrolling actually recurses
    val df = spark.sql(
      """SELECT named_struct('data', 1,
        |  'children', array(named_struct('data', 2,
        |     'children', array(named_struct('data', CAST(NULL AS INT)))))) AS doc
        |UNION ALL
        |SELECT named_struct('data', 1,
        |  'children', array(named_struct('data', 5,
        |     'children', array(named_struct('data', 9)))))""".stripMargin)
    val dt = df.schema("doc").dataType
    val errs = df.select(
      org.apache.spark.sql.functions.explode(
        graft.core.RuleCompiler.compile(rule, dt,
          org.apache.spark.sql.functions.col("doc"),
          org.apache.spark.sql.functions.lit(""))).as("e"))
      .select("e.path", "e.rule_id").as[(String, String)].collect().toSeq
    // only the NULL grandchild `data` violates, two levels down (the engine
    // maps `required` to the NULL-presence check — SURVEY §2.2: SQL NULL is
    // the flat-table analog of a missing key)
    assert(errs === Seq("/children/0/children/0/data" -> "required"))
  }
}
