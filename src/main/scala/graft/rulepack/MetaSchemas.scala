package graft.rulepack

import graft.core.JValue

/** The draft meta-schemas, embedded as resources — verbatim copies of the
  * public json-schema.org standard documents (the same documents the
  * reference ships in its offline cache, `lib/JSON/Validator/cache`;
  * resolved there by `Schema->specification`, Schema.pm:16,36). Used by
  * [[JsonValidate.schemaErrors]] to validate rule-pack documents at load
  * time.
  */
object MetaSchemas {

  /** Schema.pm:16 — the fallback specification. */
  val DefaultSpec = "http://json-schema.org/draft-04/schema#"

  private def load(name: String): JValue = {
    val in = getClass.getResourceAsStream(s"/graft/metaschema/$name.json")
    require(in != null, s"missing embedded meta-schema resource: $name")
    try JValue.parse(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
    finally in.close()
  }

  lazy val draft04: JValue = load("draft-04")
  lazy val draft06: JValue = load("draft-06")
  lazy val draft07: JValue = load("draft-07")

  /** Meta-schema for a `$schema` URI. Unknown / newer specs fall back to
    * draft-07 (permissive for their extra keywords — draft-07's
    * meta-schema has no closed world), the reference's own posture of
    * defaulting rather than refusing (Schema.pm:16). */
  def forUri(uri: String): JValue = {
    val u = RulePack.stripFragment(uri)
    if (u.contains("draft-04")) draft04
    else if (u.contains("draft-06")) draft06
    else if (u.contains("draft-07")) draft07
    else if (u.isEmpty) draft04
    else draft07
  }
}
