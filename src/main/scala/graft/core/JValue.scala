package graft.core

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import scala.jdk.CollectionConverters._

/** Minimal immutable JSON value model used for rule-pack constants
  * (`enum`, `const`, `default`) and for the rule-pack JSON codec.
  *
  * Mirrors the reference's use of decoded Perl structures as schema
  * constants (reference: lib/JSON/Validator/Util.pm:163-167 `str2data`),
  * but typed. Jackson (already on the Spark classpath) does the parsing.
  */
sealed trait JValue {
  def render: String = this match {
    case JNull          => "null"
    case JBool(b)       => if (b) "true" else "false"
    case JInt(i)        => i.toString
    case JNum(d)        => if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString else d.toString
    case JStr(s)        => "\"" + JValue.escape(s) + "\""
    case JArr(items)    => items.map(_.render).mkString("[", ",", "]")
    case JObj(fields)   => fields.map { case (k, v) => "\"" + JValue.escape(k) + "\":" + v.render }.mkString("{", ",", "}")
  }

  /** Plain-text rendering used in violation messages (strings unquoted),
    * matching how the reference interpolates values into messages. */
  def plain: String = this match {
    case JStr(s) => s
    case other   => other.render
  }
}
case object JNull extends JValue
final case class JBool(value: Boolean) extends JValue
final case class JInt(value: Long) extends JValue
final case class JNum(value: Double) extends JValue
final case class JStr(value: String) extends JValue
final case class JArr(items: Seq[JValue]) extends JValue
final case class JObj(fields: Vector[(String, JValue)]) extends JValue {
  lazy val toMap: Map[String, JValue] = fields.toMap
  def get(key: String): Option[JValue] = toMap.get(key)
}

object JValue {
  private val mapper = new ObjectMapper()
  private lazy val yamlMapper =
    new ObjectMapper(new com.fasterxml.jackson.dataformat.yaml.YAMLFactory())

  def parse(text: String): JValue = fromNode(mapper.readTree(text))

  /** YAML document → JValue (jackson-dataformat-yaml, already on the Spark
    * classpath) — the engine's side of the reference's `_yaml_load`
    * (Util.pm:152-166). */
  def parseYaml(text: String): JValue = fromNode(yamlMapper.readTree(text))

  /** Content sniffing exactly like the reference's `str2data`
    * (Util.pm:163-167): a document whose first non-space byte is `{` is
    * JSON, anything else parses as YAML (JSON is a YAML subset, so pure
    * arrays etc. still load). */
  def parseAny(text: String): JValue =
    if (text.matches("(?s)^\\s*\\{.*")) parse(text) else parseYaml(text)

  def fromNode(n: JsonNode): JValue =
    if (n == null || n.isNull) JNull
    else if (n.isBoolean) JBool(n.asBoolean())
    else if (n.isIntegralNumber) JInt(n.asLong())
    else if (n.isNumber) JNum(n.asDouble())
    else if (n.isTextual) JStr(n.asText())
    else if (n.isArray) JArr(n.elements().asScala.map(fromNode).toVector)
    else if (n.isObject)
      JObj(n.properties().asScala.map(e => e.getKey -> fromNode(e.getValue)).toVector)
    else sys.error(s"unsupported json node: $n")

  def escape(s: String): String = s.flatMap {
    case '"'           => "\\\""
    case '\\'          => "\\\\"
    case '\n'          => "\\n"
    case '\r'          => "\\r"
    case '\t'          => "\\t"
    case c if c < ' '  => f"\\u${c.toInt}%04x"
    case c             => c.toString
  }
}
