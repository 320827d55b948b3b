package graft.rulepack

import graft.core._
import graft.core.Rule._

/** Rule → JSON serializer: the engine's `bundle` (reference lib/JSON/
  * Validator/Schema.pm:44-65 — emit a self-contained schema with every
  * external reference inlined). Since [[RulePack.fromJson]] inlines `$ref`s
  * at parse time, every Rule tree is already closed; encoding it yields a
  * shippable, dependency-free rule pack (the analog of broadcasting a
  * resolved plan to executors).
  *
  * `Predicate` rules carry arbitrary Scala code and cannot round-trip; they
  * encode as `{"x-predicate": "<ruleId>"}` markers (fails loudly on parse,
  * like the reference's unresolvable ref).
  */
object RulePackEncoder {

  def encodeToJson(rule: Rule): String = encode(rule).render

  def encode(rule: Rule): JValue = rule match {
    case Always => JBool(true)
    case Never  => JBool(false)
    case All(rules) => mergeObjs(rules.map(encodeObj))
    case other      => JObj(encodeObj(other))
  }

  private def mergeObjs(parts: Seq[Vector[(String, JValue)]]): JValue = {
    val fields0 = parts.flatten
    // duplicate `required` arrays union (conjunction-equivalent) — keeps
    // modality-split required lists (plain + readOnly + writeOnly) in ONE
    // object so the parser's per-direction re-split sees the flags
    val fields =
      if (fields0.count(_._1 == "required") > 1) {
        val names = fields0.collect { case ("required", JArr(items)) => items }.flatten.distinct
        fields0.filterNot(_._1 == "required") :+ ("required" -> (JArr(names.toVector): JValue))
      } else fields0
    val dup = fields.groupBy(_._1).filter(_._2.size > 1)
    if (dup.isEmpty) JObj(fields.toVector)
    // keyword collision (e.g. two Patterns) → allOf form, still one object
    else JObj(Vector("allOf" -> JArr(parts.map(p => JObj(p): JValue))))
  }

  private def num(d: Double): JValue =
    if (d == d.floor && math.abs(d) < 1e15) JInt(d.toLong) else JNum(d)

  private def encodeObj(rule: Rule): Vector[(String, JValue)] = rule match {
    case Always => Vector.empty
    case Never  => Vector("not" -> JObj(Vector.empty))
    case TypeIs(Seq(t)) => Vector("type" -> JStr(t))
    case TypeIs(ts)     => Vector("type" -> JArr(ts.map(JStr(_))))
    case Enum(vs)       => Vector("enum" -> JArr(vs))
    case Const(v)       => Vector("const" -> v)
    case Minimum(v, false) => Vector("minimum" -> num(v))
    case Minimum(v, true)  => Vector("exclusiveMinimum" -> num(v))
    case Maximum(v, false) => Vector("maximum" -> num(v))
    case Maximum(v, true)  => Vector("exclusiveMaximum" -> num(v))
    case MultipleOf(v)  => Vector("multipleOf" -> num(v))
    case MinLength(n)   => Vector("minLength" -> JInt(n))
    case MaxLength(n)   => Vector("maxLength" -> JInt(n))
    case Pattern(p)     => Vector("pattern" -> JStr(p))
    case Format(f)      => Vector("format" -> JStr(f))
    case MinItems(n)    => Vector("minItems" -> JInt(n))
    case MaxItems(n)    => Vector("maxItems" -> JInt(n))
    case UniqueItems    => Vector("uniqueItems" -> JBool(true))
    case Items(r)       => Vector("items" -> encode(r))
    case TupleItems(rs, additional) =>
      Vector("items" -> JArr(rs.map(encode))) ++
        (additional match {
          case None => Vector("additionalItems" -> JBool(false))
          case Some(Always) => Vector.empty
          case Some(r) => Vector("additionalItems" -> encode(r))
        })
    case Contains(r, minC, maxC) =>
      Vector("contains" -> encode(r)) ++
        minC.map(n => "minContains" -> (JInt(n): JValue)) ++
        maxC.map(n => "maxContains" -> (JInt(n): JValue))
    case Properties(props) =>
      Vector("properties" -> JObj(props.toVector.map { case (k, r) => k -> encode(r) }))
    case PatternProperties(props) =>
      Vector("patternProperties" -> JObj(props.toVector.map { case (k, r) => k -> encode(r) }))
    case Required(fs)   => Vector("required" -> JArr(fs.map(JStr(_))))
    case ClosedWorld(_, _, None)    => Vector("additionalProperties" -> JBool(false))
    case ClosedWorld(_, _, Some(r)) => Vector("additionalProperties" -> encode(r))
    case PropertyNames(r) => Vector("propertyNames" -> encode(r))
    case MinProperties(n) => Vector("minProperties" -> JInt(n))
    case MaxProperties(n) => Vector("maxProperties" -> JInt(n))
    case DependentRequired(deps) =>
      Vector("dependentRequired" -> JObj(deps.toVector.map { case (k, vs) => k -> (JArr(vs.map(JStr(_))): JValue) }))
    case DependentSchemas(deps) =>
      Vector("dependentSchemas" -> JObj(deps.toVector.map { case (k, r) => k -> encode(r) }))
    case Not(r)    => Vector("not" -> encode(r))
    case AllOf(rs) => Vector("allOf" -> JArr(rs.map(encode)))
    case AnyOf(rs) => Vector("anyOf" -> JArr(rs.map(encode)))
    case OneOf(rs) => Vector("oneOf" -> JArr(rs.map(encode)))
    case IfThenElse(c, t, e) =>
      Vector("if" -> encode(c)) ++ t.map("then" -> encode(_)) ++ e.map("else" -> encode(_))
    case Nullable(r) => encodeObj(r) :+ ("nullable" -> (JBool(true): JValue))
    case Discriminator(field, mapping, default) =>
      Vector("x-discriminator" -> JObj(Vector(
        "propertyName" -> JStr(field),
        "mapping" -> JObj(mapping.toVector.map { case (k, r) => k -> encode(r) })) ++
        default.map("default" -> encode(_))))
    case Predicate(id, _, _) => Vector("x-predicate" -> JStr(id))
    // modality: the readOnly/writeOnly composite (Rule.readOnly/writeOnly =
    // Modal + PresenceForbidden) re-emerges from these standalone cases —
    // PresenceForbidden carries the flag, Modal defers to its inner rule
    // (the parser re-derives directions from the flags). A Modal(Required)
    // from per-direction required-stripping folds back into `required`.
    case Modal(Required(fs), _) => Vector("required" -> JArr(fs.map(JStr(_))))
    case Modal(r, _)            => encodeObj(r)
    case PresenceForbidden(Request, _)  => Vector("readOnly" -> JBool(true))
    case PresenceForbidden(Response, _) => Vector("writeOnly" -> JBool(true))
    case PresenceForbidden(Both, _)     => Vector.empty
    case All(rules) =>
      mergeObjs(rules.map(encodeObj)) match {
        case JObj(fields) => fields
        case other        => Vector("allOf" -> other)
      }
  }
}
