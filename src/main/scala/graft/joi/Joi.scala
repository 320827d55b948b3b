package graft.joi

import graft.core.{JStr, JValue, Rule}
import graft.core.Rule._

/** Fluent rule builder — API-surface parity with the reference's Joi DSL
  * (reference lib/JSON/Validator/Joi.pm:29-40 `compile`, 103-165
  * `_compile_*`): a programmatic front-end that lowers to the same [[Rule]]
  * ADT the JSON rule-pack parser produces, proving both front-ends share
  * one compiler (reference entry point D, SURVEY.md §3).
  *
  * {{{
  * import graft.joi.joi
  * val rule = joi.obj.props(
  *   "age"  -> joi.integer.min(0).max(200).required,
  *   "name" -> joi.string.min(2).alphanum.required,
  *   "tags" -> joi.array.items(joi.string.token).unique)
  * }}}
  */
final case class JoiBuilder(
    typ: Option[String],
    rules: Vector[Rule] = Vector.empty,
    isRequired: Boolean = false,
    propList: Vector[(String, JoiBuilder)] = Vector.empty) {

  private def add(r: Rule): JoiBuilder = copy(rules = rules :+ r)

  // shared
  def required: JoiBuilder = copy(isRequired = true)
  def valid(values: JValue*): JoiBuilder = add(Enum(values))
  def const(v: JValue): JoiBuilder = add(Const(v))

  // number/integer (Joi.pm:75-96); min/max are polymorphic on the builder
  // type exactly like the reference's compile: string→length, array→items,
  // object→properties count, number→value (Joi.pm:108-109,133-134,145-146,160-161)
  def min(n: Double): JoiBuilder =
    if (typ.contains("string") || typ.contains("array")) lengthMin(n.toInt)
    else if (typ.contains("object")) add(MinProperties(n.toInt))
    else add(Minimum(n))
  def max(n: Double): JoiBuilder =
    if (typ.contains("string") || typ.contains("array")) lengthMax(n.toInt)
    else if (typ.contains("object")) add(MaxProperties(n.toInt))
    else add(Maximum(n))
  // inclusive like the reference: positive = min(0), negative = max(0)
  // (Joi.pm:75,79) — 0 is accepted by both
  def positive: JoiBuilder = add(Minimum(0))
  def negative: JoiBuilder = add(Maximum(0))
  def multiple(n: Double): JoiBuilder = add(MultipleOf(n))

  // string sugar (Joi.pm:26,43,73,94)
  def alphanum: JoiBuilder = add(Pattern("^\\w*$"))
  def token: JoiBuilder = add(Pattern("^[a-zA-Z0-9_]+$"))
  def email: JoiBuilder = add(Format("email"))
  def uri: JoiBuilder = add(Format("uri"))
  def uuid: JoiBuilder = add(Format("uuid"))
  def isoDate: JoiBuilder = add(Format("date-time"))
  def pattern(re: String): JoiBuilder = add(Pattern(re))
  def length(n: Int): JoiBuilder = lengthMin(n).lengthMax(n)
  private def lengthMin(n: Int): JoiBuilder =
    add(if (typ.contains("array")) MinItems(n) else MinLength(n))
  private def lengthMax(n: Int): JoiBuilder =
    add(if (typ.contains("array")) MaxItems(n) else MaxLength(n))
  def lowercase: JoiBuilder = add(Pattern("^[^A-Z]*$"))

  // array (Joi.pm:103-110)
  def items(item: JoiBuilder): JoiBuilder = add(Items(item.rule))
  def unique: JoiBuilder = add(UniqueItems)

  // object (Joi.pm:140-152): required props collected at the object level,
  // exactly like the reference's compile
  def props(ps: (String, JoiBuilder)*): JoiBuilder = copy(propList = propList ++ ps)
  def strict: JoiBuilder = add(ClosedWorld(propList.map(_._1), Seq.empty, None))

  /** Lower to the shared Rule ADT. */
  def rule: Rule = {
    val typeR = typ.map(t => TypeIs(Seq(t))).toVector
    val objR =
      if (propList.isEmpty) Vector.empty
      else {
        val props = Properties(propList.map { case (k, b) => k -> b.rule })
        val req = propList.collect { case (k, b) if b.isRequired => k }
        Vector(props) ++ (if (req.nonEmpty) Vector(Required(req)) else Vector.empty)
      }
    Rule.all(typeR ++ objR ++ rules)
  }
}

object joi {
  def string: JoiBuilder = JoiBuilder(Some("string"))
  def number: JoiBuilder = JoiBuilder(Some("number"))
  def integer: JoiBuilder = JoiBuilder(Some("integer"))
  def boolean: JoiBuilder = JoiBuilder(Some("boolean"))
  def array: JoiBuilder = JoiBuilder(Some("array"))
  def obj: JoiBuilder = JoiBuilder(Some("object"))
  def nullValue: JoiBuilder = JoiBuilder(Some("null"))
  def str(s: String): JValue = JStr(s)
}
