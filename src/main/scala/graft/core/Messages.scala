package graft.core

/** Violation message templates, behaviorally equivalent to the reference's
  * message table (reference lib/JSON/Validator/Error.pm:6-53).
  *
  * A message id is `<category>.<keyword>`; `%3`/`%4` are the two
  * interpolation slots the reference uses (details[2], details[3]).
  * Templates are applied either at rule-compile time (constant slots) or as
  * Catalyst `concat` when a slot is the observed value.
  */
object Messages {
  val templates: Map[String, String] = Map(
    "allOf.type" -> "/allOf Expected %3 - got %4.",
    "anyOf.type" -> "/anyOf Expected %3 - got %4.",
    "array.additionalItems" -> "Invalid number of items: %3/%4.",
    "array.maxContains" -> "Contains too many items: %3/%4.",
    "array.maxItems" -> "Too many items: %3/%4.",
    "array.minContains" -> "Contains not enough items: %3/%4.",
    "array.minItems" -> "Not enough items: %3/%4.",
    "array.uniqueItems" -> "Unique items required.",
    "array.contains" -> "No items contained.",
    "const.const" -> "Does not match const: %3.",
    "enum.enum" -> "Not in enum list: %3.",
    "number.ex_maximum" -> "%3 >= maximum(%4)",
    "number.ex_minimum" -> "%3 <= minimum(%4)",
    "number.maximum" -> "%3 > maximum(%4)",
    "number.minimum" -> "%3 < minimum(%4)",
    "number.multipleOf" -> "Not multiple of %3.",
    "not.not" -> "Should not match.",
    "null.type" -> "Not null.",
    "object.additionalProperties" -> "Properties not allowed: %3.",
    "object.maxProperties" -> "Too many properties: %3/%4.",
    "object.minProperties" -> "Not enough properties: %3/%4.",
    "object.required" -> "Missing property.",
    "object.dependencies" -> "Missing property. Dependee: %3.",
    "oneOf.all_rules_match" -> "All of the oneOf rules match.",
    "oneOf.n_rules_match" -> "oneOf rules %3 match.",
    "oneOf.type" -> "/oneOf Expected %3 - got %4.",
    "string.pattern" -> "String does not match %3.",
    "string.maxLength" -> "String is too long: %3/%4.",
    "string.minLength" -> "String is too short: %3/%4.",
    "type.type" -> "Expected %3 - got %4.",
    "format.format" -> "Does not match %3 format."
  )

  /** Fill constant slots. Slots interpolated from row values are handled in
    * the compiler with `concat`. */
  def render(id: String, arg3: String = "", arg4: String = ""): String =
    templates.getOrElse(id, id).replace("%3", arg3).replace("%4", arg4)
}
