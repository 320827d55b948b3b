package graft.core

/** The rule DSL: JSON-Schema keyword semantics as a Scala ADT.
  *
  * Each case mirrors one validation keyword of the reference
  * (dispatcher: reference lib/JSON/Validator/Schema.pm:366-420), but the
  * engine compiles a whole `Rule` tree into Catalyst `Column` expressions
  * (see [[RuleCompiler]]) instead of interpreting it row-at-a-time.
  *
  * A `Rule` is pure data: serializable to/from JSON rule packs
  * ([[rulepack.RulePack]]) and buildable from the fluent builder
  * ([[graft.joi.Joi]]), so all front-ends share one compiler — the same
  * design as the reference where the Joi DSL lowers to a plain schema
  * (reference lib/JSON/Validator/Joi.pm:29-40).
  */
sealed trait Rule

object Rule {
  /** Boolean schemas: `true` accepts everything, `false` rejects everything
    * (reference Schema.pm:369). */
  case object Always extends Rule
  case object Never extends Rule

  /** `type` — one or more of object/array/string/number/integer/boolean/null
    * (reference Util.pm:58-72 `data_type`). In the engine the column's static
    * DataType decides conformance at compile time; only nullability and the
    * integer-vs-number distinction remain runtime checks. */
  final case class TypeIs(types: Seq[String]) extends Rule

  /** `enum` / `const` (reference Schema.pm:580-599) — value equality against
    * constants, canonical-checksum equality in the reference, native Catalyst
    * equality here. */
  final case class Enum(values: Seq[JValue]) extends Rule
  final case class Const(value: JValue) extends Rule

  /** Numeric bounds; `exclusive` covers both the draft-4 boolean style and
    * the draft-6 numeric style after normalization at parse time
    * (reference Draft4.pm:26-42 vs Draft6.pm:47-69). */
  final case class Minimum(value: Double, exclusive: Boolean = false) extends Rule
  final case class Maximum(value: Double, exclusive: Boolean = false) extends Rule
  final case class MultipleOf(value: Double) extends Rule

  /** String rules (reference Schema.pm:805-836). `Pattern` is a partial
    * (unanchored) match like Perl's `=~`. */
  final case class MinLength(n: Int) extends Rule
  final case class MaxLength(n: Int) extends Rule
  final case class Pattern(regex: String) extends Rule
  final case class Format(name: String) extends Rule

  /** Array rules (reference Schema.pm:612-670). `Items` applies one schema to
    * every element; `TupleItems` is the positional form with
    * `additionalItems` (false caps the length). */
  final case class MinItems(n: Int) extends Rule
  final case class MaxItems(n: Int) extends Rule
  case object UniqueItems extends Rule
  final case class Items(rule: Rule) extends Rule
  final case class TupleItems(rules: Seq[Rule], additional: Option[Rule]) extends Rule
  final case class Contains(rule: Rule, min: Option[Int] = None, max: Option[Int] = None) extends Rule

  /** Object rules (reference Schema.pm:726-803). In the flat-table engine,
    * properties address columns; `Required` is a static presence check
    * (missing column), while SQL NULL is JSON null and is caught by
    * `TypeIs`. */
  final case class Properties(props: Seq[(String, Rule)]) extends Rule
  final case class PatternProperties(props: Seq[(String, Rule)]) extends Rule
  final case class Required(fields: Seq[String]) extends Rule
  /** `additionalProperties`, pre-resolved by the parser with the sibling
    * `properties` names and `patternProperties` regexes baked in (the
    * reference computes the uncovered-key set at runtime,
    * Schema.pm:762-770; our schema is static so it resolves at compile).
    * `rule=None` means `additionalProperties:false` (closed world). */
  final case class ClosedWorld(allowed: Seq[String], patterns: Seq[String], rule: Option[Rule]) extends Rule
  final case class MinProperties(n: Int) extends Rule
  final case class MaxProperties(n: Int) extends Rule
  /** `propertyNames` (draft6+, reference Draft6.pm:111-122): every key name
    * must satisfy the rule. Static for struct columns (checked at compile);
    * runtime `forall(map_keys(m), …)` for MapType columns. */
  final case class PropertyNames(rule: Rule) extends Rule
  final case class DependentRequired(deps: Seq[(String, Seq[String])]) extends Rule
  final case class DependentSchemas(deps: Seq[(String, Rule)]) extends Rule

  /** Combinators (reference Schema.pm:380-399). */
  final case class Not(rule: Rule) extends Rule
  final case class AllOf(rules: Seq[Rule]) extends Rule
  final case class AnyOf(rules: Seq[Rule]) extends Rule
  final case class OneOf(rules: Seq[Rule]) extends Rule
  final case class IfThenElse(cond: Rule, thenR: Option[Rule], elseR: Option[Rule]) extends Rule

  /** OpenAPI `nullable` (reference OpenAPIv3.pm:307-401): null bypasses the
    * wrapped rule. */
  final case class Nullable(rule: Rule) extends Rule

  /** OpenAPI readOnly/writeOnly modality (reference OpenAPIv2.pm:401-408,
    * OpenAPIv3.pm:356-396): a read-only rule is skipped when validating
    * requests, write-only when validating responses. The direction comes
    * from [[RuleCompiler.Ctx]]. */
  sealed trait Direction
  case object Request extends Direction
  case object Response extends Direction
  case object Both extends Direction
  final case class Modal(rule: Rule, appliesTo: Direction) extends Rule

  /** Value present while validating in `direction` → violation. The
    * reference pushes "Read-only." when a readOnly property appears in a
    * request and "Write-only." when a writeOnly property appears in a
    * response (OpenAPIv3.pm:363, 384); [[readOnly]]/[[writeOnly]] compose
    * this with [[Modal]] to give the full reference semantics. Inert when
    * validating with direction Both (plain schema validation has no
    * request/response split). */
  final case class PresenceForbidden(direction: Direction, message: String) extends Rule

  /** readOnly property: presence in a request is itself a violation, AND the
    * property schema still validates in both directions — the reference's
    * `_validate_type_object_request` pushes "Read-only." and then runs the
    * normal properties pass over the same data (OpenAPIv3.pm:356-374), so a
    * present-and-invalid readOnly property yields TWO errors in a request.
    * Only `required` is direction-stripped (handled by the parser as
    * `Modal(Required, Response)`). */
  def readOnly(rule: Rule): Rule =
    all(Seq(rule, PresenceForbidden(Request, "Read-only.")))

  /** writeOnly property: presence in a response is itself a violation; the
    * property schema validates in both directions (OpenAPIv3.pm:376-396 —
    * same shape as [[readOnly]]). */
  def writeOnly(rule: Rule): Rule =
    all(Seq(rule, PresenceForbidden(Response, "Write-only.")))

  /** OpenAPI-style discriminator (reference OpenAPIv2.pm:410-416,
    * OpenAPIv3.pm:340-349): the value of `field` selects which rule pack
    * applies to the row — per-`source` rule dispatch at scale. Unmatched
    * values fall through to `default` (Always if None). */
  final case class Discriminator(field: String, mapping: Seq[(String, Rule)],
      default: Option[Rule] = None) extends Rule

  /** Custom predicate — the engine's analog of the reference's extension
    * points (format code-refs Schema.pm:21, `_validate_type_*` subclassing
    * Schema.pm:876-879): a named Column predicate over the target value.
    * Used for cross-column invariants like `n_tok === size(tokens)` that
    * JSON-Schema keywords can't express. Not JSON-serializable (Scala API
    * only). */
  final case class Predicate(ruleId: String, message: String,
      pred: org.apache.spark.sql.Column => org.apache.spark.sql.Column) extends Rule

  /** All sub-rules of a conjunction-style schema object: `{type: ...,
    * minimum: ..., pattern: ...}` parses to `All(Seq(TypeIs(...), ...))`.
    * Unlike `AllOf` there is no branch-index path prefixing — these are
    * keywords of one schema object. */
  final case class All(rules: Seq[Rule]) extends Rule

  def all(rules: Seq[Rule]): Rule = rules match {
    case Seq()  => Always
    case Seq(r) => r
    case rs     => All(rs)
  }

  /** Statically-known set of row fields a rule reads, or None when the rule
    * may touch the whole row (`Predicate`, `ClosedWorld` with a sub-rule,
    * property-count rules). Drives column pruning in
    * [[graft.core.Violations.validate]]: a doc_id-only uniqueness pass must
    * never read `tokens` (SURVEY.md §4 pruning note), and a 5-column rule
    * pack over an 11-column table must scan 5 columns.
    */
  def referencedFields(rule: Rule): Option[Set[String]] = rule match {
    case Always | Never            => Some(Set.empty)
    // a property sub-rule targets the field value (even a Predicate), so it
    // can only read that field
    case Properties(props)         => Some(props.map(_._1).toSet)
    case Required(fields)          => Some(fields.toSet)
    case DependentRequired(deps)   => Some(deps.flatMap { case (k, vs) => k +: vs }.toSet)
    case All(rs)                   => combine(rs)
    case AllOf(rs)                 => combine(rs)
    case AnyOf(rs)                 => combine(rs)
    case OneOf(rs)                 => combine(rs)
    case Not(r)                    => referencedFields(r)
    case Discriminator(f, mapping, default) =>
      combine(mapping.map(_._2) ++ default.toSeq).map(_ + f)
    case Nullable(r)               => referencedFields(r)
    case IfThenElse(c, t, e)       => combine(Seq(c) ++ t ++ e)
    // leaf value rules on the row target itself, or rules that need the
    // whole row (Predicate, ClosedWorld, Min/MaxProperties, PatternProperties
    // — pattern match depends on the schema, resolved at compile)
    case _                         => None
  }

  private def combine(rs: Seq[Rule]): Option[Set[String]] =
    rs.map(referencedFields).foldLeft(Option(Set.empty[String])) {
      case (Some(a), Some(b)) => Some(a ++ b)
      case _ => None
    }
}
