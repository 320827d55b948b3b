package graft.core

import graft.functions.Formats
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Compiles a [[Rule]] tree into a single Catalyst `Column` holding the
  * error list for the target value: `array<struct<path, rule_id, category,
  * message, observed>>` — the columnar analog of the reference's
  * `@errors` list of `JSON::Validator::Error` objects
  * (reference lib/JSON/Validator/Schema.pm:366-420 `_validate`).
  *
  * Everything is pure Catalyst expressions (no UDFs): rules on array
  * elements use higher-order functions (`transform`/`filter`), so the whole
  * validation of a row stays inside one whole-stage-codegen span. Compilation
  * is a pure function of (rule, input DataType); type dispatch happens at
  * compile time — the reference's runtime `data_type` sniffing
  * (Util.pm:58-72) is free here because the DataFrame schema is static.
  *
  * Error semantics ported:
  *  - type errors suppress sibling keyword errors (Schema.pm:410 early
  *    return),
  *  - allOf/anyOf/oneOf branch messages get `/allOf/<i> ` prefixes and
  *    same-path type errors collapse into one `Expected a/b - got c.` error
  *    (Schema.pm:422-536, Util.pm:116-130 `prefix_errors`),
  *  - oneOf emits `all_rules_match` / `n_rules_match` with pass indices.
  */
object RuleCompiler {

  /** One error, mirroring Error.pm's `(path, details[0..2], message)`. */
  final case class Err(path: String, rule_id: String, category: String, message: String, observed: String)

  val errStructType: StructType = StructType(Seq(
    StructField("path", StringType), StructField("rule_id", StringType),
    StructField("category", StringType), StructField("message", StringType),
    StructField("observed", StringType)))
  val errArrayType: ArrayType = ArrayType(errStructType)

  def noErrors: Column = typedlit(Seq.empty[Err])

  private def mkErr(path: Column, ruleId: String, category: Column, message: Column, observed: Column): Column =
    struct(
      path.as("path"), lit(ruleId).as("rule_id"), category.as("category"),
      message.as("message"), coalesce(observed, lit("null")).as("observed"))

  private def one(e: Column): Column = array(e)

  /** `when(ok) pass else [err]` with null-skip: JSON-Schema value keywords
    * don't apply to null/missing values (the `type` keyword reports those). */
  private def check(ok: Column, e: Column, target: Column): Column =
    when(target.isNull || ok, noErrors).otherwise(one(e))

  final case class Ctx(
      formats: Formats.Registry = Formats.Registry(),
      coerce: Set[String] = Set.empty,
      direction: Rule.Direction = Rule.Both)

  /** JSON type name of a Spark DataType (compile-time `data_type`). */
  def jsonTypeOf(dt: DataType): String = dt match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType => "integer"
    case _: FloatType | _: DoubleType | _: DecimalType             => "number"
    case _: StringType | _: DateType | _: TimestampType | _: VarcharType | _: CharType => "string"
    case _: BooleanType                                            => "boolean"
    case _: ArrayType                                              => "array"
    case _: StructType | _: MapType                                => "object"
    case _: NullType                                               => "null"
    case other                                                     => other.typeName
  }

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _              => false
  }
  private def isFractional(dt: DataType): Boolean = dt match {
    case _: FloatType | _: DoubleType | _: DecimalType => true
    case _                                             => false
  }
  private def isStringy(dt: DataType): Boolean = dt match {
    case _: StringType | _: VarcharType | _: CharType => true
    case _                                            => false
  }

  private def observedOf(target: Column, dt: DataType): Column = dt match {
    case _: StringType => target
    case _             => target.cast(StringType)
  }

  /** Literal of a rule-pack JSON constant, coerced to the column type when
    * the families are compatible; None when the constant can never equal a
    * value of `dt` (e.g. string constant vs int column). */
  def litOf(v: JValue, dt: DataType): Option[Column] = (v, dt) match {
    case (JNull, _)                       => Some(lit(null).cast(dt))
    case (JBool(b), BooleanType)          => Some(lit(b))
    case (JInt(i), d) if isNumeric(d)     => Some(lit(i).cast(d))
    case (JNum(n), d) if isFractional(d)  => Some(lit(n).cast(d))
    case (JNum(n), d) if isNumeric(d) && n == n.floor => Some(lit(n.toLong).cast(d))
    case (JStr(s), d) if isStringy(d)     => Some(lit(s))
    case (JArr(items), ArrayType(et, _))  =>
      val lits = items.map(litOf(_, et))
      if (lits.forall(_.isDefined))
        Some(if (lits.isEmpty) array().cast(ArrayType(et)) else array(lits.map(_.get): _*))
      else None
    case _                                => None
  }

  /** Entry point: error-array column for `rule` applied to `target`. */
  def compile(rule: Rule, dt: DataType, target: Column, path: Column, ctx: Ctx = Ctx()): Column = {
    import Rule._
    rule match {
      case Always => noErrors
      case Never  =>
        // boolean schema `false` → the reference reports it as not/not
        // (Schema.pm:369 converts to {not=>{}}).
        one(mkErr(path, "not", lit("not"), lit(Messages.render("not.not")), observedOf(target, dt)))

      case All(rules) => compileAll(rules, dt, target, path, ctx)

      case TypeIs(types) => compileType(types, dt, target, path)

      case Enum(values) =>
        val lits = values.flatMap(litOf(_, dt))
        val okC  = lits.map(target === _).reduceOption(_ || _).getOrElse(lit(false))
        val listed = values.map(_.plain).mkString(", ")
        check(okC, mkErr(path, "enum", lit("enum"),
          lit(Messages.render("enum.enum", listed)), observedOf(target, dt)), target)

      case Const(value) =>
        val okC = litOf(value, dt).map(l => target <=> l).getOrElse(lit(value == JNull) && target.isNull)
        val e = mkErr(path, "const", lit("const"),
          lit(Messages.render("const.const", value.render)), observedOf(target, dt))
        if (value == JNull) when(okC, noErrors).otherwise(one(e)) else check(okC, e, target)

      case Minimum(v, excl) if isNumeric(dt) =>
        val cat = jsonTypeOf(dt)
        val (kw, ok) = if (excl) ("ex_minimum", target > lit(v).cast(dt)) else ("minimum", target >= lit(v).cast(dt))
        val tmpl = if (excl) " <= minimum(" else " < minimum("
        check(ok, mkErr(path, kw, lit(cat),
          concat(observedOf(target, dt), lit(tmpl + num(v) + ")")), observedOf(target, dt)), target)
      case Maximum(v, excl) if isNumeric(dt) =>
        val cat = jsonTypeOf(dt)
        val (kw, ok) = if (excl) ("ex_maximum", target < lit(v).cast(dt)) else ("maximum", target <= lit(v).cast(dt))
        val tmpl = if (excl) " >= maximum(" else " > maximum("
        check(ok, mkErr(path, kw, lit(cat),
          concat(observedOf(target, dt), lit(tmpl + num(v) + ")")), observedOf(target, dt)), target)

      case MultipleOf(v) if isNumeric(dt) =>
        val ok =
          if (!isFractional(dt) && v == v.floor) pmod(target, lit(v.toLong).cast(dt)) === lit(0)
          else {
            val div = target.cast(DoubleType) / lit(v)
            // reference uses decimal-string inspection of the quotient
            // (Schema.pm:720-721); epsilon-compare is the columnar analog.
            abs(div - round(div, 0)) < lit(1e-9) * greatest(abs(div), lit(1.0))
          }
        check(ok, mkErr(path, "multipleOf", lit(jsonTypeOf(dt)),
          lit(Messages.render("number.multipleOf", num(v))), observedOf(target, dt)), target)

      case MinLength(n) if isStringy(dt) =>
        check(length(target) >= n, mkErr(path, "minLength", lit("string"),
          concat(lit("String is too short: "), length(target).cast(StringType), lit(s"/$n.")),
          target), target)
      case MaxLength(n) if isStringy(dt) =>
        check(length(target) <= n, mkErr(path, "maxLength", lit("string"),
          concat(lit("String is too long: "), length(target).cast(StringType), lit(s"/$n.")),
          target), target)

      case Pattern(regex) if isStringy(dt) =>
        check(target.rlike(regex), mkErr(path, "pattern", lit("string"),
          lit(Messages.render("string.pattern", regex)), target), target)

      case Format(name) if isStringy(dt) =>
        val okC = ctx.formats.check(name, target)
        check(okC, mkErr(path, "format", lit("format"),
          lit(s"Does not match $name format."), target), target)

      case MinItems(n) => arrayRule(dt, target) { (et, arr) =>
        check(size(arr) >= n, mkErr(path, "minItems", lit("array"),
          concat(lit("Not enough items: "), size(arr).cast(StringType), lit(s"/$n.")),
          observedOf(arr, dt)), arr)
      }
      case MaxItems(n) => arrayRule(dt, target) { (et, arr) =>
        check(size(arr) <= n, mkErr(path, "maxItems", lit("array"),
          concat(lit("Too many items: "), size(arr).cast(StringType), lit(s"/$n.")),
          observedOf(arr, dt)), arr)
      }
      case UniqueItems => arrayRule(dt, target) { (et, arr) =>
        check(size(array_distinct(arr)) === size(arr),
          mkErr(path, "uniqueItems", lit("array"),
            lit(Messages.render("array.uniqueItems")), observedOf(arr, dt)), arr)
      }

      case Items(sub) => arrayRule(dt, target) { (et, arr) =>
        sub match {
          // distribute items over a keyword conjunction: items({min,max}) ≡
          // concat(items(min), items(max)). Each leaf then uses the
          // null-struct path below — per-element `concat` of error arrays
          // allocates even for passing elements and is GC-bound at scale
          // (measured: 2.6× not 4× scaling on a 4× core step).
          // Distribution is ONLY semantics-preserving when the conjunction
          // has no dispatcher gating: a TypeIs must suppress sibling errors
          // per element (Schema.pm:410 — items:{type:integer,maximum:5} on
          // element 6.5 reports only the type error) and const/enum fire
          // only after the other keywords pass (Schema.pm:401-419); those
          // mixes fall through to the per-element conjunction below.
          case All(parts) if !parts.exists(_.isInstanceOf[TypeIs]) &&
              !(parts.exists(p => p.isInstanceOf[Const] || p.isInstanceOf[Enum]) &&
                parts.exists(p => !p.isInstanceOf[Const] && !p.isInstanceOf[Enum])) =>
            parts.map(p => compile(Items(p), dt, target, path, ctx))
              .reduceOption(concat(_, _)).getOrElse(noErrors)
          case leaf if emitsSingleError(leaf) =>
            // passing element → NULL (no allocation); failing → its struct
            val perElem = transform(arr, (x, i) =>
              try_element_at(compile(leaf, et, x, concat(path, lit("/"), i.cast(StringType)), ctx), lit(1)))
            val exact = filter(perElem, e => e.isNotNull)
            // aggregate pre-check for numeric bounds: errors can exist only
            // if the array's min/max crosses the bound, so the per-element
            // transform+filter machinery (higher-order functions — no
            // codegen) runs ONLY on rows that provably contain a violation.
            // On a 99.x%-passing corpus this removes the dominant
            // per-element cost of the validate leg. Sound because `check`
            // null-skips (null elements pass bound keywords, and
            // array_min/array_max skip nulls the same way); a NULL guard
            // (empty / all-null array) falls through to the exact path,
            // which emits nothing for those.
            val body = itemsBoundGuard(leaf, et, arr) match {
              case Some(allPass) => when(allPass, noErrors).otherwise(exact)
              case None          => exact
            }
            when(arr.isNull, noErrors).otherwise(body)
          case _ =>
            when(arr.isNull, noErrors).otherwise(
              flatten(transform(arr, (x, i) =>
                compile(sub, et, x, concat(path, lit("/"), i.cast(StringType)), ctx))))
        }
      }

      case TupleItems(rules, additional) => arrayRule(dt, target) { (et, arr) =>
        val positional = rules.zipWithIndex.map { case (r, i) =>
          when(arr.isNull || size(arr) <= i, noErrors).otherwise(
            compile(r, et, element_at(arr, i + 1), concat(path, lit(s"/$i")), ctx))
        }
        val n = rules.length
        val extra = additional match {
          case None =>
            // additionalItems:false caps length (Schema.pm:645-661)
            when(arr.isNull || size(arr) <= n, noErrors).otherwise(
              one(mkErr(path, "additionalItems", lit("array"),
                concat(lit("Invalid number of items: "), size(arr).cast(StringType), lit(s"/$n.")),
                observedOf(arr, dt))))
          case Some(r) =>
            when(arr.isNull, noErrors).otherwise(
              flatten(transform(arr, (x, i) =>
                when(i < n, noErrors).otherwise(
                  compile(r, et, x, concat(path, lit("/"), i.cast(StringType)), ctx)))))
        }
        concat((positional :+ extra): _*)
      }

      case Contains(sub, minC, maxC) => arrayRule(dt, target) { (et, arr) =>
        val matches = size(filter(arr, x => size(compile(sub, et, x, path, ctx)) === 0))
        val lo = minC.getOrElse(1)
        val containsErr =
          when(arr.isNull || matches >= lo, noErrors).otherwise(
            if (minC.isDefined)
              one(mkErr(path, "minContains", lit("array"),
                concat(lit("Contains not enough items: "), matches.cast(StringType), lit(s"/$lo.")),
                observedOf(arr, dt)))
            else
              one(mkErr(path, "contains", lit("array"),
                lit(Messages.render("array.contains")), observedOf(arr, dt))))
        val maxErr = maxC match {
          case Some(hi) =>
            when(arr.isNull || matches <= hi, noErrors).otherwise(
              one(mkErr(path, "maxContains", lit("array"),
                concat(lit("Contains too many items: "), matches.cast(StringType), lit(s"/$hi.")),
                observedOf(arr, dt))))
          case None => noErrors
        }
        concat(containsErr, maxErr)
      }

      case Properties(props) => dt match {
        // relational mapping: NULL field = absent key, so a property sub-rule
        // is skipped on null (the reference skips rules for missing keys,
        // Draft4.pm:191-195) and `required` owns the null check.
        case st: StructType =>
          val subErrs = props.flatMap { case (name, sub) =>
            st.fields.find(_.name == name).map { f =>
              val fieldCol = target.getField(name)
              when(fieldCol.isNull, noErrors).otherwise(
                compile(sub, f.dataType, fieldCol, concat(path, lit(s"/$name")), ctx))
            } // missing column: `required` reports it; properties on absent key pass
          }
          if (subErrs.isEmpty) noErrors
          else when(target.isNull, noErrors).otherwise(concat(subErrs: _*))
        // dynamic objects (from_json to map<string,…>): keys are runtime
        // values — the reference's native hash regime (Draft4.pm:191-195)
        case MapType(_: StringType, vt, _) =>
          val subErrs = props.map { case (name, sub) =>
            val v = try_element_at(target, lit(name))
            when(v.isNull, noErrors).otherwise(
              compile(sub, vt, v, concat(path, lit(s"/$name")), ctx))
          }
          if (subErrs.isEmpty) noErrors
          else when(target.isNull, noErrors).otherwise(concat(subErrs: _*))
        case _ => noErrors
      }

      case PatternProperties(props) => dt match {
        case st: StructType =>
          val subErrs = for {
            (regex, sub) <- props
            f <- st.fields if java.util.regex.Pattern.compile(regex).matcher(f.name).find()
          } yield {
            val fieldCol = target.getField(f.name)
            when(fieldCol.isNull, noErrors).otherwise(
              compile(sub, f.dataType, fieldCol, concat(path, lit(s"/${f.name}")), ctx))
          }
          if (subErrs.isEmpty) noErrors
          else when(target.isNull, noErrors).otherwise(concat(subErrs: _*))
        case MapType(_: StringType, vt, _) =>
          // runtime key match: every key matching the regex applies the rule
          // to its value (rlike = partial match, like the reference)
          val subErrs = props.map { case (regex, sub) =>
            flatten(transform(
              filter(map_keys(target), k => k.rlike(regex)),
              k => compile(sub, vt, try_element_at(target, k), concat(path, lit("/"), k), ctx)))
          }
          if (subErrs.isEmpty) noErrors
          else when(target.isNull, noErrors).otherwise(concat(subErrs: _*))
        case _ => noErrors
      }

      case Required(fields) => dt match {
        case st: StructType =>
          val errs = fields.map { name =>
            st.fields.find(_.name == name) match {
              case Some(_) =>
                // relational mapping: NULL = absent (documented divergence from
                // pure key-presence semantics; see SURVEY.md §2.2 `required`)
                when(target.isNull || target.getField(name).isNotNull, noErrors)
                  .otherwise(one(mkErr(concat(path, lit(s"/$name")), "required", lit("object"),
                    lit(Messages.render("object.required")), lit("null"))))
              case None =>
                when(target.isNull, noErrors).otherwise(
                  one(mkErr(concat(path, lit(s"/$name")), "required", lit("object"),
                    lit(Messages.render("object.required")), lit("null"))))
            }
          }
          concat(errs: _*)
        case MapType(_: StringType, _, _) =>
          val errs = fields.map { name =>
            when(target.isNull || try_element_at(target, lit(name)).isNotNull, noErrors)
              .otherwise(one(mkErr(concat(path, lit(s"/$name")), "required", lit("object"),
                lit(Messages.render("object.required")), lit("null"))))
          }
          concat(errs: _*)
        case _ => noErrors
      }

      case ClosedWorld(allowed, patterns, sub) => dt match {
        case st: StructType =>
          val compiled = patterns.map(java.util.regex.Pattern.compile)
          val extras = st.fields.filterNot(f =>
            allowed.contains(f.name) || compiled.exists(_.matcher(f.name).find()))
          sub match {
            case None if extras.nonEmpty =>
              // static closed-world failure: every (non-null) row errs
              // (Schema.pm:762-770 lists the extras sorted)
              val names = extras.map(_.name).sorted.mkString(", ")
              when(target.isNull, noErrors).otherwise(
                one(mkErr(path, "additionalProperties", lit("object"),
                  lit(Messages.render("object.additionalProperties", names)), observedOf(target, dt))))
            case None => noErrors
            case Some(r) =>
              val errs = extras.map(f =>
                compile(r, f.dataType, target.getField(f.name), concat(path, lit(s"/${f.name}")), ctx))
              if (errs.isEmpty) noErrors
              else when(target.isNull, noErrors).otherwise(concat(errs.toSeq: _*))
          }
        case MapType(_: StringType, vt, _) =>
          // dynamic keys: the extras set is computed per row
          val isExtra = (k: Column) =>
            !allowed.map(lit(_): Column).foldLeft(lit(false))((acc, a) => acc || k === a) &&
              !patterns.foldLeft(lit(false))((acc, re) => acc || k.rlike(re))
          val extras = filter(map_keys(target), isExtra)
          sub match {
            case None =>
              when(target.isNull || size(extras) === 0, noErrors).otherwise(
                one(mkErr(path, "additionalProperties", lit("object"),
                  concat(lit("Properties not allowed: "),
                    array_join(array_sort(extras), ", "), lit(".")),
                  observedOf(target, dt))))
            case Some(r) =>
              when(target.isNull, noErrors).otherwise(
                flatten(transform(extras,
                  k => compile(r, vt, try_element_at(target, k), concat(path, lit("/"), k), ctx))))
          }
        case _ => noErrors
      }

      case MinProperties(n) => objectCount(dt, target) { cnt =>
        check(cnt >= n, mkErr(path, "minProperties", lit("object"),
          concat(lit("Not enough properties: "), cnt.cast(StringType), lit(s"/$n.")),
          observedOf(target, dt)), target)
      }
      case MaxProperties(n) => objectCount(dt, target) { cnt =>
        check(cnt <= n, mkErr(path, "maxProperties", lit("object"),
          concat(lit("Too many properties: "), cnt.cast(StringType), lit(s"/$n.")),
          observedOf(target, dt)), target)
      }

      case PropertyNames(sub) => dt match {
        // struct keys are static: evaluate the sub-rule once per field name
        // at compile time (constant per row)
        case st: StructType =>
          val bad = st.fieldNames.filterNot { name =>
            evalStaticString(sub, name, ctx)
          }
          if (bad.isEmpty) noErrors
          else when(target.isNull, noErrors).otherwise(
            concat(bad.toSeq.map(name => one(mkErr(concat(path, lit(s"/$name")), "propertyNames",
              lit("object"), lit("Does not match propertyNames."), lit(name)))): _*))
        case MapType(_: StringType, _, _) =>
          when(target.isNull, noErrors).otherwise(
            filter(transform(map_keys(target), k =>
              try_element_at(compile(sub, StringType, k, path, ctx), lit(1))),
              e => e.isNotNull))
        case _ => noErrors
      }

      case DependentRequired(deps) => dt match {
        case st: StructType =>
          val errs = for {
            (dependee, dependents) <- deps if st.fieldNames.contains(dependee)
            dep <- dependents
          } yield {
            val present = st.fieldNames.contains(dep)
            val depCol = if (present) target.getField(dep).isNotNull else lit(false)
            when(target.isNull || target.getField(dependee).isNull || depCol, noErrors)
              .otherwise(one(mkErr(concat(path, lit(s"/$dep")), "dependencies", lit("object"),
                lit(Messages.render("object.dependencies", dependee)), lit("null"))))
          }
          if (errs.isEmpty) noErrors else concat(errs: _*)
        case MapType(_: StringType, _, _) =>
          val errs = for ((dependee, dependents) <- deps; dep <- dependents) yield
            when(target.isNull || try_element_at(target, lit(dependee)).isNull ||
                try_element_at(target, lit(dep)).isNotNull, noErrors)
              .otherwise(one(mkErr(concat(path, lit(s"/$dep")), "dependencies", lit("object"),
                lit(Messages.render("object.dependencies", dependee)), lit("null"))))
          if (errs.isEmpty) noErrors else concat(errs: _*)
        case _ => noErrors
      }

      case DependentSchemas(deps) => structRule(dt, target) { st =>
        val errs = for ((dependee, sub) <- deps if st.fieldNames.contains(dependee)) yield
          when(target.isNull || target.getField(dependee).isNull, noErrors)
            .otherwise(compile(sub, dt, target, path, ctx))
        if (errs.isEmpty) noErrors else concat(errs: _*)
      }

      case Not(sub) =>
        val subErrs = compile(sub, dt, target, path, ctx)
        when(size(subErrs) > 0, noErrors).otherwise(
          one(mkErr(path, "not", lit("not"), lit(Messages.render("not.not")), observedOf(target, dt))))

      case AllOf(rules) => combinator("allOf", rules, dt, target, path, ctx, requireAll = true)
      case AnyOf(rules) => combinator("anyOf", rules, dt, target, path, ctx, requireAll = false)
      case OneOf(rules) => compileOneOf(rules, dt, target, path, ctx)

      case IfThenElse(condR, thenR, elseR) =>
        val condErrs = compile(condR, dt, target, path, ctx)
        val thenErrs = thenR.map(compile(_, dt, target, path, ctx)).getOrElse(noErrors)
        val elseErrs = elseR.map(compile(_, dt, target, path, ctx)).getOrElse(noErrors)
        when(size(condErrs) === 0, thenErrs).otherwise(elseErrs)

      case Nullable(sub) =>
        when(target.isNull, noErrors).otherwise(compile(sub, dt, target, path, ctx))

      case Discriminator(field, mapping, default) => structRule(dt, target) { st =>
        if (!st.fieldNames.contains(field)) noErrors
        else {
          val disc = target.getField(field)
          val fallback = default.map(compile(_, dt, target, path, ctx)).getOrElse(noErrors)
          mapping.foldRight(fallback) { case ((value, sub), acc) =>
            when(disc === lit(value), compile(sub, dt, target, path, ctx)).otherwise(acc)
          }
        }
      }

      case Modal(sub, appliesTo) =>
        // readOnly fields don't constrain requests; writeOnly don't
        // constrain responses (OpenAPIv3.pm:356-396)
        if (appliesTo == Rule.Both || ctx.direction == Rule.Both || appliesTo == ctx.direction)
          compile(sub, dt, target, path, ctx)
        else noErrors

      case PresenceForbidden(dir, msg) =>
        // "Read-only."/"Write-only." on presence in the disallowed direction
        // (OpenAPIv3.pm:363, 384); Both = plain schema validation → inert
        if (ctx.direction == dir)
          when(target.isNull, noErrors).otherwise(
            one(mkErr(path, "modality", lit("modality"), lit(msg), observedOf(target, dt))))
        else noErrors

      case Predicate(ruleId, message, pred) =>
        check(pred(target), mkErr(path, ruleId, lit("custom"), lit(message),
          observedOf(target, dt)), target)

      // keyword not applicable to this column type → passes (JSON-Schema
      // semantics: keywords constrain only their own type)
      case _ => noErrors
    }
  }

  /** Leaf rules that produce at most one error for a scalar target —
    * eligible for the allocation-free per-element path in `Items`. */
  private def emitsSingleError(r: Rule): Boolean = r match {
    case _: Rule.TypeIs | _: Rule.Enum | _: Rule.Const | _: Rule.Minimum |
         _: Rule.Maximum | _: Rule.MultipleOf | _: Rule.MinLength |
         _: Rule.MaxLength | _: Rule.Pattern | _: Rule.Format | Rule.Never => true
    case _ => false
  }

  private def num(v: Double): String =
    if (v == v.floor && math.abs(v) < 1e15) v.toLong.toString else v.toString

  /** "All elements pass" pre-check for a per-element bound keyword, when
    * one exists that is strictly sound: guard TRUE ⟹ the distributed
    * `Items(leaf)` emits no errors. Only numeric min/max qualify (their
    * pass condition is monotone in the element value, so the array
    * extremum decides the whole row); anything else returns None and takes
    * the exact per-element path. NaN behaves consistently: Spark's
    * comparison and array extremum use the same total order. */
  private def itemsBoundGuard(leaf: Rule, et: DataType, arr: Column): Option[Column] = leaf match {
    case Rule.Minimum(v, excl) if isNumeric(et) =>
      Some(if (excl) array_min(arr) > lit(v).cast(et) else array_min(arr) >= lit(v).cast(et))
    case Rule.Maximum(v, excl) if isNumeric(et) =>
      Some(if (excl) array_max(arr) < lit(v).cast(et) else array_max(arr) <= lit(v).cast(et))
    case _ => None
  }

  private def arrayRule(dt: DataType, target: Column)(f: (DataType, Column) => Column): Column = dt match {
    case ArrayType(et, _) => f(et, target)
    case _                => noErrors
  }

  private def structRule(dt: DataType, target: Column)(f: StructType => Column): Column = dt match {
    case st: StructType => f(st)
    case _              => noErrors
  }

  /** Key count of an object column: non-null fields for a (static) struct,
    * `size(map_keys(m))` for a dynamic map. */
  private def objectCount(dt: DataType, target: Column)(f: Column => Column): Column = dt match {
    case st: StructType => f(presentCount(st, target))
    case _: MapType     => f(size(map_keys(target)))
    case _              => noErrors
  }

  /** Driver-side evaluation of a string rule against a constant (struct
    * field names are static, so `propertyNames` resolves at compile time —
    * the mirror of the reference's runtime key loop, Draft6.pm:111-122). */
  private def evalStaticString(rule: Rule, s: String, ctx: Ctx): Boolean = {
    import Rule._
    rule match {
      case Always => true
      case Never => false
      case All(rs) => rs.forall(evalStaticString(_, s, ctx))
      case AllOf(rs) => rs.forall(evalStaticString(_, s, ctx))
      case AnyOf(rs) => rs.exists(evalStaticString(_, s, ctx))
      case OneOf(rs) => rs.count(evalStaticString(_, s, ctx)) == 1
      case Not(r) => !evalStaticString(r, s, ctx)
      case TypeIs(ts) => ts.contains("string")
      case Pattern(p) => java.util.regex.Pattern.compile(p).matcher(s).find()
      case MinLength(n) => s.codePointCount(0, s.length) >= n
      case MaxLength(n) => s.codePointCount(0, s.length) <= n
      case Enum(vs) => vs.contains(JStr(s))
      case Const(v) => v == JStr(s)
      case _ => true
    }
  }

  private def presentCount(st: StructType, target: Column): Column =
    st.fields.map(f => target.getField(f.name).isNotNull.cast(IntegerType): Column)
      .reduceOption(_ + _).getOrElse(lit(0))

  /** `type` keyword. Static DataType decides conformance; only null-ness and
    * integer-on-fractional remain runtime (reference Util.pm:58-72 +
    * Schema.pm:684-692 integer check). Union types use the reference's
    * combined message `Expected a/b - got c.` (Schema.pm:450-470). */
  private def compileType(types: Seq[String], dt: DataType, target: Column, path: Column): Column = {
    val staticT = jsonTypeOf(dt)
    val allowsNull = types.contains("null")
    val want = types.mkString("/")

    // the reference's data_type reports "integer" only when a candidate
    // schema asks for it; otherwise integral values are "number"
    // (Util.pm:66-69 — pinned by t/issue-22: "Expected string - got number.")
    val gotName = if (staticT == "integer" && !types.contains("integer")) "number" else staticT
    def gotCol: Column = when(target.isNull, lit("null")).otherwise(lit(gotName))

    val matchesNonNull: Column = {
      val direct = types.contains(staticT) ||
        (staticT == "integer" && types.contains("number"))
      if (direct) lit(true)
      else if (staticT == "number" && types.contains("integer"))
        target === floor(target) // fractional column holding a whole value
      else lit(false)
    }

    val ok = when(target.isNull, lit(allowsNull)).otherwise(matchesNonNull)
    val category = if (types == Seq("null")) "null" else want
    val message =
      if (types == Seq("null")) lit(Messages.render("null.type"))
      else concat(lit(s"Expected $want - got "), gotCol, lit("."))
    when(ok, noErrors).otherwise(one(mkErr(path, "type", lit(category), message,
      when(target.isNull, lit("null")).otherwise(observedOf(target, dt)))))
  }

  /** Conjunction of keywords from one schema object: type errors suppress the
    * value-keyword errors (reference Schema.pm:410 `return @errors if
    * @errors` after type dispatch). */
  private def compileAll(rules: Seq[Rule], dt: DataType, target: Column, path: Column, ctx: Ctx): Column = {
    import Rule._
    val (typeRules, rest0)   = rules.partition(_.isInstanceOf[TypeIs])
    val (constEnum, rest)    = rest0.partition(r => r.isInstanceOf[Const] || r.isInstanceOf[Enum])
    def cat(rs: Seq[Rule]): Column =
      rs.map(compile(_, dt, target, path, ctx)).reduceOption(concat(_, _)).getOrElse(noErrors)
    // dispatcher order: combinator+type errors first; if none, value
    // keywords; const/enum only after everything else passed
    // (Schema.pm:401-419). The gates are built ONLY for non-empty groups —
    // a `when(size(e)>0, e).otherwise(…)` inlines `e` twice, which blows up
    // the expression tree (and runtime) for the common min/max-only packs.
    (typeRules.nonEmpty, rest.nonEmpty, constEnum.nonEmpty) match {
      case (false, _, false)    => cat(rest)
      case (true, false, false) => cat(typeRules)
      case (true, true, false)  =>
        val typeErrs = cat(typeRules)
        when(size(typeErrs) > 0, typeErrs).otherwise(cat(rest))
      case (false, false, true) => cat(constEnum)
      case (false, true, true)  =>
        val otherErrs = cat(rest)
        when(size(otherErrs) > 0, otherErrs).otherwise(cat(constEnum))
      case (true, _, true) =>
        val typeErrs = cat(typeRules)
        val otherErrs = cat(rest)
        when(size(typeErrs) > 0, typeErrs)
          .otherwise(when(size(otherErrs) > 0, otherErrs).otherwise(cat(constEnum)))
    }
  }

  /** Shared allOf/anyOf machinery incl. message prefixing and the same-path
    * type-error collapse (Schema.pm:422-496, Util.pm:116-130). */
  private def combinator(kind: String, rules: Seq[Rule], dt: DataType, target: Column,
      path: Column, ctx: Ctx, requireAll: Boolean): Column = {
    val branches = rules.zipWithIndex.map { case (r, i) =>
      prefixErrors(kind, i, compile(r, dt, target, path, ctx))
    }
    val allErrs = branches.reduceOption(concat(_, _)).getOrElse(noErrors)
    val anyPass = branches.map(b => size(b) === 0).reduceOption(_ || _).getOrElse(lit(true))
    val raw = if (requireAll) allErrs else when(anyPass, noErrors).otherwise(allErrs)
    collapseTypeErrors(kind, raw, path, target, dt)
  }

  private def compileOneOf(rules: Seq[Rule], dt: DataType, target: Column, path: Column, ctx: Ctx): Column = {
    val branchErrs = rules.zipWithIndex.map { case (r, i) => (i, compile(r, dt, target, path, ctx)) }
    val passBits   = branchErrs.map { case (_, b) => (size(b) === 0).cast(IntegerType) }
    val passCount  = passBits.reduceOption(_ + _).getOrElse(lit(0))
    val passedIdx  = array_join(
      filter(array(branchErrs.map { case (i, b) => when(size(b) === 0, lit(i.toString)) }: _*),
        x => x.isNotNull), ", ")
    val prefixed = branchErrs.map { case (i, b) => prefixErrors("oneOf", i, b) }
      .reduceOption(concat(_, _)).getOrElse(noErrors)
    val failAll = collapseTypeErrors("oneOf", prefixed, path, target, dt)
    when(passCount === 1, noErrors)
      .when(passCount === rules.length && passCount > 0,
        one(mkErr(path, "all_rules_match", lit("oneOf"),
          lit(Messages.render("oneOf.all_rules_match")), observedOf(target, dt))))
      .when(passCount > 1,
        one(mkErr(path, "n_rules_match", lit("oneOf"),
          concat(lit("oneOf rules "), passedIdx, lit(" match.")), observedOf(target, dt))))
      .otherwise(failAll)
  }

  /** `/kind/<i> ` message prefix; a sub-message already starting with a path
    * gets joined without the space (the reference's `s!(\d+)\s/!$1/!g`
    * fix-up, Util.pm:123-124). */
  private def prefixErrors(kind: String, index: Int, errs: Column): Column =
    transform(errs, e => struct(
      e.getField("path").as("path"),
      e.getField("rule_id").as("rule_id"),
      e.getField("category").as("category"),
      concat(lit(s"/$kind/$index"),
        when(e.getField("message").startsWith("/"), e.getField("message"))
          .otherwise(concat(lit(" "), e.getField("message")))).as("message"),
      e.getField("observed").as("observed")))

  /** When a combinator fails with ≥2 errors that are all `type` errors at the
    * base path, collapse them into one combined error
    * `/allOf Expected a/b - got c.` (Schema.pm:438-447). */
  private def collapseTypeErrors(kind: String, errs: Column, path: Column, target: Column, dt: DataType): Column = {
    val nonType = exists(errs, e => e.getField("rule_id") =!= "type" || e.getField("path") =!= path)
    val wantTypes = array_join(array_distinct(transform(errs, e => e.getField("category"))), "/")
    val got = when(target.isNull, lit("null")).otherwise(lit(jsonTypeOf(dt)))
    when(size(errs) >= 2 && !nonType,
      one(mkErr(path, "type", lit(kind),
        concat(lit(s"/$kind Expected "), wantTypes, lit(" - got "), got, lit(".")),
        when(target.isNull, lit("null")).otherwise(observedOf(target, dt)))))
      .otherwise(errs)
  }
}
