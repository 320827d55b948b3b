package graft.rulepack

import graft.core._
import graft.rulepack.RulePack.{Store, joinUri, stripFragment}

import scala.collection.mutable

/** Driver-side JSON-document validator — the engine's analog of the
  * reference validating a SCHEMA DOCUMENT against its draft meta-schema at
  * load time (`JSON::Validator::load_and_validate_schema`,
  * reference Validator.pm:53-64; `Schema->errors` / `is_invalid`,
  * Schema.pm:14-19, 89: the schema data is validated by a sibling
  * validator resolving the `specification` URL with
  * `coerce('numbers,strings')`).
  *
  * Locus: the data plane stays in the compiled Catalyst path
  * (`RuleCompiler` — per-row, codegen'd, distributed). Schema documents
  * are spec-sized driver-side values validated ONCE before any cluster job
  * launches, which is exactly where the reference runs this check; a
  * recursive driver walk is the honest shape for it (the meta-schemas are
  * unboundedly self-referential, so they cannot — and should not — be
  * unrolled into compiled column rules).
  *
  * Semantics mirror the reference keyword-for-keyword and
  * message-for-message (Schema.pm:366-843, Error.pm:6-76,
  * Util.pm:58-174): keyword order, the anyOf/allOf/oneOf type-error
  * collapse, `schema_type` inference for untyped schemas, Perl scalar
  * semantics (string/number unification in enum/const/uniqueItems
  * checksums, `%.15g` stringification in messages and the `multipleOf`
  * quotient check), and the draft-4 bool-style / draft-6 numeric-style
  * exclusive bounds. `$ref` chains are followed lazily against the
  * document's `$id` scope via the same [[RulePack.Resolver]] the compiler
  * uses. Coercion profile is off by default (`validate`), and
  * numbers+strings for the meta-schema gate ([[schemaErrors]]), matching
  * Schema.pm:16-17.
  *
  * The 2019-09 split keywords ride along exactly as the reference's
  * subclass adds them (`$recursiveRef` followed like `$ref`,
  * `dependentRequired`/`dependentSchemas`, `minContains`/`maxContains` —
  * Draft201909.pm:24-120), as does OpenAPI `nullable`
  * (OpenAPIv3.pm:305-345). Deliberately out of scope: `coerce(defaults)`
  * (a data-plane repair — [[graft.core.Coerce]]).
  */
object JsonValidate {

  /** One validation error; `toString` renders the reference's
    * `"$path: $message"` form (Error.pm:102). */
  final case class Err(path: String, message: String) {
    override def toString: String = s"$path: $message"
  }

  /** Coercion profile (reference `coerce`, Validator.pm:24-43). */
  final case class Coercion(numbers: Boolean = false, strings: Boolean = false,
      booleans: Boolean = false)

  /** Validate `data` against `schema` (a raw JSON-value schema, refs
    * resolved against `store`), reference-ordered and reference-worded.
    * Errors come back sorted by path (Schema.pm:149-156).
    *
    * `refSiblings`: 2019-09 dialect `$ref` handling — sibling keywords
    * accumulate along the chain and apply alongside the target (target
    * wins per keyword, ref-machinery keys dropped:
    * Draft201909.pm:49-68 `_state`). Defaults to the draft-4/7 replace
    * semantics; auto-enabled when the schema's own `$schema` names
    * 2019-09/2020-12 (the reference selects the subclass the same way). */
  def validate(data: JValue, schema: JValue, store: Store = Store(),
      coerce: Coercion = Coercion(), refSiblings: Option[Boolean] = None): Seq[Err] = {
    val merge = refSiblings.getOrElse(schema match {
      case o: JObj => o.get("$schema").exists {
        case JStr(u) => u.contains("2019-09") || u.contains("2020-12")
        case _ => false
      }
      case _ => false
    })
    val walker = new Walker(new RulePack.Resolver(schema, store), coerce, merge)
    val base = schema match {
      case o: JObj => (o.get("$id") orElse o.get("id")).collect { case JStr(s) => stripFragment(s) }.getOrElse("")
      case _ => ""
    }
    walker.validate(data, schema, base, Nil, new Walker.Seen)
      .sortBy(_.path)
      .map(e => Err(e.path, e.message))
  }

  /** Validate a schema DOCUMENT against its declared draft meta-schema —
    * the reference's `Schema->errors` (Schema.pm:14-19): the
    * specification is the document's `$schema` (default draft-04), and the
    * meta-validation runs with numbers+strings coercion. Returns the
    * sorted error list; empty = the schema is a valid specification
    * instance. */
  def schemaErrors(doc: JValue, store: Store = Store()): Seq[Err] = {
    val spec = doc match {
      case o: JObj => o.get("$schema").collect { case JStr(s) => s }.getOrElse(MetaSchemas.DefaultSpec)
      case _ => MetaSchemas.DefaultSpec
    }
    validate(doc, MetaSchemas.forUri(spec), store,
      Coercion(numbers = true, strings = true))
  }

  /** Parse + meta-validate + compile — the reference's
    * `load_and_validate_schema` (Validator.pm:53-64): throws with the
    * reference's "Invalid JSON specification" wording listing every
    * meta-schema violation; otherwise returns the compiled rule.
    * (Do not feed it a draft META-schema itself: meta-schemas are
    * unboundedly recursive and are meant to be interpreted by this walker,
    * not compiled — use [[schemaErrors]] to check one.) */
  def loadAndValidateSchema(text: String, store: Store = Store()): Rule = {
    val doc = JValue.parseAny(text)
    val errs = schemaErrors(doc, store)
    if (errs.nonEmpty)
      throw new IllegalArgumentException(
        ("Invalid JSON specification" +: errs.map(e => s"- $e")).mkString("\n"))
    RulePack.fromJson(doc, store)
  }

  // ---------------------------------------------------------------- errors

  /** Internal error carrying the reference's `details` tuple — the
    * combinator collapse logic keys on `details[1] == "type"`
    * (Schema.pm:440-447 et al.), so the message is rendered from details
    * unless a prefix pass overrode it (Util.pm:116-130). */
  private final case class IErr(path: String, details: Vector[String],
      msgOverride: Option[String] = None) {
    def message: String = msgOverride.getOrElse(renderMessage(details))
    def isTypeAt(p: String): Boolean = details.lift(1).contains("type") && path == p
  }

  /** Error.pm:56-76: format errors surface the checker's text; 3-element
    * `type` details render "Expected %1 - got %3."; everything else goes
    * through the message table (integer shares number's templates). */
  private def renderMessage(d: Vector[String]): String = {
    if (d.headOption.contains("format")) d.lift(2).getOrElse("")
    else if (d.lift(1).contains("type") && d.length == 3) s"Expected ${d(0)} - got ${d(2)}."
    else {
      val kw = d.lift(1).getOrElse("")
      Messages.templates.get(s"${d(0)}.$kw")
        .orElse(if (d(0) == "integer") Messages.templates.get(s"number.$kw") else None) match {
        case Some(t) =>
          (1 to 4).foldLeft(t)((acc, i) => acc.replace(s"%$i", d.lift(i - 1).getOrElse("")))
        case None => ("Failed" +: d).mkString(" ")
      }
    }
  }

  /** Util.pm:116-130 `prefix_errors`: "/kind/idx msg", collapsing
    * "<digits> /" so nested prefixes chain as "/anyOf/0/allOf/1 …". */
  private def prefixErrors(kind: String, groups: Seq[(String, Vector[IErr])]): Vector[IErr] =
    groups.iterator.flatMap { case (idx, errs) =>
      errs.map { e =>
        e.copy(msgOverride = Some(s"/$kind/$idx ${e.message}".replaceAll("(\\d+)\\s/", "$1/")))
      }
    }.toVector

  // ------------------------------------------------------- Perl semantics

  private def esc(s: String) = s.replace("~", "~0").replace("/", "~1")
  private def renderPath(rev: List[String]): String =
    if (rev.isEmpty) "/" else rev.reverse.map(esc).mkString("/", "/", "")

  /** Perl NV stringification (`%.15g`, trailing zeros stripped) — messages
    * and the `multipleOf` quotient check depend on it (Schema.pm:719). */
  private[rulepack] def perlG(d: Double): String = {
    if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString
    else {
      val s = String.format(java.util.Locale.ROOT, "%.15g", Double.box(d))
      val ei = s.indexWhere(c => c == 'e' || c == 'E')
      var m = if (ei < 0) s else s.take(ei)
      val e = if (ei < 0) "" else s.drop(ei)
      if (m.contains('.')) m = m.replaceAll("0+$", "").stripSuffix(".")
      m + e
    }
  }

  /** Perl scalar stringification of a JSON leaf. */
  private def plainScalar(v: JValue): String = v match {
    case JStr(s)  => s
    case JInt(i)  => i.toString
    case JNum(d)  => perlG(d)
    case JBool(b) => if (b) "1" else ""
    case JNull    => ""
    case other    => other.render
  }

  /** Util.pm:58-72 `data_type`. */
  private def dataType(v: JValue): String = v match {
    case _: JObj          => "object"
    case _: JArr          => "array"
    case JNull            => "null"
    case _: JBool         => "boolean"
    case _: JInt | _: JNum => "number"
    case _: JStr          => "string"
  }

  /** Perl truthiness of a decoded JSON value (refs are always true). */
  private def truthy(v: JValue): Boolean = v match {
    case JNull    => false
    case JBool(b) => b
    case JInt(i)  => i != 0
    case JNum(d)  => d != 0
    case JStr(s)  => s.nonEmpty && s != "0"
    case _        => true
  }

  /** Util.pm:27-29 `data_checksum` equivalence classes: scalars collapse to
    * their string form (so `5` and `"5"` compare equal, as in Perl), undef
    * is distinct, containers compare structurally with sorted object
    * keys. */
  private def checksum(v: JValue): String = v match {
    case JNull                        => "undef"
    case _: JObj | _: JArr | _: JBool => canonical(v)
    case s                            => "'" + plainScalar(s) + "'"
  }
  private def canonical(v: JValue): String = v match {
    case JObj(fields) => fields.sortBy(_._1)
      .map { case (k, x) => "\"" + JValue.escape(k) + "\":" + canonical(x) }
      .mkString("{", ",", "}")
    case JArr(items)  => items.map(canonical).mkString("[", ",", "]")
    case JInt(i)      => i.toString
    case JNum(d)      => perlG(d)
    case other        => other.render
  }

  /** Util.pm:132-168 `schema_type`: infer the effective type of an untyped
    * schema from its keywords, applied only when the data (or undef)
    * matches the guess (`_guessed_right`, Util.pm:170-174). */
  private def schemaType(o: JObj, data: JValue): String = {
    val m = o.toMap
    def has(k: String) = m.contains(k)
    def truthyK(k: String) = m.get(k).exists(truthy)
    def defined(k: String) = m.get(k).exists(_ != JNull)
    def guessed(t: String): String =
      if (data == JNull || dataType(data) == t) t else ""

    if (truthyK("additionalProperties")) guessed("object")
    else if (truthyK("patternProperties")) guessed("object")
    else if (truthyK("properties")) guessed("object")
    else if (has("propertyNames")) guessed("object")
    else if (truthyK("required")) guessed("object")
    else if (truthyK("dependencies") || truthyK("dependentSchemas") || truthyK("dependentRequired")) guessed("object")
    else if (defined("maxProperties") || defined("minProperties")) guessed("object")
    else if (has("items")) guessed("array")
    else if (truthyK("uniqueItems")) guessed("array")
    else if (has("contains")) guessed("array")
    else if (has("maxItems") || has("minItems")) guessed("array")
    else if (truthyK("pattern")) guessed("string")
    else if (has("maxLength") || defined("minLength")) guessed("string")
    else if (truthyK("multipleOf")) guessed("number")
    else if (defined("maximum") || defined("minimum") || defined("exclusiveMaximum") || defined("exclusiveMinimum")) guessed("number")
    else if (has("const")) "const"
    else ""
  }

  private def numOf(v: JValue): Option[Double] = v match {
    case JInt(i) => Some(i.toDouble)
    case JNum(d) => Some(d)
    case JStr(s) => s.toDoubleOption // Perl numeric context on a schema scalar
    case _       => None
  }

  /** Perl's strict JSON-number coercion regex (Schema.pm:712). */
  private val CoerceNumRe = "^-?(?:0|[1-9]\\d*)(?:\\.\\d+)?(?:[eE][+-]?\\d+)?$"

  // --------------------------------------------- driver-side format checks

  /** The formats the shipped meta-schemas use, as driver-side checkers
    * returning the reference checker's error text (Formats.pm:124-196);
    * every other format passes permissively here — the COMPLETE registry
    * lives in the data plane ([[graft.functions.Formats]]). */
  private def checkFormat(format: String, value: String): Option[String] = format match {
    case "regex" =>
      if (graft.functions.Formats.regexCompilable(value)) None
      else Some("Does not match regex format.")
    case "uri" =>
      if (value.exists(_ > 127)) Some("An URI can only only contain ASCII characters.")
      else iriReference(value, "uri")
    case "uri-reference" => iriReference(value, "uri-reference")
    case _ => None
  }

  /** Formats.pm:124-145 `check_iri_reference`, structurally. */
  private def iriReference(v: String, name: String): Option[String] = {
    val re = "^(([^:/?#]+):)?(//([^/?#]*))?([^?#]*)(\\?([^#]*))?(#(.*))?".r
    re.findPrefixMatchOf(v) match {
      case None => Some(s"Does not match $name format.")
      case Some(m) =>
        def g(i: Int) = Option(m.group(i)).getOrElse("")
        val (scheme, authHost, path, hasFragment) = (g(2), g(4), g(5), g(8))
        if (authHost.nonEmpty && scheme.isEmpty) Some("Scheme missing.")
        else if (scheme.isEmpty && path.isEmpty && hasFragment.isEmpty) Some("Scheme, path or fragment are required.")
        else if (scheme.nonEmpty && !scheme.toLowerCase.matches("^[a-z][a-z0-9+\\-.]*$")) Some("Scheme must begin with a letter.")
        else if ("%[^0-9a-fA-F]".r.findFirstIn(v).isDefined) Some("Invalid hex escape.")
        else if ("%[0-9a-fA-F](?:[^0-9a-fA-F]|$)".r.findFirstIn(v).isDefined) Some("Hex escapes are not complete.")
        else if (authHost.nonEmpty && path.nonEmpty && !path.startsWith("/")) Some("Path cannot be empty and must begin with a /")
        else if (authHost.isEmpty && path.startsWith("//")) Some("Path cannot not start with //.")
        else None
    }
  }

  // ---------------------------------------------------------------- walker

  private object Walker {
    /** Schema.pm:372-376 recursion protection: identity-keyed
      * (schema, data) memo; an in-progress pair returns its
      * (still-empty) error list. */
    final class Seen {
      private val m = mutable.HashMap[(Int, Int), Vector[IErr]]()
      private def key(a: AnyRef, b: AnyRef) =
        (System.identityHashCode(a), System.identityHashCode(b))
      def get(s: AnyRef, d: AnyRef): Option[Vector[IErr]] = m.get(key(s, d))
      def put(s: AnyRef, d: AnyRef, e: Vector[IErr]): Unit = m(key(s, d)) = e
    }
  }

  private final class Walker(resolver: RulePack.Resolver, coerce: Coercion,
      mergeRefSiblings: Boolean) {
    import Walker.Seen

    private val RefMachinery = Set("$anchor", "$id", "$recursiveAnchor", "$recursiveRef", "$ref")

    /** `_state`: follow `$ref` chains, rebasing on embedded `$id`s; a
      * looping chain stops at the revisited node. Draft-4/7 REPLACES the
      * schema (Schema.pm:353-364); the 2019-09 dialect accumulates the
      * chain's sibling keywords and applies them alongside the target,
      * target winning per keyword (Draft201909.pm:49-68). */
    private def follow(s0: JValue, base0: String, chain0: List[AnyRef]): (JValue, String) = {
      var s = s0
      var base = base0
      var chain = chain0
      var alongside = Vector.empty[(String, JValue)]
      var done = false
      while (!done) s match {
        case o: JObj =>
          base = (o.get("$id") orElse o.get("id")).collect {
            case JStr(x) if !x.startsWith("#") => stripFragment(joinUri(base, x))
          }.getOrElse(base)
          (o.get("$ref") orElse o.get("$recursiveRef")) match {
            case Some(JStr(r)) if !chain.exists(_ eq o) =>
              if (mergeRefSiblings) alongside = alongside ++ o.fields
              chain = o :: chain
              val (t, nb) = resolver.resolveRef(r, base)
              s = t; base = nb
            case _ => done = true
          }
        case _ => done = true
      }
      if (mergeRefSiblings && alongside.nonEmpty) s match {
        case o: JObj =>
          val kept = alongside.filterNot(kv => RefMachinery(kv._1))
            .filterNot(kv => o.toMap.contains(kv._1))
          if (kept.nonEmpty) s = JObj(kept ++ o.fields)
        case _ => ()
      }
      (s, base)
    }

    /** Schema.pm:366-421 `_validate`. */
    def validate(data: JValue, schema0: JValue, base0: String,
        path: List[String], seen: Seen): Vector[IErr] = {
      val (schema, base) = follow(schema0, base0, Nil)
      val pstr = renderPath(path)
      schema match {
        case JBool(b) => if (b) Vector.empty else Vector(IErr(pstr, Vector("not", "not")))
        case o: JObj  => validateObjSchema(data, o, base, path, pstr, seen)
        case _        => Vector.empty // malformed schema node: lint's territory
      }
    }

    private def validateObjSchema(data: JValue, schema: JObj, base: String,
        path: List[String], pstr: String, seen: Seen): Vector[IErr] = {
      val recursive = data match {
        case _: JObj | _: JArr => true
        case _                 => false
      }
      if (recursive) seen.get(schema, data) match {
        case Some(errs) => return errs
        case None       => seen.put(schema, data, Vector.empty)
      }

      val errors = Vector.newBuilder[IErr]
      val m = schema.toMap

      m.get("not").filter(truthy).foreach { notS =>
        if (validate(data, notS, base, path, new Seen).isEmpty)
          errors += IErr(pstr, Vector("not", "not"))
      }
      m.get("allOf").foreach { case JArr(rules) => errors ++= vAllOf(data, rules, base, path, pstr); case _ => () }
      m.get("anyOf").foreach { case JArr(rules) => errors ++= vAnyOf(data, rules, base, path, pstr); case _ => () }
      m.get("oneOf").foreach { case JArr(rules) => errors ++= vOneOf(data, rules, base, path, pstr); case _ => () }
      if (m.contains("if")) {
        val fresh = new Seen
        val cond = m("if")
        val branch =
          if (!truthy(cond) || validate(data, cond, base, path, fresh).nonEmpty) m.get("else")
          else m.get("then")
        errors ++= validate(data, branch.getOrElse(JObj(Vector.empty)), base, path, fresh)
      }

      m.get("type").filter(truthy) match {
        case Some(JArr(types)) => errors ++= vAnyOfTypes(data, schema, types, base, path, pstr)
        case Some(JStr(t))     => errors ++= vType(t, data, schema, base, path, pstr, seen)
        case Some(_)           => ()
        case None =>
          val t = schemaType(schema, data)
          if (t.nonEmpty) errors ++= vType(t, data, schema, base, path, pstr, seen)
      }

      var out = errors.result()
      if (out.isEmpty) {
        m.get("const").foreach { c =>
          if (checksum(data) != checksum(c))
            out :+= IErr(pstr, Vector("const", "const", c.render))
        }
        m.get("enum").filter(truthy)
          .filterNot(_ => data == JNull && m.get("nullable").exists(truthy)).foreach {
          case JArr(vs) =>
            if (!vs.exists(v => checksum(v) == checksum(data))) {
              val listed = vs.map {
                case JNull            => "null"
                case b: JBool         => b.render
                case c @ (_: JObj | _: JArr) => c.render
                case s                => plainScalar(s)
              }.mkString(", ")
              out :+= IErr(pstr, Vector("enum", "enum", listed))
            }
          case _ => ()
        }
      }
      if (recursive) seen.put(schema, data, out)
      out
    }

    private def vType(t: String, data: JValue, schema: JObj, base: String,
        path: List[String], pstr: String, seen: Seen): Vector[IErr] =
      // OpenAPI nullable bypasses every per-type check for null data
      // (OpenAPIv3.pm:305-345's per-type overrides)
      if (data == JNull && schema.get("nullable").exists(truthy)) Vector.empty
      else t match {
      case "object"  => vObject(data, schema, base, path, pstr, seen)
      case "array"   => vArray(data, schema, base, path, pstr, seen)
      case "string"  => vString(data, schema, pstr)
      case "number"  => vNumber(data, schema, pstr, "number")
      case "integer" => vInteger(data, schema, pstr)
      case "boolean" => data match {
        case _: JBool => Vector.empty
        case other    => Vector(IErr(pstr, Vector("boolean", "type", dataType(other))))
      }
      case "null" => data match {
        case JNull => Vector.empty
        case other => Vector(IErr(pstr, Vector("null", "type", dataType(other))))
      }
      case "const" =>
        val c = schema.toMap("const")
        if (checksum(data) == checksum(c)) Vector.empty
        else Vector(IErr(pstr, Vector("const", "const", c.render)))
      case _ => Vector.empty // "any" / unknown type names are no-ops
    }

    // -------------------------------------------------------- combinators

    /** Schema.pm:422-448. */
    private def vAllOf(data: JValue, rules: Seq[JValue], base: String,
        path: List[String], pstr: String): Vector[IErr] = {
      val groups = rules.zipWithIndex.flatMap { case (r, i) =>
        val e = validate(data, r, base, path, new Seen)
        if (e.isEmpty) None else Some((i.toString, e))
      }
      collapse("allOf", groups, pstr)
    }

    /** Schema.pm:472-497 (any branch passing short-circuits). */
    private def vAnyOf(data: JValue, rules: Seq[JValue], base: String,
        path: List[String], pstr: String): Vector[IErr] = {
      val groups = Vector.newBuilder[(String, Vector[IErr])]
      for ((r, i) <- rules.zipWithIndex) {
        val e = validate(data, r, base, path, new Seen)
        if (e.isEmpty) return Vector.empty
        groups += ((i.toString, e))
      }
      collapse("anyOf", groups.result(), pstr)
    }

    /** Schema.pm:506-536. */
    private def vOneOf(data: JValue, rules: Seq[JValue], base: String,
        path: List[String], pstr: String): Vector[IErr] = {
      val passed = Vector.newBuilder[Int]
      val groups = Vector.newBuilder[(String, Vector[IErr])]
      for ((r, i) <- rules.zipWithIndex) {
        val e = validate(data, r, base, path, new Seen)
        if (e.isEmpty) passed += i else groups += ((i.toString, e))
      }
      val ok = passed.result()
      val gs = groups.result()
      if (ok.length == 1) Vector.empty
      else if (gs.isEmpty) Vector(IErr(pstr, Vector("oneOf", "all_rules_match")))
      else if (ok.nonEmpty) Vector(IErr(pstr, Vector("oneOf", "n_rules_match", ok.mkString(", "))))
      else collapse("oneOf", gs, pstr)
    }

    /** The shared tail: one error, or any non-type-at-base error → prefix
      * per branch; otherwise collapse all base type errors into one
      * "<kind> Expected a/b - got X." (Schema.pm:440-447). */
    private def collapse(kind: String, groups: Seq[(String, Vector[IErr])],
        pstr: String): Vector[IErr] = {
      val all = groups.iterator.flatMap(_._2).toVector
      if (all.isEmpty) Vector.empty
      else if (all.length == 1 || all.exists(e => !e.isTypeAt(pstr)))
        prefixErrors(kind, groups)
      else {
        val want = all.map(_.details(0)).distinct.mkString("/")
        Vector(IErr(pstr, Vector(kind, "type", want, all.last.details(2))))
      }
    }

    /** Schema.pm:450-470: a type UNION re-validates the whole schema once
      * per member type; non-type errors are favored un-prefixed, pure type
      * misses collapse to "Expected a/b - got X.". */
    private def vAnyOfTypes(data: JValue, schema: JObj, types: Seq[JValue],
        base: String, path: List[String], pstr: String): Vector[IErr] = {
      val all = Vector.newBuilder[IErr]
      for (t <- types) {
        val s2 = JObj(schema.fields.filterNot(_._1 == "type") :+ ("type" -> t))
        val e = validate(data, s2, base, path, new Seen)
        if (e.isEmpty) return Vector.empty
        all ++= e
      }
      val errs = all.result()
      val nonType = errs.filter(e => !e.isTypeAt(pstr))
      if (nonType.nonEmpty) nonType
      else if (errs.isEmpty) Vector.empty
      else {
        val want = errs.map(_.details(0)).distinct.mkString("/")
        Vector(IErr(pstr, Vector(want, "type", errs.last.details(2))))
      }
    }

    // ------------------------------------------------------ type checkers

    /** Schema.pm:726-803 `_validate_type_object`. */
    private def vObject(data: JValue, schema: JObj, base: String,
        path: List[String], pstr: String, seen: Seen): Vector[IErr] = data match {
      case d: JObj =>
        val m = schema.toMap
        val dm = d.toMap
        val dkeys = d.fields.map(_._1)
        val errors = Vector.newBuilder[IErr]

        for (mx <- m.get("maxProperties"); n <- numOf(mx) if n < dkeys.size)
          errors += IErr(pstr, Vector("object", "maxProperties", dkeys.size.toString, plainScalar(mx)))
        for (mn <- m.get("minProperties"); n <- numOf(mn) if n > dkeys.size)
          errors += IErr(pstr, Vector("object", "minProperties", dkeys.size.toString, plainScalar(mn)))

        m.get("propertyNames").foreach { pn =>
          for (name <- dkeys) {
            val e = validate(JStr(name), pn, base, path, seen)
            if (e.nonEmpty) errors ++= prefixErrors("propertyName", Seq((name, e)))
          }
        }

        // accumulate per-key rules: properties, then matching
        // patternProperties, then additionalProperties fill-in
        val rules = mutable.LinkedHashMap[String, mutable.Buffer[JValue]]()
        m.get("properties").foreach { case JObj(props) =>
          for ((k, r) <- props) rules.getOrElseUpdate(k, mutable.Buffer()) += r
          case _ => ()
        }
        m.get("patternProperties").foreach { case JObj(pats) =>
          for ((p, r) <- pats) {
            val re = try Some(java.util.regex.Pattern.compile(p)) catch { case _: Exception => None }
            re.foreach(cp => for (k <- dkeys if cp.matcher(k).find())
              rules.getOrElseUpdate(k, mutable.Buffer()) += r)
          }
          case _ => ()
        }
        val additional = m.getOrElse("additionalProperties", JObj(Vector.empty))
        if (truthy(additional)) {
          val add: JValue = additional match { case o: JObj => o; case _ => JObj(Vector.empty) }
          for (k <- dkeys if !rules.contains(k)) rules(k) = mutable.Buffer(add)
        } else {
          val bad = dkeys.filterNot(rules.contains)
          if (bad.nonEmpty) // closed world rejects the row outright (Schema.pm:766-769)
            return Vector(IErr(pstr, Vector("object", "additionalProperties", bad.sorted.mkString(", "))))
        }

        m.get("required").foreach { case JArr(req) =>
          for (JStr(k) <- req.distinct if !dm.contains(k)) {
            errors += IErr(renderPath(k :: path), Vector("object", "required"))
            rules.remove(k)
          }
          case _ => ()
        }

        m.get("dependencies").foreach { case JObj(deps) =>
          for ((k, v) <- deps if dm.contains(k)) v match {
            case JArr(reqs) =>
              for (JStr(r) <- reqs if !dm.contains(r))
                errors += IErr(renderPath(r :: path), Vector("object", "dependencies", k))
            case sub =>
              val (t, b2) = follow(sub, base, Nil)
              t match {
                case o: JObj => errors ++= vObject(data, o, b2, path, pstr, seen)
                case _       => ()
              }
          }
          case _ => ()
        }

        // 2019-09 split keywords (Draft201909.pm:92-120): dependentSchemas
        // re-validates the whole object, dependentRequired is the array form
        m.get("dependentSchemas").foreach { case JObj(deps) =>
          for ((k, sub) <- deps if dm.contains(k)) sub match {
            case JArr(reqs) =>
              for (JStr(r) <- reqs if !dm.contains(r))
                errors += IErr(renderPath(r :: path), Vector("object", "dependencies", k))
            case s => errors ++= validate(data, s, base, path, seen)
          }
          case _ => ()
        }
        m.get("dependentRequired").foreach { case JObj(deps) =>
          for ((k, JArr(reqs)) <- deps if dm.contains(k); JStr(r) <- reqs if !dm.contains(r))
            errors += IErr(renderPath(r :: path), Vector("object", "dependencies", k))
          case _ => ()
        }

        for ((k, rs) <- rules; r <- rs; v <- dm.get(k))
          errors ++= validate(v, r, base, k :: path, seen)
        // (the reference's post-hoc per-property enum/const re-check,
        // Schema.pm:795-798, only fires when _validate reported nothing —
        // in which case those keywords already passed; a no-op here)

        errors.result()
      case other => Vector(IErr(pstr, Vector("object", "type", dataType(other))))
    }

    /** Schema.pm:612-670 `_validate_type_array`. */
    private def vArray(data: JValue, schema: JObj, base: String,
        path: List[String], pstr: String, seen: Seen): Vector[IErr] = data match {
      case JArr(items) =>
        val m = schema.toMap
        val errors = Vector.newBuilder[IErr]

        for (mn <- m.get("minItems"); n <- numOf(mn) if n > items.size)
          errors += IErr(pstr, Vector("array", "minItems", items.size.toString, plainScalar(mn)))
        for (mx <- m.get("maxItems"); n <- numOf(mx) if n < items.size)
          errors += IErr(pstr, Vector("array", "maxItems", items.size.toString, plainScalar(mx)))
        if (m.get("uniqueItems").exists(truthy)) {
          val seenSums = mutable.HashSet[String]()
          if (items.exists(i => !seenSums.add(checksum(i))))
            errors += IErr(pstr, Vector("array", "uniqueItems"))
        }

        // contains with the 2019-09 min/maxContains extension
        // (Draft201909.pm:70-89; identical to Schema.pm:636-645 when the
        // bounds are absent)
        m.get("contains").foreach { c =>
          val minC = m.get("minContains")
          val skip =
            (minC.flatMap(numOf).contains(0.0) && !m.get("maxContains").exists(truthy)) ||
              (minC.flatMap(numOf).contains(0.0) && items.isEmpty)
          if (!skip) {
            val failGroups = items.zipWithIndex.flatMap { case (it, i) =>
              val e = validate(it, c, base, i.toString :: path, seen)
              if (e.isEmpty) None else Some(e)
            }
            val nValid = items.size - failGroups.size
            if (failGroups.size >= items.size) errors ++= failGroups.flatten
            for (mx <- m.get("maxContains"); b <- numOf(mx) if nValid > b)
              errors += IErr(pstr, Vector("array", "maxContains", items.size.toString, plainScalar(mx)))
            for (mn <- minC.filter(truthy); b <- numOf(mn) if nValid < b)
              errors += IErr(pstr, Vector("array", "minContains", items.size.toString, plainScalar(mn)))
            if (items.isEmpty) errors += IErr(pstr, Vector("array", "contains"))
          }
        }

        m.get("items") match {
          case Some(JArr(rules0)) =>
            val additional = m.getOrElse("additionalItems", JObj(Vector.empty))
            val rules =
              if (truthy(additional) && rules0.size < items.size)
                rules0 ++ Vector.fill(items.size - rules0.size)(additional)
              else rules0
            if (rules.size >= items.size)
              for (i <- items.indices)
                errors ++= validate(items(i), rules(i), base, i.toString :: path, seen)
            else if (!truthy(additional))
              errors += IErr(pstr, Vector("array", "additionalItems", items.size.toString, rules0.size.toString))
          case Some(single) =>
            for (i <- items.indices)
              errors ++= validate(items(i), single, base, i.toString :: path, seen)
          case None => ()
        }
        errors.result()
      case other => Vector(IErr(pstr, Vector("array", "type", dataType(other))))
    }

    /** Schema.pm:805-843 `_validate_type_string`. */
    private def vString(data: JValue, schema: JObj, pstr: String): Vector[IErr] = {
      val m = schema.toMap
      val typeExplicit = m.get("type").exists(truthy)
      data match {
        case JNull if !typeExplicit => Vector.empty // inferred string + undef passes
        case JNull | _: JObj | _: JArr | _: JBool =>
          Vector(IErr(pstr, Vector("string", "type", dataType(data))))
        case num @ (_: JInt | _: JNum) if !coerce.strings =>
          Vector(IErr(pstr, Vector("string", "type", dataType(num))))
        case other =>
          val s = plainScalar(other) // JStr as-is; numbers coerced to string
          val errors = Vector.newBuilder[IErr]
          m.get("format").collect { case JStr(f) => f }.foreach { f =>
            checkFormat(f, s).foreach(err => errors += IErr(pstr, Vector("format", f, err)))
          }
          for (mx <- m.get("maxLength"); n <- numOf(mx)
               if s.codePointCount(0, s.length) > n)
            errors += IErr(pstr, Vector("string", "maxLength", s.codePointCount(0, s.length).toString, plainScalar(mx)))
          for (mn <- m.get("minLength"); n <- numOf(mn)
               if s.codePointCount(0, s.length) < n)
            errors += IErr(pstr, Vector("string", "minLength", s.codePointCount(0, s.length).toString, plainScalar(mn)))
          m.get("pattern").collect { case JStr(p) => p }.foreach { p =>
            val ok = try java.util.regex.Pattern.compile(p).matcher(s).find()
            catch { case _: Exception => true } // uncompilable patterns are lint's territory
            if (!ok) errors += IErr(pstr, Vector("string", "pattern", p))
          }
          errors.result()
      }
    }

    /** Schema.pm:701-724 `_validate_type_number` (+ the min/max helpers at
      * 538-578, both exclusive styles). */
    private def vNumber(data: JValue, schema: JObj, pstr: String,
        expected: String): Vector[IErr] = {
      val m = schema.toMap
      val vOpt: Either[IErr, Double] = data match {
        case JInt(i) => Right(i.toDouble)
        case JNum(d) => Right(d)
        case JStr(s) if coerce.numbers && s.matches(CoerceNumRe) => Right(s.toDouble)
        case other => Left(IErr(pstr, Vector(expected, "type", dataType(other))))
      }
      vOpt match {
        case Left(e) => Vector(e)
        case Right(v) =>
          val errors = Vector.newBuilder[IErr]
          m.get("format").collect { case JStr(f) => f }.foreach { f =>
            checkFormat(f, perlG(v)).foreach(err => errors += IErr(pstr, Vector("format", f, err)))
          }
          // maximum / exclusiveMaximum (bool = draft-4 style vs maximum,
          // number = draft-6 style)
          m.get("exclusiveMaximum") match {
            case Some(JBool(true)) =>
              for (mx <- m.get("maximum"); b <- numOf(mx) if !(v < b))
                errors += IErr(pstr, Vector(expected, "ex_maximum", perlG(v), plainScalar(mx)))
            case Some(ex @ (_: JInt | _: JNum)) =>
              for (b <- numOf(ex) if !(v < b))
                errors += IErr(pstr, Vector(expected, "ex_maximum", perlG(v), plainScalar(ex)))
            case _ => ()
          }
          for (mx <- m.get("maximum"); b <- numOf(mx) if !(v <= b))
            errors += IErr(pstr, Vector(expected, "maximum", perlG(v), plainScalar(mx)))
          m.get("exclusiveMinimum") match {
            case Some(JBool(true)) =>
              for (mn <- m.get("minimum"); b <- numOf(mn) if !(v > b))
                errors += IErr(pstr, Vector(expected, "ex_minimum", perlG(v), plainScalar(mn)))
            case Some(ex @ (_: JInt | _: JNum)) =>
              for (b <- numOf(ex) if !(v > b))
                errors += IErr(pstr, Vector(expected, "ex_minimum", perlG(v), plainScalar(ex)))
            case _ => ()
          }
          for (mn <- m.get("minimum"); b <- numOf(mn) if !(v >= b))
            errors += IErr(pstr, Vector(expected, "minimum", perlG(v), plainScalar(mn)))
          // multipleOf via the reference's stringified-quotient check
          // (Schema.pm:718-719)
          for (dv <- m.get("multipleOf").filter(truthy); d <- numOf(dv)
               if "\\.[^0]+$".r.findFirstIn(perlG(v / d)).isDefined)
            errors += IErr(pstr, Vector(expected, "multipleOf", plainScalar(dv)))
          errors.result()
      }
    }

    /** Schema.pm:685-692: number checks first, then the stringified-value
      * integer shape on the ORIGINAL scalar. */
    private def vInteger(data: JValue, schema: JObj, pstr: String): Vector[IErr] = {
      val e = vNumber(data, schema, pstr, "integer")
      if (e.nonEmpty) e
      else {
        val s = data match {
          case JStr(x) => x
          case JInt(i) => i.toString
          case JNum(d) => perlG(d)
          case _       => ""
        }
        if (s.matches("^-?\\d+$")) Vector.empty
        else Vector(IErr(pstr, Vector("integer", "type", dataType(data))))
      }
    }
  }
}
