package graft.rulepack

import graft.core._
import graft.core.Rule._

/** JSON rule-pack front-end: parses a JSON-Schema-shaped document into the
  * [[Rule]] ADT, resolving in-document and cross-document `$ref` pointers on
  * the driver before compilation — the analog of the reference's
  * resolve-before-validate contract (reference lib/JSON/Validator/
  * Schema.pm:102-147 `resolve`, Store.pm:62-100 `Store::resolve`).
  *
  * The [[Store]] is the rule-pack registry (id → document), mirroring the
  * reference's `JSON::Validator::Store` (Store.pm:21-49). Resolution inlines
  * referenced schemas into one closed rule tree (the analog of `bundle`,
  * Schema.pm:44-65): the compiled plan ships to executors self-contained.
  * Cyclic references are rejected at parse time — columnar data is acyclic,
  * so recursive schemas have no instance to apply to (reference handles
  * cycles at runtime instead, Schema.pm:372-376).
  */
object RulePack {

  final case class Store(docs: Map[String, JValue] = Map.empty) {
    def resolve(uri: String): Option[JValue] = {
      val (doc, frag) = uri.split("#", 2) match {
        case Array(d)    => (d, "")
        case Array(d, f) => (d, f)
      }
      docs.get(doc).flatMap(pointer(_, frag))
    }
  }

  /** JSON-pointer navigation (reference Schema.pm:260-326 `get`). */
  def pointer(doc: JValue, frag: String): Option[JValue] = {
    val parts = frag.split("/").filter(_.nonEmpty)
      .map(_.replace("~1", "/").replace("~0", "~"))
    parts.foldLeft(Option(doc)) {
      case (Some(o: JObj), key) => o.get(key)
      case (Some(JArr(items)), idx) => idx.toIntOption.flatMap(items.lift)
      case _ => None
    }
  }

  /** Wildcard pointer walk (reference Schema.pm:260-326 `_get` with undef
    * segments): `None` fans out over all object keys / array indices;
    * returns every match with its concrete JSON-pointer path (the
    * reference's callback contract, t/get.t 'callback'). */
  def pointerAll(doc: JValue, segments: Seq[Option[String]]): Seq[(JValue, String)] = {
    def esc(s: String) = s.replace("~", "~0").replace("/", "~1")
    def walk(v: JValue, rest: Seq[Option[String]], path: String): Seq[(JValue, String)] = rest match {
      case Seq() => Seq(v -> path)
      case Some(k) +: tail => v match {
        case o: JObj     => o.get(k).toSeq.flatMap(walk(_, tail, s"$path/${esc(k)}"))
        case JArr(items) => k.toIntOption.flatMap(items.lift).toSeq.flatMap(walk(_, tail, s"$path/$k"))
        case _           => Nil
      }
      case None +: tail => v match {
        case JObj(fields) => fields.flatMap { case (k, s) => walk(s, tail, s"$path/${esc(k)}") }
        case JArr(items)  => items.zipWithIndex.flatMap { case (s, i) => walk(s, tail, s"$path/$i") }
        case _            => Nil
      }
    }
    walk(doc, segments, "")
  }

  /** `get` with the reference's `$ref`-following view (t/get.t '$ref'
    * subtest): when the addressed value is an object carrying `$ref` /
    * `$recursiveRef`, the chain is followed and sibling keywords merge with
    * the target's (target wins per keyword — `_state`'s
    * `{%alongside, %$schema}`, Schema.pm:353-364 / Draft201909.pm:49-68) —
    * unless the path itself addresses the `$ref` key. Returns None for a
    * missing path, like the reference's undef. */
  def getResolved(root: JValue, frag: String, store: Store = Store()): Option[JValue] = {
    val resolver = new Resolver(root, store)
    def followMerge(v: JValue, base: String, seen: Set[String]): JValue = v match {
      case o: JObj =>
        (o.get("$ref") orElse o.get("$recursiveRef")) match {
          case Some(JStr(uri)) =>
            val key = joinUri(base, uri)
            if (seen.contains(key)) v // cyclic view: stop merging, return as-is
            else {
              val (target, targetBase) = resolver.resolveRef(uri, base)
              val alongside = o.fields.filterNot { case (k, _) =>
                k == "$ref" || k == "$recursiveRef" || k == "$anchor" ||
                  k == "$id" || k == "id" || k == "$recursiveAnchor"
              }
              followMerge(target, targetBase, seen + key) match {
                case JObj(tf) =>
                  // target wins per keyword; sibling keys keep their order
                  val overridden = alongside.filterNot { case (k, _) => tf.exists(_._1 == k) }
                  JObj(overridden ++ tf)
                case other => other
              }
            }
          case _ => v
        }
      case _ => v
    }
    // refs are followed WHILE navigating (mid-path refs resolve before each
    // descent), except when the path addresses the $ref key itself
    val parts = frag.split("/").filter(_.nonEmpty)
      .map(_.replace("~1", "/").replace("~0", "~")).toSeq
    val landed = parts.foldLeft(Option(root)) { (acc, key) =>
      acc.flatMap { v =>
        val here =
          if (key == "$ref" || key == "$recursiveRef") v
          else followMerge(v, resolver.entryBase, Set.empty)
        here match {
          case o: JObj     => o.get(key)
          case JArr(items) => key.toIntOption.flatMap(items.lift)
          case _           => None
        }
      }
    }
    landed.map(followMerge(_, resolver.entryBase, Set.empty))
  }

  def parse(json: String, store: Store = Store()): Rule =
    fromJson(JValue.parse(json), store)

  /** YAML rule pack — OpenAPI specs in the wild are overwhelmingly YAML
    * (reference loads them everywhere: Store.pm:146-158 `_load_from_file`,
    * tests t/load-yaml.t). Parses to the identical [[Rule]] as the JSON
    * twin. */
  def parseYaml(yaml: String, store: Store = Store()): Rule =
    fromJson(JValue.parseYaml(yaml), store)

  /** Format-sniffing load (`str2data`, Util.pm:163-167): first non-space
    * byte `{` → JSON, else YAML. */
  def parseAny(text: String, store: Store = Store()): Rule =
    fromJson(JValue.parseAny(text), store)

  /** Draft-dialect sniffing (reference Validator.pm:103-124): the `$schema`
    * / `swagger` / `openapi` keys select the dialect. The parser itself is
    * dialect-tolerant (it accepts draft-4 boolean-style and draft-6+
    * numeric-style exclusive bounds simultaneously), so the dialect is
    * informational + used by lint for dialect-specific advice. */
  def detectDialect(root: JValue): String = root match {
    case o: JObj =>
      o.get("$schema").collect { case JStr(s) => s } match {
        case Some(s) if s.contains("draft-04") => "draft4"
        case Some(s) if s.contains("draft-06") => "draft6"
        case Some(s) if s.contains("draft-07") => "draft7"
        case Some(s) if s.contains("2019-09")  => "draft2019-09"
        case Some(s) if s.contains("2020-12")  => "draft2020-12"
        case Some(_) => "unknown"
        case None =>
          if (o.get("swagger").contains(JStr("2.0"))) "openapiv2"
          else if (o.get("openapi").exists { case JStr(v) => v.startsWith("3."); case _ => false }) "openapiv3"
          else "draft7" // the reference's default dialect (Validator.pm:124)
      }
    case _ => "draft7"
  }

  /** Minimal RFC 3986 reference resolution: scheme-absolute refs stand
    * alone, fragment-only refs replace the base's fragment, everything else
    * resolves against the base's hierarchical path (java.net.URI). An empty
    * base (anonymous document) leaves relative refs as-is — they become
    * store keys. */
  def joinUri(base: String, ref: String): String = {
    val b = stripFragment(base)
    if (ref.isEmpty) b
    else if (ref.matches("^[A-Za-z][A-Za-z0-9+.\\-]*:.*")) ref
    else if (ref.startsWith("#")) b + ref
    else if (b.isEmpty) ref
    else
      try new java.net.URI(b).resolve(new java.net.URI(ref)).toString
      catch { case _: Exception => ref }
  }

  private[rulepack] def stripFragment(uri: String): String = {
    val i = uri.indexOf('#')
    if (i < 0) uri else uri.take(i)
  }

  /** Walk a document registering every subschema carrying `id`/`$id` (its
    * URI resolved against the enclosing base, becoming the base for its
    * descendants — Schema.pm:337-351 `_resolve_object`) and every
    * `$anchor` / fragment-only id (Draft6.pm/Draft201909.pm anchor forms)
    * under `base#name`. Data-carrying keywords (enum/const/default/
    * examples) are not walked — their contents are instances, not
    * schemas. */
  private def registerIds(v: JValue, base: String,
      reg: scala.collection.mutable.Map[String, JValue]): Unit = v match {
    case o: JObj =>
      val idOpt = (o.get("$id") orElse o.get("id")).collect { case JStr(s) => s }
      val newBase = idOpt match {
        case Some(s) if s.startsWith("#") => // anchor-form id (draft4/6/7)
          reg(stripFragment(base) + s) = o; base
        case Some(s) =>
          val abs = stripFragment(joinUri(base, s))
          reg(abs) = o
          abs
        case None => base
      }
      o.get("$anchor").foreach { case JStr(a) => reg(s"${stripFragment(newBase)}#$a") = o; case _ => }
      for ((k, sub) <- o.fields) k match {
        // schema MAPS: the keys are property names / regexes, not keywords
        // — a property literally named "default" still holds a schema
        case "properties" | "patternProperties" | "definitions" | "$defs" | "dependentSchemas" =>
          sub match {
            case JObj(fs) => fs.foreach { case (_, s) => registerIds(s, newBase, reg) }
            case _        =>
          }
        case kk if !dataKeys(kk) => registerIds(sub, newBase, reg)
        case _ =>
      }
    case JArr(items) => items.foreach(registerIds(_, base, reg))
    case _ =>
  }

  /** Keywords whose contents are instances, not schemas. */
  private val dataKeys = Set("enum", "const", "default", "examples")

  def fromJson(root: JValue, store: Store = Store()): Rule =
    fromPointer(root, "", store)

  /** Build the rule at JSON pointer `frag` of `root` while `$ref`s keep
    * resolving against the WHOLE document — the OpenAPI component shape:
    * `fromPointer(spec, "/components/schemas/Pet")` compiles one component
    * whose refs reach its siblings (reference `Schema.pm:260-326 get` +
    * resolve-before-validate contract). */
  /** The resolution context shared by [[fromPointer]] (rule building) and
    * [[propertyDefaults]] (default extraction): root-id validation,
    * `$id`/`$anchor` registration of the entry and store documents, and
    * `$ref`-target lookup. */
  private[rulepack] final class Resolver(root: JValue, store: Store) {
    // root id validation + entry base (reference Schema.pm id contract:
    // t/id-keyword-draft4.t "Fragment not allowed"/"Relative URL not
    // allowed")
    private val rootId = root match {
      case o: JObj => (o.get("$id") orElse o.get("id")).collect { case JStr(s) => s }
      case _       => None
    }
    rootId.foreach { s =>
      if (s.contains("#") && !s.endsWith("#"))
        throw new IllegalArgumentException(s"Fragment not allowed in root id: $s")
      if (!s.matches("^[A-Za-z][A-Za-z0-9+.\\-]*:.*"))
        throw new IllegalArgumentException(s"Relative URL not allowed as root id: $s")
    }
    val entryBase: String = rootId.map(s => stripFragment(s)).getOrElse("")

    // two-pass: register $id/$anchor subtrees of the entry document and of
    // every store document (each against its own base), THEN build
    private val reg = scala.collection.mutable.Map[String, JValue]()
    if (entryBase.nonEmpty) reg(entryBase) = root
    registerIds(root, entryBase, reg)
    for ((uri, doc) <- store.docs) {
      if (!reg.contains(stripFragment(uri))) reg(stripFragment(uri)) = doc
      registerIds(doc, stripFragment(uri), reg)
    }

    /** Document a base URI's fragment pointers resolve against: the
      * registered subtree for that base, the entry root for the anonymous
      * base. */
    private def docOf(base: String): JValue =
      if (base.isEmpty) root else reg.getOrElse(stripFragment(base), root)

    /** Resolve `uri` (as written in a `$ref`) against the OWNING schema's
      * base — returns the target plus the base its own refs resolve
      * against. */
    def resolveRef(uri: String, base: String): (JValue, String) = {
      val abs = joinUri(base, uri)
      val hashIdx = abs.indexOf('#')
      val (docUri, frag) =
        if (hashIdx < 0) (abs, "") else (abs.take(hashIdx), abs.drop(hashIdx + 1))
      val doc: Option[JValue] =
        if (docUri.isEmpty || docUri == entryBase) Some(docOf(docUri))
        else reg.get(docUri) orElse store.resolve(docUri)
      val target =
        if (frag.isEmpty || frag == "/") doc
        else if (frag.startsWith("/")) doc.flatMap(pointer(_, frag))
        else reg.get(s"$docUri#$frag") // $anchor / fragment-only-id lookup
      target.map((_, docUri))
        .getOrElse(throw new IllegalArgumentException(s"unresolvable \\$$ref: $uri (base '$base')"))
    }
  }

  def fromPointer(root: JValue, frag: String, store: Store = Store()): Rule = {
    val resolver = new Resolver(root, store)
    val entryBase = resolver.entryBase
    def resolveRef(uri: String, base: String): (JValue, String) = resolver.resolveRef(uri, base)

    /** `seen` maps an active `$ref`/`$recursiveRef` expansion to the
      * STRUCTURAL depth (levels of items/properties/contains descent — i.e.
      * data depth consumed) at which it was entered. Re-entering the same
      * ref at the same depth is a pure cycle (consumes no data, can never
      * terminate) → reject, as before. Re-entering DEEPER is productive
      * recursion (the 2019-09 `$recursiveRef` tree shape,
      * reference Draft201909.pm:24-68 + t/draft2019-09.t:25-36): unroll it —
      * a rule applies to a column whose static DataType has finite nesting,
      * so expansions past [[MaxStructuralDepth]] can never see data and
      * truncate to Always. (The reference follows refs lazily at runtime
      * with a seen-memo, Schema.pm:372-376; bounded unrolling is the
      * compile-time analog.) */
    def build(v: JValue, seen: Map[String, Int], depth: Int, base: String): Rule = v match {
      case JBool(true)  => Always
      case JBool(false) => Never
      case o: JObj      => buildObj(o, seen, depth, base)
      case other => throw new IllegalArgumentException(s"schema must be object or boolean, got ${other.render}")
    }

    def buildObj(o0: JObj, seen: Map[String, Int], depth: Int, base0: String): Rule = {
      // entering a subschema with its own (non-anchor) id rebases its refs
      val base = (o0.get("$id") orElse o0.get("id")).collect { case JStr(s) => s } match {
        case Some(s) if !s.startsWith("#") => stripFragment(joinUri(base0, s))
        case _                             => base0
      }
      val o = o0
      // same-depth sub-schemas: combinators and keywords that apply to the
      // SAME data value (no structural descent)
      def subRule(v: JValue, seen: Map[String, Int]): Rule = build(v, seen, depth, base)
      // one-level-deeper sub-schemas: items/properties/contains etc. descend
      // into the data, consuming one level of the column type's nesting
      def deepRule(v: JValue, seen: Map[String, Int]): Rule = build(v, seen, depth + 1, base)

      // $ref / $recursiveRef: siblings are merged like the reference's
      // _state ref-following (Schema.pm:353-364, Draft201909.pm:49-68 —
      // `$recursiveRef` is followed through the store exactly like `$ref`,
      // resolved against the enclosing base: "#" lands on the nearest
      // enclosing `$id` scope, t/draft2019-09.t:46-59 tree.json)
      (o.get("$ref") orElse o.get("$recursiveRef")) match {
        case Some(JStr(uri)) =>
          val refKey = joinUri(base, uri)
          seen.get(refKey) match {
            case Some(d) if d == depth =>
              throw new IllegalArgumentException(
                s"recursive \\$$ref cycle without structural descent: $uri")
            case Some(_) if depth >= MaxStructuralDepth =>
              return Always // deeper than any static column type can nest
            case _ =>
          }
          val (target, targetBase) = resolveRef(uri, base)
          val rest = JObj(o.fields.filterNot(f => f._1 == "$ref" || f._1 == "$recursiveRef"))
          val refRule = build(target, seen + (refKey -> depth), depth, targetBase)
          val restRule = if (rest.fields.exists(f => !metaKeys(f._1))) buildObj(rest, seen, depth, base) else Always
          return Rule.all(Seq(refRule, restRule).filter(_ != Always)) match {
            case All(Seq()) => Always
            case r          => r
          }
        case _ =>
      }

      val rules = Seq.newBuilder[Rule]

      o.get("type").foreach {
        case JStr(t)     => rules += TypeIs(Seq(t))
        case JArr(items) => rules += TypeIs(items.collect { case JStr(t) => t })
        case _           =>
      }
      o.get("enum").foreach { case JArr(items) => rules += Enum(items); case _ => }
      o.get("const").foreach(v => rules += Const(v))

      // numeric bounds — draft4 boolean-style exclusive* modifies the bound
      // (Draft4.pm:26-42); draft6+ numeric-style is its own bound
      // (Draft6.pm:47-69); both normalized here.
      val exMinB = o.get("exclusiveMinimum").contains(JBool(true))
      val exMaxB = o.get("exclusiveMaximum").contains(JBool(true))
      o.get("minimum").foreach { case n: JValue => numOf(n).foreach(d => rules += Minimum(d, exMinB)) }
      o.get("maximum").foreach { case n: JValue => numOf(n).foreach(d => rules += Maximum(d, exMaxB)) }
      o.get("exclusiveMinimum").foreach(n => numOf(n).foreach(d => rules += Minimum(d, exclusive = true)))
      o.get("exclusiveMaximum").foreach(n => numOf(n).foreach(d => rules += Maximum(d, exclusive = true)))
      o.get("multipleOf").foreach(n => numOf(n).foreach(d => rules += MultipleOf(d)))

      o.get("minLength").foreach(n => intOf(n).foreach(i => rules += MinLength(i)))
      o.get("maxLength").foreach(n => intOf(n).foreach(i => rules += MaxLength(i)))
      o.get("pattern").foreach { case JStr(p) => rules += Pattern(p); case _ => }
      o.get("format").foreach { case JStr(f) => rules += Format(f); case _ => }

      o.get("minItems").foreach(n => intOf(n).foreach(i => rules += MinItems(i)))
      o.get("maxItems").foreach(n => intOf(n).foreach(i => rules += MaxItems(i)))
      if (o.get("uniqueItems").exists(truthy)) rules += UniqueItems
      o.get("items").foreach {
        case JArr(schemas) =>
          val additional = o.get("additionalItems") match {
            case Some(JBool(false)) => None
            case Some(s)            => Some(deepRule(s, seen))
            case None               => Some(Always)
          }
          rules += TupleItems(schemas.map(deepRule(_, seen)), additional)
        case s => rules += Items(deepRule(s, seen))
      }
      o.get("contains").foreach { s =>
        val minC = o.get("minContains").flatMap(intOf)
        val maxC = o.get("maxContains").flatMap(intOf)
        rules += Contains(deepRule(s, seen), minC, maxC)
      }

      val propNames = o.get("properties") match {
        case Some(JObj(fields)) => fields.map(_._1)
        case _ => Vector.empty
      }
      val patternRes = o.get("patternProperties") match {
        case Some(JObj(fields)) => fields.map(_._1)
        case _ => Vector.empty
      }
      o.get("properties").foreach {
        case JObj(fields) => rules += Properties(fields.map { case (k, s) => k -> deepRule(s, seen) })
        case _ =>
      }
      o.get("patternProperties").foreach {
        case JObj(fields) => rules += PatternProperties(fields.map { case (k, s) => k -> deepRule(s, seen) })
        case _ =>
      }
      // required, modality-aware: the reference strips readOnly props from
      // `required` when validating requests and writeOnly props for
      // responses (OpenAPIv3.pm:367, 388) — here the demand is wrapped in a
      // Modal so it only applies in the direction the property may appear
      def flaggedProps(key: String): Set[String] = o.get("properties") match {
        case Some(JObj(fields)) =>
          fields.collect { case (k, po: JObj) if po.get(key).exists(truthy) => k }.toSet
        case _ => Set.empty
      }
      o.get("required").foreach {
        case JArr(items) =>
          val names = items.collect { case JStr(s) => s }
          val ro = flaggedProps("readOnly"); val wo = flaggedProps("writeOnly")
          val plain = names.filterNot(n => ro(n) || wo(n))
          if (plain.nonEmpty) rules += Required(plain)
          val roReq = names.filter(ro)
          if (roReq.nonEmpty) rules += Modal(Required(roReq), Response)
          val woReq = names.filter(wo)
          if (woReq.nonEmpty) rules += Modal(Required(woReq), Request)
        case _ =>
      }
      o.get("additionalProperties").foreach {
        case JBool(false) => rules += ClosedWorld(propNames, patternRes, None)
        case JBool(true)  =>
        case s            => rules += ClosedWorld(propNames, patternRes, Some(deepRule(s, seen)))
      }
      o.get("propertyNames").foreach(s => rules += PropertyNames(deepRule(s, seen)))
      o.get("minProperties").foreach(n => intOf(n).foreach(i => rules += MinProperties(i)))
      o.get("maxProperties").foreach(n => intOf(n).foreach(i => rules += MaxProperties(i)))

      // draft4/6/7 `dependencies` (array form = required, hash form = schema;
      // Draft4.pm:141-159) and the 2019-09 split keywords
      o.get("dependencies").foreach {
        case JObj(fields) =>
          val reqDeps = fields.collect { case (k, JArr(items)) => k -> items.collect { case JStr(s) => s }.toSeq }
          val schDeps = fields.collect { case (k, s: JObj) => k -> subRule(s, seen) }
          if (reqDeps.nonEmpty) rules += DependentRequired(reqDeps)
          if (schDeps.nonEmpty) rules += DependentSchemas(schDeps)
        case _ =>
      }
      o.get("dependentRequired").foreach {
        case JObj(fields) =>
          rules += DependentRequired(fields.map { case (k, JArr(items)) => k -> items.collect { case JStr(s) => s }.toSeq; case (k, _) => k -> Seq.empty[String] })
        case _ =>
      }
      o.get("dependentSchemas").foreach {
        case JObj(fields) => rules += DependentSchemas(fields.map { case (k, s) => k -> subRule(s, seen) })
        case _ =>
      }

      // engine extension keywords (x- prefix like OpenAPI extensions)
      o.get("x-discriminator").foreach {
        case d: JObj =>
          val field = d.get("propertyName").collect { case JStr(f) => f }
            .getOrElse(throw new IllegalArgumentException("x-discriminator needs propertyName"))
          val mapping = d.get("mapping") match {
            case Some(JObj(fields)) => fields.map { case (k, s) => k -> subRule(s, seen) }
            case _ => Vector.empty
          }
          rules += Discriminator(field, mapping, d.get("default").map(subRule(_, seen)))
        case _ =>
      }
      if (o.get("x-predicate").isDefined)
        throw new IllegalArgumentException(
          "x-predicate marks a code-defined rule; it cannot be reconstructed from JSON")

      o.get("not").foreach(s => rules += Not(subRule(s, seen)))
      o.get("allOf").foreach { case JArr(items) => rules += AllOf(items.map(subRule(_, seen))); case _ => }
      o.get("anyOf").foreach { case JArr(items) => rules += AnyOf(items.map(subRule(_, seen))); case _ => }
      o.get("oneOf").foreach { case JArr(items) => rules += OneOf(items.map(subRule(_, seen))); case _ => }
      o.get("if").foreach { condS =>
        rules += IfThenElse(subRule(condS, seen),
          o.get("then").map(subRule(_, seen)), o.get("else").map(subRule(_, seen)))
      }
      // OpenAPI modality: readOnly/writeOnly wrap the whole property schema
      // — constraints apply in one direction, presence in the other is
      // itself a violation (OpenAPIv3.pm:356-392)
      def modal(r: Rule): Rule =
        if (o.get("readOnly").exists(truthy)) Rule.readOnly(r)
        else if (o.get("writeOnly").exists(truthy)) Rule.writeOnly(r)
        else r

      if (o.get("nullable").exists(truthy)) {
        val inner = rules.result()
        return modal(Nullable(Rule.all(inner)))
      }

      modal(Rule.all(rules.result()))
    }

    val start = pointer(root, frag)
      .getOrElse(throw new IllegalArgumentException(s"no schema at pointer: $frag"))
    build(start, Map.empty, 0, entryBase)
  }

  /** Rule-pack linting — the analog of the reference validating a schema
    * against its meta-schema before use (`is_invalid`/`errors`,
    * Schema.pm:14-19, 89): structural problems are caught on the driver
    * before any job launches. Returns human-readable problems (empty =
    * clean). */
  def lint(rule: Rule): Seq[String] = {
    import graft.functions.Formats
    def walk(r: Rule, path: String): Seq[String] = r match {
      case Pattern(p) =>
        if (Formats.regexCompilable(p)) Nil else Seq(s"$path: uncompilable pattern: $p")
      case Format(f) =>
        if (Formats.registry.contains(f)) Nil
        else Seq(s"$path: unknown format '$f' (permissive registries pass it at runtime)")
      case All(rs) =>
        val bounds = rs.collect { case Minimum(v, _) => v }
        val maxes = rs.collect { case Maximum(v, _) => v }
        val conflict =
          for (lo <- bounds.maxOption; hi <- maxes.minOption if lo > hi)
            yield s"$path: minimum $lo > maximum $hi (never satisfiable)"
        conflict.toSeq ++ rs.flatMap(walk(_, path))
      case Enum(vs) if vs.isEmpty => Seq(s"$path: empty enum (never satisfiable)")
      case MinLength(n) if n < 0 => Seq(s"$path: negative minLength")
      case MinItems(n) if n < 0 => Seq(s"$path: negative minItems")
      case Properties(props) => props.flatMap { case (k, sub) => walk(sub, s"$path/$k") }
      case PatternProperties(props) =>
        props.flatMap { case (re, sub) =>
          (if (Formats.regexCompilable(re)) Nil else Seq(s"$path: uncompilable patternProperties regex: $re")) ++
            walk(sub, s"$path/<$re>")
        }
      case Items(sub) => walk(sub, s"$path/items")
      case TupleItems(rs, add) =>
        rs.zipWithIndex.flatMap { case (s, i) => walk(s, s"$path/items/$i") } ++
          add.toSeq.flatMap(walk(_, s"$path/additionalItems"))
      case Contains(sub, minC, maxC) =>
        (for (lo <- minC; hi <- maxC if lo > hi) yield s"$path: minContains $lo > maxContains $hi").toSeq ++
          walk(sub, s"$path/contains")
      case Not(sub) => walk(sub, s"$path/not")
      case AllOf(rs) => rs.zipWithIndex.flatMap { case (s, i) => walk(s, s"$path/allOf/$i") }
      case AnyOf(rs) => rs.zipWithIndex.flatMap { case (s, i) => walk(s, s"$path/anyOf/$i") }
      case OneOf(rs) => rs.zipWithIndex.flatMap { case (s, i) => walk(s, s"$path/oneOf/$i") }
      case IfThenElse(c, t, e) =>
        walk(c, s"$path/if") ++ t.toSeq.flatMap(walk(_, s"$path/then")) ++ e.toSeq.flatMap(walk(_, s"$path/else"))
      case Nullable(sub) => walk(sub, path)
      case Discriminator(_, mapping, default) =>
        mapping.flatMap { case (k, s) => walk(s, s"$path/x-discriminator/$k") } ++
          default.toSeq.flatMap(walk(_, s"$path/x-discriminator/default"))
      case DependentSchemas(deps) => deps.flatMap { case (k, s) => walk(s, s"$path/dependentSchemas/$k") }
      case _ => Nil
    }
    walk(rule, "")
  }

  /** Structural-depth budget for unrolling productive recursive refs —
    * deeper than any static Spark column type in practice; expansions past
    * it truncate to Always (they can never see data). */
  private val MaxStructuralDepth = 12

  /** Defaults declared on the root object's properties, `$ref`s followed —
    * the schema side of the reference's `coerce('defaults')`
    * (Schema.pm:752-755; t/coerce-default.t pins that defaults live behind
    * `$ref`s too). Feed the result to [[graft.core.Coerce.apply]] for the
    * non-mutating repaired projection (the engine's analog of the
    * reference's in-place `$data->{$k} = $default`). */
  def propertyDefaults(root: JValue, store: Store = Store()): Map[String, JValue] = {
    val resolver = new Resolver(root, store)
    def defaultOf(s: JValue, base: String, depth: Int): Option[JValue] = s match {
      case so: JObj =>
        so.get("default").orElse {
          (so.get("$ref") orElse so.get("$recursiveRef")) match {
            case Some(JStr(uri)) if depth < MaxStructuralDepth =>
              val (target, targetBase) = resolver.resolveRef(uri, base)
              defaultOf(target, targetBase, depth + 1)
            case _ => None
          }
        }
      case _ => None
    }
    root match {
      case o: JObj => o.get("properties") match {
        case Some(JObj(props)) =>
          props.flatMap { case (k, s) =>
            defaultOf(s, resolver.entryBase, 0).map(k -> _)
          }.toMap
        case _ => Map.empty
      }
      case _ => Map.empty
    }
  }

  /** Type-aware lint: walks the rule against a concrete row schema and
    * names every enum/const constant the compiler's typed-literal coercion
    * ([[graft.core.RuleCompiler.litOf]]) silently drops because its JSON
    * type family can never equal the column's type. This is the visible,
    * compile-time face of the documented deep-equality divergence from the
    * reference's `data_checksum` (Util.pm:27-29): a heterogeneous
    * `enum: [1, "x"]` against an int column quietly becomes `enum: [1]` —
    * correct for typed data, invisible without this warning. Run it next to
    * the untyped [[lint]] before launching jobs. */
  def lint(rule: Rule, schema: org.apache.spark.sql.types.StructType): Seq[String] = {
    import org.apache.spark.sql.types._
    import graft.core.RuleCompiler.litOf
    def walk(r: Rule, dt: DataType, path: String): Seq[String] = r match {
      case Enum(vs) =>
        vs.filter(v => v != JNull && litOf(v, dt).isEmpty).map(v =>
          s"$path: enum constant ${v.render} can never equal a ${dt.simpleString} value — dropped by typed equality")
      case Const(v) if v != JNull && litOf(v, dt).isEmpty =>
        Seq(s"$path: const ${v.render} can never equal a ${dt.simpleString} value — always fails on typed data")
      case Properties(props) => props.flatMap { case (k, sub) =>
        dt match {
          case st: StructType if st.fieldNames.contains(k) => walk(sub, st(k).dataType, s"$path/$k")
          case MapType(_, vt, _)                           => walk(sub, vt, s"$path/$k")
          case _                                           => Nil
        }
      }
      case PatternProperties(props) => dt match {
        case MapType(_, vt, _) => props.flatMap { case (re, sub) => walk(sub, vt, s"$path/<$re>") }
        case _                 => Nil // struct keys resolve at compile time
      }
      case Items(sub) => dt match {
        case ArrayType(et, _) => walk(sub, et, s"$path/items"); case _ => Nil
      }
      case TupleItems(rs, add) => dt match {
        case ArrayType(et, _) =>
          rs.zipWithIndex.flatMap { case (s, i) => walk(s, et, s"$path/items/$i") } ++
            add.toSeq.flatMap(walk(_, et, s"$path/additionalItems"))
        case _ => Nil
      }
      case Contains(sub, _, _) => dt match {
        case ArrayType(et, _) => walk(sub, et, s"$path/contains"); case _ => Nil
      }
      case All(rs)   => rs.flatMap(walk(_, dt, path))
      case AllOf(rs) => rs.zipWithIndex.flatMap { case (s, i) => walk(s, dt, s"$path/allOf/$i") }
      case AnyOf(rs) => rs.zipWithIndex.flatMap { case (s, i) => walk(s, dt, s"$path/anyOf/$i") }
      case OneOf(rs) => rs.zipWithIndex.flatMap { case (s, i) => walk(s, dt, s"$path/oneOf/$i") }
      case Not(s)    => walk(s, dt, s"$path/not")
      case IfThenElse(c, t, e) =>
        walk(c, dt, s"$path/if") ++ t.toSeq.flatMap(walk(_, dt, s"$path/then")) ++
          e.toSeq.flatMap(walk(_, dt, s"$path/else"))
      case Nullable(s)  => walk(s, dt, path)
      case Modal(s, _)  => walk(s, dt, path)
      case Discriminator(_, mapping, default) =>
        mapping.flatMap { case (k, s) => walk(s, dt, s"$path/x-discriminator/$k") } ++
          default.toSeq.flatMap(walk(_, dt, s"$path/x-discriminator/default"))
      case DependentSchemas(deps) => deps.flatMap { case (k, s) => walk(s, dt, s"$path/dependentSchemas/$k") }
      case ClosedWorld(_, _, Some(s)) => dt match {
        case MapType(_, vt, _) => walk(s, vt, s"$path/additionalProperties"); case _ => Nil
      }
      case _ => Nil
    }
    walk(rule, schema, "")
  }

  private val metaKeys = Set("$schema", "$id", "id", "$anchor", "$comment",
    "$recursiveAnchor", "$recursiveRef",
    "title", "description", "definitions", "$defs", "examples", "default",
    "then", "else", "minContains", "maxContains", "additionalItems")

  private def numOf(v: JValue): Option[Double] = v match {
    case JInt(i) => Some(i.toDouble)
    case JNum(d) => Some(d)
    case _       => None
  }
  private def intOf(v: JValue): Option[Int] = v match {
    case JInt(i) => Some(i.toInt)
    case JNum(d) if d == d.floor => Some(d.toInt)
    case _       => None
  }
  private def truthy(v: JValue): Boolean = v match {
    case JBool(b) => b
    case JInt(i)  => i != 0
    case _        => false
  }
}
