package graft.rulepack

import graft.SparkSuite
import graft.core._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Acceptance slice of the official JSON-Schema-Test-Suite (draft 4/6/7
  * keyword set), the layer-2 safety net the reference runs in
  * t/draft7-acceptance.t:9-24 — schema+instance pairs lifted through a
  * generic JSON→typed-column mapping and validated by the compiled rule.
  *
  * Cases whose instances cannot be represented as a typed Spark column
  * (heterogeneous arrays, empty objects) are cancelled at runtime with the
  * reason; semantically-divergent cases would go on [[todoSkip]] exactly
  * like the reference's todo list (currently empty — the slice passes
  * clean). */
class AcceptanceSpec extends SparkSuite {

  /** group description :: test description — expected divergences. */
  private val todoSkip: Set[String] = Set.empty

  /** JSON instance → typed Column; None = not representable relationally. */
  private def lift(v: JValue): Option[Column] = v match {
    case JNull        => Some(lit(null))
    case JBool(b)     => Some(lit(b))
    case JInt(i)      => Some(lit(i))
    case JNum(d)      => Some(lit(d))
    case JStr(s)      => Some(lit(s))
    case JArr(items)  =>
      val kinds = items.map {
        case _: JInt | _: JNum => "num"
        case _: JStr           => "str"
        case _: JBool          => "bool"
        case _: JArr           => "arr"
        case _: JObj           => "obj"
        case JNull             => "null"
      }.distinct.filterNot(_ == "null")
      if (kinds.length > 1) None // heterogeneous: no single Spark element type
      else {
        val lifted = items.map(lift)
        if (lifted.forall(_.isDefined)) Some(array(lifted.map(_.get): _*)) else None
      }
    case JObj(fields) =>
      if (fields.isEmpty) None // struct<> has no fields to type
      else {
        val cols = fields.map { case (k, sub) => lift(sub).map(_.as(k)) }
        if (cols.forall(_.isDefined)) Some(struct(cols.map(_.get): _*)) else None
      }
  }

  private def isValid(rule: Rule, data: JValue): Option[Boolean] =
    lift(data).map { c =>
      val df = spark.range(1).select(c.as("data"))
      val dt = df.schema("data").dataType
      df.select((size(RuleCompiler.compile(rule, dt, col("data"), lit(""))) === 0).as("ok"))
        .head().getBoolean(0)
    }

  private def loadSlice(resource: String): Seq[(String, JValue, Seq[(String, JValue, Boolean)])] = {
    val text = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream(resource), "UTF-8").mkString
    JValue.parse(text) match {
      case JArr(groups) => groups.map { case g: JObj =>
        val desc = g.get("description").collect { case JStr(s) => s }.get
        val schema = g.get("schema").get
        val tests = g.get("tests") match {
          case Some(JArr(ts)) => ts.map { case t: JObj =>
            (t.get("description").collect { case JStr(s) => s }.get,
              t.get("data").getOrElse(JNull),
              t.get("valid").contains(JBool(true)))
          case other => sys.error(s"bad test: $other")
          }
          case other => sys.error(s"bad tests: $other")
        }
        (desc, schema, tests)
      case other => sys.error(s"bad group: $other")
      }
      case other => sys.error(s"bad suite: $other")
    }
  }

  /** draft 4/6/7 keyword slice + the 2019-09 delta slice (minContains /
    * maxContains, dependentRequired / dependentSchemas, $anchor,
    * $recursiveRef — the keywords the reference exercises in
    * t/draft2019-09-acceptance.t, minus the groups on its own todo list). */
  private val suite: Seq[(String, JValue, Seq[(String, JValue, Boolean)])] =
    loadSlice("/jsonschema-suite/draft7-slice.json") ++
      loadSlice("/jsonschema-suite/draft2019-slice.json")

  private var executed = 0

  for ((gdesc, schema, tests) <- suite) {
    // one compiled rule per group (schemas compile once, like a real pack)
    lazy val rule = RulePack.fromJson(schema)
    for ((tdesc, data, expectValid) <- tests) {
      val name = s"$gdesc :: $tdesc"
      if (todoSkip.contains(name)) ignore(name) {}
      else test(name) {
        isValid(rule, data) match {
          case Some(got) =>
            executed += 1
            assert(got === expectValid,
              s"schema=${schema.render} data=${data.render} expected valid=$expectValid")
          case None => cancel("instance not representable as a typed column")
        }
      }
    }
  }

  test("acceptance slice actually exercised a substantial case count") {
    assert(suite.map(_._3.size).sum >= 200)
    assert(suite.exists(_._1.startsWith("2019-09")), "the 2019-09 delta slice must be loaded")
  }
}
