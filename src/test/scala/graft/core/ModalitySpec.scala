package graft.core

import graft.SparkSuite
import graft.core.Rule._
import org.apache.spark.sql.functions.col

/** OpenAPI modality (readOnly/writeOnly) and collectionFormat splitting
  * (reference OpenAPIv2.pm:245-256, 401-408; OpenAPIv3.pm:356-396). */
class ModalitySpec extends SparkSuite {
  import spark.implicits._

  test("readOnly rules skip request validation, apply to responses") {
    // id is server-assigned (readOnly): requests may omit it, responses must
    // have it — the presence demand is a Modal(Required) at row level
    // (property sub-rules skip absent/null fields by design)
    val rule = All(Seq(
      Properties(Seq("name" -> TypeIs(Seq("string")))),
      Modal(Required(Seq("id")), Response)))
    val requestRow = Seq((Some("x"), Option.empty[Int])).toDF("name", "id")
    val reqCtx = RuleCompiler.Ctx(direction = Request)
    val respCtx = RuleCompiler.Ctx(direction = Response)
    assert(Violations.validate(requestRow, rule, Seq(), reqCtx).count() === 0)
    assert(Violations.validate(requestRow, rule, Seq(), respCtx).count() === 1)
    // direction Both applies everything
    assert(Violations.validate(requestRow, rule, Seq()).count() === 1)
  }

  test("collectionFormat splits csv/ssv/tsv/pipes (OpenAPIv2.pm:245-256)") {
    val df = Seq(("a,b,c", "a b c", "a\tb\tc", "a|b|c")).toDF("csv", "ssv", "tsv", "pipes")
    val out = df.select(
      Coerce.splitCollection(col("csv"), "csv").as("c"),
      Coerce.splitCollection(col("ssv"), "ssv").as("s"),
      Coerce.splitCollection(col("tsv"), "tsv").as("t"),
      Coerce.splitCollection(col("pipes"), "pipes").as("p")).head()
    (0 to 3).foreach(i => assert(out.getSeq[String](i) === Seq("a", "b", "c")))
    assertThrows[IllegalArgumentException](Coerce.splitCollection(col("csv"), "nope"))
  }

  test("split collection feeds array rules end-to-end") {
    val df = Seq("NW,SE,NW").toDF("dirs")
      .select(Coerce.splitCollection(col("dirs"), "csv").as("value"))
    val rule = All(Seq(Items(Enum(Seq(JStr("NW"), JStr("NE"), JStr("SW"), JStr("SE")))), UniqueItems))
    val v = Violations.validateColumn(df, rule, "value", Seq())
    assert(v.select("rule_id").as[String].collect().toSeq === Seq("uniqueItems"))
  }
}
