package graft.core

import graft.SparkSuite
import graft.functions.ParamStyles
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Style/explode decode parity with the reference's own fixtures
  * (`t/openapiv3-style-explode.t`) — every expectation below is a literal
  * case from that file, evaluated through the column decoders. */
class ParamStylesSpec extends SparkSuite {
  import spark.implicits._

  private def arr(v: String, style: String, explode: Boolean, name: String = "id"): Seq[String] = {
    val c: Column = ParamStyles.decodeStyleArray(col("v"), style, explode, name)
    Seq(v).toDF("v").select(c.as("out")).head().getSeq[String](0)
  }

  private def obj(v: String, style: String, explode: Boolean, name: String = "id"): Option[Map[String, String]] = {
    val c: Column = ParamStyles.decodeStyleObject(col("v"), style, explode, name)
    val row = Seq(v).toDF("v").select(c.as("out")).head()
    if (row.isNullAt(0)) None else Some(row.getMap[String, String](0).toMap)
  }

  test("array label: '.3,4,5' → [3,4,5]; no-prefix '5' → [5]") {
    assert(arr(".3,4,5", "label", explode = false) == Seq("3", "4", "5"))
    assert(arr("5", "label", explode = false) == Seq("5"))
  }

  test("array label explode: '.3.4.5' → [3,4,5]; '.5' → [5]") {
    assert(arr(".3.4.5", "label", explode = true) == Seq("3", "4", "5"))
    assert(arr(".5", "label", explode = true) == Seq("5"))
  }

  test("array matrix: ';id=3,4,5' → [3,4,5]; ';id=5' → [5]") {
    assert(arr(";id=3,4,5", "matrix", explode = false) == Seq("3", "4", "5"))
    assert(arr(";id=5", "matrix", explode = false) == Seq("5"))
  }

  test("array matrix explode: ';id=3;id=4;id=5' → [3,4,5]; ';id=5' → [5]") {
    assert(arr(";id=3;id=4;id=5", "matrix", explode = true) == Seq("3", "4", "5"))
    assert(arr(";id=5", "matrix", explode = true) == Seq("5"))
  }

  test("array simple: '10,20' → [10,20]; '10' → [10]") {
    assert(arr("10,20", "simple", explode = false) == Seq("10", "20"))
    assert(arr("10", "simple", explode = false) == Seq("10"))
  }

  test("array form explode wraps the single slot; pipe/space split") {
    assert(arr("1.3", "form", explode = true) == Seq("1.3"))
    assert(arr("1|2|3", "pipeDelimited", explode = false) == Seq("1", "2", "3"))
    assert(arr("2 3 4", "spaceDelimited", explode = false) == Seq("2", "3", "4"))
  }

  test("object label: '.category.bird.name.birdy' → {category: bird, name: birdy}") {
    assert(obj(".category.bird.name.birdy", "label", explode = false)
      .contains(Map("category" -> "bird", "name" -> "birdy")))
  }

  test("object label explode: '.category=bird.name=birdy'") {
    assert(obj(".category=bird.name=birdy", "label", explode = true)
      .contains(Map("category" -> "bird", "name" -> "birdy")))
  }

  test("object matrix: ';id=category,bird,name,birdy'") {
    assert(obj(";id=category,bird,name,birdy", "matrix", explode = false)
      .contains(Map("category" -> "bird", "name" -> "birdy")))
  }

  test("object matrix explode: ';category=bird;name=birdy'") {
    assert(obj(";category=bird;name=birdy", "matrix", explode = true)
      .contains(Map("category" -> "bird", "name" -> "birdy")))
  }

  test("object simple both explodes (t: /object/simple{,/explode})") {
    assert(obj("category,bird,name,birdy", "simple", explode = false)
      .contains(Map("category" -> "bird", "name" -> "birdy")))
    assert(obj("category=bird,name=birdy", "simple", explode = true)
      .contains(Map("category" -> "bird", "name" -> "birdy")))
  }

  test("object form/pipe/space non-explode pair lists (t: /object/query ff/pf/sf)") {
    assert(obj("name,birdy,age,1", "form", explode = false)
      .contains(Map("name" -> "birdy", "age" -> "1")))
    assert(obj("name|birdy|age|2", "pipeDelimited", explode = false)
      .contains(Map("name" -> "birdy", "age" -> "2")))
    assert(obj("name birdy age 3", "spaceDelimited", explode = false)
      .contains(Map("name" -> "birdy", "age" -> "3")))
  }

  test("empty value decodes to empty map/array (Perl split parity, ff='' → {})") {
    assert(obj("", "form", explode = false).contains(Map.empty[String, String]))
    assert(arr("", "form", explode = false) == Seq.empty)
  }

  test("missing label/matrix prefix on an OBJECT → NULL (reference: no coercion)") {
    assert(obj("category,bird", "matrix", explode = false).isEmpty)
    assert(obj("category.bird", "label", explode = false).isEmpty)
    assert(obj("x=1", "matrix", explode = true).isEmpty)
  }

  test("odd pair list pads the trailing key with ''") {
    assert(obj("a,1,b", "form", explode = false).contains(Map("a" -> "1", "b" -> "")))
    assert(obj(".k1=v1.k2", "label", explode = true)
      .contains(Map("k1" -> "v1", "k2" -> "")))
  }

  test("deepObject: 'do[name]=birdy&do[birth-date][gte]=1970-01-01' paths join with '.'") {
    val out = Seq("do[name]=birdy&do[birth-date][gte]=1970-01-01&other=x")
      .toDF("v")
      .select(ParamStyles.decodeDeepObject(col("v"), "do").as("m"))
      .head().getMap[String, String](0).toMap
    assert(out == Map("name" -> "birdy", "birth-date.gte" -> "1970-01-01"))
  }

  test("deepObject: numeric path segments stay positional ('do[numbers][0]=4')") {
    val out = Seq("do[numbers][0]=4&do[numbers][1]=2")
      .toDF("v")
      .select(ParamStyles.decodeDeepObject(col("v"), "do").as("m"))
      .head().getMap[String, String](0).toMap
    assert(out == Map("numbers.0" -> "4", "numbers.1" -> "2"))
  }

  test("deepObject: no matching pairs → NULL (reference flips exists off)") {
    val row = Seq("other=x&also[k]=v").toDF("v")
      .select(ParamStyles.decodeDeepObject(col("v"), "do").as("m")).head()
    assert(row.isNullAt(0))
  }

  test("defaults: query/cookie → form(+explode), path/header → simple(no explode)") {
    assert(ParamStyles.defaultStyle("query") == "form" && ParamStyles.defaultExplode("form"))
    assert(ParamStyles.defaultStyle("path") == "simple" && !ParamStyles.defaultExplode("simple"))
    assert(ParamStyles.defaultStyle("cookie") == "form")
    assert(ParamStyles.defaultStyle("header") == "simple")
  }

  test("interior empty fields survive; only trailing are dropped (Perl split)") {
    assert(arr("a,,b", "form", explode = false) == Seq("a", "", "b"))
    assert(arr("a,b,,", "form", explode = false) == Seq("a", "b"))
  }
}
