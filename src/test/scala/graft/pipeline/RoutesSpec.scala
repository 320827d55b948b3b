package graft.pipeline

import graft.SparkSuite
import org.apache.spark.sql.functions._

class RoutesSpec extends SparkSuite {
  import spark.implicits._

  private val routes = Seq(
    Routes.Route("get", "/pets/{petId}", "getPet"),
    Routes.Route("get", "/pets/mine", "myPets"),
    Routes.Route("post", "/pets", "createPet"),
    Routes.Route("get", "/pets/{petId}/photos/{photoId}", "getPhoto"),
    Routes.Route("get", "/health"))

  test("weight mirrors the reference's digit-string construction") {
    // OpenAPIv2.pm:124-126 — leading empty segment kept, '{' segments 0
    assert(Routes.weight("/pets/{petId}") === "1110")
    assert(Routes.weight("/pets/mine") === "1111")
    assert(Routes.weight("/pets/{petId}/photos/{photoId}") === "111010")
    // Perl strips ALL trailing empty fields: split '/', '/' is () — both
    // engines agree the bare-root weight is just the "1" prefix
    assert(Routes.weight("/") === "1")
    assert(Routes.weight("") === "1")
    assert(Routes.weight("/pets/") === "111")
  }

  test("sortedRoutes: weight desc (static beats placeholder), path asc, method asc") {
    val sorted = Routes.sortedRoutes(routes).map(r => (r.method, r.path))
    // deepest path first (longest digit string), then static-over-template
    assert(sorted.head === (("get", "/pets/{petId}/photos/{photoId}")))
    assert(sorted.indexOf(("get", "/pets/mine")) < sorted.indexOf(("get", "/pets/{petId}")))
    // same weight ("/health" 11 vs "/pets" 11): path ascending
    assert(sorted.indexOf(("get", "/health")) < sorted.indexOf(("post", "/pets")))
  }

  test("sortedRoutes reproduces t/openapiv2-routes.t's expected order verbatim") {
    // the reference's own 13-route fixture (t/openapiv2-routes.t:8-42),
    // exercising every tiebreak: depth, static-vs-placeholder at each
    // position, and path-ascending among equal weights
    val fixture = Seq(
      Routes.Route("get", "/a1"),
      Routes.Route("post", "/a1/bbbbbbb2/{c3}"),
      Routes.Route("put", "/a1/bbbbbbbbbbbbbbbbbbbb2/{ccc3}"),
      Routes.Route("get", "/a1/xxxxxxxxx/{ccc3}"),
      Routes.Route("post", "/a1/{b2}/{ccc3}/{d4}"),
      Routes.Route("get", "/a1/{bb2}/{c3}/d"),
      Routes.Route("put", "/a1/{bb2}/{ccc3}/{dddd4}/{e5}"),
      Routes.Route("get", "/a1/{bbbb2}/{cc3}"),
      Routes.Route("post", "/aa1/bbb2/{c3}"),
      Routes.Route("get", "/aaa1/bb2"),
      Routes.Route("put", "/aaa2"),
      Routes.Route("get", "/{aaa1}/{bb2}/{ccc3}"),
      Routes.Route("delete", "/{x}"))
    val expected = Seq(
      "/a1/{bb2}/{ccc3}/{dddd4}/{e5}",
      "/a1/{bb2}/{c3}/d",
      "/a1/{b2}/{ccc3}/{d4}",
      "/a1/bbbbbbb2/{c3}",
      "/a1/bbbbbbbbbbbbbbbbbbbb2/{ccc3}",
      "/a1/xxxxxxxxx/{ccc3}",
      "/aa1/bbb2/{c3}",
      "/a1/{bbbb2}/{cc3}",
      "/{aaa1}/{bb2}/{ccc3}",
      "/aaa1/bb2",
      "/a1",
      "/aaa2",
      "/{x}")
    assert(Routes.sortedRoutes(fixture).map(_.path) === expected)
  }

  test("matchRoutes: precedence, extraction, method case, unmatched → nulls") {
    val req = Seq(
      (1L, "GET", "/pets/42"),
      (2L, "GET", "/pets/mine"),        // static must win over {petId}
      (3L, "POST", "/pets"),
      (4L, "GET", "/pets/7/photos/9"),
      (5L, "DELETE", "/pets/42"),       // method mismatch → no route
      (6L, "GET", "/stores/1"),         // no template → no route
      (7L, "get", "/health")            // lower-case method still matches
    ).toDF("id", "method", "path")
    val got = Routes.matchRoutes(req, "method", "path", routes)
      .select(col("id"), col("route_path"), col("operation_id"),
        Routes.paramsCanonical(col("params")).as("p"))
      .as[(Long, String, String, String)].collect().sortBy(_._1)
    assert(got(0) === ((1L, "/pets/{petId}", "getPet", "petId=42")))
    assert(got(1) === ((2L, "/pets/mine", "myPets", "")))
    assert(got(2) === ((3L, "/pets", "createPet", "")))
    assert(got(3) === ((4L, "/pets/{petId}/photos/{photoId}", "getPhoto",
      "petId=7,photoId=9")))
    assert(got(4) === ((5L, null, null, null)))
    assert(got(5) === ((6L, null, null, null)))
    assert(got(6) === ((7L, "/health", null, "")))
  }

  test("a placeholder never swallows a slash; literal segments are regex-quoted") {
    val r = Seq(Routes.Route("get", "/a.b/{x}"))
    val req = Seq((1L, "GET", "/a.b/1"), (2L, "GET", "/aXb/1"),
      (3L, "GET", "/a.b/1/2")).toDF("id", "method", "path")
    val got = Routes.matchRoutes(req, "method", "path", r)
      .select(col("id"), col("route_path"))
      .as[(Long, String)].collect().sortBy(_._1)
    assert(got(0)._2 === "/a.b/{x}")   // literal dot matches itself
    assert(got(1)._2 === null)         // quoted dot is NOT a regex wildcard
    assert(got(2)._2 === null)         // {x} stops at '/'
  }

  test("matchRoutes is a pure projection: no join or exchange in the plan") {
    val req = Seq((1L, "GET", "/pets/42")).toDF("id", "method", "path")
    val plan = Routes.matchRoutes(req, "method", "path", routes)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"), plan)
  }
}
