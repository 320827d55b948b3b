package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** OpenAPI route TABLE operations — the data-processing half of the
  * reference's request layer (`OpenAPIv2.pm:120-145` `routes`,
  * `validate_request` dispatch): match a corpus of (method, path) request
  * rows against a spec's path templates, most-specific route first, and
  * extract the `{placeholder}` path parameters.
  *
  * Spark-first shape: the route table is spec-sized (tens of rows), so
  * matching compiles to ONE `coalesce(when(rlike)...)` chain over the
  * reference-sorted templates — pure codegen'd projections riding the
  * scan, zero joins, zero UDFs. Param extraction is `regexp_extract`
  * against the same anchored pattern. At 10¹² request rows the plan is a
  * single narrow map stage.
  *
  * Route precedence mirrors `OpenAPIv2.pm:120-131` exactly: weight = the
  * digit string built per '/'-segment ('0' for a `{placeholder}` segment,
  * '1' otherwise, prefixed "1"), compared numerically descending, ties by
  * path ascending — static segments outrank placeholders at the same
  * depth, deeper paths outrank shallow ones.
  */
object Routes {

  /** One spec route: `method` (case-insensitive), `path` template with
    * `{name}` placeholders, optional operationId. */
  final case class Route(method: String, path: String, operationId: String = null)

  /** The reference's sort weight as its digit STRING (numeric compare ==
    * (length, lexicographic) compare for all-digit strings, and a string
    * never overflows on deep paths). `OpenAPIv2.pm:124-126` parity: Perl's
    * `split '/'` keeps the leading empty segment and drops trailing ones —
    * `String.split` with limit 0 does the same, except on "" where Perl
    * yields no fields. */
  def weight(path: String): String = {
    val segs = if (path.isEmpty) Array.empty[String] else path.split("/")
    "1" + segs.map(s => if (s.startsWith("{")) '0' else '1').mkString
  }

  private def weightKey(w: String): (Int, String) = (-w.length, w)

  /** Routes in the reference's dispatch order (`OpenAPIv2.pm:128-143`):
    * weight numerically DESC, path ASC, method ASC within a path. Numeric
    * desc on digit strings = (length desc, string desc). */
  def sortedRoutes(routes: Seq[Route]): Seq[Route] =
    routes.sortWith { (a, b) =>
      val (wa, wb) = (weight(a.path), weight(b.path))
      if (wa.length != wb.length) wa.length > wb.length
      else if (wa != wb) wa > wb
      else if (a.path != b.path) a.path < b.path
      else a.method < b.method
    }

  /** `{name}` placeholder names of a template, in order. */
  def paramNames(template: String): Seq[String] =
    "\\{([^}]+)\\}".r.findAllMatchIn(template).map(_.group(1)).toSeq

  /** Anchored Java/RE2 pattern for a template: literal segments quoted,
    * each `{name}` segment becomes a `([^/]+)` capture group. */
  def templateRegex(template: String): String = {
    val segs = template.split("/", -1)
    "^" + segs.map { s =>
      if (s.startsWith("{") && s.endsWith("}")) "([^/]+)"
      else if (s.isEmpty) ""
      else java.util.regex.Pattern.quote(s)
    }.mkString("/") + "$"
  }

  /** First-match-wins route dispatch: appends `route_method`, `route_path`,
    * `operation_id` and `params` (map of placeholder name → matched
    * segment) to `df`; all four are NULL for requests no route matches —
    * the "no route" violation is a `route_path IS NULL` filter away.
    * Method compare is case-insensitive (HTTP methods arrive upper-case,
    * specs write them lower-case). */
  def matchRoutes(df: DataFrame, methodCol: String, pathCol: String,
      routes: Seq[Route]): DataFrame = {
    require(routes.nonEmpty, "matchRoutes needs at least one route")
    val p = col(pathCol)
    val m = lower(col(methodCol))
    val branches = sortedRoutes(routes).map { r =>
      val re = templateRegex(r.path)
      val names = paramNames(r.path)
      val params =
        if (names.isEmpty) map().cast("map<string,string>")
        else map(names.zipWithIndex.flatMap { case (n, i) =>
          Seq(lit(n), regexp_extract(p, re, i + 1))
        }: _*)
      when(m === lit(r.method.toLowerCase) && p.rlike(re),
        struct(lit(r.method).as("route_method"), lit(r.path).as("route_path"),
          (if (r.operationId == null) lit(null).cast("string")
           else lit(r.operationId)).as("operation_id"),
          params.as("params")))
    }
    df.withColumn("__route", coalesce(branches: _*))
      .withColumn("route_method", col("__route.route_method"))
      .withColumn("route_path", col("__route.route_path"))
      .withColumn("operation_id", col("__route.operation_id"))
      .withColumn("params", col("__route.params"))
      .drop("__route")
  }

  /** Canonical `k=v` rendering of the params map, keys sorted — the
    * deterministic cross-engine form the oracle gate compares. */
  def paramsCanonical(params: Column): Column =
    array_join(sort_array(transform(map_entries(params),
      e => concat(e.getField("key"), lit("="), e.getField("value")))), ",")
}
