package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import java.util.regex.Pattern

/** OpenAPI v3 parameter style/explode DECODING as pure column expressions —
  * the data-processing half of the reference's request/response layer
  * (`OpenAPIv3.pm:148-253` `_coerce_parameter_style_*`; fixtures
  * `t/openapiv3-style-explode.t`). The HTTP routing around it stays out of
  * scope (SURVEY.md §2.11); what lands here is exactly the part a data
  * engine meets: a column of style-encoded parameter strings (an access
  * log, an events table) that must be decoded to typed arrays/maps before
  * rule validation.
  *
  * Semantics mirrored from the reference:
  *  - array styles (`OpenAPIv3.pm:161-180`): form/simple/space/pipe split
  *    on `,`/` `/`|`; explode wraps the single value; label strips a
  *    leading `.` then splits on `,` (non-explode) or `.`; matrix strips a
  *    leading `;name=` then splits on `,` (non-explode) or `;name=`.
  *    A value missing its prefix splits on the un-switched separator —
  *    same as the reference's conditional `s///` + split.
  *  - object styles (`OpenAPIv3.pm:182-211`): non-explode splits into an
  *    alternating `k,v,k,v` list (prefix required for label/matrix — a
  *    missing prefix yields NULL, the reference's "no coercion"); explode
  *    splits into `k=v` pieces on `.`/`;`/`,` (label/matrix/simple).
  *  - deepObject (`OpenAPIv3.pm:213-236`): `name[a][b]=v` query pairs
  *    become a map keyed by the bracket path joined with `.` — the flat
  *    column representation of the reference's nested hash (a static
  *    column type cannot nest dynamically; the path string is lossless).
  *
  * Perl `split` parity: trailing empty fields are dropped, so an empty
  * string decodes to an empty array/map (`t/openapiv3-style-explode.t`
  * `ff => ''` → `{}`), while interior empties survive.
  *
  * Everything is built from codegen'd built-ins (`split`, `filter`,
  * `transform`, `map_from_*`) — the decode rides the scan at 100 TB like
  * every other scan-rider in this engine; the arrays involved are
  * per-value tiny, so the interpreted HOF trim is bounded by the value
  * length, not the corpus.
  */
object ParamStyles {

  /** Default style per parameter location (`OpenAPIv3.pm:151-153`). */
  def defaultStyle(in: String): String = in match {
    case "query" | "cookie" => "form"
    case _                  => "simple" // header, path
  }

  /** Default explode per style (`OpenAPIv3.pm:163`, OpenAPI 3.0 table). */
  def defaultExplode(style: String): Boolean = style == "form"

  /** Perl-split parity: drop TRAILING empty fields (split with no LIMIT). */
  private def trimTrailingEmpty(arr: Column): Column = {
    val nTrail = aggregate(
      reverse(arr),
      struct(lit(0).as("n"), lit(true).as("go")),
      (acc, x) => struct(
        when(acc("go") && x === "", acc("n") + 1).otherwise(acc("n")).as("n"),
        (acc("go") && x === "").as("go")))("n")
    slice(arr, lit(1), size(arr) - nTrail)
  }

  private def rq(s: String): String = Pattern.quote(s)

  /** Decode one style-encoded string into `array<string>`
    * (`_coerce_parameter_style_array`, `OpenAPIv3.pm:161-180`). `name` is
    * only consulted by the matrix style. NULL in → NULL out. */
  def decodeStyleArray(c: Column, style: String, explode: Boolean, name: String = ""): Column =
    style match {
      case "form" | "simple" | "spaceDelimited" | "pipeDelimited" =>
        if (explode) array(c) // single slot: the reference wraps the value (:167)
        else {
          val re = style match {
            case "pipeDelimited"  => "\\|"
            case "spaceDelimited" => " "
            case _                => ","
          }
          trimTrailingEmpty(split(c, re))
        }
      case "label" =>
        val has = c.startsWith(".")
        val stripped = when(has, expr_substr(c, 2)).otherwise(c)
        if (explode) trimTrailingEmpty(split(stripped, "\\."))
        else when(has, trimTrailingEmpty(split(stripped, ",")))
          .otherwise(trimTrailingEmpty(split(stripped, "\\.")))
      case "matrix" =>
        val pfx = s";$name="
        val has = c.startsWith(pfx)
        val stripped = when(has, expr_substr(c, pfx.length + 1)).otherwise(c)
        if (explode) trimTrailingEmpty(split(stripped, rq(pfx)))
        else when(has, trimTrailingEmpty(split(stripped, ",")))
          .otherwise(trimTrailingEmpty(split(stripped, rq(pfx))))
      case other =>
        throw new IllegalArgumentException(s"unknown array style '$other'")
    }

  /** Decode one style-encoded string into `map<string,string>`
    * (`_coerce_parameter_style_object`, `OpenAPIv3.pm:182-211`).
    * Non-explode: alternating `k,v` list; label/matrix REQUIRE their
    * prefix (missing → NULL, the reference's undef return → no coercion).
    * Explode (label/matrix/simple): `k=v` pieces; a piece without `=`
    * gets value `''` (Mojo::Parameters parity). form+explode is the
    * HTTP-multi-pair case the reference handles outside the styles table —
    * NULL here too. An odd trailing key gets value `''`. */
  def decodeStyleObject(c: Column, style: String, explode: Boolean, name: String = ""): Column = {
    def kvMap(pieces: Column): Column =
      map_from_entries(transform(pieces, p => struct(
        substring_index(p, "=", 1).as("key"),
        when(p.contains("="), expr_substr_after_first(p, "=")).otherwise(lit("")).as("value"))))
    def pairedMap(arr: Column): Column = {
      val padded = when(size(arr) % 2 === 1, concat(arr, array(lit("")))).otherwise(arr)
      map_from_arrays(
        filter(padded, (_, i) => i % 2 === 0),
        filter(padded, (_, i) => i % 2 === 1))
    }
    val nullMap = lit(null).cast("map<string,string>")

    if (explode) style match {
      case "label" =>
        when(c.startsWith("."), kvMap(trimTrailingEmpty(split(expr_substr(c, 2), "\\."))))
          .otherwise(nullMap)
      case "matrix" =>
        when(c.startsWith(";"), kvMap(trimTrailingEmpty(split(expr_substr(c, 2), ";"))))
          .otherwise(nullMap)
      case "simple" =>
        kvMap(trimTrailingEmpty(split(c, ",")))
      case _ => nullMap // form-explode arrives as HTTP pairs, not one string (:186-189)
    } else {
      val re = style match {
        case "pipeDelimited"  => "\\|"
        case "spaceDelimited" => " "
        case "label"          => "\\."
        case _                => "," // form, matrix, simple
      }
      style match {
        case "label" =>
          when(c.startsWith("."), pairedMap(trimTrailingEmpty(split(expr_substr(c, 2), re))))
            .otherwise(nullMap)
        case "matrix" =>
          val pfx = s";$name="
          when(c.startsWith(pfx),
            pairedMap(trimTrailingEmpty(split(expr_substr(c, pfx.length + 1), re))))
            .otherwise(nullMap)
        case "form" | "simple" | "pipeDelimited" | "spaceDelimited" =>
          pairedMap(trimTrailingEmpty(split(c, re)))
        case other =>
          throw new IllegalArgumentException(s"unknown object style '$other'")
      }
    }
  }

  /** Decode a `deepObject` parameter out of a query-string column
    * (`_coerce_parameter_style_object_deep`, `OpenAPIv3.pm:213-236`):
    * pairs `name[a][b]=v` become `{'a.b': v}`. Pairs for other names are
    * ignored; no matching pairs → NULL (the reference flips `exists` off).
    * Percent-decoding is the caller's concern (as in the reference, which
    * receives decoded values from Mojo). */
  def decodeDeepObject(qs: Column, name: String): Column = {
    val pairs = split(qs, "&")
    val mine = filter(pairs, p => p.startsWith(s"$name["))
    val entries = transform(mine, { p =>
      val rawKey = substring_index(p, "=", 1)
      val path = regexp_replace(
        regexp_replace(rawKey, "^" + rq(name) + "\\[", ""),
        "\\]\\[", ".")
      struct(
        regexp_replace(path, "\\]$", "").as("key"),
        when(p.contains("="), expr_substr_after_first(p, "=")).otherwise(lit("")).as("value"))
    })
    when(size(mine) > 0, map_from_entries(entries))
      .otherwise(lit(null).cast("map<string,string>"))
  }

  /** `substring(c, pos)` to end-of-string (1-based, like SQL). */
  private def expr_substr(c: Column, pos: Int): Column =
    c.substr(lit(pos), length(c))

  /** Everything after the FIRST occurrence of `sep` (Mojo pair split). */
  private def expr_substr_after_first(c: Column, sep: String): Column =
    c.substr(instr(c, sep) + 1, length(c))
}
