package graft.stats

import graft.core.Rule
import graft.core.Rule._
import graft.core.{JValue, JStr, JNum}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Rule-pack INFERENCE: profile a table once and propose the conservative
  * pack that describes it — the inverse of validation, and the way a new
  * corpus gets its first pack without hand-writing one. (The reference
  * consumes packs; an engine that owns the corpus can also derive them —
  * SURVEY §2.7's stats surface turned generative.)
  *
  *  - JSON type comes from the Spark schema (static, free);
  *  - `required` from a zero null count;
  *  - numeric columns get observed `[min, max]` bounds;
  *  - low-cardinality string columns (distinct ≤ `enumThreshold`) become
  *    enums of their sorted observed values.
  *
  * Everything derives from ONE aggregation pass over the table (all
  * columns' aggregates in a single global agg — partial-aggregated,
  * counters-only shuffle, same shape as [[ColumnStats.profile]]). The
  * exact distinct count is the one non-sketch aggregate; at 10¹²-row scale
  * swap it for `approx_count_distinct` and treat the enum decision as
  * advisory (documented trade — the profile artifact is identical in
  * shape).
  *
  * LAW (spec-pinned): the inferred pack validates its own corpus with
  * ZERO violations — inference is conservative by construction. */
object PackInference {

  /** The oracle-checkable profile artifact, one row per column:
    * `(column, json_type, n_null, n_distinct, min_num, max_num,
    * enum_vals)` — `enum_vals` a comma-joined sorted value list when the
    * column qualifies for an enum, else NULL. */
  def inferredProfile(df: DataFrame, cols: Seq[String],
      enumThreshold: Int = 16): DataFrame = {
    val total = count(lit(1))
    val aggs = cols.flatMap { c =>
      val dt = df.schema(c).dataType
      val numeric = dt.isInstanceOf[NumericType]
      Seq(
        (total - count(col(c))).as(s"${c}__nnull"),
        count_distinct(col(c)).as(s"${c}__ndist"),
        (if (numeric) min(col(c)).cast("double") else lit(null).cast("double")).as(s"${c}__min"),
        (if (numeric) max(col(c)).cast("double") else lit(null).cast("double")).as(s"${c}__max"),
        (if (dt.isInstanceOf[StringType])
          concat_ws(",", sort_array(collect_set(col(c))))
        else lit(null).cast("string")).as(s"${c}__vals"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val perCol = cols.map { c =>
      val jt = graft.core.RuleCompiler.jsonTypeOf(df.schema(c).dataType)
      struct(lit(c).as("column"), lit(jt).as("json_type"),
        col(s"${c}__nnull").as("n_null"), col(s"${c}__ndist").as("n_distinct"),
        col(s"${c}__min").as("min_num"), col(s"${c}__max").as("max_num"),
        when(lit(jt) === "string" && col(s"${c}__ndist") <= enumThreshold,
          col(s"${c}__vals")).otherwise(lit(null).cast("string")).as("enum_vals"))
    }
    row.select(explode(array(perCol: _*)).as("p")).select("p.*")
  }

  /** Robust numeric bounds for inference: exact percentiles at
    * `(loQ, hiQ)` instead of min/max — one corrupted outlier row cannot
    * stretch the inferred range to cover future garbage (the min/max pack
    * would accept anything between the corpse and the corpus). Exact R-7
    * `percentile` here (oracle-matchable, same as v24); at 10¹²-row scale
    * swap in `percentile_approx` — the artifact shape is identical.
    * Output one row per column: `(column, lo, hi)`. */
  def robustBounds(df: DataFrame, cols: Seq[String],
      loQ: Double = 0.001, hiQ: Double = 0.999): DataFrame = {
    require(cols.nonEmpty && cols.forall(c =>
      df.schema(c).dataType.isInstanceOf[NumericType]), "numeric columns only")
    val aggs = cols.flatMap(c => Seq(
      expr(s"percentile($c, ${loQ}D)").as(s"${c}__lo"),
      expr(s"percentile($c, ${hiQ}D)").as(s"${c}__hi")))
    val row = df.agg(aggs.head, aggs.tail: _*)
    val perCol = cols.map(c => struct(lit(c).as("column"),
      col(s"${c}__lo").as("lo"), col(s"${c}__hi").as("hi")))
    row.select(explode(array(perCol: _*)).as("p")).select("p.*")
  }

  /** [[infer]] with robust percentile bounds on the numeric columns
    * (everything else identical): the drift-tolerant pack a production
    * corpus should start from when single-row corruption is a risk. */
  def inferRobust(df: DataFrame, cols: Seq[String], enumThreshold: Int = 16,
      loQ: Double = 0.001, hiQ: Double = 0.999): Rule = {
    val numCols = cols.filter(c => df.schema(c).dataType.isInstanceOf[NumericType])
    val bounds = robustBounds(df, numCols, loQ, hiQ).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    def patch(r: Rule, c: String): Rule = r match {
      case All(parts) => All(parts.map(p => patch(p, c)))
      case Minimum(_, e) => Minimum(bounds(c)._1, e)
      case Maximum(_, e) => Maximum(bounds(c)._2, e)
      case other => other
    }
    infer(df, cols, enumThreshold) match {
      case All(parts) => All(parts.map {
        case Properties(props) => Properties(props.map { case (c, r) =>
          c -> (if (bounds.contains(c)) patch(r, c) else r) })
        case other => other
      })
      case other => other
    }
  }

  /** Build the pack from a collected profile. The collect touches one row
    * per COLUMN (never data rows) — the same driver-side footprint as
    * reading a schema. */
  def infer(df: DataFrame, cols: Seq[String], enumThreshold: Int = 16): Rule = {
    val profile = inferredProfile(df, cols, enumThreshold).collect()
      .map(r => r.getString(0) -> r).toMap
    val props: Seq[(String, Rule)] = cols.map { c =>
      val r = profile(c)
      val jt = r.getString(1)
      val parts = Seq(TypeIs(Seq(jt))) ++
        (if (!r.isNullAt(4)) Seq(Minimum(r.getDouble(4)), Maximum(r.getDouble(5))) else Nil) ++
        (if (!r.isNullAt(6)) Seq(Enum(r.getString(6).split(",").toSeq.map(v => JStr(v): JValue))) else Nil)
      c -> (if (parts.size == 1) parts.head else All(parts))
    }
    val required = cols.filter(c => profile(c).getLong(2) == 0L)
    All(Seq(Properties(props)) ++
      (if (required.nonEmpty) Seq(Required(required)) else Nil))
  }
}
