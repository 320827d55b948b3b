package graft.stats

import graft.core.Rule
import graft.core.Rule._
import graft.core.{JValue, JStr, JArr}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Rule-pack INFERENCE: profile a table and propose the conservative
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
  * Two aggregation passes, both partial-aggregated counter shuffles (same
  * shape as [[ColumnStats.profile]]):
  *   1. counters only (null/distinct counts, numeric min/max) — NO value
  *      collection, so a high-cardinality text/URL column costs a fixed
  *      HLL-or-counter buffer, never a value set;
  *   2. `collect_set` ONLY for the string columns pass 1 proved are at or
  *      under `enumThreshold` distinct values — every collected set is
  *      bounded by the threshold, so the second pass's buffers are tiny
  *      by construction.
  * Each driver-side collect touches ONE row (the global aggregate row) —
  * the same footprint as reading a schema.
  *
  * `sketch = true` is the 10¹²-row form: pass 1's exact `count_distinct`
  * becomes `approx_count_distinct` (HLL++, fixed-size buffer). The HLL
  * estimate only GATES pass 2 (widened by the sketch's error margin);
  * pass 2 re-applies the exact threshold to the collected set, so the
  * emitted enum is identical to the exact path unless the HLL error
  * exceeds the widened slack. Numeric min/max stay exact counters in both
  * modes, so the LAW below holds for sketch mode too; only the artifact's
  * `n_distinct` column becomes an estimate.
  *
  * Enum values travel as a JSON-rendered array (`["de","en"]`) in the
  * profile artifact — unambiguous for values containing commas, quotes,
  * or any other delimiter — and [[infer]] builds `Rule.Enum` from the
  * collected array directly, never by re-splitting a joined string.
  *
  * LAW (spec-pinned): the inferred pack validates its own corpus with
  * ZERO violations — inference is conservative by construction. */
object PackInference {

  private case class ColProfile(name: String, jsonType: String, nNull: Long,
      nDistinct: Long, minNum: Option[Double], maxNum: Option[Double],
      enumVals: Option[Seq[String]])

  private def profileCols(df: DataFrame, cols: Seq[String],
      enumThreshold: Int, sketch: Boolean): Seq[ColProfile] = {
    val schema = df.schema
    val total = count(lit(1))
    val aggs1 = cols.flatMap { c =>
      val dt = schema(c).dataType
      val numeric = dt.isInstanceOf[NumericType]
      Seq(
        (total - count(col(c))).as(s"${c}__nnull"),
        (if (sketch) approx_count_distinct(col(c)) else count_distinct(col(c)))
          .as(s"${c}__ndist"),
        (if (numeric) min(col(c)).cast("double") else lit(null).cast("double")).as(s"${c}__min"),
        (if (numeric) max(col(c)).cast("double") else lit(null).cast("double")).as(s"${c}__max"))
    }
    val r1 = df.agg(aggs1.head, aggs1.tail: _*).head()
    def lng(n: String) = r1.getLong(r1.fieldIndex(n))
    def dbl(n: String) =
      if (r1.isNullAt(r1.fieldIndex(n))) None else Some(r1.getDouble(r1.fieldIndex(n)))
    // enum candidates: string columns within the threshold per pass 1.
    // HLL++'s default relative error is 5%; widen the gate so a true
    // ≤-threshold column is never dropped by estimate noise — pass 2
    // applies the exact threshold to the actual set either way
    val slack = if (sketch) math.ceil(enumThreshold * 1.1).toLong + 4 else enumThreshold.toLong
    val candidates = cols.filter(c =>
      schema(c).dataType.isInstanceOf[StringType] && lng(s"${c}__ndist") <= slack)
    val enumSets: Map[String, Seq[String]] =
      if (candidates.isEmpty) Map.empty
      else {
        val aggs2 = candidates.map(c => sort_array(collect_set(col(c))).as(c))
        val r2 = df.agg(aggs2.head, aggs2.tail: _*).head()
        candidates.flatMap { c =>
          val vs = r2.getSeq[String](r2.fieldIndex(c))
          if (vs.size <= enumThreshold) Some(c -> vs) else None
        }.toMap
      }
    cols.map { c =>
      ColProfile(c, graft.core.RuleCompiler.jsonTypeOf(schema(c).dataType),
        lng(s"${c}__nnull"), lng(s"${c}__ndist"),
        dbl(s"${c}__min"), dbl(s"${c}__max"), enumSets.get(c))
    }
  }

  private val profileSchema = StructType(Seq(
    StructField("column", StringType, nullable = false),
    StructField("json_type", StringType, nullable = false),
    StructField("n_null", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("min_num", DoubleType, nullable = true),
    StructField("max_num", DoubleType, nullable = true),
    StructField("enum_vals", StringType, nullable = true)))

  /** The oracle-checkable profile artifact, one row per column:
    * `(column, json_type, n_null, n_distinct, min_num, max_num,
    * enum_vals)` — `enum_vals` a JSON-rendered sorted value array when the
    * column qualifies for an enum, else NULL. */
  def inferredProfile(df: DataFrame, cols: Seq[String],
      enumThreshold: Int = 16, sketch: Boolean = false): DataFrame = {
    val rows = profileCols(df, cols, enumThreshold, sketch).map { p =>
      Row(p.name, p.jsonType, p.nNull, p.nDistinct,
        p.minNum.map(Double.box).orNull, p.maxNum.map(Double.box).orNull,
        p.enumVals.map(vs => JArr(vs.map(JStr(_))).render).orNull)
    }
    df.sparkSession.createDataFrame(rows.asJava, profileSchema)
  }

  /** Schema-drift report between two corpus snapshots: both sides run the
    * SAME [[inferredProfile]] pass (one global aggregate each — the whole
    * diff costs two profile scans and a per-column join of two
    * column-count-sized artifacts), joined per column with enum-set
    * deltas. The operational question it answers at ingest time: did the
    * new snapshot introduce values, nulls, or ranges the committed pack
    * would reject — BEFORE running full validation.
    *
    * Output one row per column:
    * `(column, n_null_old/new, n_distinct_old/new, min_old/new,
    * max_old/new, enum_added, enum_removed)` — the enum deltas are
    * JSON-rendered sorted arrays (NULL when the side is not
    * enum-qualified; `[]` when qualified and unchanged). */
  def profileDiff(oldDf: DataFrame, newDf: DataFrame, cols: Seq[String],
      enumThreshold: Int = 16): DataFrame = {
    def side(df: DataFrame, tag: String) =
      inferredProfile(df, cols, enumThreshold).select(col("column"),
        col("n_null").as(s"n_null_$tag"), col("n_distinct").as(s"n_distinct_$tag"),
        col("min_num").as(s"min_$tag"), col("max_num").as(s"max_$tag"),
        col("enum_vals").as(s"__enum_$tag"))
    val j = side(oldDf, "old").join(side(newDf, "new"), "column")
    def arr(c: String) = from_json(col(c), ArrayType(StringType))
    def delta(a: String, b: String) = when(col(a).isNotNull,
      to_json(array_sort(array_except(arr(a),
        coalesce(arr(b), array().cast("array<string>"))))))
    j.select(col("column"),
      col("n_null_old"), col("n_null_new"),
      col("n_distinct_old"), col("n_distinct_new"),
      col("min_old"), col("min_new"), col("max_old"), col("max_new"),
      delta("__enum_new", "__enum_old").as("enum_added"),
      delta("__enum_old", "__enum_new").as("enum_removed"))
  }

  /** Robust numeric bounds for inference: percentiles at `(loQ, hiQ)`
    * instead of min/max — one corrupted outlier row cannot stretch the
    * inferred range to cover future garbage (the min/max pack would
    * accept anything between the corpse and the corpus). Exact R-7
    * `percentile` by default (oracle-matchable, same as v24);
    * `sketch = true` swaps in `percentile_approx` (GK sketch, bounded
    * buffer) — the 10¹²-row form, identical artifact shape.
    * Output one row per column: `(column, lo, hi)`. */
  def robustBounds(df: DataFrame, cols: Seq[String],
      loQ: Double = 0.001, hiQ: Double = 0.999,
      sketch: Boolean = false): DataFrame = {
    require(cols.nonEmpty && cols.forall(c =>
      df.schema(c).dataType.isInstanceOf[NumericType]), "numeric columns only")
    val fn = if (sketch) "percentile_approx" else "percentile"
    val acc = if (sketch) ", 10000" else ""
    val aggs = cols.flatMap(c => Seq(
      expr(s"CAST($fn($c, ${loQ}D$acc) AS DOUBLE)").as(s"${c}__lo"),
      expr(s"CAST($fn($c, ${hiQ}D$acc) AS DOUBLE)").as(s"${c}__hi")))
    val row = df.agg(aggs.head, aggs.tail: _*)
    val perCol = cols.map(c => struct(lit(c).as("column"),
      col(s"${c}__lo").as("lo"), col(s"${c}__hi").as("hi")))
    row.select(explode(array(perCol: _*)).as("p")).select("p.*")
  }

  /** [[infer]] with robust percentile bounds on the numeric columns
    * (everything else identical): the drift-tolerant pack a production
    * corpus should start from when single-row corruption is a risk. */
  def inferRobust(df: DataFrame, cols: Seq[String], enumThreshold: Int = 16,
      loQ: Double = 0.001, hiQ: Double = 0.999,
      sketch: Boolean = false): Rule = {
    val numCols = cols.filter(c => df.schema(c).dataType.isInstanceOf[NumericType])
    val bounds = robustBounds(df, numCols, loQ, hiQ, sketch).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    def patch(r: Rule, c: String): Rule = r match {
      case All(parts) => All(parts.map(p => patch(p, c)))
      case Minimum(_, e) => Minimum(bounds(c)._1, e)
      case Maximum(_, e) => Maximum(bounds(c)._2, e)
      case other => other
    }
    infer(df, cols, enumThreshold, sketch) match {
      case All(parts) => All(parts.map {
        case Properties(props) => Properties(props.map { case (c, r) =>
          c -> (if (bounds.contains(c)) patch(r, c) else r) })
        case other => other
      })
      case other => other
    }
  }

  /** Build the pack from the profile. Enum rules come straight from the
    * collected (threshold-bounded) value arrays — no delimiter round-trip,
    * so values containing commas or any other character survive intact. */
  def infer(df: DataFrame, cols: Seq[String], enumThreshold: Int = 16,
      sketch: Boolean = false): Rule = {
    val profile = profileCols(df, cols, enumThreshold, sketch)
    val props: Seq[(String, Rule)] = profile.map { p =>
      val boundParts = (p.minNum, p.maxNum) match {
        case (Some(lo), Some(hi)) => Seq(Minimum(lo), Maximum(hi))
        case _ => Nil
      }
      val parts = Seq(TypeIs(Seq(p.jsonType))) ++ boundParts ++
        p.enumVals.map(vs => Enum(vs.map(v => JStr(v): JValue))).toSeq
      p.name -> (if (parts.size == 1) parts.head else All(parts))
    }
    val required = profile.filter(_.nNull == 0L).map(_.name)
    All(Seq(Properties(props)) ++
      (if (required.nonEmpty) Seq(Required(required)) else Nil))
  }
}
