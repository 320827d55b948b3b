package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

import java.nio.ByteBuffer

/** Mergeable t-digest state (Dunning's merging-digest formulation, public
  * algorithm: "Computing Extremely Accurate Quantiles Using t-Digests",
  * Dunning & Ertl). Centroid sizes are bounded by the k1 scale function
  * `k(q) = δ/(2π)·asin(2q−1)`, which keeps tail centroids tiny (high tail
  * accuracy) and mid-range centroids at O(W/δ).
  *
  * The buffer holds ≤ `4δ` raw values; overflow triggers a sort + merge
  * pass, so update cost is amortized O(log δ) and the serialized state is
  * O(δ) doubles regardless of input size — the property that makes the
  * sketch shuffle-safe at 10¹² rows (partial aggregation ships ~2δ
  * centroids per map task, merges are associative tree reductions).
  */
final class TDigestState(val compression: Double) extends Serializable {
  var minV: Double = Double.PositiveInfinity
  var maxV: Double = Double.NegativeInfinity
  var means: Array[Double] = Array.emptyDoubleArray
  var weights: Array[Double] = Array.emptyDoubleArray
  private var buf: Array[Double] = new Array[Double](math.max(32, (4 * compression).toInt))
  private var bufN: Int = 0

  def isEmpty: Boolean = bufN == 0 && means.isEmpty

  def add(v: Double): Unit = if (!v.isNaN) {
    if (v < minV) minV = v
    if (v > maxV) maxV = v
    buf(bufN) = v
    bufN += 1
    if (bufN == buf.length) flush()
  }

  /** Fold buffered raw values into the centroid list. */
  def flush(): Unit = if (bufN > 0) {
    val raw = java.util.Arrays.copyOf(buf, bufN)
    java.util.Arrays.sort(raw)
    bufN = 0
    mergeSorted(raw, null)
  }

  /** Merge another digest's state into this one (associative up to the
    * sketch's accuracy bound; exact weights/min/max are preserved). */
  def mergeIn(o: TDigestState): Unit = {
    o.flush()
    flush()
    if (o.minV < minV) minV = o.minV
    if (o.maxV > maxV) maxV = o.maxV
    if (o.means.nonEmpty) mergeSorted(o.means, o.weights)
  }

  // k1 scale function and inverse, normalized so one unit of k-budget is
  // one centroid's worth of weight
  private def k(q: Double): Double =
    compression / (2 * math.Pi) * math.asin(2 * math.min(math.max(q, 0.0), 1.0) - 1)
  private def kInv(x: Double): Double =
    if (x >= compression / 4) 1.0
    else if (x <= -compression / 4) 0.0
    else (math.sin(x * 2 * math.Pi / compression) + 1) / 2

  /** Two-pointer merge of the current centroids with a sorted batch
    * (`ws == null` means unit weights), then a single compress sweep. */
  private def mergeSorted(ms: Array[Double], ws: Array[Double]): Unit = {
    val n0 = means.length
    val n1 = ms.length
    val am = new Array[Double](n0 + n1)
    val aw = new Array[Double](n0 + n1)
    var i = 0; var j = 0; var o = 0
    while (i < n0 || j < n1) {
      if (j >= n1 || (i < n0 && means(i) <= ms(j))) {
        am(o) = means(i); aw(o) = weights(i); i += 1
      } else {
        am(o) = ms(j); aw(o) = if (ws == null) 1.0 else ws(j); j += 1
      }
      o += 1
    }
    var total = 0.0
    i = 0
    while (i < o) { total += aw(i); i += 1 }

    val om = new Array[Double](o)
    val ow = new Array[Double](o)
    var nOut = 0
    var cMean = am(0)
    var cW = aw(0)
    var wSoFar = 0.0
    var wLimit = total * kInv(k(0.0) + 1.0)
    i = 1
    while (i < o) {
      if (wSoFar + cW + aw(i) <= wLimit) {
        cMean += (am(i) - cMean) * aw(i) / (cW + aw(i))
        cW += aw(i)
      } else {
        om(nOut) = cMean; ow(nOut) = cW; nOut += 1
        wSoFar += cW
        wLimit = total * kInv(k(wSoFar / total) + 1.0)
        cMean = am(i); cW = aw(i)
      }
      i += 1
    }
    om(nOut) = cMean; ow(nOut) = cW; nOut += 1
    means = java.util.Arrays.copyOf(om, nOut)
    weights = java.util.Arrays.copyOf(ow, nOut)
  }
}

object TDigestState {

  /** Quantile estimate from a compressed digest: midpoint-rank linear
    * interpolation between adjacent centroids, with the exact tracked
    * min/max anchoring the tails (a singleton first/last centroid is
    * therefore exact at q→0/1). */
  def quantile(minV: Double, maxV: Double,
      means: Array[Double], weights: Array[Double], q: Double): Double = {
    val n = means.length
    if (n == 0) return Double.NaN
    if (n == 1) return means(0)
    var total = 0.0
    var i = 0
    while (i < n) { total += weights(i); i += 1 }
    val target = math.min(math.max(q, 0.0), 1.0) * total
    // left tail: [0, w0/2] interpolates minV → mean0
    val firstMid = weights(0) / 2
    if (target <= firstMid)
      return if (firstMid == 0) means(0)
      else minV + (means(0) - minV) * target / firstMid
    // right tail: [total − wn/2, total] interpolates meanN → maxV
    val lastMid = total - weights(n - 1) / 2
    if (target >= lastMid) {
      val span = total - lastMid
      return if (span == 0) means(n - 1)
      else means(n - 1) + (maxV - means(n - 1)) * (target - lastMid) / span
    }
    var cum = 0.0
    i = 0
    while (i < n - 1) {
      val midI = cum + weights(i) / 2
      val midN = cum + weights(i) + weights(i + 1) / 2
      if (target <= midN) {
        return if (midN == midI) means(i + 1)
        else means(i) + (means(i + 1) - means(i)) * (target - midI) / (midN - midI)
      }
      cum += weights(i)
      i += 1
    }
    means(n - 1)
  }

  /** CDF estimate (rank of `x` in [0,1]) — the inverse interpolation of
    * [[quantile]], monotone in `x`, with the tracked min/max anchoring the
    * tails. This is what turns two stored digests into a drift check
    * (bin mass = cdf(hi) − cdf(lo)) without rescanning either snapshot. */
  def cdf(minV: Double, maxV: Double,
      means: Array[Double], weights: Array[Double], x: Double): Double = {
    val n = means.length
    if (n == 0) return Double.NaN
    if (n == 1) return if (x < means(0)) 0.0 else if (x > means(0)) 1.0 else 0.5
    if (x <= minV) return 0.0
    if (x >= maxV) return 1.0
    var total = 0.0
    var i = 0
    while (i < n) { total += weights(i); i += 1 }
    val firstMid = weights(0) / 2
    if (x <= means(0)) {
      val span = means(0) - minV
      val r = if (span == 0) firstMid else firstMid * (x - minV) / span
      return r / total
    }
    val lastMidRank = total - weights(n - 1) / 2
    if (x >= means(n - 1)) {
      val span = maxV - means(n - 1)
      val r = if (span == 0) lastMidRank
      else lastMidRank + (total - lastMidRank) * (x - means(n - 1)) / span
      return r / total
    }
    var cum = 0.0
    i = 0
    while (i < n - 1) {
      if (x <= means(i + 1)) {
        val midI = cum + weights(i) / 2
        val midN = cum + weights(i) + weights(i + 1) / 2
        val span = means(i + 1) - means(i)
        val r = if (span == 0) midN else midI + (midN - midI) * (x - means(i)) / span
        return r / total
      }
      cum += weights(i)
      i += 1
    }
    1.0
  }

  /** Result type shared by the aggregate and [[TDigestQuantile]]. */
  val centroidType: StructType = StructType(Seq(
    StructField("mean", DoubleType, nullable = false),
    StructField("weight", DoubleType, nullable = false)))
  val resultType: StructType = StructType(Seq(
    StructField("min", DoubleType, nullable = false),
    StructField("max", DoubleType, nullable = false),
    StructField("centroids", ArrayType(centroidType, containsNull = false), nullable = false)))
}

/** `tdigest_sketch(col, compression)` — one-pass mergeable t-digest
  * aggregate (SURVEY.md §2.7: the at-scale quantile path the north-star
  * names; `BASELINE.json` north_star "t-digest quantile sketches for
  * distribution-drift KL/PSI checks"). Returns
  * `struct<min, max, centroids: array<struct<mean, weight>>>`; query it
  * with [[TDigestQuantile]] / `tdigest_quantile(digest, q)`.
  *
  * vs `percentile_approx` (Spark's KLL): this digest is an engine-owned
  * artifact — it can be persisted per partition/snapshot in the metrics
  * table and re-merged across runs, which the built-in's internal buffer
  * does not expose. Accuracy: rank error ≲ 1/δ mid-range and ~exact at
  * the tails (k1 scale function keeps tail centroids near-singleton).
  *
  * NULLs/NaNs are skipped; an all-null group yields NULL (same contract
  * as the built-in percentile aggregates).
  */
case class TDigestSketch(
    child: Expression,
    compression: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigestState] with UnaryLike[Expression] {

  require(compression >= 10 && compression <= 10000,
    s"tdigest_sketch compression must be in [10, 10000], got $compression")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"tdigest_sketch needs a DOUBLE input, got ${child.dataType.sql} (cast it)")
  override def dataType: DataType = TDigestState.resultType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): TDigestState = new TDigestState(compression)

  override def update(buf: TDigestState, input: InternalRow): TDigestState = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(a: TDigestState, b: TDigestState): TDigestState = {
    a.mergeIn(b)
    a
  }

  override def eval(buf: TDigestState): Any = {
    buf.flush()
    if (buf.isEmpty) null
    else {
      val cents: Array[Any] = Array.tabulate(buf.means.length) { i =>
        new GenericInternalRow(Array[Any](buf.means(i), buf.weights(i)))
      }
      new GenericInternalRow(Array[Any](buf.minV, buf.maxV, new GenericArrayData(cents)))
    }
  }

  override def serialize(buf: TDigestState): Array[Byte] = {
    buf.flush()
    val n = buf.means.length
    val bb = ByteBuffer.allocate(8 * (3 + 2 * n) + 4)
    bb.putDouble(buf.minV).putDouble(buf.maxV).putDouble(compression).putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(buf.means(i)).putDouble(buf.weights(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TDigestState = {
    val bb = ByteBuffer.wrap(bytes)
    val st = new TDigestState(compression)
    st.minV = bb.getDouble()
    st.maxV = bb.getDouble()
    bb.getDouble() // compression echo (format stability)
    val n = bb.getInt()
    st.means = new Array[Double](n)
    st.weights = new Array[Double](n)
    var i = 0
    while (i < n) { st.means(i) = bb.getDouble(); st.weights(i) = bb.getDouble(); i += 1 }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TDigestSketch =
    copy(child = newChild)
  override def prettyName: String = "tdigest_sketch"
}

/** `tdigest_quantile(digest, q)` — quantile estimate from a
  * [[TDigestSketch]] result. Scalar, evaluated once per GROUP row over a
  * ≤2δ-entry centroid array, so CodegenFallback costs nothing measurable.
  */
case class TDigestQuantile(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (DataType.equalsStructurally(left.dataType, TDigestState.resultType, ignoreNullability = true) &&
        right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"tdigest_quantile(digest, q) needs (${TDigestState.resultType.sql}, DOUBLE), " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")

  override protected def nullSafeEval(digest: Any, q: Any): Any = {
    val row = digest.asInstanceOf[InternalRow]
    val arr = row.getArray(2)
    val n = arr.numElements()
    val means = new Array[Double](n)
    val weights = new Array[Double](n)
    var i = 0
    while (i < n) {
      val c = arr.getStruct(i, 2)
      means(i) = c.getDouble(0)
      weights(i) = c.getDouble(1)
      i += 1
    }
    TDigestState.quantile(row.getDouble(0), row.getDouble(1), means, weights,
      q.asInstanceOf[Double])
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): TDigestQuantile =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "tdigest_quantile"
}

/** `tdigest_cdf(digest, x)` — rank estimate of a value from a
  * [[TDigestSketch]] result (monotone inverse of [[TDigestQuantile]]). */
case class TDigestCdf(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (DataType.equalsStructurally(left.dataType, TDigestState.resultType, ignoreNullability = true) &&
        right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"tdigest_cdf(digest, x) needs (${TDigestState.resultType.sql}, DOUBLE), " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")

  override protected def nullSafeEval(digest: Any, x: Any): Any = {
    val row = digest.asInstanceOf[InternalRow]
    val arr = row.getArray(2)
    val n = arr.numElements()
    val means = new Array[Double](n)
    val weights = new Array[Double](n)
    var i = 0
    while (i < n) {
      val c = arr.getStruct(i, 2)
      means(i) = c.getDouble(0)
      weights(i) = c.getDouble(1)
      i += 1
    }
    TDigestState.cdf(row.getDouble(0), row.getDouble(1), means, weights,
      x.asInstanceOf[Double])
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): TDigestCdf =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "tdigest_cdf"
}

object TDigestSketch {

  private def doubleOf(e: Expression, what: String): Double = e.eval() match {
    case d: Double => d
    case f: Float => f.toDouble
    case i: Int => i.toDouble
    case l: Long => l.toDouble
    case d: org.apache.spark.sql.types.Decimal => d.toDouble // SQL `100.0` literal
    case other => throw new IllegalArgumentException(s"$what must be a numeric literal, got $other")
  }

  /** Expression-list constructor shared by [[register]] and
    * [[graft.GraftExtensions]]. */
  def fromExpressions(exprs: Seq[Expression]): TDigestSketch =
    TDigestSketch(exprs(0), doubleOf(exprs(1), "compression"))

  def quantileFromExpressions(exprs: Seq[Expression]): TDigestQuantile =
    TDigestQuantile(exprs(0), exprs(1))

  def cdfFromExpressions(exprs: Seq[Expression]): TDigestCdf =
    TDigestCdf(exprs(0), exprs(1))

  /** Register `tdigest_sketch`, `tdigest_quantile`, `tdigest_cdf`. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "tdigest_sketch", fromExpressions, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "tdigest_quantile", quantileFromExpressions, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "tdigest_cdf", cdfFromExpressions, "built-in")
  }

  /** Column forms (require [[register]] once per session). */
  def tdigestSketch(c: Column, compression: Double): Column =
    call_function("tdigest_sketch", c.cast("double"), lit(compression))
  def tdigestQuantile(digest: Column, q: Double): Column =
    call_function("tdigest_quantile", digest, lit(q))
  def tdigestCdf(digest: Column, x: Double): Column =
    call_function("tdigest_cdf", digest, lit(x))
}
