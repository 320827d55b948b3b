package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthesis of the engine's fact/dim tables per
  * `BASELINE.json` `input_hint` and FIXTURES.md §A: the tokenized-sequence
  * fact table `(doc_id, tokens, n_tok, source)` with planted violations at
  * closed-form row indices, and the `allowed_sources` dimension.
  *
  * Everything is generated distributively from `spark.range` with pure
  * column expressions — a pure function of the row index, no driver-side
  * loops, no RNG state: the same generator scales from 10^4 unit-test rows
  * to the 10^9 bench slice by changing `n` only, and any two runs (at any
  * partitioning) produce identical rows.
  */
object TokenGen {

  val VocabSize = 50257
  val MaxLen = 8192L

  /** Planted-violation periods (FIXTURES.md §A1): each prime plants one rule
    * class; row 0 is exempt (it would hit every period). */
  val InvariantPeriod = 10007L    // n_tok != size(tokens)
  val TokenMinPeriod = 10009L     // a token = -1
  val TokenMaxPeriod = 10037L     // a token = VocabSize (out of range)
  val EmptyPeriod = 10039L        // tokens = []
  val DupPeriod = 10061L          // doc_id duplicates row i-1
  val UnregisteredPeriod = 10067L // source not in allowed_sources
  val BadIdPeriod = 10069L        // malformed doc_id
  val NullSourcePeriod = 10079L   // source NULL

  private def planted(i: org.apache.spark.sql.Column, p: Long) =
    (i % p === 0) && (i > 0)

  /** The fact table. ~70% of rows land on source "web-common" to force the
    * skew/salting path (FIXTURES.md §A1). */
  def tokenSequences(spark: SparkSession, n: Long, numPartitions: Int = 0,
      maxLen: Long = MaxLen): DataFrame = {
    val base = if (numPartitions > 0) spark.range(0, n, 1, numPartitions) else spark.range(n)
    val i = col("id")

    // L(i) = 1 + (i*2654435761 mod maxLen); Knuth multiplicative hash spreads
    // lengths uniformly while staying a pure function of i
    val len = (i * 2654435761L % maxLen + 1)
    val lenAdj = when(planted(i, EmptyPeriod), lit(0L)).otherwise(len)

    // t(i,j) = xxhash64(i,j) mod VocabSize — position-hashed, not an
    // arithmetic progression: the previous (i*31 + j*7919) mod V form made
    // most doc pairs SHIFTED copies of each other (for any (i,i') there is
    // a shift d = 31(i'-i)/7919 mod V; whenever |d| < len the sequences
    // overlap in len-d positions), planting an unintended corpus-wide
    // near-duplicate graph that dominated token-domain dedup runs
    val toks = transform(sequence(lit(0), (lenAdj - 1).cast("int")), j =>
      pmod(xxhash64(i, j), lit(VocabSize.toLong)).cast("int"))
    val tokens = when(planted(i, EmptyPeriod), array().cast("array<int>"))
      .when(planted(i, TokenMinPeriod), concat(array(lit(-1)), slice(toks, 2, 1000000)))
      .when(planted(i, TokenMaxPeriod), concat(array(lit(VocabSize)), slice(toks, 2, 1000000)))
      .otherwise(toks)

    val nTok = when(planted(i, InvariantPeriod), size(tokens) + 1).otherwise(size(tokens))

    val docId = when(planted(i, DupPeriod), format_string("doc-%012d", i - 1))
      .when(planted(i, BadIdPeriod), concat(lit("BAD_"), i.cast("string")))
      .otherwise(format_string("doc-%012d", i))

    // skewed source: 70% mass on web-common, remainder over ~1000 sources
    val spread = pmod(xxhash64(i), lit(1000))
    val source = when(planted(i, NullSourcePeriod), lit(null).cast("string"))
      .when(planted(i, UnregisteredPeriod), concat(lit("unregistered-src-"), i.cast("string")))
      .when(pmod(xxhash64(i * 7 + 13), lit(10)) < 7, lit("web-common"))
      .otherwise(concat(lit("src-"), format_string("%04d", spread)))

    base.select(
      docId.as("doc_id"),
      tokens.as("tokens"),
      nTok.cast("int").as("n_tok"),
      source.as("source"))
  }

  /** The allowed-sources dimension (FIXTURES.md §A2): 1000 registered
    * sources + "web-common"; small enough to broadcast by default, with a
    * larger variant for the shuffle-join path. */
  def allowedSources(spark: SparkSession, n: Int = 1000): DataFrame = {
    val i = col("id")
    spark.range(n + 1).select(
      when(i === n, lit("web-common"))
        .otherwise(concat(lit("src-"), format_string("%04d", i))).as("source"),
      (pmod(i, lit(20)) =!= 0).as("license_ok"),
      date_add(to_date(lit("2020-01-01")), (i % 1000).cast("int")).as("added_at"))
  }

  /** Closed-form expected violation counts for `n` generated rows — used by
    * tests to assert exact global-rule results without a second oracle scan. */
  def expectedPlantCount(n: Long, period: Long): Long =
    if (n <= 1) 0 else (n - 1) / period
}
