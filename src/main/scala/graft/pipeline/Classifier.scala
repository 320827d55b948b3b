package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Linear text classifiers for corpus curation — the fastText-shaped
  * quality/language filter every web-scale pipeline runs (CCNet, GPT-3's
  * WebText-vs-CommonCrawl logistic filter, Llama's wiki-reference
  * classifier), in closed form: multinomial Naive Bayes with Laplace
  * smoothing. NB is the one member of the family whose training is pure
  * counting — two partial-aggregated `groupBy`s, no SGD loop — so it
  * distributes exactly and the DuckDB oracle replays it bit-for-bit.
  *
  * Scale design: the model is one row per DISTINCT word (a counter
  * table, never broadcast to the driver); corpus totals travel as a
  * 1-row broadcast; the scoring join keys on the word — Zipf-skewed on
  * the probe side like every vocabulary join (p24's bigram analysis),
  * with AQE's OptimizeSkewedJoin splitting hot partitions; per-doc
  * rollup is one counter groupBy. Everything linear in corpus tokens. */
object Classifier {

  /** Train multinomial NB on `train` (boolean `labelCol`) and score
    * `score`: per-word log-odds `ln((c1+1)/(N1+V)) − ln((c0+1)/(N0+V))`
    * (Laplace α=1, V = distinct train vocabulary), document score =
    * `ln(D1/D0) + Σ_tokens odds(w)` with out-of-vocabulary tokens taking
    * the smoothed-zero constant `ln(N0+V) − ln(N1+V)`.
    *
    * Output `(id, n_tok, score6, predicted)` — score rounded to 6 (float
    * summation order is engine-dependent beyond that; the per-token terms
    * are O(1)-magnitude logs, so 6 decimals is inside the error bound),
    * `predicted` = score > 0. Word-free docs in `score` score exactly the
    * prior. */
  def nbClassify(train: DataFrame, score: DataFrame, idCol: String,
      textCol: String, labelCol: String): DataFrame = {
    val tw = train.select(explode(TextAnalysis.words(col(textCol))).as("w"),
      col(labelCol).as("y"))
    val cw = tw.groupBy("w").agg(
      sum(when(col("y"), 1L).otherwise(0L)).as("c1"),
      sum(when(col("y"), 0L).otherwise(1L)).as("c0"))
    val totals = cw.agg(sum(col("c1")).as("N1"), sum(col("c0")).as("N0"),
      count(lit(1)).as("V"))
    val priors = train.agg(
      sum(when(col(labelCol), 1L).otherwise(0L)).as("D1"),
      sum(when(col(labelCol), 0L).otherwise(1L)).as("D0"))
    val odds = cw.crossJoin(broadcast(totals))
      .select(col("w"),
        (log((col("c1") + 1).cast("double") / (col("N1") + col("V")).cast("double")) -
         log((col("c0") + 1).cast("double") / (col("N0") + col("V")).cast("double")))
          .as("odds"))
    val sw = score.select(col(idCol).as("id"),
      explode_outer(TextAnalysis.words(col(textCol))).as("w"))
    sw.join(odds, Seq("w"), "left")
      .crossJoin(broadcast(totals)).crossJoin(broadcast(priors))
      .select(col("id"),
        when(col("w").isNull, lit(0L)).otherwise(1L).as("tok"),
        coalesce(col("odds"),
          when(col("w").isNull, lit(0.0)).otherwise(
            log((col("N0") + col("V")).cast("double")) -
            log((col("N1") + col("V")).cast("double")))).as("o"),
        (log(col("D1").cast("double")) - log(col("D0").cast("double"))).as("prior"))
      .groupBy("id").agg(
        sum(col("tok")).as("n_tok"),
        round(first(col("prior")) + sum(col("o")), 6).as("score6"))
      .withColumn("predicted", col("score6") > 0.0)
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): hashed-unigram bag
    * features over `nBuckets` buckets, per-bucket log-ratio
    * `λ(b) = ln p̂_target(b) − ln p̂_raw(b)` (add-one smoothing over the
    * bucket spine, so buckets unseen in either corpus stay finite), and
    * per-document `log_weight = Σ_tokens λ(bucket(w))`. Resampling keeps
    * documents ∝ exp(log_weight) — the weight column IS the selector.
    *
    * Scale contrast with [[nbClassify]]: the NB model is word-keyed
    * (unbounded vocabulary → shuffle join); the DSIR model is BUCKET-keyed
    * — a fixed-size table (64…10⁴ rows regardless of corpus), so the
    * scoring join BROADCASTS and the whole scorer rides the scan with one
    * per-doc counter groupBy. Empty docs get weight 0 (= neutral). */
  def dsirWeights(target: DataFrame, raw: DataFrame, score: DataFrame,
      idCol: String, textCol: String, nBuckets: Int = 64): DataFrame = {
    def bucket(w: Column): Column =
      pmod(Dedup.md5Hash32(w, 0), lit(nBuckets.toLong)).cast("int")
    def counts(df: DataFrame, name: String): DataFrame =
      df.select(explode(TextAnalysis.words(col(textCol))).as("w"))
        .groupBy(bucket(col("w")).as("b")).agg(count(lit(1)).as(name))
    val spine = score.sparkSession.range(nBuckets)
      .select(col("id").cast("int").as("b"))
    val c = spine.join(counts(target, "ct"), Seq("b"), "left")
      .join(counts(raw, "cr"), Seq("b"), "left")
      .select(col("b"), coalesce(col("ct"), lit(0L)).as("ct"),
        coalesce(col("cr"), lit(0L)).as("cr"))
    val tot = c.agg(sum(col("ct")).as("nt"), sum(col("cr")).as("nr"))
    val lam = c.crossJoin(broadcast(tot)).select(col("b"),
      (log((col("ct") + 1).cast("double") / (col("nt") + nBuckets).cast("double")) -
       log((col("cr") + 1).cast("double") / (col("nr") + nBuckets).cast("double")))
        .as("lam"))
    val sw = score.select(col(idCol).as("id"),
      explode_outer(TextAnalysis.words(col(textCol))).as("w"))
    sw.join(broadcast(lam), bucket(col("w")) === lam("b"), "left")
      .groupBy("id").agg(
        sum(when(col("w").isNull, 0L).otherwise(1L)).as("n_tok"),
        round(sum(coalesce(col("lam"), lit(0.0))), 6).as("log_weight6"))
  }
}
