package graft.pipeline

import org.apache.spark.sql.DataFrame
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
}
