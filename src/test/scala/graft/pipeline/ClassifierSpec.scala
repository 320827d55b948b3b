package graft.pipeline

import graft.SparkSuite

class ClassifierSpec extends SparkSuite {
  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("naive Bayes: hand-computed log-odds, OOV constant, empty doc = prior") {
    // corpus: N1=5 (good:3, fine:1, bad:1), N0=3 (bad:2, awful:1), V=4,
    // D1=2, D0=1 → prior = ln 2; smoothed denominators 9 and 7
    val train = Seq((1L, "good good fine", true), (2L, "bad bad awful", false),
      (3L, "good bad", true)).toDF("doc_id", "text", "y")
    val score = Seq((10L, "good"), (11L, "zzz"), (12L, ""), (13L, "good bad zzz"))
      .toDF("doc_id", "text")
    val out = Classifier.nbClassify(train, score, "doc_id", "text", "y")
      .orderBy("id").as[(Long, Long, Double, Boolean)].collect().toSeq
    val prior = math.log(2.0)
    def o(c1: Long, c0: Long): Double =
      math.log((c1 + 1) / 9.0) - math.log((c0 + 1) / 7.0)
    val oov = math.log(7.0) - math.log(9.0)
    val s13 = prior + o(3, 0) + o(1, 2) + oov
    assert(out === Seq(
      (10L, 1L, r6(prior + o(3, 0)), true),
      (11L, 1L, r6(prior + oov), r6(prior + oov) > 0),
      (12L, 0L, r6(prior), true),
      (13L, 3L, r6(s13), r6(s13) > 0)))
    // the OOV constant is negative here (majority-class mass smaller):
    // ln(7/9) < 0 — pins the sign convention
    assert(oov < 0)
  }

  test("naive Bayes recovers a text-derived label on the real corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val train = docs.selectExpr("doc_id", "text", "text like '%spark%' as y")
    val out = Classifier.nbClassify(train, docs, "doc_id", "text", "y")
    // NB on its own train set with one perfectly-predictive word should
    // land near but below 1.0 (short no-spark docs ride the prior);
    // 0.902 measured — pin a floor, not the point value
    val acc = out.join(docs, out("id") === docs("doc_id"))
      .selectExpr("predicted", "text like '%spark%' as y")
      .groupBy().agg(org.apache.spark.sql.functions.expr(
        "sum(case when predicted = y then 1 else 0 end) / count(*)").as("acc"))
      .as[Double].head()
    assert(acc > 0.85, s"train-set accuracy $acc")
  }

  test("naive Bayes separates fully-disjoint planted vocabularies exactly") {
    val train = (0L until 40L).map { i =>
      if (i % 2 == 0) (i, s"alpha beta gamma w$i", true)
      else (i, s"delta epsilon zeta w$i", false)
    }.toDF("doc_id", "text", "y")
    val out = Classifier.nbClassify(train, train.drop("y"), "doc_id", "text", "y")
      .orderBy("id").as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(out.size === 40)
    out.foreach { case (id, nTok, _, pred) =>
      assert(nTok === 4L)
      assert(pred === (id % 2 == 0), s"doc $id misclassified")
    }
  }
}
