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

  test("DSIR weights: hand-computed λ sums, empty doc neutral, target up-ranked") {
    // target mentions 'aa' heavily; raw is balanced; a doc of 'aa' must
    // out-weigh a doc of 'bb'
    val target = Seq((1L, "aa aa aa")).toDF("doc_id", "text")
    val raw = Seq((1L, "aa aa aa"), (2L, "bb bb bb")).toDF("doc_id", "text")
    val score = Seq((10L, "aa aa"), (11L, "bb bb"), (12L, "")).toDF("doc_id", "text")
    val out = Classifier.dsirWeights(target, raw, score, "doc_id", "text", nBuckets = 8)
      .orderBy("id").as[(Long, Long, Double)].collect().toSeq
    // closed form: buckets(aa) ≠ buckets(bb) would be luck-dependent with 8
    // buckets — compute λ from the actual bucket assignment instead
    val b = raw.sparkSession.range(1).select(
      org.apache.spark.sql.functions.pmod(Dedup.md5Hash32(
        org.apache.spark.sql.functions.lit("aa"), 0), org.apache.spark.sql.functions.lit(8L)).as("ba"),
      org.apache.spark.sql.functions.pmod(Dedup.md5Hash32(
        org.apache.spark.sql.functions.lit("bb"), 0), org.apache.spark.sql.functions.lit(8L)).as("bb"))
      .as[(Long, Long)].head()
    val (ctA, ctB) = if (b._1 == b._2) (3L, 3L) else (3L, 0L)
    def lam(ct: Long, cr: Long) =
      math.log((ct + 1) / (3.0 + 8)) - math.log((cr + 1) / (6.0 + 8))
    val (crA, crB) = if (b._1 == b._2) (6L, 6L) else (3L, 3L)
    val eAA = r6(2 * lam(ctA, crA))
    val eBB = r6(2 * lam(if (b._1 == b._2) ctA else 0L, crB))
    assert(out === Seq((10L, 2L, eAA), (11L, 2L, eBB), (12L, 0L, 0.0)))
    if (b._1 != b._2) assert(eAA > eBB, "target token must out-weigh raw-only token")
  }

  test("tfidf keywords: hand-computed scores, tie broken by term, k caps rows") {
    val docs = Seq((1L, "apple apple banana"), (2L, "banana cherry"),
      (3L, "cherry cherry cherry durian")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfKeywords(docs, "doc_id", "text", k = 3)
      .orderBy("id", "rank").as[(Long, String, Long, Long, Double, Long)]
      .collect().toSeq
    val ln3 = math.log(3.0); val ln15 = math.log(1.5)
    assert(out === Seq(
      (1L, "apple", 2L, 1L, r6(2 * ln3), 1L),
      (1L, "banana", 1L, 2L, r6(ln15), 2L),
      // d2: banana and cherry tie exactly — term asc breaks it
      (2L, "banana", 1L, 2L, r6(ln15), 1L),
      (2L, "cherry", 1L, 2L, r6(ln15), 2L),
      (3L, "cherry", 3L, 2L, r6(3 * ln15), 1L),
      (3L, "durian", 1L, 1L, r6(ln3), 2L)))
    // k caps: a 5-distinct-term doc yields exactly k rows
    val wide = Seq((9L, "a b c d e")).toDF("doc_id", "text")
    assert(TextAnalysis.tfidfKeywords(wide, "doc_id", "text", k = 3).count() === 3)
  }

  test("zipfFit recovers slope ~ -1 on a planted 1/rank corpus and is partition-invariant") {
    // word w_i occurs ceil(2000/i) times, i = 1..80 → ln(freq) ≈ ln(2000) − ln(rank)
    val text = (1 to 80).flatMap(i => Seq.fill((2000 + i - 1) / i)(f"w$i%03d")).mkString(" ")
    val df = Seq(text).toDF("text")
    val row = TextAnalysis.zipfFit(df, "text", topRanks = 80).head()
    assert(row.getLong(0) === 80L)      // n_types
    assert(row.getLong(2) === 80L)      // n_ranks
    val slope = row.getDouble(3)
    assert(slope > -1.05 && slope < -0.95, s"slope6 = $slope")
    val again = TextAnalysis.zipfFit(df.repartition(5), "text", topRanks = 80).head()
    assert(again === row, "zipfFit must be bit-identical across partitionings")
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
