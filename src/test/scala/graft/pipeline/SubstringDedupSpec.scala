package graft.pipeline

import graft.SparkSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** [[Dedup.exactSubstringDedup]] on hand-computed fixtures: winner
  * exemption, span merge across overlapping grams, multi-span gaps, the
  * shorter-than-L edge, and the cleaned-stream checksum. Token ids are
  * picked so no 15-gram repeats by accident. */
class SubstringDedupSpec extends SparkSuite {
  import spark.implicits._

  private val L = 4

  private def run(rows: Seq[(Long, Seq[Int])]) =
    Dedup.exactSubstringDedup(rows.toDF("doc_id", "tokens"), "doc_id", "tokens", L)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Int]("n_tok"), r.getAs[Int]("n_dup_tokens"),
         r.getAs[Int]("n_spans"), r.getAs[String]("clean_checksum"))).toMap

  test("full copy is fully covered; the first occurrence is exempt") {
    val a = Seq(1, 2, 3, 4, 5, 6)
    val out = run(Seq(1L -> a, 2L -> a))
    assert(out(1L) === ((6, 0, 0, md5hex("1 2 3 4 5 6"))))
    assert(out(2L) === ((6, 6, 1, md5hex(""))))
  }

  test("two shared regions around a unique spacer merge to two spans") {
    // doc 2 = doc 1's [0,4] ++ unique 90..92 ++ doc 1's [5,9]
    val a = (1 to 10).toSeq
    val b = Seq(1, 2, 3, 4, 5, 90, 91, 92, 6, 7, 8, 9, 10)
    val out = run(Seq(1L -> a, 2L -> b))
    // doc 1: grams (1..4),(2..5) and (6..9),(7..10) recur in doc 2 but doc 1
    // holds every winner → untouched
    assert(out(1L)._2 === 0)
    // doc 2: covered [0,4] and [8,12]; spacer 90 91 92 survives
    assert(out(2L) === ((13, 10, 2, md5hex("90 91 92"))))
  }

  test("overlapping duplicated grams merge into one span") {
    // doc 2 embeds a 6-token run of doc 1 → 3 overlapping 4-grams, 1 span
    val a = Seq(1, 2, 3, 4, 5, 6, 7, 8)
    val b = Seq(70, 71, 2, 3, 4, 5, 6, 7, 80, 81)
    val out = run(Seq(1L -> a, 2L -> b))
    assert(out(2L) === ((10, 6, 1, md5hex("70 71 80 81"))))
  }

  test("docs shorter than L emit no grams and survive whole") {
    val out = run(Seq(1L -> Seq(1, 2, 3), 2L -> Seq(1, 2, 3)))
    assert(out(1L) === ((3, 0, 0, md5hex("1 2 3"))))
    assert(out(2L) === ((3, 0, 0, md5hex("1 2 3"))))
  }

  test("repeat WITHIN one doc: later occurrence erased, first kept") {
    val a = Seq(1, 2, 3, 4, 50, 51, 52, 1, 2, 3, 4)
    val out = run(Seq(1L -> a))
    assert(out(1L) === ((11, 4, 1, md5hex("1 2 3 4 50 51 52"))))
  }

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map(b => f"$b%02x").mkString
  }
}
