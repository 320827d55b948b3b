package graft.pipeline

import graft.SparkSuite
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("explode-based simhash equals the per-row expression") {
    val perRow = docs.select(col("doc_id").as("id"), Dedup.simhash32(col("text")).as("simhash"))
      .orderBy("id").as[(Long, Long)].collect().toSeq
    val agg = Dedup.simhashSignatures(docs, "doc_id", "text")
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(perRow === agg)
  }

  test("near-duplicate text lands in the same minhash band bucket") {
    val base = docs.select("doc_id", "text")
    // duplicate the first 10 docs with shifted ids: identical text must share
    // every signature, hence every band
    val dups = base.where(col("doc_id") < 10)
      .select((col("doc_id") + 100000).as("doc_id"), col("text"))
    val candidates = Dedup.minhashCandidatePairs(base.unionByName(dups), "doc_id", "text")
      .where(col("id_b") >= 100000 && col("id_a") === col("id_b") - 100000)
    assert(candidates.count() === 10)
  }

  test("jaccard of identical docs is 1.0 and pairs are canonical (id_a < id_b)") {
    val base = docs.where(col("doc_id") < 20).select("doc_id", "text")
    val dups = base.select((col("doc_id") + 1000).as("doc_id"), col("text"))
    val pairs = Dedup.jaccardPairs(base.unionByName(dups), "doc_id", "text", k = 3, minJaccard = 0.999)
      .where(col("id_b") === col("id_a") + 1000)
    assert(pairs.count() === 20)
    assert(pairs.agg(min("jaccard")).head().getDouble(0) === 1.0)
    val all = Dedup.jaccardPairs(base.unionByName(dups), "doc_id", "text", 3, 0.0)
    assert(all.where(col("id_a") >= col("id_b")).count() === 0)
  }

  test("ANN: a vector's nearest neighbor under brute force is its duplicate") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val base = emb.select(col("vec_id"), col("embedding"))
    val dup = base.where(col("vec_id") === 0)
      .select(lit(9999L).as("vec_id"), col("embedding"))
    val corpus = base.unionByName(dup)
    val top = Similarity.topKBruteForce(
      corpus.where(col("vec_id") === 9999), corpus, "vec_id", "embedding", k = 1)
    val row = top.head()
    assert(row.getAs[Long]("neighbor_id") === 0L)
    assert(math.abs(row.getAs[Double]("cosine") - 1.0) < 1e-9)
  }

  test("multimodal: frame sampling keeps every stride-th frame") {
    import spark.implicits._
    val media = Multimodal.fromText(docs.limit(5), "doc_id", "text")
    val frames = Multimodal.sampleFrames(media, frameBytes = 16, stride = 2)
    assert(frames.where(col("frame_idx") % 2 =!= 0).count() === 0)
    assert(frames.count() > 0)
  }
}
