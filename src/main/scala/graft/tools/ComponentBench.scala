package graft.tools

import graft.core.Violations
import graft.global.{Referential, Uniqueness}
import graft.sources.TokenGen
import graft.stats.ColumnStats
import org.apache.spark.sql.SparkSession

/** Per-component scaling probe: times each audit stage separately at one
  * parallelism level. Usage: ComponentBench <cores> <dataDir> [reps] */
object ComponentBench {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val dataDir = args(1) // "-" skips the token-audit legs
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = graft.GraftSession.get(cores.toString, "graft-component")

    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[component] $name@$cores: ${ts.min}%.2f s")
    }

    if (dataDir != "-") {
      val facts = spark.read.parquet(dataDir)
      val dim = TokenGen.allowedSources(spark)
      val pack = AuditCli.tokenRulePack(maxLen = 8192)
      time("scan_only")(facts.count())
      time("decode_tokens")(facts.agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.size(org.apache.spark.sql.functions.col("tokens")))).collect())
      time("validate")(Violations.validate(facts, pack, Seq("doc_id")).count())
      time("uniqueness")(Uniqueness.duplicateKeys(facts, Seq("doc_id")).count())
      time("uniqueness_hashed")(Uniqueness.duplicateKeysHashed(facts, Seq("doc_id")).count())
      time("referential")(Referential.violations(facts, "source", dim, "source").count())
      time("stats")(ColumnStats.profile(facts).count())
    }

    // Hash-family A/B on the dedup hot loop: the CHECKED queries pin the
    // engine-portable md5 family so DuckDB can replay them; production runs
    // the codegen'd xxhash64 family. This measures what the oracle costs.
    val docsPath = args.lift(4).getOrElse("/root/testdata/sf0.1/documents.parquet")
    if (new java.io.File(docsPath).exists) {
      import graft.pipeline.Dedup
      val docs = spark.read.parquet(docsPath)
      time("minhash_pairs_md5")(Dedup.minhashCandidatePairs(docs, "doc_id", "text",
        shingleK = 3, numHashes = 16, bands = 8, family = Dedup.Md5Portable).count())
      time("minhash_pairs_xx")(Dedup.minhashCandidatePairs(docs, "doc_id", "text",
        shingleK = 3, numHashes = 16, bands = 8, family = Dedup.XxFast).count())
      time("simhash_pairs_md5")(Dedup.simhashNearDupPairs(docs, "doc_id", "text",
        family = Dedup.Md5Portable).count())
      time("simhash_pairs_xx")(Dedup.simhashNearDupPairs(docs, "doc_id", "text",
        family = Dedup.XxFast).count())
      time("bigram_nll")(graft.pipeline.TextAnalysis.bigramNll(
        docs, "doc_id", "text").count())
    }

    // SQ8 bandwidth probe: the ANN shortlist pass over the 1-byte-per-dim
    // codes artifact vs the identical pass over the float column, both read
    // from parquet — plus the on-disk sizes (the 4x storage claim, measured)
    val embPath = args.lift(3).getOrElse("/root/testdata/sf0.1/embeddings.parquet")
    if (new java.io.File(embPath).exists) {
      import org.apache.spark.sql.functions._
      import graft.pipeline.Similarity
      val emb = spark.read.parquet(embPath)
      val q = emb.where(col("vec_id") < 8)
      val codesDir = java.nio.file.Files.createTempDirectory("sq8codes").toString
      Similarity.sq8Codes(emb, "vec_id", "embedding")
        .write.mode("overwrite").parquet(codesDir)
      val codes = spark.read.parquet(codesDir)
      time("ann_shortlist_float")(
        Similarity.topKBruteForce(q, emb, "vec_id", "embedding", k = 20).count())
      time("ann_shortlist_sq8")(
        Similarity.sq8Shortlist(q, codes, "vec_id", "embedding", shortlist = 20).count())
      def dirBytes(p: String): Long = {
        val f = new java.io.File(p)
        if (f.isFile) f.length
        else Option(f.listFiles).map(_.map(x => dirBytes(x.getPath)).sum).getOrElse(0L)
      }
      println(f"[component] sq8_bytes@$cores: codes=${dirBytes(codesDir)} float=${dirBytes(embPath)} " +
        f"ratio=${dirBytes(embPath).toDouble / dirBytes(codesDir)}%.2f")
    }
    spark.stop()
  }
}
