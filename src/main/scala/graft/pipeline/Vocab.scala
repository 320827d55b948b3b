package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-vocabulary application — the tokenization step of a training-data
  * pipeline: map each document's token stream to integer ids against a
  * vocabulary table, with an explicit out-of-vocabulary (OOV) policy and an
  * OOV-rate report.
  *
  * Scale design (100 TB corpus, ≤ few-M-row vocab):
  *  - the vocab side BROADCASTS — the corpus-side join is a map-side hash
  *    lookup, no corpus shuffle for the mapping itself;
  *  - the only corpus shuffle is the positional reassembly's single
  *    `groupBy(id)` carrying `(id, pos, tid)` triples — unavoidable once
  *    the stream is exploded, and partial-aggregated on the map side;
  *  - a map-literal HOF (`element_at(map, w)`) would avoid even that
  *    shuffle, but a 100k-entry literal blows the codegen method-size
  *    limit and falls back to interpretation — the join shape stays
  *    codegen'd at any vocab size, so it is the production form.
  */
object Vocab {

  /** Rank-indexed vocabulary from the corpus itself: the top `topN` tokens
    * by frequency, `tid` = dense rank 0..topN−1 under the TOTAL order
    * (count desc, token asc) — deterministic and engine-portable. The word
    * count is a classic map-side-combined groupBy; the rank window runs
    * over ≤ topN rows (vocab-sized, single partition by construction).
    * Output `(token, tid)`. */
  def buildVocabulary(df: DataFrame, textCol: String, topN: Int): DataFrame =
    df.select(explode(TextAnalysis.words(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(topN)
      .select(col("token"),
        (row_number().over(Window.orderBy(col("n").desc, col("token"))) - 1)
          .cast("long").as("tid"))

  /** Map each document's whitespace-token stream to vocabulary ids.
    *
    * CONTRACT: `vocab` must be unique on `token` — a duplicated token
    * would fan out every occurrence through the join and silently corrupt
    * counts and positions ([[buildVocabulary]] is unique by construction;
    * external vocab tables should be deduplicated before use).
    *
    * OOV policy: `oovId = Some(x)` substitutes x for unknown tokens (the
    * `<unk>` convention); `None` DROPS unknown tokens (positions close up,
    * relative order preserved). Either way `n_oov` counts them, so the
    * OOV rate is always observable — a rate that jumps between corpus
    * versions is the canonical "wrong vocab file" alarm.
    *
    * Empty documents survive with an empty id array (posexplode_outer +
    * null-token accounting), so row counts are preserved end-to-end.
    * Output `(id, token_ids: array<long>, n_tok, n_oov)`; `token_ids` is in
    * original token order (array_sort on (pos, tid) structs — the broadcast
    * join's output order is not deterministic, the positional sort is). */
  def applyVocabulary(df: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, oovId: Option[Long] = Some(-1L)): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      posexplode_outer(TextAnalysis.words(col(textCol))).as(Seq("pos", "token")))
    val marked = toks.join(broadcast(vocab), Seq("token"), "left")
      .select(col("id"), col("pos"), col("tid"),
        (col("token").isNotNull && col("tid").isNull).as("oov"),
        col("token").isNotNull.as("tok"))
    // collect_list drops null elements: a null `elem` (empty doc's padding
    // row, or an OOV under the drop policy) simply doesn't enter the array
    val elem = oovId match {
      case Some(x) => when(col("tok"),
        struct(col("pos"), coalesce(col("tid"), lit(x)).as("tid")))
      case None => when(col("tok") && !col("oov"),
        struct(col("pos"), col("tid").as("tid")))
    }
    marked.groupBy("id").agg(
        sum(when(col("tok"), 1L).otherwise(0L)).as("n_tok"),
        sum(when(col("oov"), 1L).otherwise(0L)).as("n_oov"),
        collect_list(elem).as("pts"))
      .select(col("id"),
        transform(array_sort(col("pts")), p => p.getField("tid")).as("token_ids"),
        col("n_tok"), col("n_oov"))
  }

  /** Position-weighted checksum of an id array: Σ (i+1)·id_i (0-based i).
    * Order-sensitive, so it pins the exact sequence in a scalar the oracle
    * can reproduce (`sum(pos * tid)` over 1-based DuckDB positions). */
  def idChecksum(tokenIds: Column): Column =
    aggregate(transform(tokenIds, (t, i) => t * (i + lit(1)).cast("long")),
      lit(0L), (acc, v) => acc + v)

  /** Distributed BPE merge TRAINING (public algorithm: Sennrich, Haddow &
    * Birch 2016, "Neural Machine Translation of Rare Words with Subword
    * Units" — greedy highest-frequency pair merges, word-internal with the
    * `</w>` end marker, counted over word TYPES weighted by corpus
    * frequency). Output: the ordered merge table
    * `(merge_rank, lhs, rhs, merged, freq)` — the artifact a BPE
    * tokenizer applies.
    *
    * Scale shape: the corpus is scanned ONCE to build the word-type table
    * (a map-side-combined word count — types ≪ occurrences); every
    * iteration then runs on that vocab-sized table: pair counting is a
    * partial-aggregated counter `groupBy(l, r)`, the winning pair is a
    * deterministic 1-ROW driver collect (greedy BPE's sequential decision
    * — k round-trips for k merges, the standard distributed-trainer
    * shape), and the rewrite is a pure exact-substring `replace`
    * projection. `localCheckpoint` per round keeps the plan flat.
    *
    * Engine-portable by construction: a word travels as the bracketed
    * symbol string `⟨l⟩⟨o⟩⟨w⟩⟨</w>⟩`, so the pair rewrite is leftmost
    * non-overlapping exact `replace` — the same semantics in any engine,
    * and exactly greedy BPE's within-word scan (merging (x,x) on
    * `⟨x⟩⟨x⟩⟨x⟩` yields `⟨xx⟩⟨x⟩`). Ties break (freq desc, lhs asc,
    * rhs asc). The rare word already containing a bracket character is
    * excluded from training (it cannot be represented; filtered, like
    * regex-unsafe terms elsewhere in this file's family). */
  def bpeMerges(df: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    var types = df.select(explode(TextAnalysis.words(col(textCol))).as("w"))
      .where(!col("w").contains("⟨") && !col("w").contains("⟩"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(concat(lit("⟨"),
          array_join(concat(regexp_extract_all(col("w"), lit("."), lit(0)),
            array(lit("</w>"))), "⟩⟨"),
          lit("⟩")).as("s"),
        col("freq"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= nMerges && !exhausted) {
      val syms = regexp_extract_all(col("s"), lit("⟨([^⟩]*)⟩"), lit(1))
      val top = types
        .select(col("freq"), explode(zip_with(
            syms, slice(syms, lit(2), greatest(size(syms) - 1, lit(0))),
            (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .where(col("p.r").isNotNull) // zip_with's null tail padding
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("l"), col("r")).limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((rank, l, r, l + r, n))
        types = types.select(
            call_function("replace", col("s"),
              lit(s"⟨$l⟩⟨$r⟩"), lit(s"⟨$l$r⟩")).as("s"),
            col("freq"))
          .localCheckpoint()
        rank += 1
      }
    }
    merges.result().toDF("merge_rank", "lhs", "rhs", "merged", "freq")
  }

  /** BPE SEGMENTATION — apply a [[bpeMerges]] table to a corpus: each word
    * replays the merge list in rank order (greedy BPE inference) and the
    * document becomes its subword stream. Output
    * `(id, n_subtok, subwords: array<string>)` in original word order;
    * word-free docs emit nothing.
    *
    * Scale shape: the merge table is collected once (it is the trained
    * artifact — ≤ vocab-budget rows) and folds into ONE chained
    * exact-replace projection, so segmentation RIDES THE SCAN — no join,
    * no per-word state; the only shuffle is the per-doc reassembly
    * `groupBy(id)`. The fold nests one codegen call per merge, which
    * holds to a few hundred merges; a production-size merge list (30k+)
    * would chain batched projections with checkpoints — same plan shape,
    * just split. A word containing a bracket character cannot take the
    * symbol encoding and passes through as a single opaque token
    * (mirroring its exclusion from training). */
  def bpeSegment(df: DataFrame, idCol: String, textCol: String,
      merges: DataFrame): DataFrame = {
    val ms = merges.orderBy("merge_rank").collect()
      .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs")))
    val toks = df.select(col(idCol).as("id"),
      posexplode(TextAnalysis.words(col(textCol))).as(Seq("pos", "w")))
    val bracketed = concat(lit("⟨"),
      array_join(concat(regexp_extract_all(col("w"), lit("."), lit(0)),
        array(lit("</w>"))), "⟩⟨"),
      lit("⟩"))
    val merged = ms.foldLeft(bracketed) { case (acc, (l, r)) =>
      call_function("replace", acc, lit(s"⟨$l⟩⟨$r⟩"), lit(s"⟨$l$r⟩"))
    }
    val subs = when(col("w").contains("⟨") || col("w").contains("⟩"), array(col("w")))
      .otherwise(regexp_extract_all(merged, lit("⟨([^⟩]*)⟩"), lit(1)))
    toks.select(col("id"), col("pos"), subs.as("subs"))
      .groupBy("id")
      .agg(sum(size(col("subs"))).cast("long").as("n_subtok"),
        collect_list(struct(col("pos"), col("subs"))).as("ps"))
      .select(col("id"), col("n_subtok"),
        flatten(transform(array_sort(col("ps")), p => p.getField("subs"))).as("subwords"))
  }
}
