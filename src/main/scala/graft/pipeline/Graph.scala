package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph scoring over edge tables — weighted PageRank in exact
  * fixed-point arithmetic, and TextRank (PageRank over the word-adjacency
  * graph; Mihalcea & Tarau 2004) as the corpus-keyword application.
  *
  * Why fixed-point: PageRank is usually float, but float sums are
  * order-dependent, so a distributed run and a single-node oracle drift
  * apart in the last ulps and tie-break differently. Scores here are
  * BIGINT micromass units (`fpScale` = 10^12 = total probability mass):
  * every step is integer multiply / truncating integer divide / integer
  * sum — associative, engine-portable, bit-identical on any partitioning
  * or shuffle order. The truncation loses < 1 unit (10^-12 of mass) per
  * edge per round — far below any ranking signal — and makes the result
  * REPRODUCIBLE, which float PageRank is not.
  *
  * Scale shape (one iteration = one join + one groupBy, the Pregel
  * message step):
  *  - `edges ⋈ scores` keys on the src node. Scores are vocab-/host-sized
  *    but UNBOUNDED (10^8+ nodes on web graphs) so the join carries no
  *    broadcast hint — AQE decides from measured sizes, and its skew-join
  *    splits the Zipf hubs ("the" in a word graph, big portals in a host
  *    graph) that dominate the probe side.
  *  - contributions `groupBy(dst)` partial-aggregates: the map side
  *    collapses each hot destination before the shuffle, so a hub's cost
  *    is its distinct-neighbor count, not its occurrence count.
  *  - per-src strength is attached ONCE before the loop (the edge table
  *    with strength is checkpointed and reused by every round).
  *  - each round ends in `localCheckpoint` — O(iters) plan depth, not
  *    O(iters²) lineage re-execution.
  *
  * Overflow: products are bounded by fpScale × max edge weight ≤ 10^12 ×
  * w_max; ANSI mode is ON so a corpus big enough to overflow fails loudly
  * — at that scale swap the score column to DECIMAL(38,0) (same integer
  * semantics, wider headroom); the oracle-pinned tests cover the BIGINT
  * form.
  */
object Graph {

  val fpScale: Long = 1000000000000L

  /** Weighted PageRank with damping `dampPct`/100 over a directed edge
    * table `(src, dst, weight)`, `iters` fixed rounds (fixed — the oracle
    * replays the identical rounds; convergence-checked variants belong to
    * the caller). Returns `(id, score_fp)`, one row per node that appears
    * as a source or destination.
    *
    * Dangling nodes (no out-edges) receive teleport + in-flow but emit
    * nothing — their mass evaporates instead of being redistributed (the
    * standard sparse simplification; on symmetrized graphs, e.g.
    * [[textRank]], every node has out-edges so no mass is lost).
    *
    * Exact arithmetic contract, mirrored verbatim by the DuckDB oracle
    * (`//` there, `div` here — both truncate toward zero on the
    * non-negative operands used):
    * {{{
    *   base      = fpScale div N
    *   s0(v)     = base
    *   contrib   = (s(u) * w(u,v)) div strength(u)
    *   s'(v)     = (base * (100 - dampPct)) div 100
    *             + (dampPct * Σ_u contrib) div 100
    * }}}
    */
  def pagerank(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, iters: Int = 5, dampPct: Int = 85): DataFrame = {
    require(iters >= 1 && dampPct >= 0 && dampPct <= 100)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(weightCol).cast("long").as("w"))
    // out-strength attached once; this table drives every round
    val strength = e.groupBy("src").agg(sum("w").as("st"))
    val ew = e.join(strength, "src").localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id")))
      .distinct().localCheckpoint()
    val n = nodes.count()
    require(n > 0, "pagerank over an empty edge table")
    val base = fpScale / n
    val teleport = base * (100L - dampPct) / 100L

    var scores = nodes.withColumn("score_fp", lit(base))
    for (_ <- 1 to iters) {
      scores = pagerankRound(ew, nodes, scores, teleport, dampPct).localCheckpoint()
    }
    scores
  }

  /** One Pregel message round, checkpoint-free (isolated so plan audits can
    * inspect the real per-iteration shape): join scores onto the
    * strength-carrying edge table, partial-aggregate contributions by
    * destination, apply teleport + damping. */
  private[graft] def pagerankRound(ew: DataFrame, nodes: DataFrame,
      scores: DataFrame, teleport: Long, dampPct: Int): DataFrame = {
    val contrib = ew.join(scores.withColumnRenamed("id", "src"), "src")
      .groupBy("dst")
      .agg(sum(expr("(score_fp * w) div st")).as("c"))
    nodes
      .join(contrib.withColumnRenamed("dst", "id"), Seq("id"), "left")
      .select(col("id"),
        (lit(teleport) +
          expr(s"($dampPct * coalesce(c, 0L)) div 100")).as("score_fp"))
  }

  /** TextRank corpus keywords: PageRank over the word co-occurrence graph
    * (nodes = distinct words, edges = adjacent word pairs symmetrized,
    * weight = occurrence count; self-loops dropped). Complements TF-IDF
    * (p41): TF-IDF scores words by document contrast, TextRank by graph
    * centrality — boilerplate connectors rank high in raw frequency but
    * low in TextRank once damping spreads mass to content hubs.
    *
    * The edge build rides the scan: one `zip_with` of two shifted slices
    * (all array refs top-level — HOF lambda captures re-evaluate per
    * element), one explode, one groupBy. Output `(rank, word, score_fp)`,
    * top `topK` by (score desc, word) — exact integer scores make the
    * tie-break engine-portable. */
  def textRank(df: DataFrame, textCol: String, iters: Int = 5,
      topK: Int = 20, dampPct: Int = 85): DataFrame = {
    val ws = df.select(TextAnalysis.words(col(textCol)).as("ws"))
      .where(size(col("ws")) > 1)
    val pairs = ws.select(explode(zip_with(
        slice(col("ws"), lit(1), size(col("ws")) - 1),
        slice(col("ws"), lit(2), size(col("ws")) - 1),
        (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .where(col("a") =!= col("b"))
    val e0 = pairs.groupBy("a", "b").agg(count(lit(1)).as("n"))
    val edges = e0.select(col("a").as("src"), col("b").as("dst"), col("n"))
      .unionByName(e0.select(col("b").as("src"), col("a").as("dst"), col("n")))
      .groupBy("src", "dst").agg(sum("n").as("w"))
    val scored = pagerank(edges, "src", "dst", "w", iters, dampPct)
    scored.select(col("id").as("word"), col("score_fp"))
      .orderBy(col("score_fp").desc, col("word"))
      .limit(topK)
      .select(row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("score_fp").desc, col("word"))).cast("long").as("rank"),
        col("word"), col("score_fp"))
  }
}
