package graft.pipeline

import graft.SparkSuite
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSuite {
  import spark.implicits._

  test("pagerank: symmetric 2-node graph is the exact fixed point") {
    // N=2 → base = 5e11; each node's contribution to the other is its full
    // score, so s' = base*15/100 + 85*s/100 = s exactly — the integer
    // arithmetic must hold this fixed point bit-for-bit over many rounds
    val edges = Seq(("a", "b", 3L), ("b", "a", 3L)).toDF("src", "dst", "w")
    val scores = Graph.pagerank(edges, "src", "dst", "w", iters = 7)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(scores == Map("a" -> 500000000000L, "b" -> 500000000000L))
  }

  test("pagerank: star center outranks leaves and mass is conserved up to truncation") {
    val leaves = (1 to 9).map(i => s"leaf$i")
    val edges = leaves.flatMap(l => Seq(("hub", l, 1L), (l, "hub", 1L)))
      .toDF("src", "dst", "w")
    val rows = Graph.pagerank(edges, "src", "dst", "w", iters = 5).collect()
    val scores = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(leaves.forall(l => scores("hub") > scores(l)))
    assert(leaves.map(scores).distinct.size == 1, "symmetric leaves must tie exactly")
    val total = scores.values.sum
    // each div truncates < 1 unit per (node + edge) per round
    val slack = (scores.size + 18L) * 5L
    assert(total <= Graph.fpScale && total >= Graph.fpScale - slack,
      s"mass $total drifted from ${Graph.fpScale}")
  }

  test("pagerank: dangling destination still gets teleport + in-flow") {
    val edges = Seq(("a", "sink", 1L), ("a", "b", 1L), ("b", "a", 1L))
      .toDF("src", "dst", "w")
    val scores = Graph.pagerank(edges, "src", "dst", "w", iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(scores.keySet == Set("a", "b", "sink"))
    val teleport = (Graph.fpScale / 3) * 15 / 100
    assert(scores("sink") > teleport, "sink must receive in-flow on top of teleport")
  }

  test("textRank: graph hub outranks a high-frequency isolated pair") {
    // "hub" co-occurs with 8 distinct words once each; "loop"/"pair"
    // co-occur with only each other 8 times. Degree-weighted centrality
    // must favor the hub even though raw frequency ties.
    val hubDoc = (1 to 8).map(i => s"hub w$i hub").mkString(" ")
    val pairDoc = Seq.fill(8)("loop pair").mkString(" ")
    val df = Seq(hubDoc, pairDoc).toDF("text")
    val ranked = Graph.textRank(df, "text", iters = 5, topK = 30).collect()
    val byWord = ranked.map(r => r.getString(1) -> r.getLong(0)).toMap
    assert(byWord("hub") < byWord("loop") && byWord("hub") < byWord("pair"))
    assert(ranked.map(_.getLong(0)).toSeq == (1L to ranked.length).toSeq)
  }

  test("pagerank equals a driver-side reference fold on random graphs (exact integers)") {
    // fixed-point arithmetic means the distributed result must EQUAL a
    // sequential reference implementation — not approximately, exactly
    val rnd = new scala.util.Random(42)
    val n = 40
    val edgeSeq = (0 until 160).map { _ =>
      (s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}", 1L + rnd.nextInt(5))
    }.filter { case (a, b, _) => a != b }.distinct
    val edges = edgeSeq.toDF("src", "dst", "w")
    val got = Graph.pagerank(edges, "src", "dst", "w", iters = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // reference: same formula, Map-based
    val nodes = (edgeSeq.map(_._1) ++ edgeSeq.map(_._2)).distinct.sorted
    val strength = edgeSeq.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val base = Graph.fpScale / nodes.size
    val teleport = base * 15L / 100L
    var s = nodes.map(_ -> base).toMap
    for (_ <- 1 to 4) {
      val in = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      edgeSeq.foreach { case (a, b, w) => in(b) += s(a) * w / strength(a) }
      s = nodes.map(v => v -> (teleport + 85L * in(v) / 100L)).toMap
    }
    assert(got === s)
  }

  test("textRank is deterministic across runs and repartitionings") {
    val docs = (0 until 50).map(i => s"alpha beta w$i gamma ${"delta " * (i % 3)}")
      .toDF("text")
    val a = Graph.textRank(docs, "text", topK = 10).collect().toSeq
    val b = Graph.textRank(docs.repartition(7), "text", topK = 10).collect().toSeq
    assert(a == b)
  }
}
