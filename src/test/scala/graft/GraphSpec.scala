package graft

import graft.dedup.Dedup
import graft.operators.Graph

/** Fixed-point PageRank + the shingle-share edge builder (q130). */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("driver twin: exact fixed-point power iteration on a known graph") {
    // path graph 1-2-3 plus edge 2-4: node 2 is the hub
    val edges = Seq((1L, 2L), (2L, 3L), (2L, 4L)).toDF("a", "b")
    val got = Graph.pageRank(edges, "a", "b", iters = 3)
      .orderBy("node").as[(Long, Long, Long)].collect().toSeq
    // exact integer twin
    val sym = Seq(1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 2L, 2L -> 4L, 4L -> 2L)
    val deg = sym.groupBy(_._1).map { case (n, g) => n -> g.size.toLong }
    var pr: Map[Long, Long] = deg.map { case (n, _) => n -> 1000000L }.toMap
    for (_ <- 1 to 3) {
      val inflow = sym.groupBy(_._2).map { case (n, in) =>
        n -> in.map { case (s, _) => pr(s) / deg(s) }.sum }
      pr = deg.map { case (n, _) =>
        n -> (150000L + 85L * inflow.getOrElse(n, 0L) / 100L) }.toMap
    }
    assert(got == Seq(1L, 2L, 3L, 4L).map(n => (n, deg(n), pr(n))))
    // the hub outranks every leaf
    val m = got.map(r => r._1 -> r._3).toMap
    assert(m(2L) > m(1L) && m(2L) > m(3L) && m(2L) > m(4L))
  }

  test("rank mass is conserved up to truncation: sum pr <= n*scale, close to it") {
    val edges = (1L to 9L).map(i => (i, i + 1)).toDF("a", "b")
    val got = Graph.pageRank(edges, "a", "b", iters = 4)
      .as[(Long, Long, Long)].collect()
    val total = got.map(_._3).sum
    assert(total <= 10L * 1000000L)
    assert(total > 10L * 990000L, s"truncation lost too much: $total")
  }

  test("shingle-share edges: planted near-dups pair with the exact shared count") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base), (2L, base + " extra tail words here"),
      (3L, "completely different content with no overlap at all present"))
    val got = Dedup.shingleShareEdges(docs.toDF("doc_id", "text"),
                                      "doc_id", "text",
                                      dfCap = 20, minShared = 3)
      .as[(Long, Long, Long)].collect().toSeq
    // docs 1/2 share the 6 shingles of the 10-token base; doc 3 pairs
    // with nobody
    assert(got == Seq((1L, 2L, 6L)))
  }

  test("df-cap drops stop-shingles: a phrase in every doc pairs nobody") {
    val common = "the exact same boilerplate line appears in every document"
    val docs = (1L to 10L).map(i => (i, s"$common unique$i")).toDF("doc_id", "text")
    val got = Dedup.shingleShareEdges(docs, "doc_id", "text",
                                      dfCap = 5, minShared = 1)
      .collect()
    assert(got.isEmpty)
  }

  test("plan: no cartesian product in edges or rank rounds") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val plan = Graph.pageRank(edges, "a", "b", iters = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("UDF("), plan)
  }
}
