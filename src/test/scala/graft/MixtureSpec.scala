package graft

import graft.text.Curation

/** Mixture allocation (q111): the budget solve — allocation, rate,
  * deficit per source in exact integer algebra.
  */
class MixtureSpec extends SparkSpec {
  import spark.implicits._

  // sources: a (2 docs, 10 tokens), b (1 doc, 2 tokens), c (1 doc, 4 tokens)
  private val docs = Seq(
    (1L, "a", "t t t t t t"), (2L, "a", "t t t t"),
    (3L, "b", "t t"),
    (4L, "c", "t t t t")).toDF("doc_id", "source", "text")

  private def run(weights: Seq[(String, Long)], budget: Long) =
    Curation.mixtureAllocation(docs, "source", "text", weights, budget)
      .orderBy("source")
      .select("source", "n_docs", "tokens_avail", "weight_ppm",
              "target_tokens", "allocated_tokens", "rate_ppm", "deficit")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq

  test("allocation, rate, and deficit match the hand computation") {
    // budget 8: a -> 500000ppm => target 4 of 10 avail (rate 400000),
    // b -> 500000ppm => target 4 of 2 avail (deficit 2, rate 10^6)
    val got = run(Seq("a" -> 500000L, "b" -> 500000L), 8L)
    assert(got == Seq(
      ("a", 2L, 10L, 500000L, 4L, 4L, 400000L, 0L),
      ("b", 1L, 2L, 500000L, 4L, 2L, 1000000L, 2L),
      ("c", 1L, 4L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("an unweighted source stays visible at weight 0") {
    val got = run(Seq("a" -> 1000000L), 10L)
    assert(got.map(_._1) == Seq("a", "b", "c"))
    assert(got.filter(_._1 != "a").forall(r => r._4 == 0L && r._6 == 0L))
  }

  test("integer floors: target and rate round down") {
    // budget 7 * 300000ppm = 2100000 // 10^6 = target 2 (not 2.1);
    // rate = 2*10^6 // 10 = 200000
    val got = run(Seq("a" -> 300000L), 7L).filter(_._1 == "a").head
    assert(got._5 == 2L && got._7 == 200000L)
  }

  test("overflow-safe at ppm scale for trillion-token budgets") {
    val got = run(Seq("a" -> 999999L), 5_000_000_000_000L).filter(_._1 == "a").head
    assert(got._5 == 4999995000000L) // 5e12 * 999999 div 1e6, exact
    assert(got._6 == 10L && got._8 == got._5 - 10L)
  }

  test("plan: one aggregate over the corpus, broadcast weights join") {
    val df = Curation.mixtureAllocation(docs, "source", "text",
                                        Seq("a" -> 1L), 10L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("UDF("))
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
           "token aggregate must map-side combine")
  }
}
