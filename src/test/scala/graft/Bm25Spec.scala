package graft

import org.apache.spark.sql.functions._

import graft.search.Search

/** BM25 ranked search ([[Search.bm25TopK]]): exact-rational scoring is
  * recomputed from first principles in BigInt (immune to any Spark
  * decimal/precision subtlety) and the plan shape that makes the
  * operator scale is pinned:
  *   - the `\W+` tokenizer runs ONCE per row — CollapseProject must not
  *     inline a copy of the split into every per-term tf column;
  *   - the corpus never hash-shuffles — the only exchanges are the
  *     1-row corpus-stats reduction and its broadcast back;
  *   - top-k is TakeOrderedAndProject, never a global sort.
  */
class Bm25Spec extends SparkSpec {

  private val Query = "stream window"
  private val K = 10

  private lazy val docs = graft.io.Tables.load(spark, Sf001, "documents")

  private def referenceScores: Map[Long, (Long, BigInt)] = {
    val rows = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val toks = rows.map { case (id, text) =>
      id -> text.toLowerCase.split("\\W+").filter(_.nonEmpty).toSeq
    }
    val qts = Query.toLowerCase.split("\\W+").filter(_.nonEmpty).distinct.toSeq
    val n = BigInt(toks.size)
    val t = BigInt(toks.map(_._2.size.toLong).sum)
    val dfs = qts.map(qt => qt -> BigInt(toks.count(_._2.contains(qt)))).toMap
    toks.map { case (id, ts) =>
      val dl = BigInt(ts.size)
      val score = qts.map { qt =>
        val tf = BigInt(ts.count(_ == qt))
        val df = dfs(qt)
        val tfc = tf.min(BigInt(1048576))
        if (tf == 0) BigInt(0)
        else (BigInt(10000) * (2 * (n - df) + 1) * 22 * tfc * t) /
          ((2 * df + 1) * (10 * t * tfc + 3 * t + 9 * dl * n))
      }.sum
      id -> (dl.toLong, score)
    }.toMap
  }

  test("bm25TopK equals the BigInt first-principles recomputation") {
    val got = Search.bm25TopK(docs, "doc_id", "text", Query, k = K)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ref = referenceScores
    val expected = ref.toSeq
      .filter { case (_, (_, s)) => s > 0 }
      .sortBy { case (id, (_, s)) => (-s, id) }
      .take(K)
      .map { case (id, (dl, s)) => (id, dl, s.toLong) }
    assert(got.toSeq == expected,
           s"got ${got.toSeq.take(5)}... expected ${expected.take(5)}...")
    assert(got.nonEmpty, "query terms must match at least one doc")
  }

  test("bm25 ranking differs from bare tf (idf and length normalization bite)") {
    val ref = referenceScores
    val matched = ref.filter(_._2._2 > 0)
    // At least two matched docs with equal total tf but different score
    // would prove normalization; weaker but robust: scores are not all
    // equal across matched docs (some discrimination happens).
    assert(matched.map(_._2._2).toSet.size > 1,
           "all matched docs scored identically — ranking is degenerate")
  }

  test("plan: one tokenizer pass, no corpus hash-shuffle, TakeOrderedAndProject top-k") {
    val plan = Search.bm25TopK(docs, "doc_id", "text", Query, k = K)
      .queryExecution.executedPlan.toString
    def countOccurrences(s: String, sub: String): Int =
      s.sliding(sub.length).count(_ == sub)
    // Two corpus passes is the floor (stats reduction, then scoring);
    // each tokenizes once. More means CollapseProject inlined a copy
    // per term or InferFiltersFromConstraints pushed isnotnull filters
    // that re-run the tokenizer.
    assert(countOccurrences(plan, "split(lower(") == 2,
           s"tokenizer must run once per corpus pass, plan:\n${plan.take(3000)}")
    assert(!plan.linesIterator.exists(l => l.contains("Filter") && l.contains("split(lower(")),
           s"no pushed-down filter may re-run the tokenizer, plan:\n${plan.take(3000)}")
    assert(!plan.contains("Exchange hashpartitioning"),
           s"corpus must not hash-shuffle, plan:\n${plan.take(3000)}")
    assert(plan.contains("TakeOrderedAndProject"),
           s"top-k must be TakeOrderedAndProject, plan:\n${plan.take(3000)}")
    assert(plan.contains("BroadcastExchange"),
           s"corpus stats must broadcast back, plan:\n${plan.take(3000)}")
  }
}
