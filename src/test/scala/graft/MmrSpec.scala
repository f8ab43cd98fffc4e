package graft

import org.apache.spark.sql.functions._

import graft.search.Ann

/** MMR diversified rerank (q153's operator): hand-computed greedy
  * trace on a planted redundant cluster — the case plain top-k
  * provably wastes its budget on.
  */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  // quantized grid (×1000): a tight cluster a1/a2/a3 along the query
  // direction plus two diverse docs b/c on other axes. All values are
  // exact multiples of 1e-3 so the integer dots are hand-checkable.
  private val docs = Seq(
    (1L, Seq(1.0f, 0.1f, 0.0f, 0.0f)),   // a1: rel 1,000,000
    (2L, Seq(0.99f, 0.1f, 0.0f, 0.0f)),  // a2: rel   990,000, a1·a2 = 1,000,000
    (3L, Seq(0.98f, 0.1f, 0.0f, 0.0f)),  // a3: rel   980,000, a1·a3 =   990,000
    (4L, Seq(0.5f, 0.0f, 0.9f, 0.0f)),   // b:  rel   500,000, a1·b  =   500,000
    (5L, Seq(0.45f, 0.0f, 0.0f, 0.9f)))  // c:  rel   450,000, a1·c  =   450,000
  private val query = Seq(1.0f, 0.0f, 0.0f, 0.0f)

  test("plain top-3 returns the redundant cluster; MMR spends the budget on coverage") {
    val e = docs.toDF("vec_id", "embedding")
    val plain = Ann.intDotTopK(e, "vec_id", "embedding", query, k = 3)
      .select($"vec_id").as[Long].collect().toSeq
    assert(plain === Seq(1L, 2L, 3L), "relevance-only top-3 is the cluster")

    val mmr = Ann.mmrRerank(e, "vec_id", "embedding", query, k = 3, poolSize = 5)
      .orderBy($"rnk")
      .select($"rnk", $"vec_id", $"rel", $"red")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // greedy trace: a1 first (pure relevance, red 0); then a2/a3 score
    // rel − red = −10,000 while b scores 500,000 − 500,000 = 0 → b;
    // then c (0) still beats the cluster (−10,000)
    assert(mmr === Seq(
      (1L, 1L, 1000000L, 0L),
      (2L, 4L, 500000L, 500000L),
      (3L, 5L, 450000L, 450000L)), mmr.toString)
  }

  test("k larger than the corpus returns everything once; k must fit the pool") {
    val e = docs.toDF("vec_id", "embedding")
    val all = Ann.mmrRerank(e, "vec_id", "embedding", query, k = 9, poolSize = 9)
    assert(all.count() === 5)
    assert(all.select($"vec_id").as[Long].collect().toSet === Set(1L, 2L, 3L, 4L, 5L))
    assertThrows[IllegalArgumentException] {
      Ann.mmrRerank(e, "vec_id", "embedding", query, k = 10, poolSize = 5)
    }
  }

  test("string ids rank and tie-break identically to their natural order") {
    val e = docs.map { case (id, v) => (s"doc_$id", v) }.toDF("vec_id", "embedding")
    val mmr = Ann.mmrRerank(e, "vec_id", "embedding", query, k = 3, poolSize = 5)
      .orderBy($"rnk").select($"vec_id").as[String].collect().toSeq
    assert(mmr === Seq("doc_1", "doc_4", "doc_5"))
  }
}
