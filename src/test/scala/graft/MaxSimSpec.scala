package graft

import graft.search.Ann
import org.apache.spark.sql.functions._

/** MaxSim late interaction (q158) and truncated-dimension overlap
  * (q159): hand-checked scores on one-hot fixtures, plus the plan
  * shape that keeps the top-k cut distributed.
  */
class MaxSimSpec extends SparkSpec {
  import spark.implicits._

  private def oneHot(i: Int, dims: Int = 4): Seq[Float] =
    Seq.tabulate(dims)(j => if (j == i) 1.0f else 0.0f)

  test("maxSim: every query vector finds its best doc vector; maxima sum") {
    // doc 0 carries {e0, e1}, doc 1 only {e0}, doc 2 only {e2}
    val corpus = Seq(
      (0L, oneHot(0)), (0L, oneHot(1)),
      (1L, oneHot(0)),
      (2L, oneHot(2))).toDF("doc", "embedding")
    // query bag {e0, e1}: doc0 matches both (2e6), doc1 one (1e6),
    // doc2 none (0)
    val queries = Seq((0L, oneHot(0)), (1L, oneHot(1)))
      .toDF("qi", "embedding")
      .select($"qi", Ann.intVec($"embedding").as("qv"))
    val got = Ann.maxSimTopK(corpus, "doc", "embedding", queries,
                             "qi", "qv", k = 10)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L, 2000000L), (2L, 1L, 1000000L),
                      (3L, 2L, 0L)), got.toString)
  }

  test("maxSim plans a TakeOrderedAndProject cut, not a corpus window") {
    val plan = SparkEntry.queries("q158_maxsim_late_interaction")(spark, Sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
  }

  test("truncatedOverlapAtK: overlap counted per query; trunc ties break by id") {
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.9f, 0.5f)),
      (3L, Seq(0.5f, 0.9f))).toDF("vec_id", "embedding")
    val queries = Seq(
      (10L, Seq(1000L, 0L)),   // full top2 {1,2}; trunc top2 {1,2} → 2
      (11L, Seq(0L, 1000L)))   // full top2 {3,2}; trunc all-0 ties → {1,2} → 1
    val got = Ann.truncatedOverlapAtK(corpus, "vec_id", "embedding",
                                      queries, k = 2, dims = 1)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((10L, 2L), (11L, 1L)), got.toString)
  }
}
