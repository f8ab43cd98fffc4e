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

  test("signProjectionOverlapAtK: brute-force twin over the same md5 plane table") {
    // deterministic 8-dim corpus with structure (two rough clusters),
    // r=4 projection; the expected overlap is recomputed from first
    // principles with the SAME sign table
    val dims = 8; val r = 4; val k = 3
    def vec(i: Long): Seq[Float] =
      (0 until dims).map { d =>
        val base = if (i % 2 == 0) d.toFloat else (dims - d).toFloat
        (base + ((i * 31 + d * 17) % 5).toFloat / 10f) / 10f
      }
    val corpus = (1L to 24L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val queries = Seq(1L, 2L).map(i =>
      (i, vec(i).map(Ann.quantizeL).toSeq))
    val got = Ann.signProjectionOverlapAtK(corpus, "vec_id", "embedding",
                                           queries, k = k, rDims = r)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    // driver twin
    val signs = Ann.planeSigns(r, dims)
    val iv = (1L to 24L).map(i => i -> vec(i).map(Ann.quantizeL).toSeq).toMap
    val expect = queries.map { case (qid, qv) =>
      val qp = signs.map(row => row.zip(qv).map { case (s, x) => s * x }.sum)
      def topk(score: Long => Long): Seq[Long] =
        iv.keys.toSeq.sortBy(id => (-score(id), id)).take(k)
      val full = topk(id => iv(id).zip(qv).map { case (a, b) => a * b }.sum)
      val proj = topk { id =>
        val p = signs.map(row => row.zip(iv(id)).map { case (s, x) => s * x }.sum)
        p.zip(qp).map { case (a, b) => a * b }.sum
      }
      (qid, full.toSet.intersect(proj.toSet).size.toLong)
    }
    assert(got == expect, s"got=$got expect=$expect")
    // the projection carries signal on this fixture (not all-zero
    // overlap); per-query zero is legitimate — under MIPS a query's
    // own vector need not rank top even unprojected
    assert(got.map(_._2).sum >= 1L, got.toString)
  }
}
