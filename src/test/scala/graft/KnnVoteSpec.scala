package graft

import org.apache.spark.sql.functions._

import graft.search.Ann

/** kNN label vote (q100): majority label among the k nearest other
  * vectors, exact integer dots, deterministic tie-break.
  */
class KnnVoteSpec extends SparkSpec {
  import spark.implicits._

  private def vec(axis: Int, scale: Float): Seq[Float] =
    Seq.tabulate(64)(d => if (d == axis) scale else 0.0f)

  private def corpus(rows: (Long, Int, Seq[Float])*) =
    rows.toSeq.toDF("vec_id", "label", "embedding")

  private def vote(c: org.apache.spark.sql.DataFrame, qid: Long, k: Int) = {
    val q = c.filter(col("vec_id") === qid)
      .select(col("vec_id").as("qid"), Ann.intVec(col("embedding")).as("qv"))
    Ann.knnLabelVote(c, "vec_id", "embedding", "label", q, "qid", "qv", k)
      .as[(Long, Long, Long)].collect().toSeq
  }

  test("majority label wins; self vector never votes") {
    // label 0 lives on axis 0, label 1 on axis 1; the query IS id 1,
    // so its own row must not vote for it
    val c = corpus(
      (1L, 0, vec(0, 1.0f)), (2L, 0, vec(0, 0.9f)), (3L, 0, vec(0, 0.8f)),
      (4L, 1, vec(1, 1.0f)), (5L, 1, vec(1, 0.9f)), (6L, 1, vec(1, 0.8f)))
    // k=5 neighbors of id 1: ids 2,3 (positive dot) then 4,5,6 (dot 0,
    // id-ordered) -> votes 0->2, 1->3 ... label 1 would win; use k=3
    // to isolate the majority: ids 2,3 (label 0) + 4 (label 1)
    assert(vote(c, 1L, k = 3) == Seq((1L, 0L, 2L)))
  }

  test("vote ties break to the smallest label") {
    // query on axis 2 is equidistant (dot 0) from everything: the
    // k=4 nearest are ids 1,2,3,4 by id order -> 2 votes each
    val c = corpus(
      (1L, 7, vec(0, 1.0f)), (2L, 7, vec(0, 0.9f)),
      (3L, 4, vec(1, 1.0f)), (4L, 4, vec(1, 0.9f)),
      (9L, 9, vec(2, 1.0f)))
    assert(vote(c, 9L, k = 4) == Seq((9L, 4L, 2L)))
  }

  test("prediction agrees with the axis cluster for a held-out query") {
    val c = corpus(
      (1L, 0, vec(0, 1.0f)), (2L, 0, vec(0, 0.9f)), (3L, 0, vec(0, 0.8f)),
      (4L, 1, vec(1, 1.0f)), (5L, 1, vec(1, 0.9f)),
      (10L, 1, vec(0, 0.7f))) // mislabeled vector on axis 0
    // neighbors of 10 at k=3: 1,2,3 (all label 0) -> predicted 0 ≠ own 1
    assert(vote(c, 10L, k = 3) == Seq((10L, 0L, 3L)))
  }

  test("hard negatives: nearest WRONG-label vectors only — same-label near-dups never leak in") {
    // anchor (id 1, label 0) on axis 0; its nearest neighbors 2,3 share
    // its label and MUST be skipped; the mined negatives are the
    // mislabeled axis-0 vector (closest wrong label) then the axis-1
    // cluster in id order (dot 0 ties)
    val c = corpus(
      (1L, 0, vec(0, 1.0f)), (2L, 0, vec(0, 0.9f)), (3L, 0, vec(0, 0.8f)),
      (4L, 1, vec(1, 1.0f)), (5L, 1, vec(1, 0.9f)),
      (10L, 1, vec(0, 0.7f))) // the hard one: wrong label, high dot
    val q = c.filter(col("vec_id") === 1L)
      .select(col("vec_id").as("qid"), Ann.intVec(col("embedding")).as("qv"),
              col("label").as("ql"))
    val negs = Ann.hardNegatives(c, "vec_id", "embedding", "label",
                                 q, "qid", "qv", "ql", k = 3)
      .orderBy(col("rnk"))
      .select(col("rnk"), col("vec_id"), col("dot"), col("label"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(negs === Seq(
      (1L, 10L, 700000L, 1L), // 1000·700 exact
      (2L, 4L, 0L, 1L),
      (3L, 5L, 0L, 1L)), negs.toString)
  }
}
