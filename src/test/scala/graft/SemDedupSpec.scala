package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** SemDeDup (q167): within-cell cosine edges → transitive groups →
  * survivor = least-centroid-similar member. Fixture uses orthogonal
  * cluster directions (collinear fixtures collapse the assignment)
  * and hand-picked magnitudes so every decision is a strict integer
  * comparison.
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Seq[Float] =
    (xs ++ Seq.fill(4 - xs.size)(0.0)).map(_.toFloat)

  // cell 0 (centroid along +x): a chain 1≈2≈3 where 1 and 3 are NOT
  // directly above threshold (only transitivity links them), plus an
  // orthogonal loner 4 in the same cell. cell 1: a lone +z vector.
  // cdot (dot with the literal centroid (1000,0,0,0)·1e3-grid):
  // doc1 = 1000·1000 = 1e6, doc2 = 900·1000, doc3 = 800·1000 → the
  // survivor of {1,2,3} must be doc 3 (LEAST centroid dot).
  private val assigned = Seq(
    (1L, vec(1.0, 0.00), 0L, 1000000L),
    (2L, vec(0.9, 0.12), 0L, 900000L),
    (3L, vec(0.8, 0.23), 0L, 800000L),
    (4L, vec(0.0, 1.00), 0L, 0L),
    (5L, vec(0.0, 0.0, 1.0), 1L, 1000000L)
  ).toDF("vec_id", "embedding", "cell", "cdot")

  private def run(num: Long, den: Long) =
    Dedup.semDedup(assigned, "vec_id", "embedding",
                   thresholdNum = num, thresholdDen = den)
      .orderBy(col("vec_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(4)))
      .toSeq

  test("chain collapses transitively; survivor is the least-centroid-similar member") {
    // cos(1,2) ≈ 0.991, cos(2,3) ≈ 0.987, cos(1,3) ≈ 0.961: at
    // cos² ≥ 0.95 (95/100 ⇒ cos ≥ 0.9747) the 1–3 edge is absent but
    // the chain still joins all three through 2.
    val out = run(95, 100)
    assert(out.map(x => (x._1, x._3)) ==
      Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 5L)), out.toString)
    assert(out.filter(_._4).map(_._1) == Seq(3L, 4L, 5L), out.toString)
  }

  test("singletons keep themselves; orthogonal same-cell vectors never link") {
    val out = run(95, 100)
    val d4 = out.find(_._1 == 4L).get
    assert(d4._3 == 4L && d4._4, d4.toString)
  }

  test("cells block edges: identical vectors in different cells both survive") {
    val cross = Seq(
      (1L, vec(1.0), 0L, 1000000L),
      (2L, vec(1.0), 1L, 0L)
    ).toDF("vec_id", "embedding", "cell", "cdot")
    val out = Dedup.semDedup(cross, "vec_id", "embedding",
                             thresholdNum = 81, thresholdDen = 100)
      .collect().map(r => (r.getLong(0), r.getBoolean(4))).toSeq.sorted
    assert(out == Seq((1L, true), (2L, true)), out.toString)
  }

  test("keep-one ties on cdot break to the ascending id") {
    val tied = Seq(
      (7L, vec(1.0), 0L, 500000L),
      (8L, vec(1.0), 0L, 500000L)
    ).toDF("vec_id", "embedding", "cell", "cdot")
    val out = Dedup.semDedup(tied, "vec_id", "embedding",
                             thresholdNum = 81, thresholdDen = 100)
      .collect().map(r => (r.getLong(0), r.getBoolean(4))).toSeq.sorted
    assert(out == Seq((7L, true), (8L, false)), out.toString)
  }
}
