package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Embedding-space decontamination (q149): the asymmetric corpus ×
  * benchmark cosine gate over a blocking key — exact-integer algebra,
  * best-match pick, and the blocked-recall trade, each pinned on a
  * planted fixture with orthogonal directions (collinear fixtures
  * collapse every block decision into ties).
  */
class EmbeddingDeconSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Seq[Float] =
    (xs ++ Seq.fill(4 - xs.size)(0.0)).map(_.toFloat)

  // corpus: near-copy of bench 100 (cell 0), an orthogonal loner in a
  // benchless cell, an anti-parallel vector (dot < 0 can never pass),
  // and a tie probe equidistant to two identical bench vectors
  private val corpus = Seq(
    (1L, vec(0.9, 0.1), 0L),
    (2L, vec(0.0, 0.0, 1.0), 1L),
    (3L, vec(-1.0), 0L),
    (4L, vec(1.0), 2L)).toDF("vec_id", "embedding", "cell")
  private val bench = Seq(
    (100L, vec(1.0), 0L),
    (200L, vec(1.0), 2L),
    (201L, vec(1.0), 2L)).toDF("vec_id", "embedding", "cell")

  private def run(num: Long, den: Long) =
    Dedup.embeddingDecontaminate(corpus, bench, "vec_id", "embedding", "cell",
                                 thresholdNum = num, thresholdDen = den)
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("planted near-copy is flagged; benchless cell and negative dot are not") {
    val hits = run(25, 100) // cos ≥ 0.5
    assert(hits.map(_._1) == Seq(1L, 4L), hits.toString)
    // doc 1's best match is bench 100: dot = 900·1000 = 900000
    assert(hits.head == (1L, 100L, 900000L), hits.toString)
  }

  test("best-match ties break to the smaller bench id") {
    // doc 4 scores identically against bench 200 and 201
    val hits = run(25, 100)
    assert(hits.find(_._1 == 4L).contains((4L, 200L, 1000000L)), hits.toString)
  }

  test("the threshold is inclusive at exact cos² = num/den") {
    // (1,1,0,0)·(1,0,0,0): cos² = 1/2 exactly on the integer grid
    val edge = Seq((5L, vec(1.0, 1.0), 0L)).toDF("vec_id", "embedding", "cell")
    val at = Dedup.embeddingDecontaminate(edge, bench, "vec_id", "embedding",
               "cell", thresholdNum = 50, thresholdDen = 100).collect()
    val above = Dedup.embeddingDecontaminate(edge, bench, "vec_id", "embedding",
               "cell", thresholdNum = 51, thresholdDen = 100).collect()
    assert(at.length == 1 && at.head.getLong(1) == 100L)
    assert(above.isEmpty)
  }

  test("a near-copy in a different cell is missed by construction (blocked trade)") {
    val stray = Seq((6L, vec(1.0, 0.001), 3L)).toDF("vec_id", "embedding", "cell")
    val hits = Dedup.embeddingDecontaminate(stray, bench, "vec_id", "embedding",
                 "cell", thresholdNum = 25, thresholdDen = 100).collect()
    assert(hits.isEmpty)
  }

  test("each contaminated corpus id reports exactly once; bench ids never appear as doc_id") {
    val hits = run(1, 100)
    assert(hits.map(_._1).distinct.size == hits.size)
    assert(hits.map(_._1).toSet.intersect(Set(100L, 200L, 201L)).isEmpty)
  }
}
