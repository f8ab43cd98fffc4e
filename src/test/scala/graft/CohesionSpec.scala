package graft

import graft.search.Ann

/** Embedding cohesion (q117): per-label spread vs separation, exact
  * integers, driver twin.
  */
class CohesionSpec extends SparkSpec {
  import spark.implicits._

  test("driver twin: truncated-mean centroids, intra spread, min inter") {
    val rows = Seq(
      (0L, Seq(1.0f, 0.0f), 0), (1L, Seq(3.0f, 0.0f), 0),
      (2L, Seq(0.0f, 10.0f), 1), (3L, Seq(0.0f, 12.0f), 1),
      (4L, Seq(20.0f, 20.0f), 2))
    val got = Ann.labelCohesion(rows.toDF("vec_id", "embedding", "label"),
                                "vec_id", "embedding", "label")
      .orderBy("label").as[(Long, Long, Long, Long)].collect().toSeq
    // grid x1000: label 0 centroid (2000, 0); intra = (1000^2 + 1000^2)/2
    // = 1e6; label 1 centroid (0, 11000), intra 1e6; label 2 singleton.
    val c0 = Seq(2000L, 0L); val c1 = Seq(0L, 11000L); val c2 = Seq(20000L, 20000L)
    def dist(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    assert(got == Seq(
      (0L, 2L, 1000000L, math.min(dist(c0, c1), dist(c0, c2))),
      (1L, 2L, 1000000L, math.min(dist(c1, c0), dist(c1, c2))),
      (2L, 1L, 0L, math.min(dist(c2, c0), dist(c2, c1)))))
  }

  test("centroid means TRUNCATE on negative sums (DuckDB // parity)") {
    // sum = -3 over 2 vectors: truncation -> -1 (floorDiv would say -2;
    // DuckDB's // truncates toward zero, so truncation is the contract)
    val rows = Seq((0L, Seq(-1.0f * 0.001f), 0), (1L, Seq(-2.0f * 0.001f), 0),
                   (2L, Seq(1.0f, 1.0f).take(1), 1))
    val got = Ann.labelCohesion(rows.toDF("vec_id", "embedding", "label"),
                                "vec_id", "embedding", "label")
      .orderBy("label").as[(Long, Long, Long, Long)].collect().toSeq
    // label 0 centroid dim: -3/2 = -1 truncated; intra:
    // (-1 - -1)^2 = 0, (-2 - -1)^2 = 1 -> avg = 0 (1/2 truncated)
    assert(got.head._3 == 0L)
    // inter distance uses the truncated centroid: (-1 - 1000)^2
    assert(got.head._4 == (-1L - 1000L) * (-1L - 1000L))
  }

  test("healthy space: separation exceeds spread for every label") {
    val rnd = new scala.util.Random(3)
    val bases = Seq(Seq(10f, 0f, 0f), Seq(0f, 10f, 0f), Seq(0f, 0f, 10f))
    val rows = (0 until 30).map { i =>
      val l = i % 3
      (i.toLong, bases(l).map(_ + rnd.nextInt(5) * 0.01f), l)
    }
    val got = Ann.labelCohesion(rows.toDF("vec_id", "embedding", "label"),
                                "vec_id", "embedding", "label")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length == 3)
    got.foreach { r =>
      assert(r._4 > 10L * r._3,
             s"separation must dominate spread in a healthy space: $r")
    }
  }

  test("plan: the scoring pass is one scan, no joins, native kernel") {
    val rows = Seq((0L, Seq(1.0f, 2.0f), 0), (1L, Seq(2.0f, 1.0f), 1))
    val df = Ann.labelCohesion(rows.toDF("vec_id", "embedding", "label"),
                               "vec_id", "embedding", "label")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("UDF("))
    assert(!plan.contains("Join"), s"scoring must not join: $plan")
  }
  test("a single-label corpus fails with a domain error, not empty.min") {
    val df = Seq((1L, Seq(0.1f, 0.2f), 0), (2L, Seq(0.3f, 0.1f), 0))
      .toDF("vec_id", "embedding", "label")
    val e = intercept[IllegalArgumentException] {
      Ann.labelCohesion(df, "vec_id", "embedding", "label")
    }
    assert(e.getMessage.contains("2 distinct labels"))
  }

}
