package graft

import graft.search.Ann

/** SQ8 scalar quantization (q112): per-dimension codes, midpoint
  * reconstruction folded to one native integer dot, exactness vs a
  * driver-side twin.
  */
class AnnSqSpec extends SparkSpec {
  import spark.implicits._

  // 1e-3 grid: intVec multiplies by 1000
  private val vecs = Seq(
    (0L, Seq(0.0f, 1.0f, 5.0f)),
    (1L, Seq(1.0f, 1.0f, 3.0f)),
    (2L, Seq(2.0f, 1.0f, 1.0f))).toDF("vec_id", "embedding")

  private def twinCode(x: Long, lo: Long, hi: Long): Long =
    if (hi == lo) 0L
    else math.max(0L, math.min(255L, Math.floorDiv((x - lo) * 255L, hi - lo)))

  test("sqTrain finds per-dimension min/max on the integer grid") {
    assert(Ann.sqTrain(vecs, "embedding") ==
      Seq((0L, 2000L), (1000L, 1000L), (1000L, 5000L)))
  }

  test("codes match the floor twin; min->0, max->255, flat dim->0") {
    val mm = Ann.sqTrain(vecs, "embedding")
    val got = Ann.sqEncode(vecs, "vec_id", "embedding", mm)
      .orderBy("vec_id").as[(Long, Seq[Long])].collect().toSeq
    val expected = Seq(
      0L -> Seq(twinCode(0L, 0L, 2000L), 0L, twinCode(5000L, 1000L, 5000L)),
      1L -> Seq(twinCode(1000L, 0L, 2000L), 0L, twinCode(3000L, 1000L, 5000L)),
      2L -> Seq(255L, 0L, 0L))
    assert(got == expected)
    assert(got.head._2 == Seq(0L, 0L, 255L)) // extremes hit the rails
  }

  test("out-of-domain vectors clamp instead of overflowing the byte") {
    val mm = Seq((0L, 1000L), (0L, 1000L), (0L, 1000L))
    val wide = Seq((9L, Seq(-1.0f, 2.0f, 0.5f))).toDF("vec_id", "embedding")
    val got = Ann.sqEncode(wide, "vec_id", "embedding", mm)
      .as[(Long, Seq[Long])].collect().head._2
    assert(got == Seq(0L, 255L, 127L))
  }

  test("approx_num equals the driver reconstruction twin, exactly") {
    val mm = Ann.sqTrain(vecs, "embedding")
    val q = Seq(1.5f, -0.25f, 2.0f)
    val enc = Ann.sqEncode(vecs, "vec_id", "embedding", mm)
    val got = Ann.sqTopK(enc, "vec_id", mm, q, k = 3)
      .as[(Long, Long)].collect().toMap
    val qi = q.map(Ann.quantizeL)
    val codes = Map(
      0L -> Seq(0L, 0L, 255L), 1L -> Seq(127L, 0L, 127L),
      2L -> Seq(255L, 0L, 0L))
    for ((id, cs) <- codes) {
      val twin = qi.zip(mm).zip(cs).map { case ((qd, (lo, hi)), c) =>
        qd * (510L * lo + (2L * c + 1L) * (hi - lo)) }.sum
      assert(got(id) == twin, s"vec $id")
    }
  }

  test("on separated clusters the SQ ranking finds the exact winner") {
    // two tight clusters far apart; query sits on cluster A
    val rnd = new scala.util.Random(7)
    def jitter(base: Seq[Float]) = base.map(_ + rnd.nextInt(9) * 0.001f)
    val a = Seq(10f, 0f, 0f, 10f); val b = Seq(0f, 10f, 10f, 0f)
    val rows = (0 until 20).map(i =>
      (i.toLong, if (i < 10) jitter(a) else jitter(b)))
    val df = rows.toDF("vec_id", "embedding")
    val mm = Ann.sqTrain(df, "embedding")
    val enc = Ann.sqEncode(df, "vec_id", "embedding", mm)
    val top = Ann.sqTopK(enc, "vec_id", mm, a, k = 10)
      .as[(Long, Long)].collect().map(_._1).toSet
    assert(top == (0L until 10L).toSet, s"cluster A must win: $top")
  }

  test("plan: stored codes scan skips the vector column; native kernel; top-k") {
    val mm = Ann.sqTrain(vecs, "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft_sq").toString
    // the stored form a 100 TB scan reads: (id, codes) only
    Ann.sqEncode(vecs, "vec_id", "embedding", mm)
      .write.mode("overwrite").parquet(s"$dir/codes.parquet")
    val enc = spark.read.parquet(s"$dir/codes.parquet")
    val qe = Ann.sqTopK(enc, "vec_id", mm, Seq(1f, 1f, 1f), k = 2)
      .queryExecution
    val plan = qe.executedPlan.toString
    assert(!plan.contains("UDF("), "must stay codegen-native")
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("ReadSchema") && !plan.contains("embedding"),
           "the compressed scan must never touch the vector column")
  }
}
