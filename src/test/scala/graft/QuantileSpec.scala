package graft

import graft.queries.Pipeline

/** Exact grouped quantiles (q122): rank selection at ceil(p*n), the
  * quantile_disc convention.
  */
class QuantileSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Double)]) =
    Pipeline.groupedQuantiles(rows.toDF("event_type", "value"),
                              "event_type", "value")
      .orderBy("event_type")
      .as[(String, Long, Long, Long, Long)].collect().toSeq

  private def pick(vals: Seq[Long], p: Double): Long = {
    val s = vals.sorted
    s(math.ceil(p * s.size).toInt - 1)
  }

  test("matches the sorted-selection twin on odd, even, and skewed groups") {
    val rnd = new scala.util.Random(17)
    val rows = (1 to 31).map(i => ("odd", rnd.nextInt(500) / 100.0)) ++
      (1 to 24).map(i => ("even", rnd.nextInt(900) / 100.0)) ++
      (1 to 10).map(_ => ("skew", 1.0)) :+ (("skew", 99.0))
    val got = run(rows)
    val byType = rows.groupBy(_._1).view
      .mapValues(_.map(r => math.round(r._2 * 100))).toMap
    for ((t, n, p25, p50, p75) <- got) {
      val vs = byType(t)
      assert(n == vs.size)
      assert((p25, p50, p75) ==
        (pick(vs, 0.25), pick(vs, 0.50), pick(vs, 0.75)), s"type $t")
    }
  }

  test("a single-row group reports that row at every quantile") {
    assert(run(Seq(("solo", 4.2))) == Seq(("solo", 1L, 420L, 420L, 420L)))
  }

  test("duplicate values make tie order irrelevant") {
    val rows = Seq.fill(8)(("d", 5.0)) ++ Seq(("d", 1.0), ("d", 9.0))
    val got = run(rows).head
    assert((got._3, got._4, got._5) == (500L, 500L, 500L))
  }
  test("typeCol is fully parameterized: any input column name resolves") {
    // the window must run on the post-rename names — a window built on
    // col(typeCol) fails to resolve once the select renames it away
    val got = Pipeline.groupedQuantiles(
        Seq(("x", 1.0), ("x", 2.0), ("x", 3.0), ("y", 7.0))
          .toDF("etype", "amount"), "etype", "amount")
      .orderBy("event_type").as[(String, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got == Seq(("x", 3L, 100L, 200L, 300L),
                      ("y", 1L, 700L, 700L, 700L)))
  }

}
