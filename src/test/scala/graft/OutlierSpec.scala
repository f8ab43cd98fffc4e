package graft

import org.apache.spark.sql.functions._

import graft.queries.Pipeline

/** Value-outlier gate (q114): the z-test cleared of division and sqrt,
  * exact integers.
  */
class OutlierSpec extends SparkSpec {
  import spark.implicits._

  private def mk(rows: Seq[(Long, String, Double)]) =
    rows.toDF("event_id", "event_type", "value")

  test("a gross outlier flags; the bulk does not; types are independent") {
    // type a: twenty 1.00s and one 100.00 -> z^2 ~ 20 > 9
    val a = (1L to 20L).map(i => (i, "a", 1.0)) :+ ((21L, "a", 100.0))
    // type b: constant -> variance 0, nothing flags
    val b = (30L to 40L).map(i => (i, "b", 5.0))
    val got = Pipeline.valueOutliers(mk(a ++ b), "event_type", "value")
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((21L, "a", 10000L)))
  }

  test("driver twin: exactly the rows with (nv-S)^2 > 9(nQ-S^2)") {
    val rnd = new scala.util.Random(11)
    val rows = (1L to 200L).map(i => (i, s"t${i % 3}",
      rnd.nextInt(1000) / 100.0 + (if (i % 97 == 0) 500.0 else 0.0)))
    val got = Pipeline.valueOutliers(mk(rows), "event_type", "value")
      .as[(Long, String, Long)].collect().map(_._1).toSet
    val cents = rows.map { case (id, t, v) => (id, t, math.round(v * 100)) }
    val twin = cents.groupBy(_._2).flatMap { case (_, g) =>
      val n = BigInt(g.size)
      val s = g.map(r => BigInt(r._3)).sum
      val q = g.map(r => BigInt(r._3) * r._3).sum
      g.filter { r =>
        val d = n * r._3 - s; d * d > 9 * (n * q - s * s) }.map(_._1)
    }.toSet
    assert(got == twin)
  }

  test("degenerate groups: single row and empty never flag") {
    val got = Pipeline.valueOutliers(mk(Seq((1L, "solo", 42.0))),
                                     "event_type", "value")
      .collect()
    assert(got.isEmpty)
  }

  test("plan: one map-side stats aggregate broadcast back; no corpus shuffle") {
    val df = Pipeline.valueOutliers(mk(Seq((1L, "a", 1.0), (2L, "a", 2.0))),
                                    "event_type", "value")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("UDF("))
  }
  test("id/type/value columns are fully parameterized") {
    val rows = (1L to 20L).map(i => (i, "m", 1.0)) :+ ((21L, "m", 100.0))
    val got = Pipeline.valueOutliers(
        rows.toDF("txn_id", "merchant", "amount"),
        "merchant", "amount", idCol = "txn_id")
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((21L, "m", 10000L)))
  }

}
