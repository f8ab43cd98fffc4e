package graft

import graft.queries.Pipeline

/** Peak concurrency (q105): day-partitioned sweep line with carry-in
  * over closed [start_us, end_us] intervals.
  */
class PeakConcurrencySpec extends SparkSpec {
  import spark.implicits._

  private val Day = 86400000000L

  private def run(iv: Seq[(Long, Long)]) =
    Pipeline.peakConcurrency(iv.toDF("start_us", "end_us"))
      .orderBy("day").as[(Long, Long, Long)].collect().toSeq

  test("overlap peaks where intervals stack; first-reached ts reported") {
    val got = run(Seq((0L, 100L), (50L, 150L), (200L, 300L)))
    assert(got == Seq((0L, 2L, 50L)), s"got $got")
  }

  test("closed intervals: a start at another's end overlaps") {
    val got = run(Seq((0L, 100L), (100L, 200L)))
    assert(got == Seq((0L, 2L, 100L)), s"got $got")
  }

  test("a single-instant interval counts at its instant") {
    assert(run(Seq((5L, 5L))) == Seq((0L, 1L, 5L)))
  }

  test("carry-in: a session crossing midnight stays counted next day") {
    // one interval spans the day boundary; day 1 has two shorter ones
    val got = run(Seq((Day - 100L, Day + 100L),
                      (Day + 50L, Day + 60L)))
    // day 0: only the long interval -> peak 1 at its start
    // day 1: carry-in 1, then +1 at D+50 -> peak 2
    assert(got == Seq((0L, 1L, Day - 100L), (1L, 2L, Day + 50L)), s"got $got")
  }

  test("plan: carry side broadcasts; sweep shuffles by day only") {
    val plan = Pipeline.peakConcurrency(
        Seq((0L, 10L)).toDF("start_us", "end_us"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
           s"carry-in must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("UDF("),
           s"bad plan:\n$plan")
  }
}
