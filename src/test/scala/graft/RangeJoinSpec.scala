package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Bin-bucketed range join: containment semantics (inclusive ends,
  * multi-bin intervals, overlapping intervals, no-match points) and
  * the no-nested-loop plan guarantee.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val points = Seq(
    (1L, 5L, "p1"), (1L, 64L, "p2"), (1L, 100L, "p3"), (1L, 200L, "p4"),
    (2L, 64L, "p5")
  ).toDF("key", "x", "pt")

  private val intervals = Seq(
    (1L, 0L, 10L, "iA"),     // single bin
    (1L, 60L, 130L, "iB"),   // spans bins 0-2 at width 64
    (1L, 90L, 110L, "iC"),   // overlaps iB: p3 matches both
    (2L, 64L, 64L, "iD")     // degenerate single-point interval
  ).toDF("key", "s", "e", "iv")

  test("containment: inclusive ends, multi-bin spans, overlaps, no-match") {
    val got = RangeJoin.binJoin(points, intervals, "key", "x", "s", "e", binWidth = 64)
      .select($"pt", $"iv").as[(String, String)].collect().toSet
    assert(got === Set(
      ("p1", "iA"),            // inside single-bin interval
      ("p2", "iB"),            // at interval start, bin boundary
      ("p3", "iB"), ("p3", "iC"), // overlapping intervals both match
      ("p5", "iD")))           // degenerate interval, exact hit
    // p4 (200) matches nothing — not emitted
  }

  test("plan: equi-join, not a nested-loop/cartesian inequality join") {
    val plan = RangeJoin.binJoin(points, intervals, "key", "x", "s", "e", 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
           s"range join must stay an equi-join:\n$plan")
  }
}
