package graft

import java.sql.Timestamp

import graft.queries.Pipeline

/** Ordered event funnel (q104): view → click-after-view →
  * purchase-after-click, strict event-time order per user.
  */
class EventFunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  test("stages require strict order; out-of-order events do not count") {
    val events = Seq(
      // u1: full funnel in order
      (1L, "view", ts(0)), (1L, "click", ts(1)), (1L, "purchase", ts(2)),
      // u2: click BEFORE the first view -> click stage not reached
      (2L, "click", ts(0)), (2L, "view", ts(1)), (2L, "purchase", ts(2)),
      // u3: view only
      (3L, "view", ts(0)), (3L, "error", ts(1)),
      // u4: purchase before click -> purchase stage not reached
      (4L, "view", ts(0)), (4L, "purchase", ts(1)), (4L, "click", ts(2)),
      // u5: no view at all -> nothing counts
      (5L, "click", ts(0)), (5L, "purchase", ts(1)))
      .toDF("user_id", "event_type", "ts")
    val got = Pipeline.eventFunnel(events).orderBy("stage")
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("1_view", 4L), ("2_click", 2L), ("3_purchase", 1L)),
           s"got $got")
  }

  test("a later click after an early stray one still advances the funnel") {
    val events = Seq(
      (1L, "click", ts(0)), (1L, "view", ts(1)),
      (1L, "click", ts(2)), (1L, "purchase", ts(3)))
      .toDF("user_id", "event_type", "ts")
    val got = Pipeline.eventFunnel(events)
      .as[(String, Long)].collect().toMap
    assert(got == Map("1_view" -> 1L, "2_click" -> 1L, "3_purchase" -> 1L))
  }

  test("plan: one user-partition exchange feeds the stacked windows") {
    val events = Seq((1L, "view", ts(0))).toDF("user_id", "event_type", "ts")
    val plan = Pipeline.eventFunnel(events)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"no self-joins:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2, s"window + per-user agg must share the shuffle:\n$plan")
  }
}
