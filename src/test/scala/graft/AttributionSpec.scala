package graft

import java.sql.Timestamp

import graft.queries.Pipeline

/** Last-touch attribution (q120): strict-past window, latest touch
  * wins, none-bucket for untouched purchases.
  */
class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, user: Long, t: String, typ: String, v: Double = 1.0) =
    (id, user, Timestamp.valueOf(t), typ, v)

  private def run(rows: Seq[(Long, Long, Timestamp, String, Double)]) =
    Pipeline.lastTouchAttribution(
        rows.toDF("event_id", "user_id", "ts", "event_type", "value"))
      .orderBy("attributed_to")
      .as[(String, Long, Long)].collect().toSeq

  test("the LATEST preceding touch wins; earlier ones don't") {
    val got = run(Seq(
      ev(1, 1, "2025-01-01 10:00:00", "view"),
      ev(2, 1, "2025-01-01 10:05:00", "click"),
      ev(3, 1, "2025-01-01 10:10:00", "purchase", 2.5)))
    assert(got == Seq(("click", 1L, 250L)))
  }

  test("a purchase before any touch lands in the none bucket") {
    val got = run(Seq(
      ev(1, 1, "2025-01-01 09:00:00", "purchase", 1.0),
      ev(2, 1, "2025-01-01 10:00:00", "view"),
      ev(3, 1, "2025-01-01 11:00:00", "purchase", 3.0)))
    assert(got == Seq(("none", 1L, 100L), ("view", 1L, 300L)))
  }

  test("same-timestamp ties order by event_id; users are independent") {
    val got = run(Seq(
      // user 1: click and purchase share a ts — click (lower id) precedes
      ev(1, 1, "2025-01-01 10:00:00", "click"),
      ev(2, 1, "2025-01-01 10:00:00", "purchase", 1.0),
      // user 2's view must not leak into user 1
      ev(3, 2, "2025-01-01 09:00:00", "view"),
      ev(4, 2, "2025-01-01 10:30:00", "purchase", 5.0)))
    assert(got == Seq(("click", 1L, 100L), ("view", 1L, 500L)))
  }

  test("other event types never attribute; a purchase never self-attributes") {
    val got = run(Seq(
      ev(1, 1, "2025-01-01 10:00:00", "signup"),
      ev(2, 1, "2025-01-01 10:05:00", "purchase", 1.0),
      ev(3, 1, "2025-01-01 10:06:00", "purchase", 2.0)))
    // signup is not a touch; the first purchase is not a touch for the second
    assert(got == Seq(("none", 2L, 300L)))
  }
}
