package graft

import java.sql.Timestamp

import graft.queries.Pipeline

/** 7-day moving revenue (q115): RANGE frame over day numbers — gaps
  * shrink the frame, they never widen the lookback.
  */
class MovingWindowSpec extends SparkSpec {
  import spark.implicits._

  private def ev(day: String, v: Double, typ: String = "purchase") =
    (Timestamp.valueOf(s"$day 12:00:00"), typ, v)

  private def run(rows: Seq[(Timestamp, String, Double)]) =
    Pipeline.movingDailyRevenue(rows.toDF("ts", "event_type", "value"))
      .orderBy("day")
      .select("day", "cents", "cents_7d", "days_present", "avg_cents_7d")
      .as[(java.sql.Date, Long, Long, Long, Long)].collect().toSeq

  test("a calendar gap SHRINKS the frame (RANGE, not ROWS)") {
    val got = run(Seq(
      ev("2025-01-01", 1.0), ev("2025-01-02", 2.0), ev("2025-01-03", 3.0),
      ev("2025-01-20", 10.0)))
    // day 20 is >6 days past day 3: its frame holds only itself —
    // a ROWS 6-preceding frame would have dragged in all three old days
    assert(got.map(r => (r._1.toString, r._3, r._4)) == Seq(
      ("2025-01-01", 100L, 1L), ("2025-01-02", 300L, 2L),
      ("2025-01-03", 600L, 3L), ("2025-01-20", 1000L, 1L)))
  }

  test("inside the horizon the frame accumulates; day 8 drops day 1") {
    val days = (1 to 8).map(d => ev(f"2025-01-$d%02d", d.toDouble))
    val got = run(days)
    // day 7 frame = days 1..7 -> 2800; day 8 = days 2..8 -> 3500
    assert(got(6)._3 == 2800L && got(6)._4 == 7L)
    assert(got(7)._3 == 3500L && got(7)._4 == 7L)
  }

  test("moving average floors; only purchases count") {
    val got = run(Seq(
      ev("2025-01-01", 1.0), ev("2025-01-02", 0.02),
      ev("2025-01-02", 99.0, typ = "view")))
    // sum7 at day 2 = 102 cents over 2 days -> floor 51
    assert(got.map(_._5) == Seq(100L, 51L))
    assert(got.map(_._2).sum == 102L)
  }
}
