package graft

import java.sql.Timestamp

import graft.queries.Pipeline

/** CUSUM drift scan (q127): division-free changepoint statistic. */
class CusumSpec extends SparkSpec {
  import spark.implicits._

  private def mk(days: Seq[(String, Double)]) =
    days.zipWithIndex.map { case ((d, v), i) =>
      (i.toLong, Timestamp.valueOf(s"$d 12:00:00"), "purchase", v)
    }.toDF("event_id", "ts", "event_type", "value")

  test("a planted level shift peaks the CUSUM at the last day of the old level") {
    // ten days at 1.00 then ten at 9.00: |n*cum - k*S| is maximal at
    // k=10, the boundary day
    val days = (1 to 10).map(i => (f"2024-01-$i%02d", 1.0)) ++
      (11 to 20).map(i => (f"2024-01-$i%02d", 9.0))
    val got = Pipeline.cusumDrift(mk(days))
      .orderBy("day").as[(java.sql.Date, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got.size == 20)
    val peak = got.filter(_._6 == 1L)
    assert(peak.map(_._2) == Seq(10L), s"peak at ${peak.map(_._2)}")
    // driver twin of the scaled deviation on the peak row
    val s = 10 * 100 + 10 * 900; val cum10 = 10 * 100L
    assert(peak.head._5 == math.abs(20L * cum10 - 10L * s))
  }

  test("driver twin across all rows; exactly one changepoint flag; ties -> earliest") {
    val days = Seq(("2024-02-01", 5.0), ("2024-02-02", 5.0),
                   ("2024-02-03", 5.0))
    val got = Pipeline.cusumDrift(mk(days))
      .orderBy("day").as[(java.sql.Date, Long, Long, Long, Long, Long)]
      .collect().toSeq
    // constant series: every dev is 0 (n*cum = k*S), tie broken to day 1
    assert(got.map(_._5) == Seq(0L, 0L, 0L))
    assert(got.map(_._6) == Seq(1L, 0L, 0L))
  }

  test("non-purchase events are excluded; multiple events per day aggregate") {
    val df = Seq(
      (1L, Timestamp.valueOf("2024-03-01 01:00:00"), "purchase", 2.0),
      (2L, Timestamp.valueOf("2024-03-01 02:00:00"), "purchase", 3.0),
      (3L, Timestamp.valueOf("2024-03-01 03:00:00"), "view", 99.0),
      (4L, Timestamp.valueOf("2024-03-02 01:00:00"), "purchase", 5.0))
      .toDF("event_id", "ts", "event_type", "value")
    val got = Pipeline.cusumDrift(df)
      .orderBy("day").as[(java.sql.Date, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got.map(_._3) == Seq(500L, 500L))
  }
}
