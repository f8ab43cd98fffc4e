package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsOf

/** As-of join semantics: at-or-before match, latest-wins, tie on equal
  * build timestamps to the largest tiebreak, null when nothing prior,
  * and the one-shuffle plan shape.
  */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val builds = Seq(
    (1L, ts("2025-01-01 10:00:00"), 100L),
    (1L, ts("2025-01-01 10:00:00"), 101L), // tie: larger id wins
    (1L, ts("2025-01-01 12:00:00"), 102L),
    (2L, ts("2025-01-01 11:00:00"), 200L)
  ).toDF("user_id", "ts", "event_id")

  private val queries = Seq(
    (1L, ts("2025-01-01 09:00:00"), 9001L), // before any build -> null
    (1L, ts("2025-01-01 10:00:00"), 9002L), // equal ts matches (<=), tie -> 101
    (1L, ts("2025-01-01 11:59:59"), 9003L), // between -> 101
    (1L, ts("2025-01-01 13:00:00"), 9004L), // after last -> 102
    (2L, ts("2025-01-01 11:00:00"), 9005L), // other key, equal ts -> 200
    (3L, ts("2025-01-01 12:00:00"), 9006L)  // key with no builds -> null
  ).toDF("user_id", "ts", "event_id")

  test("at-or-before, latest-wins, ties, and null semantics") {
    val got = AsOf.joinWithGap(queries, builds, "user_id", "ts", "event_id")
      .select($"event_id", $"asof_event_id", $"gap_us")
      .as[(Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(9001L) === ((None, None)))
    assert(got(9002L) === ((Some(101L), Some(0L))))
    assert(got(9003L) === ((Some(101L), Some((3600L + 3599L) * 1000000L))))
    assert(got(9004L) === ((Some(102L), Some(3600L * 1000000L))))
    assert(got(9005L) === ((Some(200L), Some(0L))))
    assert(got(9006L) === ((None, None)))
  }

  test("forward: at-or-after, earliest-wins, smallest tie, null past the end") {
    val got = AsOf.joinForward(queries, builds, "user_id", "ts",
                               Seq("event_id"), "event_id")
      .orderBy($"event_id")
      .select($"event_id", $"asof_event_id")
      .as[(Long, Option[Long])].collect().toSeq
    assert(got == Seq(
      9001L -> Some(100L), // next build ahead; equal-ts tie -> SMALLEST id
      9002L -> Some(100L), // build AT the query ts matches (>=)
      9003L -> Some(102L), // next ahead
      9004L -> None,       // nothing after the last build
      9005L -> Some(200L), // other key, equal ts
      9006L -> None))      // key with no builds
  }

  test("forward plan: exactly one exchange — union + window, no inequality join") {
    val plan = AsOf.joinForward(queries, builds, "user_id", "ts",
                                Seq("event_id"), "event_id")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected one shuffle:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("SortMergeJoin"))
  }

  test("plan: exactly one exchange — union + window, no inequality join") {
    val plan = AsOf.joinWithGap(queries, builds, "user_id", "ts", "event_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
           s"as-of must not plan an inequality join:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected one shuffle, got $exchanges:\n$plan")
  }
}
