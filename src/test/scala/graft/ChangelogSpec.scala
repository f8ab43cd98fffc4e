package graft

import org.apache.spark.sql.functions._

import graft.io.Tables

/** Changelog application (q108): upsert with tombstones, latest op
  * per key wins.
  */
class ChangelogSpec extends SparkSpec {
  import spark.implicits._

  private val snapshot = Seq((1L, "a", 10L), (2L, "b", 20L), (5L, "e", 50L))
    .toDF("id", "name", "v")

  private def apply(log: Seq[(Long, String, Long, String, Long)]) =
    Tables.applyChangelog(snapshot,
        log.toDF("id", "name", "v", "op", "seq"),
        Seq("id"), "op", Seq(col("seq")))
      .orderBy("id").as[(Long, String, Long)].collect().toSeq

  test("insert, update, delete each apply; untouched rows pass through") {
    val got = apply(Seq(
      (3L, "c", 30L, "I", 1L),   // new key
      (2L, "b", 99L, "U", 1L),   // update existing
      (1L, "a", 0L, "D", 1L)))   // tombstone
    assert(got == Seq((2L, "b", 99L), (3L, "c", 30L), (5L, "e", 50L)),
           s"got $got")
  }

  test("several ops on one key collapse to the latest by version") {
    val got = apply(Seq(
      (4L, "d", 1L, "I", 1L), (4L, "d", 2L, "U", 2L), (4L, "d", 0L, "D", 3L),
      (5L, "e", 0L, "D", 1L), (5L, "e2", 55L, "U", 2L)))
    // key 4: inserted then deleted -> absent; key 5: delete then a
    // LATER update -> resurrected with the update's payload
    assert(got == Seq((1L, "a", 10L), (2L, "b", 20L), (5L, "e2", 55L)),
           s"got $got")
  }

  test("plan: key-partitioned window + anti-join, no cartesian") {
    val plan = Tables.applyChangelog(snapshot,
        Seq((3L, "c", 30L, "I", 1L)).toDF("id", "name", "v", "op", "seq"),
        Seq("id"), "op", Seq(col("seq")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("UDF("),
           s"bad plan:\n$plan")
  }
}
