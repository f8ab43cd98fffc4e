package graft

import graft.io.Joins

/** [[Joins.boundedBroadcast]]: the runtime guard that keeps induced
  * dictionaries (q72/q76/q82 vocabularies) from becoming unbounded
  * driver-side broadcast builds at corpus scale.
  */
class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private val fact = Seq((1, "a"), (2, "b"), (3, "a"), (4, "c"))
    .toDF("id", "k")
  private val dict = Seq(("a", 10L), ("b", 20L)).toDF("k", "v")

  test("under the bound: the dictionary carries the broadcast hint") {
    val j = fact.join(Joins.boundedBroadcast(dict, maxRows = 100), Seq("k"))
    assert(j.queryExecution.analyzed.toString.contains("ResolvedHint"))
    assert(j.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    assert(j.count() == 3)
  }

  test("over the bound: no broadcast hint — the optimizer decides from stats") {
    val j = fact.join(Joins.boundedBroadcast(dict, maxRows = 1), Seq("k"))
    // no hint in the analyzed plan: at real scale (where size stats put
    // the dict over autoBroadcastJoinThreshold) the join SHUFFLES
    // instead of building a multi-GB driver-side table
    assert(!j.queryExecution.analyzed.toString.contains("ResolvedHint"))
    assert(j.count() == 3)
  }

  test("join results are identical on both sides of the bound") {
    val lo = fact.join(Joins.boundedBroadcast(dict, maxRows = 100), Seq("k"))
      .orderBy("id").collect().toSeq
    val hi = fact.join(Joins.boundedBroadcast(dict, maxRows = 1), Seq("k"))
      .orderBy("id").collect().toSeq
    assert(lo == hi)
  }
}
