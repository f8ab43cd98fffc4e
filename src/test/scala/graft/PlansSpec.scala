package graft

import org.apache.spark.sql.DataFrame

/** Physical-plan shape assertions — the 100 TB posture, pinned.
  *
  * These protect the properties that make each operator survive a
  * 1000-executor scale-up: filters reaching the parquet scan, column
  * pruning, broadcast dims, top-k as TakeOrderedAndProject (per-
  * partition k + driver merge, never a global sort), and shuffle
  * counts that stay constant as data grows.
  */
class PlansSpec extends SparkSpec {

  private def planOf(q: String): String =
    SparkEntry.queries(q)(spark, Sf001).queryExecution.executedPlan.toString

  private def countOccurrences(plan: String, token: String): Int =
    plan.sliding(token.length).count(_ == token)

  test("SparkEntry.entry: flagship query returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q02: predicates and projection push into the parquet scan") {
    val plan = planOf("q02_filter_revenue")
    assert(plan.contains("PushedFilters: ["), plan.take(2000))
    assert(plan.contains("l_shipdate"), "shipdate filter must reach the scan")
    // column pruning: scan must not read uninvolved wide columns
    assert(!plan.contains("l_comment"), "pruned column appears in scan")
  }

  test("q03: dimension join is broadcast, not shuffled") {
    val plan = planOf("q03_broadcast_join")
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("q06: top-k plans as TakeOrderedAndProject (no global sort)") {
    val plan = planOf("q06_topk_orders")
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("q29: brute-force kNN = broadcast query side + TakeOrderedAndProject") {
    val plan = planOf("q29_knn_dot")
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
           "one-row query side must broadcast")
  }

  test("q22: exact dedup is exactly one shuffle (partial/final agg on digest)") {
    val plan = planOf("q22_dedup_exact")
    // AQE wraps the plan; count materialized shuffle exchanges
    assert(countOccurrences(plan, "Exchange hashpartitioning") <= 1, plan.take(3000))
    assert(plan.contains("HashAggregate"), "hash aggregate expected")
  }

  test("q22: dedup scan prunes to the two referenced columns") {
    val plan = planOf("q22_dedup_exact")
    assert(!plan.contains("lang"), "unreferenced column read by scan")
  }

  test("q61: decontamination never plans a cartesian/nested-loop pair expansion") {
    val plan = planOf("q61_decontaminate")
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    // pair expansion happens inside fp buckets (one aggregation), not
    // as a join of two exploded fingerprint branches
    assert(countOccurrences(plan, "Generate explode") <= 3, plan.take(3000))
  }

  test("q62: learned-block near-dup joins on the cell key, no cartesian") {
    val plan = planOf("q62_semantic_neardup")
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(plan.contains("blk"), "blocked equi-join on the IVF cell expected")
  }

  test("q64: multi-table LSH probes inline into ONE corpus scan's filter") {
    val plan = planOf("q64_ann_lsh_multi")
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(countOccurrences(plan, "FileScan") == 1, "exactly one corpus scan")
    // all 4 tables' 8-bit buckets pushed down as scan predicates: the
    // top bit (128) appears once per table in the filter
    assert(countOccurrences(plan, "THEN 128 ELSE 0 END") == 4,
           "four table-bucket probes expected in the pushed filter")
  }

  test("q36: native cosine kernel is inside the plan (no HOF fallback)") {
    val plan = planOf("q36_pipeline_search")
    assert(plan.contains("cosine_similarity"), plan.take(2000))
    assert(plan.contains("TakeOrderedAndProject"), "kNN top-k must avoid global sort")
  }

  test("q31: sessionization shuffles once on user_id, window + agg reuse it") {
    val plan = planOf("q31_sessions")
    // one exchange for the window partition; the groupBy(user_id,
    // session_no) reuses the user_id partitioning only if co-partitioned
    // — assert we never exceed two.
    assert(countOccurrences(plan, "Exchange hashpartitioning") <= 2, plan.take(3000))
  }

  test("session excludes InferFiltersFromGenerate (guards the HOF re-evaluation trap)") {
    // the rule's inferred size()>0/isnotnull guards get alias-inlined
    // below Generate nodes, re-evaluating interpreted HOF generator
    // inputs (shingles, chunk UDFs) 2-3x per scan row — measured 2.7s
    // -> 1.0s on q23 at sf0.1. Every graft session builder must carry
    // the exclusion; this guards against a builder dropping it.
    val excluded = spark.conf.getOption("spark.sql.optimizer.excludedRules").getOrElse("")
    assert(excluded.contains("InferFiltersFromGenerate"),
           s"excludedRules lost the Generate-filter exclusion: '$excluded'")
  }
}
