package graft

import graft.dedup.Dedup

/** Duplicate n-gram fraction (q98): per-doc share of shingle
  * occurrences carried by ≥2 distinct docs.
  */
class DupFractionSpec extends SparkSpec {
  import spark.implicits._

  test("exact fractions on crafted overlap") {
    // A and B share "alpha beta gamma delta" -> 2 shared 3-shingles.
    // A: tokens u1 u2 alpha beta gamma delta  -> 4 shingles, 2 shared
    // B: tokens alpha beta gamma delta v1     -> 3 shingles, 2 shared
    // C: all-unique                           -> 0 shared
    val docs = Seq(
      (1L, "u1 u2 alpha beta gamma delta"),
      (2L, "alpha beta gamma delta v1"),
      (3L, "six totally unrelated words sit here"))
      .toDF("doc_id", "text")
    val got = Dedup.duplicateShingleFraction(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 4L, 2L, 50L), (2L, 3L, 2L, 66L),
                      (3L, 4L, 0L, 0L)), s"got $got")
  }

  test("within-doc repetition alone is not cross-doc duplication") {
    // one doc repeating its own phrase: every shingle df=1 doc
    val docs = Seq((1L, "alpha beta gamma alpha beta gamma alpha beta gamma"))
      .toDF("doc_id", "text")
    val got = Dedup.duplicateShingleFraction(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().head
    assert(got._3 == 0L && got._4 == 0L, s"got $got")
  }

  test("plan: one equi-join, no cartesian, UDF-free") {
    val docs = Seq((1L, "some words for the plan test here"))
      .toDF("doc_id", "text")
    val plan = Dedup.duplicateShingleFraction(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("UDF("),
           s"bad plan:\n$plan")
  }
}
