package graft

import graft.text.Curation

/** Curation funnel (q96): per-stage attrition counts over the quality,
  * repetition and exact-dedup gates.
  */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val good = "the cat sat on a mat and it is that nice today"

  test("each stage drops exactly the docs its gate rejects") {
    val docs = Seq(
      (1L, good),                                   // survives everything
      (2L, good),                                   // exact duplicate of 1
      (3L, "tiny"),                                 // fails quality (length)
      (4L, "the cat the cat the cat the cat the cat is here")) // fails repetition
      .toDF("doc_id", "text")
    val got = Curation.curationFunnel(docs, "doc_id", "text")
      .orderBy("stage").as[(String, Long)].collect().toSeq
    assert(got == Seq(("0_total", 4L), ("1_quality", 3L),
                      ("2_repetition", 2L), ("3_dedup_keeper", 1L)),
           s"got $got")
  }

  test("funnel counts are monotone non-increasing on real-ish data") {
    val docs = (1L to 60L)
      .map(i => (i, if (i % 7 == 0) "dup dup dup" * 3
                    else s"the quick document number $i is about topic ${i % 5} and it reads fine"))
      .toDF("doc_id", "text")
    val ns = Curation.curationFunnel(docs, "doc_id", "text")
      .orderBy("stage").as[(String, Long)].collect().map(_._2)
    assert(ns.length == 4 && ns.sliding(2).forall(w => w(0) >= w(1)),
           s"stages must be non-increasing: ${ns.toSeq}")
  }

  test("plan: one aggregate reduces all four counts — no window") {
    val docs = Seq((1L, good)).toDF("doc_id", "text")
    val plan = Curation.curationFunnel(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no window belongs here:\n$plan")
    assert(!plan.contains("UDF("), s"must be codegen-native:\n$plan")
  }
}
