package graft

import graft.text.TextStats

/** Exact paragraph dedup (q74): global first-occurrence retention,
  * ordered rebuild, within-doc and cross-doc re-occurrences.
  */
class ParagraphDedupSpec extends SparkSpec {
  import spark.implicits._

  test("first occurrence survives; later copies drop within and across docs") {
    val docs = Seq(
      (1L, "alpha para\n\nbeta para\n\nalpha para"), // internal repeat
      (2L, "beta para\n\ngamma para"),               // beta already seen in doc 1
      (3L, "alpha para"))                            // fully deduplicated away
      .toDF("doc_id", "text")
    val got = TextStats.dedupParagraphs(docs, "doc_id", "text")
      .select($"doc_id", $"n_paras", $"n_kept", $"clean")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)

    assert(got(0) == ((1L, 3L, 2L, "alpha para\n\nbeta para")),
           "doc 1 keeps its first alpha and beta, drops the repeat")
    assert(got(1) == ((2L, 2L, 1L, "gamma para")),
           "doc 2's beta was first seen in doc 1")
    assert(got(2) == ((3L, 1L, 0L, "")),
           "doc 3 is entirely a re-occurrence and survives empty")
  }

  test("rank-1 retention plans with WindowGroupLimit (hot paragraph stays map-side)") {
    val plan = SparkEntry.queries("q74_paragraph_dedup")(spark, Sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(3000))
  }

  test("unique corpus is untouched") {
    val docs = Seq((1L, "one\n\ntwo"), (2L, "three")).toDF("doc_id", "text")
    val got = TextStats.dedupParagraphs(docs, "doc_id", "text")
      .select($"doc_id", $"clean").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "one\n\ntwo", 2L -> "three"))
  }

  test("blank separators (3+ newlines) are structure, never deduped away") {
    val docs = Seq(
      (1L, "a\n\n\n\nb"),   // split yields [a, "", b]
      (2L, "c\n\n\n\nd"))   // its "" must NOT be a re-occurrence of doc 1's
      .toDF("doc_id", "text")
    val got = TextStats.dedupParagraphs(docs, "doc_id", "text")
      .select($"doc_id", $"n_paras", $"n_kept", $"clean")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(got(0) == ((1L, 3L, 3L, "a\n\n\n\nb")))
    assert(got(1) == ((2L, 3L, 3L, "c\n\n\n\nd")),
           "doc 2's separator structure must survive intact")
  }
}
