package graft

import graft.search.Search

/** Pseudo-relevance feedback (q164): the expansion stage must rescue a
  * vocabulary-mismatched document the literal query cannot see, and
  * every stage's tie-break is exact.
  */
class PrfSpec extends SparkSpec {
  import spark.implicits._

  test("expansion rescues a doc that shares no term with the query") {
    val docs = Seq(
      (1L, "alpha alpha beta"),  // seed doc: matches the query, carries beta
      (2L, "beta beta beta"),    // invisible to the literal query
      (3L, "gamma gamma")).toDF("doc_id", "text")
    val got = Search.prfTopK(docs, "doc_id", "text", "alpha",
                             seedK = 1, expand = 1, k = 10)
      .as[(Long, Long, Long)].collect().toSeq
    // expansion mines beta from the seed doc; re-rank scores doc1 =
    // 2(alpha)+1(beta) = 3 and doc2 = 3 — tie to the lower id; gamma
    // never surfaces
    assert(got == Seq((1L, 1L, 3L), (2L, 2L, 3L)), got.toString)
  }

  test("seed terms are never re-mined as expansion terms") {
    // doc 1 is the seed doc and is saturated with the query term; if
    // the query term leaked into the expansion set, doc 3 (alpha-only)
    // would outrank doc 2 (delta-only) — delta must be the mined term
    val docs = Seq(
      (1L, "alpha alpha alpha delta"),
      (2L, "delta delta"),
      (3L, "gamma")).toDF("doc_id", "text")
    val got = Search.prfTopK(docs, "doc_id", "text", "alpha",
                             seedK = 1, expand = 1, k = 10)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L, 4L), (2L, 2L, 2L)), got.toString)
  }
}
