package graft

import graft.dedup.Dedup

/** Cross-doc duplicated spans (q110): the ExactSubstr-family self-scan.
  * Spans cover shingles shared across DISTINCT docs; within-doc
  * repetition never counts.
  */
class DupSpansSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], k: Int = 3, minDocs: Int = 2) =
    Dedup.crossDocDuplicateSpans(docs.toDF("doc_id", "text"),
                                 "doc_id", "text", shingleK = k, minDocs = minDocs)
      .orderBy("doc_id", "span_start")
      .as[(Long, Long, Long, Long)].collect().toSeq

  test("a shared run marks both docs; the clean doc stays clean") {
    val docs = Seq(
      1L -> "u1 u2 common one two three four tail1",
      2L -> "v1 common one two three four v2 v3",
      3L -> "w1 w2 w3 w4 w5 w6 w7 w8")
    // shared 6-token run "common one two three four" + context: in doc 1
    // tokens 3..7, doc 2 tokens 2..6 -> k=3 shingles at 3,4,5 / 2,3,4
    val got = run(docs)
    assert(got.map(_._1).toSet == Set(1L, 2L))
    val d1 = got.filter(_._1 == 1L).head
    val d2 = got.filter(_._1 == 2L).head
    assert((d1._2, d1._3, d1._4) == (3L, 7L, 3L), s"doc1 span: $d1")
    assert((d2._2, d2._3, d2._4) == (2L, 6L, 3L), s"doc2 span: $d2")
  }

  test("within-doc repetition alone never creates a span") {
    // doc 1 repeats its own phrase; no other doc carries it
    val docs = Seq(
      1L -> "spam ham eggs spam ham eggs spam ham eggs",
      2L -> "totally different words here now")
    assert(run(docs).isEmpty)
  }

  test("two separated shared runs stay two spans; adjacent ones merge") {
    val docs = Seq(
      1L -> "a b c X Y Z gap1 gap2 gap3 P Q R tail",
      2L -> "a b c X Y Z other words",
      3L -> "front P Q R a b c X Y Z")
    // "a b c X Y Z" (6 tokens) and "P Q R" shared; doc 1 has both,
    // separated by a gap -> two spans
    val d1 = run(docs).filter(_._1 == 1L)
    assert(d1.size == 2, s"expected two spans: $d1")
    assert(d1.head._2 == 1L && d1.head._3 == 6L)
    assert(d1(1)._2 == 10L && d1(1)._3 == 12L)
  }

  test("minDocs raises the sharing bar") {
    val docs = Seq(
      1L -> "x y z one two three",
      2L -> "x y z four five six",
      3L -> "x y z seven eight nine")
    // "x y z" is in all three docs: survives minDocs=3; pairs-only
    // shingles (none here) would not
    val got3 = run(docs, minDocs = 3)
    assert(got3.map(_._1).toSet == Set(1L, 2L, 3L))
    assert(got3.forall(s => s._2 == 1L && s._3 == 3L && s._4 == 1L))
    // raising to 4 clears everything
    assert(run(docs, minDocs = 4).isEmpty)
  }
}
