package graft

import graft.text.TextStats

/** Gopher-style repetition signals (q69): duplicate-line counts,
  * top-bigram frequency, and the exact-integer quality gate.
  */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)]) =
    TextStats.repetitionSignals(docs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().sortBy(_._1)

  test("spammy doc counted exactly and gated; clean doc passes") {
    val spam = "buy now\nbuy now\nbuy now\nunique middle\nbuy now"
    val clean = "a quiet morning\nwith plenty of distinct words here"
    val got = run(Seq((1L, spam), (2L, clean)))

    val (_, nl, ndup, chDup, nbg, top, ok) = got(0)
    assert(nl == 5 && ndup == 4, "4 of 5 lines are the duplicated one")
    assert(chDup == 4 * "buy now".length)
    // tokens: buy now buy now buy now unique middle buy now → 10 tokens, 9 bigrams;
    // "buy now" ×4, "now buy" ×2 (line breaks are whitespace), rest unique
    assert(nbg == 9 && top == 4, s"expected top bigram count 4, got $top of $nbg")
    assert(!ok, "spam doc must fail the repetition gate")

    val (_, nl2, ndup2, _, nbg2, top2, ok2) = got(1)
    assert(nl2 == 2 && ndup2 == 0 && nbg2 == 8 && top2 == 1)
    assert(ok2, "clean doc must pass")
  }

  test("degenerate docs: empty text and single token") {
    val got = run(Seq((1L, ""), (2L, "solo")))
    assert(got(0) == ((1L, 1L, 0L, 0L, 0L, 0L, true)),
           "empty text is one empty line, no bigrams, gate passes")
    assert(got(1) == ((2L, 1L, 0L, 0L, 0L, 0L, true)),
           "one token yields zero bigrams")
  }
}
