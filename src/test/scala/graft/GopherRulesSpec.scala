package graft

import graft.text.TextStats

/** Gopher-style rule bundle (q157): each rule trips on exactly the
  * document built to violate it and nothing else, and the healthy
  * document passes the whole battery.
  */
class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  // 60 prose words with plenty of function words, mean word length
  // comfortably inside [3, 10]
  private val healthy =
    (("the cat sat with all of them and that could have been fine " +
      "because everything about the little house felt warm ") * 3).trim

  private def run(rows: (Long, String)*) =
    TextStats.gopherRules(rows.toDF("doc_id", "text"), "doc_id", "text",
                          minWords = 50, maxWords = 100000)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

  test("a healthy document passes every rule") {
    val got = run(1L -> healthy)(1L)
    for (f <- Seq("words_ok", "word_len_ok", "symbol_ok", "bullet_ok",
                  "ellipsis_ok", "alpha_ok", "stopword_ok", "kept"))
      assert(got.getAs[Boolean](f), s"$f should pass: $got")
  }

  test("each rule trips on its own violation, leaving the others green") {
    val bulletDoc = (1 to 10).map(i => s"- item $i of the list").mkString("\n")
    val got = run(
      1L -> "the cat sat with of",                      // too few words
      2L -> (healthy + " " + ("# " * 30).trim),         // symbol ratio
      3L -> bulletDoc,                                  // all bullet lines
      4L -> (healthy + "\nwait...\nmore...\nyes..."),   // ellipsis lines
      5L -> (healthy + " " + ("42 17 " * 30).trim),     // <80% alpha words
      6L -> ("zzz " * 60).trim)                         // no function words
    assert(!got(1L).getAs[Boolean]("words_ok") && !got(1L).getAs[Boolean]("kept"))
    assert(got(1L).getAs[Boolean]("stopword_ok"), got(1L).toString)
    assert(!got(2L).getAs[Boolean]("symbol_ok") && got(2L).getAs[Boolean]("words_ok"))
    assert(!got(3L).getAs[Boolean]("bullet_ok"), got(3L).toString)
    assert(!got(4L).getAs[Boolean]("ellipsis_ok") && got(4L).getAs[Boolean]("bullet_ok"))
    assert(!got(5L).getAs[Boolean]("alpha_ok"), got(5L).toString)
    assert(!got(6L).getAs[Boolean]("stopword_ok") && got(6L).getAs[Boolean]("alpha_ok"))
  }

  test("topNgramSignals: char fractions exact; spam trips, diverse text passes") {
    val healthy = (1 to 30).map(i => f"w$i%02d").mkString(" ") // 30 unique 3-char words
    val rows = Seq(
      (1L, "spam spam spam spam"),
      (2L, healthy),
      (3L, "one two one"),  // 3 words: no 4-gram exists
      (4L, "")).toDF("doc_id", "text")
    val got = TextStats.topNgramSignals(rows, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // spam: total 16 chars; "spam spam"×3 → 24, ×2 3-gram → 24, ×1 4-gram → 16
    val s = got(1L)
    assert(s.getAs[Long]("total_chars") == 16L &&
           s.getAs[Long]("top2_chars") == 24L &&
           s.getAs[Long]("top3_chars") == 24L &&
           s.getAs[Long]("top4_chars") == 16L, s.toString)
    for (f <- Seq("rep2_ok", "rep3_ok", "rep4_ok", "kept"))
      assert(!s.getAs[Boolean](f), s"$f must trip on spam: $s")
    // all-unique words: every top gram occurs once; all rationals pass
    val h = got(2L)
    assert(h.getAs[Long]("top2_chars") == 6L && h.getAs[Boolean]("kept"),
           h.toString)
    // too short for a 4-gram → 0 chars, vacuously ok
    assert(got(3L).getAs[Long]("top4_chars") == 0L &&
           got(3L).getAs[Boolean]("rep4_ok"), got(3L).toString)
    // empty doc: all zero, kept (0 ≤ 0 on every rule)
    assert(got(4L).getAs[Long]("n_words") == 0L &&
           got(4L).getAs[Boolean]("kept"), got(4L).toString)
  }

  test("mean-word-length bounds are exact cross-multiplications") {
    // 50 words of length 2 → 3n > s, fails; 50 words of length 3 → passes
    val short = ("ab " * 50).trim
    val ok = ("abc " * 50).trim
    val got = run(1L -> short, 2L -> ok)
    assert(!got(1L).getAs[Boolean]("word_len_ok"), got(1L).toString)
    assert(got(2L).getAs[Boolean]("word_len_ok"), got(2L).toString)
    // counts are exact
    assert(got(1L).getAs[Long]("n_words") == 50L)
    assert(got(1L).getAs[Long]("sum_word_len") == 100L)
  }
}
