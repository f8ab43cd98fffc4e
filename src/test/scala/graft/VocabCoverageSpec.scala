package graft

import graft.text.Profile

/** Vocabulary coverage curve (q102): vocab size covering t% of token
  * occurrences, computed from the frequency-of-frequencies histogram.
  */
class VocabCoverageSpec extends SparkSpec {
  import spark.implicits._

  /** Driver twin over the sorted frequency list — equal frequencies
    * are interchangeable, so any tie order yields the same size.
    */
  private def ref(texts: Seq[String], t: Int): Long = {
    val freqs = texts.flatMap(_.toLowerCase.split("\\W+")).filter(_.nonEmpty)
      .groupBy(identity).values.map(_.size.toLong).toSeq.sorted.reverse
    val total = freqs.sum
    var cum = 0L
    freqs.zipWithIndex.foreach { case (f, i) =>
      cum += f
      if (100 * cum >= t * total) return i + 1L
    }
    freqs.size.toLong
  }

  private def run(texts: Seq[String]) =
    Profile.vocabCoverage(texts.map(Tuple1(_)).toDF("text"), "text")
      .orderBy("threshold")
      .as[(Long, Long, Long, Long)].collect().toSeq

  test("exact boundary math on a known distribution") {
    // a x9, b x1: 50% -> 1 token, 90% -> 1 (exactly 90), 99% -> 2
    val got = run(Seq("a a a a a a a a a b"))
    assert(got.map(r => (r._1, r._2)) == Seq((50L, 1L), (90L, 1L), (99L, 2L)),
           s"got $got")
    assert(got.forall(_._4 == 10L))
  }

  test("matches the ranked-cumulative driver twin on mixed data") {
    val texts = (1 to 50).map(i =>
      s"the the the common word w$i appears once plus filler f${i % 7}")
    val got = run(texts)
    for ((thr, k, _, _) <- got)
      assert(k == ref(texts, thr.toInt), s"threshold $thr")
  }

  test("plan: map-side-combined vocab aggregate, UDF-free") {
    val plan = Profile.vocabCoverage(
        Seq(Tuple1("some words here")).toDF("text"), "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_count"), s"no map-side combine:\n$plan")
    assert(!plan.contains("UDF("), s"must be codegen-native:\n$plan")
  }
}
