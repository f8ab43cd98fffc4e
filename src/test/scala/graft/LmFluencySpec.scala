package graft

import org.apache.spark.sql.functions._

import graft.text.TextStats

/** Bigram-LM fluency ([[TextStats.lmFluency]]): the exact integer
  * scoring is recomputed from first principles on the driver, and the
  * one property that justifies the operator — in-distribution text
  * outscores gibberish under a train-split LM — is pinned on a
  * constructed corpus.
  */
class LmFluencySpec extends SparkSpec {
  import spark.implicits._

  private def lex(text: String): Seq[String] =
    "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]".r.findAllIn(text).toSeq

  private def reference(rows: Seq[(Long, String)]): Map[Long, (Long, Long)] = {
    val pairs = rows.map { case (id, text) =>
      val t = lex(text)
      (id, splitName(id), t.zip(t.drop(1)))
    }
    val trainPairs = pairs.filter(_._2 == "train").flatMap(_._3)
    val cBi = trainPairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cUni = trainPairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val v = trainPairs.map(_._1).distinct.size.toLong
    pairs.map { case (id, _, prs) =>
      if (prs.isEmpty) id -> (0L, 0L)
      else {
        val ss = prs.map { pr =>
          (1000000L * (cBi.getOrElse(pr, 0L) + 1L)) /
            (cUni.getOrElse(pr._1, 0L) + v)
        }
        id -> (prs.size.toLong, ss.sum / prs.size)
      }
    }.toMap
  }

  test("lmFluency equals the first-principles recomputation on real docs") {
    val docs = graft.io.Tables.load(spark, Sf001, "documents")
    val rows = docs.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val expected = reference(rows)
    val got = TextStats.lmFluency(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got.size == rows.size)
    rows.foreach { case (id, _) =>
      assert(got(id) == expected(id), s"doc $id: got ${got(id)} expected ${expected(id)}")
    }
  }

  test("in-distribution text outscores gibberish under the train LM") {
    // pick ids landing in train vs test under the md5 split
    val trainIds = (0L until 200L).filter(splitName(_) == "train").take(20)
    val testIds = (0L until 200L).filter(splitName(_) == "test").take(2)
    val phrase = "the cat sat on the mat and the dog ran to the cat"
    val gibberish = "zxq vbnk qwrt plmo xcvz qqjh wzxy kkpr ttzn rrqv"
    val rows = trainIds.map((_, phrase)) ++
      Seq((testIds(0), phrase), (testIds(1), gibberish))
    val df = rows.toDF("doc_id", "text")
    val got = TextStats.lmFluency(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // the gibberish score is pinned near the smoothing floor 10^6/V —
    // with this toy vocabulary (V≈9) that floor is high, so the margin
    // is 3×; on a real corpus V is large and the separation widens
    assert(got(testIds(0)) > 3 * got(testIds(1)),
           s"seen text ${got(testIds(0))} must far outscore gibberish ${got(testIds(1))}")
  }

  test("plan: unigram counts and V broadcast; pair table materialized once") {
    val docs = graft.io.Tables.load(spark, Sf001, "documents")
    val plan = TextStats.lmFluency(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
           s"dictionary-sized sides must broadcast:\n${plan.take(3000)}")
    // the corpus tokenize must not run once per branch: the pair table
    // is a pinned scan, so the expensive regexp appears at most once
    def count(s: String, sub: String): Int = s.sliding(sub.length).count(_ == sub)
    assert(count(plan, "regexp_extract_all") <= 1,
           s"pair table must be materialized once:\n${plan.take(3000)}")
  }

  test("pmiCollocations: hand-computed positional-marginal scores; hapax pairs gated; ties (w1, w2)") {
    // doc1 pairs: ab ba ab ba ab bc cd; doc2 pairs: cd dc cd dx xy
    // minCount 2 keeps ab(3) ba(2) cd(3); N=12
    // c_x: a3 b3 c3; c_y: b3 a2 d3 -> all three score 1e6*cxy*12/(cx*cy) = 4e6
    val docs = Seq("a b a b a b c d", "c d c d x y").toDF("text")
    val got = TextStats.pmiCollocations(docs, "text", minCount = 2, k = 10)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("a", "b", 3L, 4000000L),
      ("b", "a", 2L, 4000000L),
      ("c", "d", 3L, 4000000L)), got.toString)
  }

  test("pmiCollocations: a fixed phrase outranks a frequent-but-independent pair") {
    // "tail risk" always adjacent (PMI high); "the data" frequent but
    // 'the' pairs with everything (PMI low)
    val docs = (1 to 30).map(i =>
      s"the w$i saw the data and tail risk near the w${i + 1}").toDF("text")
    val got = TextStats.pmiCollocations(docs, "text", minCount = 5, k = 50)
      .as[(String, String, Long, Long)].collect().toSeq
    val score = got.map { case (a, b, _, s) => (a, b) -> s }.toMap
    assert(score(("tail", "risk")) > score(("the", "data")),
           got.toString)
  }
}
