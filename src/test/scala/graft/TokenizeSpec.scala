package graft

import graft.text.TextStats

/** Vocabulary induction + tokenize-to-ids (q76): frequency ranking,
  * UNK handling, leakage-safe train-only vocabulary, empty docs.
  */
class TokenizeSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("frequency-ranked ids, UNK=0, train-only vocabulary, empty doc") {
    val ids = 1L to 40L
    val nonTrain = ids.filter(i => splitName(i) != "train")
    assert(nonTrain.size >= 2, "fixture needs non-train docs")
    val rows = ids.map { i =>
      if (i == nonTrain.head) (i, "zz zz")   // zz occurs ONLY outside train
      else if (i == nonTrain(1)) (i, "")     // empty doc
      else (i, "aa aa bb")                   // aa twice as frequent as bb
    }
    val got = TextStats.tokenizeToIds(rows.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, String, Long, Long, String)].collect().map(r => r._1 -> r).toMap

    assert(got.size == 40)
    // aa outranks bb → ids 1 and 2; every standard doc is "1,1,2"
    ids.filterNot(i => i == nonTrain.head || i == nonTrain(1)).foreach { i =>
      assert(got(i) == ((i, splitName(i), 3L, 0L, md5hex("1,1,2"))), got(i).toString)
    }
    // zz never reaches the train vocabulary → all-UNK sequence
    assert(got(nonTrain.head)._3 == 2L && got(nonTrain.head)._4 == 2L)
    assert(got(nonTrain.head)._5 == md5hex("0,0"))
    // empty doc: zero ids, md5 of the empty string
    assert(got(nonTrain(1)) == ((nonTrain(1), splitName(nonTrain(1)), 0L, 0L, md5hex(""))))
  }
}
