package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Train/test decontamination (q61): shared-winnow-fingerprint pairs
  * across a split boundary.
  */
class DecontaminationSpec extends SparkSpec {
  import spark.implicits._

  // 12 words shared verbatim → many shared shingle windows → many fps
  private val leaked =
    "the quick brown fox jumps over the lazy dog near the riverbank today"

  test("a test doc containing a train doc's run is flagged with its overlap count") {
    val docs = Seq(
      (1L, s"intro words then $leaked and a closing remark", "train"),
      (2L, s"totally different preamble yet $leaked appears verbatim here", "test"),
      (3L, "unrelated text about cooking pasta with garlic butter and fresh sage leaves", "test"))
      .toDF("doc_id", "text", "split")
    val got = Dedup.contaminationPairs(docs, "doc_id", "text", col("split"),
                                       dfCap = 100, minShared = 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.map(p => (p._1, p._2)) == Seq((2L, 1L)),
           s"expected exactly the leaked pair, got $got")
    assert(got.head._3 >= 2, s"overlap count should reflect many shared fps: $got")
  }

  test("pairs below minShared and fingerprints above dfCap are dropped") {
    // the leaked run appears in MANY train docs → every fp it produces
    // has df > dfCap=3 → capped away → no pair survives
    val docs = (1L to 5L).map(i => (i, s"filler $i then $leaked", "train")) :+
      ((6L, s"other filler yet $leaked too", "test"))
    val got = Dedup.contaminationPairs(docs.toDF("doc_id", "text", "split"),
                                       "doc_id", "text", col("split"),
                                       dfCap = 3, minShared = 2)
      .count()
    assert(got == 0, "hot fingerprints must be df-capped before pair expansion")
  }

  test("no cross-split overlap yields no pairs") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "train"),
      (2L, "one two three four five six seven eight nine ten eleven", "test"))
      .toDF("doc_id", "text", "split")
    assert(Dedup.contaminationPairs(docs, "doc_id", "text", col("split")).count() == 0)
  }

  test("contaminationSpans: exact merged token spans at known offsets") {
    // train phrase "alpha beta gamma delta" -> shared 3-shingles.
    // test doc: tokens 1-2 unique, 3-6 = the phrase (shingles at pos
    // 3,4 -> span [3,6]), 7-9 unique, 10-13 = the phrase again
    // (span [10,13]); the two spans are separated by a gap > 1 so they
    // must NOT merge.
    val trainText = "alpha beta gamma delta"
    val testText = "uniq1 uniq2 alpha beta gamma delta uniq3 uniq4 uniq5 " +
      "alpha beta gamma delta"
    val docs = Seq(("tr1", trainText, "train"), ("te1", testText, "test"))
      .toDF("doc_id", "text", "split")
    val got = Dedup.contaminationSpans(docs, "doc_id", "text", col("split"))
      .orderBy(col("doc_id"), col("span_start"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("te1", 3L, 6L, 2L), ("te1", 10L, 13L, 2L)),
           s"got ${got.toSeq}")
  }

  test("contaminationSpans: adjacent and overlapping matches merge into one span") {
    // test doc fully contained in train -> every shingle matches ->
    // ONE maximal span covering the whole doc
    val text = "one two three four five six"
    val docs = Seq(("tr1", s"prefix $text suffix tokens here", "train"),
                   ("te1", text, "test"))
      .toDF("doc_id", "text", "split")
    val got = Dedup.contaminationSpans(docs, "doc_id", "text", col("split"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("te1", 1L, 6L, 4L)), s"got ${got.toSeq}")
  }

  test("contaminationSpans: stop-phrase shingles above dfCap produce no spans") {
    val phrase = "the quick brown fox"
    val train = (1 to 5).map(i => (s"tr$i", phrase, "train"))
    val docs = (train :+ (("te1", phrase, "test")))
      .toDF("doc_id", "text", "split")
    assert(Dedup.contaminationSpans(docs, "doc_id", "text", col("split"),
                                    dfCap = 3).count() == 0,
           "hashes carried by more than dfCap train docs must be dropped")
  }

  // ---- applying the cut list (q103) ----

  test("applyContaminationCuts: leaked spans removed, clean docs untouched") {
    val trainText = "alpha beta gamma delta"
    // test doc te1: tokens 1-2 unique, 3-6 leaked (span [3,6]), 7 unique
    val docs = Seq(("tr1", trainText, "train"),
                   ("te1", s"uniq1 uniq2 $trainText uniq3", "test"),
                   ("te2", "a clean doc with no overlap at all", "test"))
      .toDF("doc_id", "text", "split")
    val got = Dedup.applyContaminationCuts(docs, "doc_id", "text", col("split"))
      .orderBy("doc_id")
      .as[(String, Long, Long, Long, String)].collect().toSeq
    val md5 = (s: String) => java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got == Seq(
      ("te1", 7L, 3L, 4L, md5("uniq1 uniq2 uniq3")),
      ("te2", 8L, 8L, 0L, md5("a clean doc with no overlap at all"))),
      s"got $got")
  }

  test("applyContaminationCuts: a fully-contaminated doc keeps nothing") {
    val text = "one two three four five six"
    val docs = Seq(("tr1", s"prefix $text suffix tokens here", "train"),
                   ("te1", text, "test")).toDF("doc_id", "text", "split")
    val got = Dedup.applyContaminationCuts(docs, "doc_id", "text", col("split"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
                           r.getLong(3), Option(r.getString(4))))
    assert(got.toSeq == Seq(("te1", 6L, 0L, 6L, None)), s"got ${got.toSeq}")
  }

  // ---- Bloom prefilter (q94) ----

  test("bloom: no false negatives, absent-probe FPR bounded") {
    val items = (1 to 500).map(i => s"item$i")
    val bits = Dedup.bloomBits(
      Dedup.bloomWords(items.map(Tuple1(_)).toDF("h"), "h"))
    def probe(xs: Seq[String]): Seq[Boolean] =
      xs.map(Tuple1(_)).toDF("h")
        .select(Dedup.bloomMightContain(col("h"), bits).as("hit"))
        .as[Boolean].collect().toSeq
    assert(probe(items).forall(identity),
           "an inserted item can never probe false")
    val fpr = probe((1 to 1000).map(i => s"absent$i")).count(identity) / 1000.0
    // theory at n=500, m=8192, k=4: (1-e^(-kn/m))^4 ≈ 0.2%
    assert(fpr < 0.05, s"false-positive rate $fpr out of bounds")
  }

  test("bloomContaminationScan: flags a superset of the exact matched set") {
    val trainText = "alpha beta gamma delta"
    val testText = "uniq1 uniq2 alpha beta gamma delta uniq3 uniq4 uniq5 " +
      "alpha beta gamma delta"
    val docs = Seq(("tr1", trainText, "train"), ("te1", testText, "test"),
                   ("te2", "clean text about cooking pasta with sage", "test"))
      .toDF("doc_id", "text", "split")
    val exact = Dedup.contaminationSpans(docs, "doc_id", "text", col("split"))
      .groupBy(col("doc_id")).agg(sum(col("n_shingles")).as("n"))
      .as[(String, Long)].collect().toMap
    val got = Dedup.bloomContaminationScan(docs, "doc_id", "text", col("split"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.contains("te1"), s"leaked doc must be flagged: $got")
    assert(got("te1")._2 >= exact("te1"),
           s"bloom hits ${got("te1")} must cover the ${exact("te1")} exact matches")
    // 2 inserted hashes in 8192 bits → fpr ~1e-12, and the md5 algebra
    // is deterministic: the clean doc stays clean
    assert(!got.contains("te2"), s"clean doc falsely flagged: $got")
  }

  test("bloom probe plan: zero joins on the corpus side, one exchange") {
    val docs = Seq(("tr1", "alpha beta gamma delta epsilon", "train"),
                   ("te1", "alpha beta gamma delta words here", "test"))
      .toDF("doc_id", "text", "split")
    val plan = Dedup.bloomContaminationScan(docs, "doc_id", "text", col("split"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"probe must not join:\n$plan")
    assert("Exchange".r.findAllIn(plan).size == 1,
           s"only the per-doc count may shuffle:\n$plan")
    assert(!plan.contains("UDF("), s"probe must be codegen-native:\n$plan")
  }
}
