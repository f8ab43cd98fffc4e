package graft

import graft.search.Search

/** Phrase search (q109): exact consecutive-token match via the
  * anchor-vote algebra — positions, overlap, and repeated-term
  * phrases, which the bag-of-words `textMatch` cannot express.
  */
class PhraseSearchSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], phrase: String) =
    Search.phraseOccurrences(docs.toDF("doc_id", "text"),
                             "doc_id", "text", phrase)
      .orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq

  test("exact occurrences and first position; order matters") {
    val docs = Seq(
      1L -> "a b c a b c a b",   // "a b" at 1, 4, 7
      2L -> "b a c b a",         // "a b" nowhere (bag overlaps, order no)
      3L -> "x a b y")           // once, offset by a leading token
    assert(run(docs, "a b") == Seq((1L, 3L, 1L), (3L, 1L, 2L)))
  }

  test("three-term phrase spans the middle; partial prefixes don't count") {
    val docs = Seq(
      1L -> "the table scan merge table scan",  // "table scan merge" once
      2L -> "table merge scan",                 // all terms, wrong order
      3L -> "table scan")                       // missing the third term
    assert(run(docs, "table scan merge") == Seq((1L, 1L, 2L)))
  }

  test("repeated-term phrase counts overlapping occurrences") {
    // "a a" in "a a a": anchors 1 and 2 overlap — both count
    assert(run(Seq(1L -> "a a a"), "a a") == Seq((1L, 2L, 1L)))
  }

  test("single-token phrase degenerates to term occurrences") {
    assert(run(Seq(1L -> "q w q e q"), "q") == Seq((1L, 3L, 1L)))
  }

  test("tokenization is the \\W+ lowercase model") {
    // punctuation separates; case folds — same model as textMatch/BM25
    assert(run(Seq(1L -> "Table, SCAN! done"), "table scan") ==
      Seq((1L, 1L, 1L)))
  }

  test("stored index: probe equals the inline form; the scan prunes to term buckets") {
    val docs = (1L to 40L).map(i =>
      (i, s"w$i table scan join w${i + 1} " * (i % 3 + 1).toInt))
    val df = docs.toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_postings").toString
    Search.writePostings(df, "doc_id", "text", s"$dir/idx", nBuckets = 16)
    // no nBuckets on the probe: the layout comes from the index sidecar
    val stored = Search.phraseOccurrencesStored(spark, s"$dir/idx",
                                                "doc_id", "table scan")
    val inline = Search.phraseOccurrences(df, "doc_id", "text", "table scan")
    assert(stored.orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq ==
           inline.orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq)
    // the probe must prune at the DIRECTORY level: tb in PartitionFilters
    val plan = stored.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
           plan.replaceAll("\\s", "").matches("(?s).*PartitionFilters:\\[.*tb.*\\].*"),
           s"term buckets must prune as partitions: $plan")
  }

  test("appendPostings: incremental docs probe identically to a full rebuild") {
    val first = (1L to 20L).map(i => (i, s"alpha table scan beta w$i"))
    val later = (21L to 30L).map(i => (i, s"gamma table scan delta w$i"))
    val dir = java.nio.file.Files.createTempDirectory("graft_postings_a").toString
    Search.writePostings(first.toDF("doc_id", "text"), "doc_id", "text",
                         s"$dir/idx", nBuckets = 16)
    // append picks the bucket count up from the sidecar — no caller arg
    Search.appendPostings(spark, later.toDF("doc_id", "text"),
                          "doc_id", "text", s"$dir/idx")
    val stored = Search.phraseOccurrencesStored(spark, s"$dir/idx",
                                                "doc_id", "table scan")
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    val inline = Search.phraseOccurrences((first ++ later).toDF("doc_id", "text"),
                                          "doc_id", "text", "table scan")
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(stored == inline && stored.size == 30)
  }

  test("appendPostings refuses a directory without index metadata") {
    val dir = java.nio.file.Files.createTempDirectory("graft_postings_b").toString
    val e = intercept[IllegalArgumentException] {
      Search.appendPostings(spark, Seq((1L, "x")).toDF("doc_id", "text"),
                            "doc_id", "text", s"$dir/nothere")
    }
    assert(e.getMessage.contains("postings metadata"))
  }

  test("plan: no UDF, no cartesian; aggregates run on the term sliver") {
    val df = Search.phraseOccurrences(
      Seq((1L, "table scan join")).toDF("doc_id", "text"),
      "doc_id", "text", "table scan")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("UDF("), "must stay codegen-native")
    assert(!plan.contains("CartesianProduct"))
    // the phrase-term filter sits below the first exchange: the only
    // shuffled rows are occurrences of the query's terms
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("table"), "term literals must reach the plan")
  }
}
