package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Source overlap matrix (q97): distinct df-capped shingle hashes
  * shared per source pair.
  */
class SourceOverlapSpec extends SparkSpec {
  import spark.implicits._

  private val phrase = "alpha beta gamma delta epsilon"

  test("two sources sharing a phrase are paired with its shingle count") {
    val docs = Seq(
      ("s1", 1L, s"intro $phrase outro one"),
      ("s2", 2L, s"other words $phrase closing"),
      ("s3", 3L, "totally unrelated content about cooking pasta tonight"))
      .toDF("source", "doc_id", "text")
    val got = Dedup.sourceOverlapMatrix(docs, "source", "doc_id", "text")
      .as[(String, String, Long)].collect().toSeq
    // "alpha beta gamma", "beta gamma delta", "gamma delta epsilon"
    // are the shared 3-shingles; the docs' private shingles are df=1
    assert(got == Seq(("s1", "s2", 3L)), s"got $got")
  }

  test("a phrase above dfCap distinct docs is dropped from the matrix") {
    val docs = ((1 to 6).map(i => (s"s$i", i.toLong, phrase)))
      .toDF("source", "doc_id", "text")
    assert(Dedup.sourceOverlapMatrix(docs, "source", "doc_id", "text",
                                     dfCap = 5).count() == 0,
           "hot shingles must be df-capped before pairing")
  }

  test("within-source duplication alone yields no pairs") {
    val docs = Seq(("s1", 1L, phrase), ("s1", 2L, phrase),
                   ("s2", 3L, "different text with no overlap at all here"))
      .toDF("source", "doc_id", "text")
    assert(Dedup.sourceOverlapMatrix(docs, "source", "doc_id", "text")
             .count() == 0)
  }

  test("plan: pair join runs on the distinct (source, hash) table") {
    val docs = Seq(("s1", 1L, phrase), ("s2", 2L, phrase))
      .toDF("source", "doc_id", "text")
    val plan = Dedup.sourceOverlapMatrix(docs, "source", "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"must stay an equi-join:\n$plan")
    assert(!plan.contains("UDF("), s"must be codegen-native:\n$plan")
  }
}
