package graft

import graft.text.Curation
import org.apache.spark.sql.functions._

/** Domain-relevance importance weights (q155): the exact-integer
  * linearized DSIR score — hand-checked marginals on a 3-doc corpus,
  * plus the sign/zero structure that makes the weights usable as a
  * selection rank.
  */
class DomainRelevanceSpec extends SparkSpec {
  import spark.implicits._

  test("weights are the exact t_f·R − r_f·T algebra, per document") {
    val docs = Seq(
      (1L, "wiki", "alpha alpha"),
      (2L, "web", "beta beta beta"),
      (3L, "web", "alpha beta")).toDF("doc_id", "source", "text")
    val got = Curation.domainRelevanceWeights(
        docs, "doc_id", "text", col("source") === "wiki", buckets = 64)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // t_alpha=2 r_alpha=1, t_beta=0 r_beta=4, T=2, R=5
    // w_alpha = 2·5 − 1·2 = 8; w_beta = 0·5 − 4·2 = −8
    // doc1 = 2·8 = 16; doc2 = 3·(−8) = −24; doc3 = 8 − 8 = 0
    assert(got.toSeq == Seq((1L, 2L, 16L), (2L, 3L, -24L), (3L, 2L, 0L)),
           got.mkString(", "))
  }

  test("a doc of purely target-exclusive words outranks mixed and rest docs") {
    val docs = Seq(
      (1L, true, "quantum quantum lattice"),
      (2L, false, "football football football season"),
      (3L, false, "quantum football"),
      (4L, false, "lattice quantum quantum")).toDF("doc_id", "tgt", "text")
    val scores = Curation.domainRelevanceWeights(
        docs, "doc_id", "text", col("tgt"), buckets = 64)
      .select($"doc_id", $"score").as[(Long, Long)].collect().toMap
    assert(scores(4L) > scores(3L) && scores(3L) > scores(2L),
           scores.toString)
  }
}
