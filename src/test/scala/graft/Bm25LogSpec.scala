package graft

import org.apache.spark.sql.functions._

import graft.functions.FixedPoint
import graft.search.Search

/** Log-IDF BM25 ([[Search.bm25LogTopK]]): the fixed-point scoring is
  * recomputed from first principles in BigInt, and the POINT of the
  * variant is asserted — on a corpus built so the rational-IDF q81
  * ranking diverges from true Lucene BM25, the log variant's order
  * matches a double-precision ln-IDF reference while the rational one
  * does not.
  */
class Bm25LogSpec extends SparkSpec {

  private val Query = "stream window"
  private val K = 10

  private lazy val docs = graft.io.Tables.load(spark, Sf001, "documents")

  private def refLog2fp(x0: Long): Long = {
    val x = math.max(x0, 1L)
    val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
    var m = if (e > FixedPoint.S) x >> (e - FixedPoint.S) else x << (FixedPoint.S - e)
    var acc = 0L
    val two = 1L << (FixedPoint.S + 1)
    (1 to FixedPoint.F).foreach { _ =>
      val mp = (m * m) >> FixedPoint.S
      acc = acc * 2 + (if (mp >= two) 1 else 0)
      m = if (mp >= two) mp >> 1 else mp
    }
    e * FixedPoint.Scale + acc
  }

  private def referenceScores(
      rows: Seq[(Long, String)], query: String): Map[Long, (Long, BigInt)] = {
    val toks = rows.map { case (id, text) =>
      id -> text.toLowerCase.split("\\W+").filter(_.nonEmpty).toSeq
    }
    val qts = query.toLowerCase.split("\\W+").filter(_.nonEmpty).distinct.toSeq
    val n = toks.size.toLong
    val t = toks.map(_._2.size.toLong).sum
    val dfs = qts.map(qt => qt -> toks.count(_._2.contains(qt)).toLong).toMap
    val l2n = refLog2fp(2 * n + 2)
    toks.map { case (id, ts) =>
      val dl = BigInt(ts.size)
      val score = qts.map { qt =>
        val tf = BigInt(ts.count(_ == qt)).min(BigInt(1048576))
        val idf = BigInt(l2n - refLog2fp(2 * dfs(qt) + 1))
        idf * ((BigInt(10000) * 22 * tf * BigInt(t)) /
          (BigInt(10) * t * tf + BigInt(3) * t + BigInt(9) * dl * n))
      }.sum
      id -> (dl.toLong, score)
    }.toMap
  }

  test("bm25LogTopK equals the BigInt first-principles recomputation") {
    val rows = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    val ref = referenceScores(rows, Query)
    val expected = ref.toSeq
      .filter(_._2._2 > 0)
      .sortBy { case (id, (_, s)) => (-s, id) }
      .take(K)
      .map { case (id, (dl, s)) => (id, dl, s.toLong) }
    val got = Search.bm25LogTopK(docs, "doc_id", "text", Query, k = K)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
  }

  test("ranking matches double-precision ln-IDF Lucene BM25 where the rational IDF diverges") {
    import spark.implicits._
    // Corpus engineered for cross-term divergence: 'common' df=20,
    // 'rare' df=2, N=61, avgdl≈31.7. Doc 1 hits common 10× in a short
    // doc (log score ≈ 1.109·2.05 = 2.28); doc 2 hits rare once in a
    // 3×-average-length doc (log ≈ 3.21·0.567 = 1.82) — under log IDF
    // doc 1 outranks doc 2, under the rational IDF (idf_rare/idf_common
    // = 11.8 instead of 2.9) doc 2 outranks doc 1.
    val filler = (1 to 30).map(i => s"filler$i").mkString(" ")
    val rows: Seq[(Long, String)] =
      Seq(1L -> ((1 to 10).map(_ => "common").mkString(" ") + " f1 f2 f3 f4 f5"),
          2L -> s"rare $filler $filler $filler") ++
        (3L to 21L).map(i => i -> s"common $filler") ++
        (22L to 60L).map(i => i -> s"pad $filler") ++
        Seq(61L -> s"rare $filler")
    val df = rows.toDF("doc_id", "text")
    val q = "rare common"

    def luceneOrder: Seq[Long] = {
      val toks = rows.map { case (id, tx) =>
        id -> tx.toLowerCase.split("\\W+").filter(_.nonEmpty).toSeq
      }
      val qts = q.split(" ").toSeq
      val n = toks.size.toDouble
      val avgdl = toks.map(_._2.size).sum / n
      val dfs = qts.map(t => t -> toks.count(_._2.contains(t)).toDouble).toMap
      toks.map { case (id, ts) =>
        val dl = ts.size.toDouble
        val s = qts.map { t =>
          val tf = ts.count(_ == t).toDouble
          val idf = math.log(1.0 + (n - dfs(t) + 0.5) / (dfs(t) + 0.5))
          idf * tf * (1.2 + 1.0) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
        }.sum
        (id, s)
      }.filter(_._2 > 0).sortBy { case (id, s) => (-s, id) }.map(_._1)
    }

    val logOrder = Search.bm25LogTopK(df, "doc_id", "text", q, k = 100)
      .collect().map(_.getLong(0)).toSeq
    val rationalOrder = Search.bm25TopK(df, "doc_id", "text", q, k = 100)
      .collect().map(_.getLong(0)).toSeq

    assert(logOrder === luceneOrder,
           "log-IDF variant must reproduce the Lucene ordering")
    assert(rationalOrder !== luceneOrder,
           "fixture must actually exercise the rational/log divergence")
  }

  test("stored postings + norms serve the IDENTICAL ranking to the inline scan; the probe prunes to term buckets") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25idx").toString
    Search.writePostings(docs, "doc_id", "text", s"$dir/idx", nBuckets = 16)
    val inline = Search.bm25LogTopK(docs, "doc_id", "text", Query, k = K)
      .orderBy(col("score").desc, col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val served = Search.bm25LogTopKStored(spark, s"$dir/idx", "doc_id",
                                          Query, k = K)
    val stored = served.orderBy(col("score").desc, col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(stored == inline, s"stored=$stored inline=$inline")
    // the candidate scan must prune at the DIRECTORY level
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
           plan.replaceAll("\\s", "").matches("(?s).*PartitionFilters:\\[.*tb.*\\].*"),
           s"term buckets must prune as partitions: ${plan.take(3000)}")
  }

  test("append and remove keep the norms in sync: the served ranking tracks every corpus state exactly") {
    import spark.implicits._
    // 'stream window' docs with distinct tf/dl shapes, plus filler the
    // pruned probe never opens; one zero-relevance doc that still
    // counts in N/T
    val first = Seq(
      (1L, "stream window stream window lateness"),
      (2L, "stream processing with one window only and padding words"),
      (3L, "cooking recipe with butter and flour")) // irrelevant, in N/T
    val later = Seq(
      (4L, "window window window stream stream checkpoint"),
      (5L, "stream alone here"))
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25inc").toString
    Search.writePostings(first.toDF("doc_id", "text"), "doc_id", "text",
                         s"$dir/idx", nBuckets = 8)
    Search.appendPostings(spark, later.toDF("doc_id", "text"), "doc_id",
                          "text", s"$dir/idx")
    def inline(rows: Seq[(Long, String)]): Seq[(Long, Long, Long)] =
      Search.bm25LogTopK(rows.toDF("doc_id", "text"), "doc_id", "text",
                         Query, k = K)
        .orderBy(col("score").desc, col("doc_id"))
        .as[(Long, Long, Long)].collect().toSeq
    def stored(): Seq[(Long, Long, Long)] =
      Search.bm25LogTopKStored(spark, s"$dir/idx", "doc_id", Query, k = K)
        .orderBy(col("score").desc, col("doc_id"))
        .as[(Long, Long, Long)].collect().toSeq
    assert(stored() == inline(first ++ later))
    // takedown: doc 4 (relevant) AND doc 3 (zero-posting overlap with
    // the query, but its norms row must still leave N/T)
    Search.removeFromPostings(
      spark, Seq((4L, later.head._2), (3L, first(2)._2)).toDF("doc_id", "text"),
      "doc_id", "text", s"$dir/idx")
    assert(stored() == inline(Seq(first.head, first(1), later(1))))
  }

  test("plan: one tokenizer per corpus pass, no corpus shuffle, TakeOrderedAndProject top-k") {
    val plan = Search.bm25LogTopK(docs, "doc_id", "text", Query, k = K)
      .queryExecution.executedPlan.toString
    def countOccurrences(s: String, sub: String): Int =
      s.sliding(sub.length).count(_ == sub)
    // Two corpus passes is the floor (stats reduction, then scoring);
    // each tokenizes once — same contract as Bm25Spec's.
    assert(countOccurrences(plan, "split(lower(") == 2,
           s"tokenizer must run once per corpus pass, plan:\n${plan.take(3000)}")
    assert(!plan.linesIterator.exists(l => l.contains("Filter") && l.contains("split(lower(")),
           s"no pushed-down filter may re-run the tokenizer, plan:\n${plan.take(3000)}")
    assert(!plan.contains("Exchange hashpartitioning"),
           s"corpus must not hash-shuffle, plan:\n${plan.take(3000)}")
    assert(plan.contains("TakeOrderedAndProject"),
           s"top-k must be TakeOrderedAndProject, plan:\n${plan.take(3000)}")
    assert(plan.contains("BroadcastExchange"),
           s"corpus stats must broadcast back, plan:\n${plan.take(3000)}")
  }
}
