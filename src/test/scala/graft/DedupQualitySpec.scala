package graft

import graft.dedup.Dedup

/** MEASURED MinHash-LSH dedup quality (the dedup analogue of
  * AnnRecallSpec): recall of the banded candidate generation against
  * exact shingle-Jaccard ground truth, and its precision on a corpus
  * with planted near-duplicates at three similarity tiers. Everything
  * is md5-deterministic, so the measured values are stable.
  */
class DedupQualitySpec extends SparkSpec {
  import spark.implicits._

  private val WordsPerDoc = 25

  // disjoint per-doc vocabularies: unrelated docs share zero shingles,
  // so any cross-tier candidate would be a real false positive
  private def baseText(i: Int): String =
    (0 until WordsPerDoc).map(j => s"w${i}_$j").mkString(" ")

  private def mutated(i: Int, m: Int): String =
    ((0 until m).map(j => s"x${i}_$j") ++
     (m until WordsPerDoc).map(j => s"w${i}_$j")).mkString(" ")

  private def shingleSet(text: String): Set[String] =
    text.split("\\s+").filter(_.nonEmpty).sliding(3).map(_.mkString(" ")).toSet

  private def jaccard(a: String, b: String): Double = {
    val (sa, sb) = (shingleSet(a), shingleSet(b))
    sa.intersect(sb).size.toDouble / sa.union(sb).size
  }

  test("banded candidates: high recall on true near-dups, zero false positives") {
    val bases = (0 until 20).map(i => (i.toLong, baseText(i)))
    val copies = (0 until 10).map { i =>
      val m = if (i < 4) 2 else if (i < 8) 8 else 20 // high / mid / low similarity
      (100L + i, mutated(i, m))
    }
    val docs = bases ++ copies
    val truth = (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      j = jaccard(ta, tb) if j > 0.0
    } yield (ia, ib) -> j).toMap

    val cand = Dedup.minhashCandidates(docs.toDF("doc_id", "text"), "doc_id", "text",
                                       nBands = 4)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet

    // precision: disjoint vocabularies make any unrelated pair a hash
    // accident (~2^-32) — none may appear
    assert(cand.forall(truth.contains), s"false-positive pairs: ${cand.filterNot(truth.contains)}")

    def recallAbove(t: Double): (Int, Int) = {
      val tier = truth.filter(_._2 >= t).keySet
      (tier.count(cand), tier.size)
    }
    val (hiFound, hiAll) = recallAbove(0.7)
    val (midFound, midAll) = recallAbove(0.4)
    assert(hiAll >= 4 && midAll >= 8, s"fixture tiers: $hiAll high, $midAll mid")
    // 4 one-hash bands: P(miss) = (1-J)^4 — ≈0.8% at J=0.7
    assert(hiFound == hiAll, s"high-similarity recall $hiFound/$hiAll must be total")
    assert(midFound * 10 >= midAll * 7, s"mid-similarity recall $midFound/$midAll under 0.7")
    info(s"recall: J≥0.7 → $hiFound/$hiAll; J≥0.4 → $midFound/$midAll; " +
         s"candidates ${cand.size} of ${docs.size * (docs.size - 1) / 2} pairs")
  }

  test("containment catches the embedded-doc pair Jaccard is blind to; both agree on the symmetric near-dup") {
    import org.apache.spark.sql.functions.col
    // quote-in-article: doc 1 verbatim inside doc 2 with 3x boilerplate
    // appended — containment of the smaller side is 1.0, Jaccard ~0.23
    val quote = baseText(0)
    val article = quote + " " + (0 until 75).map(j => s"bp_$j").mkString(" ")
    // plus a symmetric near-dup pair both gates must agree on
    val docs = Seq((1L, quote), (2L, article),
                   (3L, baseText(1)), (4L, mutated(1, 2)),
                   (5L, baseText(2)))
      .toDF("doc_id", "text").withColumn("blk", org.apache.spark.sql.functions.lit("x"))

    val cont = Dedup.ngramContainmentPairs(docs, "doc_id", "text", "blk")
      .filter(col("inter") * 10 >= col("n_small") * 9)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    val jac = Dedup.ngramJaccardPairs(docs, "doc_id", "text", "blk")
      .filter(col("inter") * 2 >= col("uni"))
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet

    assert(cont.contains((1L, 2L)), s"containment must catch the embedded pair: $cont")
    assert(!jac.contains((1L, 2L)), s"Jaccard at 1/2 must be blind to it: $jac")
    assert(cont.contains((3L, 4L)) && jac.contains((3L, 4L)),
           s"both gates must catch the symmetric near-dup: cont=$cont jac=$jac")
    assert(!cont.exists { case (a, b) => Set(a, b).contains(5L) },
           "the disjoint-vocabulary doc pairs with nothing")
  }

  test("leakage-safe split moves every near-dup cluster as a unit; the naive per-doc split provably leaks") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$Sf001/documents.parquet")
    val pairs = Dedup.minhashCandidates(docs, "doc_id", "text", nBands = 4)
    val rows = Dedup.dupClusters(docs, "doc_id", pairs, "a_id", "b_id")
      .withColumn("cluster_split", Dedup.splitAssign(col("comp")))
      .withColumn("doc_split", Dedup.splitAssign(col("doc_id")))
      .select(col("doc_id").cast("string"), col("comp").cast("string"),
              col("cluster_split"), col("doc_split"))
      .as[(String, String, String, String)].collect().toSeq
    val byComp = rows.groupBy(_._2)
    // the op's guarantee: one split per cluster, no exceptions
    byComp.foreach { case (comp, ms) =>
      assert(ms.map(_._3).distinct.size == 1,
             s"cluster $comp straddles splits: ${ms.map(_._3).distinct}")
    }
    // non-degenerate corpus: real multi-doc clusters exist
    val multi = byComp.filter(_._2.size > 1)
    assert(multi.nonEmpty, "fixture corpus must contain near-dup clusters")
    // and the fix is NEEDED: under the per-doc hash at least one
    // cluster's members would land in different splits (the leak)
    assert(multi.exists { case (_, ms) => ms.map(_._4).distinct.size > 1 },
           "per-doc split should leak on this corpus — fixture too easy?")
  }

  test("threshold sweep: hand-computed gate boundaries over one pair-count pass") {
    import org.apache.spark.sql.functions._
    // A="a b c d e f" (4 shingles), B="a b c d e g" (inter 3, union 5,
    // J=0.6 -> passes 50/60, fails 70+); C shares only "a b c" with
    // each (J=1/7 -> never passes)
    val docs = Seq(
      (1L, "en", "a b c d e f"),
      (2L, "en", "a b c d e g"),
      (3L, "en", "a b c x y z")).toDF("doc_id", "lang", "text")
    val pc = Dedup.ngramPairCounts(docs, "doc_id", "text", "lang", dfCap = 20)
    val gated = pc.select(col("a_id"), col("b_id"), col("inter"),
                          col("na"), col("nb"),
                          explode(typedLit(Seq(50L, 60L, 70L, 80L, 90L)))
                            .as("t_pct"))
      .filter(col("inter") * 100 >=
              col("t_pct") * (col("na") + col("nb") - col("inter")))
      .select(col("t_pct"), col("a_id"), col("b_id"))
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(gated == Seq((50L, 1L, 2L), (60L, 1L, 2L)), gated.toString)
  }
}
