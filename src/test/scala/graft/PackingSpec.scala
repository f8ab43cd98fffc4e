package graft

import org.apache.spark.sql.functions._

import graft.text.TextStats

/** Sequence packing (q66): reproducibility and fill invariants. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1L to 200L)
    .map(i => (i, Seq.fill((i % 40 + 1).toInt)("w").mkString(" ")))
    .toDF("doc_id", "text")

  private def packed(df: org.apache.spark.sql.DataFrame) =
    TextStats.packSequences(df, "doc_id", "text", budget = 64, buckets = 8)
      .select($"doc_id", $"bucket", $"n_tokens", $"cum_before", $"seq_no")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq

  test("packing is invariant under input partitioning (reproducible)") {
    assert(packed(docs) == packed(docs.repartition(7)))
  }

  test("within a bucket, id order fills sequences monotonically with exact prefix sums") {
    val rows = packed(docs)
    rows.groupBy(_._2).foreach { case (_, members) =>
      val inOrder = members.sortBy(_._1)
      var cum = 0L
      inOrder.foreach { case (_, bucket, n, cumBefore, seqNo) =>
        assert(cumBefore == cum, "cum_before must be the exact token prefix sum")
        assert(seqNo == bucket * (1L << 20) + cumBefore / 64)
        cum += n
      }
      val seqs = inOrder.map(_._5)
      assert(seqs == seqs.sorted, "sequence ids must be non-decreasing in id order")
    }
  }

  test("no sequence id collides across buckets") {
    // seq_no = bucket·2²⁰ + offset, so the owning bucket is recoverable
    // from every id — collisions across buckets are structurally
    // impossible exactly when this holds for all rows
    val rows = packed(docs)
    assert(rows.forall(r => (r._5 >> 20) == r._2),
           "sequence id must encode its bucket in the high bits")
  }
}
