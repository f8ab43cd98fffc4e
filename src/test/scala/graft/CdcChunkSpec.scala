package graft

import graft.chunk.Chunkers
import org.apache.spark.sql.functions.col

/** Content-defined chunking (q101): rolling-window hash cuts. */
class CdcChunkSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(text: String): Seq[(Long, Long, String)] =
    Chunkers.cdcChunks(Seq((1L, text)).toDF("doc_id", "text"),
                       "doc_id", "text")
      .orderBy("chunk_number")
      .as[(Long, Long, Long, String)].collect().toSeq
      .map(c => (c._2, c._3, c._4))

  private val base = (1 to 40)
    .map(i => s"sentence number $i with some distinct words here.")
    .mkString(" ")

  test("chunks reconstruct the text exactly, in order") {
    val got = chunksOf(base)
    assert(got.map(_._3).mkString == base)
    assert(got.size > 1, "divisor 64 must cut a 2000-char text")
    // starts are consistent with lengths
    got.foldLeft(1L) { case (expected, (_, start, content)) =>
      assert(start == expected, s"start $start != $expected")
      expected + content.length
    }
  }

  test("content-defined: an insertion only rewrites the head chunks") {
    val orig = chunksOf(base).map(_._3)
    val edited = chunksOf("INSERTED PREFIX " + base).map(_._3)
    // every original chunk after the first cut survives byte-identical
    val survivors = orig.tail.toSet
    val reused = edited.count(survivors.contains)
    assert(reused == orig.tail.size,
           s"expected all ${orig.tail.size} post-cut chunks reused, got $reused")
  }

  test("a doc shorter than the window is one whole chunk") {
    assert(chunksOf("short doc") == Seq((1L, 1L, "short doc")))
  }

  test("cdc_cuts codegen equals the first-principles rolling-hash twin") {
    // the twin: direct polynomial sum per position (what the DuckDB
    // oracle computes), vs the expression's O(1) rolling update
    def twin(text: String, w: Int = 16, d: Int = 64): Seq[Int] = {
      val cps = text.codePoints().toArray()
      (w to cps.length).filter { i =>
        val h = (0 until w).map { j =>
          BigInt(cps(i - w + j)) * BigInt(1000003).pow(w - 1 - j)
        }.sum.mod(BigInt(2).pow(32))
        h % d == 0
      }
    }
    val texts = Seq(
      base,
      "short",                         // < window: no cuts
      "x" * 16,                        // exactly one window
      "päragraph ünïcode → ≠ 模型 " * 40, // non-ASCII codepoints
      (1 to 500).map(i => s"tok$i").mkString(" "))
    for (t <- texts) {
      val got = Seq((1L, t)).toDF("doc_id", "text")
        .select(graft.functions.CdcExpressions.cdcCuts(col("text"), 16, 64))
        .as[Seq[Int]].head()
      assert(got == twin(t), s"cuts diverge from twin on: ${t.take(40)}…")
    }
  }

  test("hash is order-sensitive: anagram windows must not share a cut decision class") {
    // regression for the base-257 degeneracy (257 ≡ 1 mod 64 made
    // H mod 64 the SUM of the window's codepoints — order-independent,
    // so any permutation of a window cut identically). The kernel must
    // separate a window from its reverse in the divisor's residue space.
    // folds with the LIVE base constant — a hardcoded literal here
    // would keep passing if CdcExpressions.Base regressed to another
    // degenerate value while this test's math stayed pinned to the old one
    def hMod64(s: String): Long = {
      val h = s.codePoints().toArray()
        .foldLeft(BigInt(0))((a, c) =>
          (a * graft.functions.CdcExpressions.Base + c).mod(BigInt(2).pow(32)))
      (h % 64).toLong
    }
    assert(graft.functions.CdcExpressions.Base % 64 != 1,
           "base ≡ 1 mod 64 collapses the hash to an additive checksum")
    val w1 = "abcdefghijklmnop"
    assert(hMod64(w1) != hMod64(w1.reverse),
           "anagram windows collide mod 64 — the hash base is degenerate again")
  }

  test("plan: zero shuffles, no window function, no UDF") {
    val df = Chunkers.cdcChunks(Seq((1L, base)).toDF("doc_id", "text"),
                                "doc_id", "text")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Window") &&
           !plan.contains("UDF("),
           s"must be a pure map-side scan:\n$plan")
  }
}
