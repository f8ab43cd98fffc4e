package graft

import graft.chunk.Chunkers

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

  test("plan: zero shuffles, no window function, no UDF") {
    val df = Chunkers.cdcChunks(Seq((1L, base)).toDF("doc_id", "text"),
                                "doc_id", "text")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Window") &&
           !plan.contains("UDF("),
           s"must be a pure map-side scan:\n$plan")
  }
}
