package graft

import graft.chunk.Chunkers

/** Sliding-window chunker (q99): overlapping windows at a stride. */
class SlidingChunkSpec extends SparkSpec {
  import spark.implicits._

  private def run(text: String, width: Int, stride: Int) =
    Chunkers.slidingChunks(Seq((1L, text)).toDF("doc_id", "text"),
                           "doc_id", "text", width, stride)
      .orderBy("chunk_number")
      .as[(Long, Long, Long, String)].collect().toSeq

  test("exact windows, overlap, and tail truncation") {
    val text = ('a' to 'z').mkString * 7 // 182 chars
    val got = run(text, 100, 60)
    // last start index = ceil(82/60) = 2 -> starts 1, 61, 121
    assert(got.map(c => (c._2, c._3)) == Seq((1L, 1L), (2L, 61L), (3L, 121L)))
    assert(got(0)._4 == text.substring(0, 100))
    assert(got(1)._4 == text.substring(60, 160))
    assert(got(2)._4 == text.substring(120)) // truncated tail, 62 chars
    // consecutive chunks share width - stride chars
    assert(got(0)._4.takeRight(40) == got(1)._4.take(40))
  }

  test("text shorter than one window yields exactly one chunk") {
    assert(run("short", 100, 60) == Seq((1L, 1L, 1L, "short")))
  }

  test("exact multiple: no phantom empty tail window") {
    // len = width + stride -> last = ceil(60/60) = 1 -> 2 chunks
    val text = "x" * 160
    assert(run(text, 100, 60).map(_._2) == Seq(1L, 2L))
  }

  test("stride == width degenerates to non-overlapping fixed windows") {
    val text = "y" * 250
    val got = run(text, 100, 100)
    assert(got.map(_._3) == Seq(1L, 101L, 201L))
    assert(got.map(_._4.length) == Seq(100, 100, 50))
  }

  test("empty text yields no rows; plan is UDF-free with no shuffle") {
    assert(run("", 100, 60).isEmpty)
    val df = Chunkers.slidingChunks(Seq((1L, "abc")).toDF("doc_id", "text"),
                                    "doc_id", "text")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("UDF(") && !plan.contains("Exchange"),
           s"must be a pure map-side scan:\n$plan")
  }
}
