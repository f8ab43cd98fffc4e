package graft

import graft.text.TextStats

/** Zipf slope (q169): the division-free least-squares rational over
  * fixed-point logs. The planted fixture uses frequencies 12/r at
  * ranks 1,2,3,4 — every pairwise ratio is a power of two times the
  * SAME 3-mantissa, and log2fp(2^k·m) = k·4096 + log2fp(m) exactly
  * (a shift never changes mantissa digits), so all four points lie
  * EXACTLY on a slope −1 line even after truncation.
  */
class ZipfSpec extends SparkSpec {
  import spark.implicits._

  test("exactly-Zipfian corpus: slope rational is exactly -1 (num == -den)") {
    // term frequencies: a=12, b=6, c=4, d=3 (distinct, so the
    // (freq desc, term asc) ranking is total)
    val text = (Seq.fill(12)("a") ++ Seq.fill(6)("b") ++
                Seq.fill(4)("c") ++ Seq.fill(3)("d")).mkString(" ")
    val out = TextStats.zipfSlope(Seq(text).toDF("text"), "text")
      .as[(Long, Long, Long)].head()
    assert(out._1 == 4L, out.toString)
    assert(out._3 > 0L, out.toString)
    assert(out._2 == -out._3, s"slope must be exactly -1: $out")
  }

  test("a flat (template-spam) corpus has slope 0 exactly") {
    // every term equally frequent → ly constant → num = 0
    val text = Seq.tabulate(5)(i => Seq.fill(4)(s"t$i")).flatten.mkString(" ")
    val out = TextStats.zipfSlope(Seq(text).toDF("text"), "text")
      .as[(Long, Long, Long)].head()
    assert(out._1 == 5L && out._2 == 0L && out._3 > 0L, out.toString)
  }

  test("topK caps the tail: only the K most frequent terms enter the fit") {
    val text = (Seq.fill(8)("x") ++ Seq.fill(4)("y") ++ Seq.fill(2)("z") ++
                Seq("rare1", "rare2")).mkString(" ")
    val out = TextStats.zipfSlope(Seq(text).toDF("text"), "text", topK = 3)
      .as[(Long, Long, Long)].head()
    // x,y,z at ranks 1,2,4?? — no: ranks 1,2,3 with freqs 8,4,2 = 2^3..2^1
    // over ranks 1,2,3: x-axis logs 0, 4096, l2fp(3); y-axis exact
    // 3·4096, 2·4096, 4096 — not collinear, but n_terms must be 3
    assert(out._1 == 3L, out.toString)
  }
}
