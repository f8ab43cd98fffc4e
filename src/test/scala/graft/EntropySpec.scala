package graft

import org.apache.spark.sql.functions._

import graft.functions.FixedPoint
import graft.text.TextStats

/** Token-entropy quality signal ([[TextStats.tokenEntropy]]):
  * first-principles fixed-point recomputation, the discrimination the
  * signal exists for (templated ≪ diverse), and the one-exchange plan.
  */
class EntropySpec extends SparkSpec {
  import spark.implicits._

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

  private def refEntropy(text: String): (Long, Long, Long) = {
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val counts = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = toks.size.toLong
    val hsum = counts.values.map(c => c * (refLog2fp(n) - refLog2fp(c))).sum
    (n, counts.size.toLong, hsum / n)
  }

  test("tokenEntropy equals the first-principles fixed-point recomputation") {
    val texts = Seq(
      1L -> "the cat sat on the mat the end",
      2L -> "a a a a a a a a",
      3L -> "one two three four five six seven eight",
      4L -> "Mixed CASE mixed case MIXED case")
    val df = texts.toDF("doc_id", "text")
    val got = TextStats.tokenEntropy(df, "doc_id", "text")
      .select("doc_id", "n_tokens", "distinct_tokens", "entropy_fp")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    texts.foreach { case (id, tx) =>
      assert(got(id) === refEntropy(tx), s"doc $id")
    }
  }

  test("entropy discriminates: repeated token 0, uniform tokens ~log2(n)") {
    val df = Seq(
      1L -> (1 to 64).map(_ => "same").mkString(" "),      // H = 0
      2L -> (1 to 64).map(i => s"w$i").mkString(" "))      // H = log2(64) = 6
      .toDF("doc_id", "text")
    val got = TextStats.tokenEntropy(df, "doc_id", "text")
      .select("doc_id", "entropy_fp").as[(Long, Long)].collect().toMap
    assert(got(1L) === 0L)
    // 6.0 in 2^12 fixed point, minus recurrence truncation
    assert(math.abs(got(2L) - 6 * FixedPoint.Scale) <= 8, s"got ${got(2L)}")
  }

  test("plan: one exchange end to end (count agg, window and doc agg share it), UDF-free") {
    val df = (1L to 50L).map(i => (i, s"w${i % 7} w${i % 3} tail")).toDF("doc_id", "text")
    val plan = TextStats.tokenEntropy(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected exactly one shuffle:\n$plan")
    assert(!plan.contains("UDF("))
  }
}
