package graft

import org.apache.spark.sql.functions._

import graft.functions.FixedPoint

/** Fixed-point log₂ ([[FixedPoint.withLog2]]): the recurrence is
  * recomputed from first principles in plain BigInt (exact match — the
  * definition IS the recurrence), the accuracy bound against double
  * log₂ is asserted over adversarial inputs, and the plan properties
  * that make it usable are pinned: monotone, UDF-free, and LINEAR in F
  * (chained named projections — a naive nested-Column build would be a
  * 3^F-node tree).
  */
class FixedPointSpec extends SparkSpec {

  /** The recurrence, verbatim, driver-side. */
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

  private val adversarial: Seq[Long] =
    Seq(1L, 2L, 3L, 4L, 5L, 7L, 8L, 9L, 63L, 64L, 65L, 1023L, 1024L, 1025L,
        (1L << 20) - 1, 1L << 20, (1L << 20) + 1,
        (1L << 40) - 1, 1L << 40, (1L << 40) + 1, (1L << 62) - 1, 1L << 62) ++
      (1 to 50).map(i => math.abs(new scala.util.Random(i).nextLong()) % (1L << 45) + 1)

  test("withLog2 equals the BigInt recurrence exactly, on every input") {
    import spark.implicits._
    val df = adversarial.toDF("x")
    val got = FixedPoint.withLog2(df, Seq(("x", "l2")))
      .select(col("x"), col("l2")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    adversarial.foreach { x =>
      assert(got(x) === refLog2fp(x), s"x=$x")
    }
  }

  test("accuracy: within 2^-F + F*2^-(S-1) of true log2, and monotone") {
    val bound = math.pow(2, -FixedPoint.F) +
      FixedPoint.F * math.pow(2, -(FixedPoint.S - 1))
    adversarial.foreach { x =>
      val fp = refLog2fp(x).toDouble / FixedPoint.Scale
      val truth = math.log(x.toDouble) / math.log(2.0)
      assert(math.abs(fp - truth) <= bound, s"x=$x fp=$fp log2=$truth")
    }
    val sorted = adversarial.sorted
    sorted.zip(sorted.tail).foreach { case (a, b) =>
      assert(refLog2fp(a) <= refLog2fp(b), s"monotonicity broke at $a -> $b")
    }
  }

  test("plan: UDF-free and linear in F (no 3^F expression blowup)") {
    import spark.implicits._
    val df = adversarial.toDF("x")
    val out = FixedPoint.withLog2(df, Seq(("x", "l2")))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("UDF("), "log2fp must be pure column algebra")
    // a 3^12 ~ 531k-node tree would print megabytes; the chained
    // projection form stays a few KB
    assert(plan.length < 100000, s"plan suspiciously large: ${plan.length} chars")
  }
}
