package graft

import org.apache.spark.sql.functions._

import graft.functions.NormalizeExpressions

/** Unicode NFC normalization (q132): canonical composition so
  * precomposed and decomposed encodings of the same visible text hash
  * identically — the pass exact dedup / shingles / vocab induction
  * need before anything else touches the corpus. All non-ASCII is
  * written as explicit \\u escapes: composed vs decomposed forms are
  * visually identical, and a literal would hide which one the source
  * actually contains.
  */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val Decomposed = "cafe\u0301"  // e + COMBINING ACUTE
  private val Composed = "caf\u00e9"     // precomposed \u00e9
  private val Angstrom = "\u212b"        // ANGSTROM SIGN (singleton -> U+00C5)
  private val ARingComposed = "\u00c5"   // precomposed A-ring
  private val ARingDecomposed = "A\u030a" // A + COMBINING RING

  private def nfcOf(s: String): String =
    Seq(s).toDF("t")
      .select(NormalizeExpressions.nfcNormalize(col("t")))
      .as[String].head()

  test("composes the canonical cases: combining marks and singleton points") {
    assert(nfcOf(Decomposed) == Composed)
    assert(nfcOf(Decomposed).length == 4)
    assert(nfcOf(ARingDecomposed) == ARingComposed)
    assert(nfcOf(Angstrom) == ARingComposed)
  }

  test("identity on ASCII and already-composed text (fast path), idempotent") {
    val ascii = "plain ascii text 123"
    assert(nfcOf(ascii) == ascii)
    assert(nfcOf(Composed) == Composed)
    assert(nfcOf(nfcOf(Decomposed)) == nfcOf(Decomposed))
  }

  test("null passes through; plan has no UDF and no shuffle") {
    val df = Seq(Some(Composed), None).toDF("t")
      .select(NormalizeExpressions.nfcNormalize(col("t")).as("n"))
    assert(df.as[Option[String]].collect().toSet == Set(Some(Composed), None))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("UDF(") && !plan.contains("Exchange"), plan)
  }

  test("equal-after-NFC strings get equal md5 — the dedup property") {
    val hashes = Seq(Composed, Decomposed).toDF("t")
      .select(md5(NormalizeExpressions.nfcNormalize(col("t"))))
      .as[String].collect().toSet
    assert(hashes.size == 1)
  }
}
