package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.ShingleExpressions
import graft.text.TextStats

/** The fused shingle→md5 codegen kernel must be BIT-IDENTICAL to the
  * composed form it replaced — every dedup-family oracle recomputes
  * `substring(md5(concat_ws(' ', shingle)), 1, len)` independently, so
  * any divergence here is an oracle break, not just a perf bug.
  */
class ShingleExprSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "one two",                            // fewer tokens than k
    "a b c",                              // exactly k
    "dup dup dup dup",                    // repeated shingles survive, in order
    "päragraph ünïcode → ≠ 模型 tokens here",
    "")

  private def composed(k: Int, hexLen: Int) =
    texts.toDF("text")
      .select(TextStats.tokens(lower(col("text"))).as("toks"))
      .select(transform(Dedup.shinglesOf(col("toks"), k),
                        g => substring(md5(g), 1, hexLen)).as("hs"))
      .as[Seq[String]].collect().toSeq

  private def fused(k: Int, hexLen: Int) =
    texts.toDF("text")
      .select(TextStats.tokens(lower(col("text"))).as("toks"))
      .select(call_function("shingle_md5", col("toks"), lit(k), lit(hexLen))
                .as("hs"))
      .as[Seq[String]].collect().toSeq

  test("fused kernel ≡ transform(shinglesOf, substring(md5)) for k=3/5, len=8/32") {
    for (k <- Seq(3, 5); hexLen <- Seq(8, 32))
      assert(fused(k, hexLen) == composed(k, hexLen), s"k=$k hexLen=$hexLen")
  }

  test("null elements follow concat_ws semantics: separator skipped with the element") {
    // concat_ws(" ", "a", null, "b") = "a b" (ONE space) — the kernel
    // must feed the digest identically or the advertised oracle
    // bit-compatibility silently breaks for SQL callers
    val df = spark.sql("SELECT array('a', CAST(NULL AS STRING), 'b') AS toks")
    val fusedNull = df
      .select(call_function("shingle_md5", col("toks"), lit(3), lit(8)))
      .as[Seq[String]].head()
    val composedNull = df
      .select(transform(Dedup.shinglesOf(col("toks"), 3),
                        g => substring(md5(g), 1, 8)))
      .as[Seq[String]].head()
    assert(fusedNull == composedNull)
  }

  test("wrappers pin the engine conventions (8-hex prefix, 32-hex full)") {
    val df = Seq("alpha beta gamma delta").toDF("text")
      .select(TextStats.tokens(col("text")).as("toks"))
    val pre = df.select(ShingleExpressions.shingleMd5Col(col("toks"), 3))
      .as[Seq[String]].head()
    val full = df.select(ShingleExpressions.shingleMd5FullCol(col("toks"), 3))
      .as[Seq[String]].head()
    assert(pre.forall(_.length == 8) && full.forall(_.length == 32))
    assert(full.map(_.take(8)) == pre)
  }

  test("wrong-typed SQL args fail at ANALYSIS, not at runtime") {
    // every registered native function: a mis-typed first argument must
    // raise a clean analysis error (checkInputDataTypes), never a
    // ClassCastException (interpreted) or Janino failure (codegen)
    val cases = Seq(
      "select shingle_md5(42, 3, 8)",
      "select cdc_cuts(42, 16, 64)",
      "select nfc_normalize(array(1, 2))",
      "select cosine_similarity(array(1L, 2L), array(1L, 2L))",
      "select long_vec_dot('abc', 'def')")
    cases.foreach { sql =>
      val e = intercept[org.apache.spark.sql.AnalysisException](
        spark.sql(sql).collect())
      assert(e.getMessage.contains("requires"), s"$sql: ${e.getMessage}")
    }
  }

  test("a literal NULL argument still evaluates to NULL, not an analysis error") {
    // the type gate must not be stricter than Spark's own
    // ExpectsInputTypes idiom, which admits NullType: fn(NULL) worked
    // through the null-safe eval path before the gate existed
    val rows = spark.sql(
      "select nfc_normalize(NULL) as a, cdc_cuts(NULL, 16, 64) as b, " +
      "shingle_md5(NULL, 3, 8) as c").collect()
    assert(rows.head.isNullAt(0) && rows.head.isNullAt(1) &&
           rows.head.isNullAt(2))
  }

  test("degenerate CDC divisor (Base ≡ 1 mod d) fails at construction") {
    // 1000002 = 2·3·166667: divisor 2 would collapse the rolling hash
    // to an order-independent checksum — constructor must refuse
    val textLit = org.apache.spark.sql.catalyst.expressions.Literal("text")
    val e = intercept[IllegalArgumentException](
      graft.functions.CdcExpressions.CdcCuts(textLit, 16, 2))
    assert(e.getMessage.contains("degenerate"))
    // divisor 1 is its own degeneracy (hash % 1 == 0 cuts everywhere)
    intercept[IllegalArgumentException](
      graft.functions.CdcExpressions.CdcCuts(textLit, 16, 1))
    // the shipped default stays legal
    graft.functions.CdcExpressions.CdcCuts(textLit, 16, 64)
  }
}
