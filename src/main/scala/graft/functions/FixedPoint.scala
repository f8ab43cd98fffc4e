package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}

/** Exact fixed-point log₂ as pure integer column algebra — the bridge
  * between "rankings that need a logarithm" (BM25 IDF, entropy,
  * perplexity) and "results an independent engine must reproduce
  * bit-for-bit". `ln`/`log` are transcendental: two libm builds may
  * round the last ulp differently, so a double log in a scoring
  * formula is unverifiable across engines. This module computes
  *
  *   log2fp(x) = the F-fraction-bit binary expansion of log₂(x)
  *
  * for integer x ≥ 1 by the classical digit-extraction recurrence —
  * normalize x to a mantissa m ∈ [1,2) at scale 2^S, then F times:
  * square m; the integer bit of the square is the next fraction bit;
  * renormalize. Every step is integer multiply/shift/compare, so ANY
  * engine that runs the same recurrence gets the same bits (DuckDB
  * oracles run it as a recursive CTE). Truncation (the m² >> S and the
  * initial x >> (e−S) when x has more than S+1 bits) is part of the
  * definition — both engines truncate identically.
  *
  * Accuracy: the result is within 2^−F of true log₂ plus O(F·2^−S)
  * accumulated mantissa truncation — with S=20, F=12 that is ~2.5e-4,
  * i.e. ~12 exact fraction bits ([[graft.FixedPointSpec]] asserts the
  * bound against double log₂ over adversarial inputs).
  *
  * Overflow: m < 2^(S+1) so m² < 2^(2S+2) = 2^42 — comfortably inside
  * BIGINT in both engines for any BIGINT input x.
  *
  * PLAN SHAPE — the recurrence references m twice per step (m·m) and
  * the step result three times, so built as one nested Column
  * expression the tree would grow 3^F nodes. The original shipped
  * form was F·cols CHAINED PROJECTIONS (each step a named column) —
  * linear in F, but each `withColumn` is a full analyzer pass over
  * the whole plan, and the BM25 family calls this with up to 5
  * column pairs (~200 driver-side analysis passes per query,
  * measured as the dominant cost of every log-scored query at sf0.1,
  * r17). Now the loop runs inside ONE native codegen expression
  * ([[Log2Fp]], registered as `log2fp` via [[graft.GraftExtensions]]):
  * a single plan node, F=12 iterations of narrow integer ops in a
  * generated `while` loop — same bits, same whole-stage codegen, no
  * projection chain ([[graft.FixedPointSpec]] pins bit-equality
  * against the BigInt recurrence and the plan shape).
  */
object FixedPoint {

  /** Mantissa scale bits (m carried at scale 2^S). */
  val S = 20

  /** Fraction bits of the result (output scale 2^F). */
  val F = 12

  /** Output scale factor, 2^F. */
  val Scale: Long = 1L << F

  private val Two = 1L << (S + 1) // mantissa ≥ this ⟺ integer bit set

  /** The recurrence as a static kernel — the single entry point for
    * both interpreted eval and generated code ([[Log2Fp]]). Values < 1
    * clamp to 1 → 0 (the quarantine-not-abort convention); e via
    * numberOfLeadingZeros ≡ length(bin(x)) − 1 for x ≥ 1.
    */
  def log2fp(x0: Long): Long = {
    val x = if (x0 < 1L) 1L else x0
    val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
    var m = if (e > S) x >> (e - S) else x << (S - e)
    var acc = 0L
    var i = 0
    while (i < F) {
      val mp = (m * m) >> S
      if (mp >= Two) { acc = acc * 2 + 1; m = mp >> 1 }
      else { acc = acc * 2; m = mp }
      i += 1
    }
    e * Scale + acc
  }

  /** log2fp(x) over a bigint column — one codegen'd plan node running
    * the F-step loop per row. Null-safe: callers wrap the input in
    * `greatest(cast, 1)` ([[withLog2]]) so nulls never reach it, but a
    * null input yields null like any unary expression.
    */
  case class Log2Fp(child: Expression)
      extends UnaryExpression with Serializable {

    override def checkInputDataTypes(): TypeCheckResult =
      GraftTypeChecks.expect(prettyName, child.dataType, LongType)
    override def dataType: DataType = LongType
    override def prettyName: String = "log2fp"

    override protected def nullSafeEval(t: Any): Any =
      log2fp(t.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, t => {
        s"""
           |${ev.value} = graft.functions.FixedPoint.log2fp($t);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** For each (srcCol, outCol): adds outCol = floor-ish(2^F · log₂(src))
    * per the recurrence above. srcCol must be a non-null integral
    * column ≥ 1 (callers pass 2df+1-style odd constructions; values < 1
    * are clamped to 1 → 0, the quarantine-not-abort convention).
    * Input columns pass through untouched; outputs append in caller
    * order (or replace, the withColumn contract). The greatest() clamp
    * also absorbs nulls (greatest skips them), matching the original
    * chained-projection form exactly.
    */
  def withLog2(df: DataFrame, cols: Seq[(String, String)]): DataFrame =
    cols.foldLeft(df) { case (acc, (src, out)) =>
      acc.withColumn(out, call_function(
        "log2fp", greatest(col(src).cast("long"), lit(1L))))
    }

  /** The SAME recurrence as DuckDB SQL, for oracle builders: given a
    * relation `srcRel` with columns (`keyCol`, `xCol`), returns a CTE
    * body whose final SELECT yields (`keyCol`, `outCol` = log2fp(x)).
    * Splice into `WITH RECURSIVE` — the iteration is the textbook
    * recursive-CTE loop, i = 0..F.
    */
  def oracleLog2Cte(srcRel: String, keyCol: String, xCol: String,
                    outCol: String): String =
    s"""__l2in AS (
          SELECT $keyCol, greatest(CAST($xCol AS BIGINT), 1) AS x FROM $srcRel),
        __l2it AS (
          SELECT $keyCol, CAST(length(bin(x)) - 1 AS BIGINT) AS e,
                 CASE WHEN length(bin(x)) - 1 > $S
                      THEN x >> CAST(length(bin(x)) - 1 - $S AS INT)
                      ELSE x << CAST($S - (length(bin(x)) - 1) AS INT) END AS m,
                 CAST(0 AS BIGINT) AS acc, 0 AS i
          FROM __l2in
          UNION ALL
          SELECT $keyCol, e,
                 CASE WHEN ((m * m) >> $S) >= $Two
                      THEN ((m * m) >> $S) >> 1 ELSE ((m * m) >> $S) END,
                 acc * 2 + CASE WHEN ((m * m) >> $S) >= $Two THEN 1 ELSE 0 END,
                 i + 1
          FROM __l2it WHERE i < $F),
        __l2 AS (
          SELECT $keyCol, e * $Scale + acc AS $outCol
          FROM __l2it WHERE i = $F)"""
}
