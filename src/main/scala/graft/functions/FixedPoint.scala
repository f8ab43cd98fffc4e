package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  * PLAN SHAPE — the reason this is a DataFrame transform and not a
  * Column: the recurrence references m twice per step (m·m) and the
  * step result three times. Built as one nested Column expression the
  * tree would grow 3^F nodes; built as CHAINED PROJECTIONS each step
  * is a NAMED column evaluated once, the tree stays linear in F, and
  * Catalyst's CollapseProject keeps the non-cheap squares from being
  * inlined (multiple references to a non-trivial producer block the
  * collapse). F=12 steps ≈ 40 narrow integer ops per row, all inside
  * whole-stage codegen.
  */
object FixedPoint {

  /** Mantissa scale bits (m carried at scale 2^S). */
  val S = 20

  /** Fraction bits of the result (output scale 2^F). */
  val F = 12

  /** Output scale factor, 2^F. */
  val Scale: Long = 1L << F

  private val Two = 1L << (S + 1) // mantissa ≥ this ⟺ integer bit set

  /** For each (srcCol, outCol): adds outCol = floor-ish(2^F · log₂(src))
    * per the recurrence above. srcCol must be a non-null integral
    * column ≥ 1 (callers pass 2df+1-style odd constructions; values < 1
    * are clamped to 1 → 0, the quarantine-not-abort convention).
    * Temp columns are dropped; input columns pass through untouched.
    */
  def withLog2(df: DataFrame, cols: Seq[(String, String)]): DataFrame = {
    val js = cols.indices
    // e = ⌊log₂ x⌋ via bit length; m₀ = x normalized to [2^S, 2^(S+1))
    var d = cols.zip(js).foldLeft(df) { case (acc, ((src, _), j)) =>
      acc
        .withColumn(s"__x$j", greatest(col(src).cast("long"), lit(1L)))
        .withColumn(s"__e$j", (length(bin(col(s"__x$j"))) - 1).cast("long"))
        .withColumn(s"__m$j", expr(
          s"CASE WHEN __e$j > $S THEN shiftright(__x$j, CAST(__e$j - $S AS INT))" +
          s" ELSE shiftleft(__x$j, CAST($S - __e$j AS INT)) END"))
        .withColumn(s"__a$j", lit(0L))
    }
    (1 to F).foreach { _ =>
      // mp must be its own projection step: it is referenced three
      // times below, which is exactly what keeps CollapseProject from
      // inlining the square per reference
      d = js.foldLeft(d) { (acc, j) =>
        acc.withColumn(s"__mp$j", expr(s"shiftright(__m$j * __m$j, $S)"))
      }
      d = js.foldLeft(d) { (acc, j) =>
        acc
          .withColumn(s"__a$j", expr(
            s"__a$j * 2 + CASE WHEN __mp$j >= $Two THEN 1 ELSE 0 END"))
          .withColumn(s"__m$j", expr(
            s"CASE WHEN __mp$j >= $Two THEN shiftright(__mp$j, 1) ELSE __mp$j END"))
      }
    }
    d = cols.zip(js).foldLeft(d) { case (acc, ((_, out), j)) =>
      acc.withColumn(out, expr(s"__e$j * $Scale + __a$j"))
    }
    d.drop(js.flatMap(j => Seq(s"__x$j", s"__e$j", s"__m$j", s"__a$j", s"__mp$j")): _*)
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
