package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined-chunking cut finder as a native codegen expression.
  *
  * WHY (measured, not speculative): the original q101 cut rule hashed
  * the trailing 16-char substring with md5 AT EVERY POSITION inside an
  * interpreted `filter` HOF lambda — one substring allocation + one
  * digest per character of the corpus; at sf0.1 that lambda was the
  * whole 3 s query. This expression replaces it with the classic
  * rolling POLYNOMIAL hash (Rabin-Karp family, the rsync/LBFS idiom):
  *
  *   H(i) = Σ_{j=0..w-1} cp(i−w+1+j) · B^{w−1−j}  mod 2^32
  *
  * maintained in O(1) per position (`h·B + c_in − c_out·B^w`) by ONE
  * static kernel called from both the interpreted eval and the
  * generated code (the [[ShingleExpressions]] pattern — the hash
  * logic lives in exactly one place). A position i (1-based,
  * codepoint-counted — the same convention as Spark's
  * `substr`/`length` and DuckDB's `substr`) is a cut iff w ≤ i ≤ len
  * and H(i) mod divisor = 0.
  *
  * BASE CHOICE: B = 1000003 (prime), because B mod 2^k must NOT be 1
  * for any divisor 2^k in use: with the original B = 257 ≡ 1 (mod 64),
  * every coefficient B^j ≡ 1 (mod 64) and the cut rule collapsed to an
  * ORDER-INDEPENDENT additive checksum of the window's codepoints —
  * anagram windows cut identically and short-period text degenerated
  * to all-or-nothing cutting. 1000003 ≡ 3 (mod 64), and 3 has
  * multiplicative order 16 mod 64, so all 16 window positions carry
  * distinct weights even in the divisor's residue space. Content-
  * defined: the cut decision depends only on the trailing w
  * characters, so an edit re-cuts at most the window around it — the
  * property q101's oracle and CdcChunkSpec pin.
  *
  * The oracle stays bit-exact because the polynomial is plain integer
  * algebra: DuckDB recomputes Σ unicode(substr(...))·coeff mod 2^32
  * per position with the 16 baked coefficients (max term sum < 2^57,
  * inside BIGINT).
  */
object CdcExpressions {

  val Base = 1000003L
  private val Mask = 0xFFFFFFFFL

  /** B^window mod 2^32 — the outgoing-char coefficient. */
  def basePow(window: Int): Long = {
    var p = 1L; var k = 0
    while (k < window) { p = (p * Base) & Mask; k += 1 }
    p
  }

  /** The kernel — public static entry for both eval and generated
    * code: 1-based cut positions of `text` under the rolling
    * polynomial-hash rule.
    */
  def cdcCuts(text: UTF8String, window: Int, divisor: Int): ArrayData = {
    val cps = text.toString.codePoints().toArray()
    val n = cps.length
    val bw = basePow(window)
    // pass 1: count; pass 2: fill — exact-size primitive array out
    var cnt = 0
    var pass = 0
    var buf: Array[Int] = null
    while (pass < 2) {
      var out = 0
      var h = 0L
      if (n >= window) {
        var k = 0
        while (k < window) { h = (h * Base + cps(k)) & Mask; k += 1 }
        if (h % divisor == 0L) {
          if (pass == 1) buf(out) = window
          out += 1
        }
        var i = window
        while (i < n) {
          h = (h * Base + cps(i) - cps(i - window) * bw) & Mask
          if (h % divisor == 0L) {
            if (pass == 1) buf(out) = i + 1
            out += 1
          }
          i += 1
        }
      }
      if (pass == 0) { cnt = out; buf = new Array[Int](cnt) }
      pass += 1
    }
    UnsafeArrayData.fromPrimitiveArray(buf)
  }

  case class CdcCuts(child: Expression, window: Int, divisor: Int)
      extends UnaryExpression with Serializable {
    // divisor 1 is its own degeneracy class: hash % 1 == 0 at every
    // position, so the cut rule is constant-true — boundaries
    // everywhere, order-independent trivially
    require(window > 0 && divisor > 1, "need positive window and divisor > 1")
    // The documented degeneracy constraint, ENFORCED: if B ≡ 1 (mod
    // divisor) every coefficient B^j ≡ 1, and the cut rule collapses to
    // an order-independent additive checksum (anagram windows cut
    // identically — the exact bug the base-257 postmortem fixed).
    // B−1 = 1000002 = 2·3·166667, so divisors 2, 3, 6, 166667, ...
    // would silently reproduce it; fail at construction instead.
    require(Base % divisor != 1,
      s"degenerate divisor $divisor: base $Base ≡ 1 (mod $divisor) makes the " +
      "rolling hash order-independent over the window — pick a divisor " +
      "that does not divide base-1")

    // AbstractDataType (ExpectsInputTypes' vocabulary) is private[sql],
    // so the analysis-time type gate is a direct checkInputDataTypes
    // override: a SQL caller passing a non-string first argument gets a
    // clean AnalysisException instead of a runtime ClassCastException
    // (interpreted) or Janino compile error (codegen).
    override def checkInputDataTypes(): TypeCheckResult =
      GraftTypeChecks.expect(prettyName, child.dataType, StringType)

    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "cdc_cuts"

    override protected def nullSafeEval(t: Any): Any =
      cdcCuts(t.asInstanceOf[UTF8String], window, divisor)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, t => {
        s"""
           |${ev.value} =
           |  graft.functions.CdcExpressions.cdcCuts($t, $window, $divisor);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column wrapper (resolved via the session registry — sessions must
    * install [[graft.GraftExtensions]]).
    */
  def cdcCuts(text: Column, window: Int, divisor: Int): Column =
    call_function("cdc_cuts", text, lit(window), lit(divisor))
}
