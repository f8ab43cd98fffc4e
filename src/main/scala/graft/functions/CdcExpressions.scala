package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
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
  *   H(i) = Σ_{j=0..w-1} cp(i−w+1+j) · B^{w−1−j}  mod 2^32,  B = 257
  *
  * maintained in O(1) per position (`h·B + c_in − c_out·B^w`), emitted
  * as a primitive `while` loop inside whole-stage codegen. A position
  * i (1-based, codepoint-counted — the same convention as Spark's
  * `substr`/`length` and DuckDB's `substr`) is a cut iff w ≤ i ≤ len
  * and H(i) mod divisor = 0. Content-defined: the cut decision
  * depends only on the trailing w characters, so an edit re-cuts at
  * most the window around it — the property q101's oracle and
  * CdcChunkSpec pin.
  *
  * The oracle stays bit-exact because the polynomial is plain integer
  * algebra: DuckDB recomputes Σ unicode(substr(...))·coeff mod 2^32
  * per position with the 16 baked coefficients (max term sum < 2^57,
  * inside BIGINT).
  */
object CdcExpressions {

  val Base = 257L
  private val Mask = 0xFFFFFFFFL

  case class CdcCuts(child: Expression, window: Int, divisor: Int)
      extends UnaryExpression with Serializable {
    require(window > 0 && divisor > 0, "need positive window and divisor")

    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "cdc_cuts"

    // B^window mod 2^32 — the outgoing-char coefficient
    private val bw: Long = {
      var p = 1L; var k = 0
      while (k < window) { p = (p * Base) & Mask; k += 1 }
      p
    }

    override protected def nullSafeEval(t: Any): Any = {
      val cps = t.asInstanceOf[UTF8String].toString.codePoints().toArray()
      val n = cps.length
      // pass 1: count; pass 2: fill — exact-size primitive array out
      var cnt = 0
      var h = 0L
      if (n >= window) {
        var k = 0
        while (k < window) { h = (h * Base + cps(k)) & Mask; k += 1 }
        if (h % divisor == 0L) cnt += 1
        var i = window
        while (i < n) {
          h = (h * Base + cps(i) - cps(i - window) * bw) & Mask
          if (h % divisor == 0L) cnt += 1
          i += 1
        }
      }
      val buf = new Array[Int](cnt)
      var out = 0
      h = 0L
      if (n >= window) {
        var k = 0
        while (k < window) { h = (h * Base + cps(k)) & Mask; k += 1 }
        if (h % divisor == 0L) { buf(out) = window; out += 1 }
        var i = window
        while (i < n) {
          h = (h * Base + cps(i) - cps(i - window) * bw) & Mask
          if (h % divisor == 0L) { buf(out) = i + 1; out += 1 }
          i += 1
        }
      }
      UnsafeArrayData.fromPrimitiveArray(buf)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, t => {
        val cps = ctx.freshName("cps"); val n = ctx.freshName("n")
        val cnt = ctx.freshName("cnt"); val h = ctx.freshName("h")
        val k = ctx.freshName("k"); val i = ctx.freshName("i")
        val buf = ctx.freshName("buf"); val out = ctx.freshName("out")
        s"""
           |int[] $cps = $t.toString().codePoints().toArray();
           |int $n = $cps.length;
           |int $cnt = 0;
           |long $h = 0L;
           |if ($n >= $window) {
           |  for (int $k = 0; $k < $window; $k++)
           |    $h = ($h * ${Base}L + (long) $cps[$k]) & ${Mask}L;
           |  if ($h % ${divisor}L == 0L) $cnt++;
           |  for (int $i = $window; $i < $n; $i++) {
           |    $h = ($h * ${Base}L + (long) $cps[$i]
           |          - ((long) $cps[$i - $window]) * ${bw}L) & ${Mask}L;
           |    if ($h % ${divisor}L == 0L) $cnt++;
           |  }
           |}
           |int[] $buf = new int[$cnt];
           |int $out = 0;
           |$h = 0L;
           |if ($n >= $window) {
           |  for (int $k = 0; $k < $window; $k++)
           |    $h = ($h * ${Base}L + (long) $cps[$k]) & ${Mask}L;
           |  if ($h % ${divisor}L == 0L) $buf[$out++] = $window;
           |  for (int $i = $window; $i < $n; $i++) {
           |    $h = ($h * ${Base}L + (long) $cps[$i]
           |          - ((long) $cps[$i - $window]) * ${bw}L) & ${Mask}L;
           |    if ($h % ${divisor}L == 0L) $buf[$out++] = $i + 1;
           |  }
           |}
           |${ev.value} =
           |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
           |    .fromPrimitiveArray($buf);
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
