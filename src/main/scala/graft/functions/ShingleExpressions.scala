package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused shingle→md5-prefix kernel as a native codegen expression.
  *
  * WHY (measured, not speculative): the dedup family's hot pass is
  * "build k-word shingle strings, md5 each, keep the first 8 hex
  * chars" — previously two interpreted HOF `transform` lambdas
  * (`concat_ws` per shingle, then `substring(md5(g), 1, 8)` per
  * shingle), each element allocating intermediate UTF8Strings and
  * spinning up a fresh digest (Spark's `Md5` news a MessageDigest per
  * eval). This expression fuses the whole pass into ONE static kernel
  * call emitted inside whole-stage codegen: a ThreadLocal digest
  * reused across every shingle of every row, bytes fed directly from
  * the token array (separator included), only the 8-char prefix ever
  * materialized.
  *
  * BIT-COMPATIBLE with the engine-wide convention
  * `substring(md5(concat_ws(" ", shingle)), 1, 8)` — md5 runs over the
  * UTF-8 bytes of the space-joined token window, so every existing
  * DuckDB oracle (q23/q24/q44/q61/q83/q94/q97/q110/q130 …) is
  * untouched. Size guard matches [[graft.dedup.Dedup.shinglesOf]]:
  * fewer than k tokens → empty array.
  */
object ShingleExpressions {

  private val Hex = "0123456789abcdef".getBytes("US-ASCII")
  private val Digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** The kernel — public static entry for both eval and generated
    * code. `hexLen` ∈ 1..32: how many leading hex chars of the digest
    * each element keeps (8 = the dedup-family prefix convention, 32 =
    * the full digest MinHash band-slices).
    */
  def shingleMd5(arr: ArrayData, k: Int, hexLen: Int): ArrayData = {
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - k + 1)
    val d = Digest.get()
    var i = 0
    while (i <= n - k) {
      d.reset()
      // concat_ws semantics exactly: a null element is skipped WITH its
      // separator ("a", null, "b" → "a b", not "a  b") — the composed
      // form this kernel must stay bit-compatible with
      var written = false
      var j = 0
      while (j < k) {
        val s = arr.getUTF8String(i + j)
        if (s != null) {
          if (written) d.update(' '.toByte)
          d.update(s.getBytes)
          written = true
        }
        j += 1
      }
      val dig = d.digest()
      val hex = new Array[Byte](hexLen)
      var c = 0
      while (c < hexLen) {
        val byte = dig(c / 2)
        hex(c) = if (c % 2 == 0) Hex((byte >> 4) & 0xF) else Hex(byte & 0xF)
        c += 1
      }
      out(i) = UTF8String.fromBytes(hex)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** shingle_md5(tokens array<string>, k, hexLen) → array<string> of
    * hexLen-char md5 prefixes of the k-word space-joined shingles.
    */
  case class ShingleMd5Prefixes(child: Expression, k: Int, hexLen: Int)
      extends UnaryExpression with Serializable {
    require(k > 0, "need positive shingle size")
    require(hexLen >= 1 && hexLen <= 32, "hexLen must be in 1..32")

    override def checkInputDataTypes(): TypeCheckResult =
      GraftTypeChecks.expect(prettyName, child.dataType, ArrayType(StringType))

    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "shingle_md5"

    override protected def nullSafeEval(t: Any): Any =
      shingleMd5(t.asInstanceOf[ArrayData], k, hexLen)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, t => {
        s"""
           |${ev.value} =
           |  graft.functions.ShingleExpressions.shingleMd5($t, $k, $hexLen);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column wrappers (resolved via the session registry — sessions
    * must install [[graft.GraftExtensions]]).
    */
  def shingleMd5Col(tokens: Column, k: Int): Column =
    call_function("shingle_md5", tokens, lit(k), lit(8))

  /** Full-digest form — the MinHash signature input. */
  def shingleMd5FullCol(tokens: Column, k: Int): Column =
    call_function("shingle_md5", tokens, lit(k), lit(32))
}
