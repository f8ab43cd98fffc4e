package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression.
  *
  * A web/training corpus mixes precomposed and decomposed encodings of
  * the SAME visible text ("é" as U+00E9 vs e+U+0301, Å as U+00C5 vs
  * U+212B vs A+U+030A) — without canonical normalization, exact dedup,
  * shingle hashing, vocabulary induction, and token counting all treat
  * equal strings as different. Spark has no built-in normalizer;
  * this wraps the JDK's `java.text.Normalizer` (Unicode NFC — the
  * canonical-composition form every major pipeline normalizes to) as a
  * registered function with a static kernel called from whole-stage
  * codegen ([[ShingleExpressions]] pattern).
  *
  * Fast path: `Normalizer.isNormalized` is a cheap scan (ASCII and
  * already-composed text — the overwhelming majority of real corpora —
  * short-circuits without allocating a normalized copy); only
  * denormalized rows pay the compose.
  *
  * Oracle parity: DuckDB's `nfc_normalize` (utf8proc) implements the
  * same stable Unicode canonical composition, so md5-over-UTF-8
  * compares bit-for-bit across engines (q132).
  */
object NormalizeExpressions {

  /** The kernel — public static entry for both eval and generated code.
    * Two-tier fast path: a byte scan first (pure ASCII — no byte ≥
    * 0x80 — is NFC by definition and returns the input with ZERO
    * allocation, the dominant case on the ingest hot path), then
    * `isNormalized` for non-ASCII-but-composed text (one String copy,
    * no normalized copy); only denormalized rows pay the compose.
    */
  def nfc(s: UTF8String): UTF8String = {
    val nb = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < nb) { ascii = (s.getByte(i) & 0x80) == 0; i += 1 }
    if (ascii) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  case class NfcNormalize(child: Expression)
      extends UnaryExpression with Serializable {

    override def checkInputDataTypes(): TypeCheckResult =
      GraftTypeChecks.expect(prettyName, child.dataType, StringType)
    override def dataType: DataType = StringType
    override def prettyName: String = "nfc_normalize"

    override protected def nullSafeEval(t: Any): Any =
      nfc(t.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, t => {
        s"""
           |${ev.value} = graft.functions.NormalizeExpressions.nfc($t);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column wrapper (resolved via the session registry — sessions must
    * install [[graft.GraftExtensions]]).
    */
  def nfcNormalize(text: Column): Column =
    call_function("nfc_normalize", text)

  /** Driver-side twin of the kernel for QUERY strings: stored text is
    * NFC at the conversion boundary ([[graft.ingest.Ingest]]), so every
    * raw query string entering a search path (BM25, phrase, token
    * match, query embedding) must be normalized the same way or a
    * decomposed-form query of composed-form stored text silently
    * misses exact token/hash matches. Same fast path: composed/ASCII
    * input returns the same reference without allocating.
    */
  def nfcString(s: String): String =
    if (s == null || Normalizer.isNormalized(s, Normalizer.Form.NFC)) s
    else Normalizer.normalize(s, Normalizer.Form.NFC)
}
