package graft.ingest

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Minimal PDF text extraction (S9 — the reference converts PDF to
  * markdown via its DoclingService, solaius/data_pipeline2
  * `services/docling_service.py:173-295`, and pins malformed-PDF
  * tolerance in `tests/test_docling_service.py:38-50`).
  *
  * Scope: simple text-based PDFs — uncompressed or FlateDecode content
  * streams, literal/hex string show operators (Tj, ', ", TJ) with the
  * standard escape set, line breaks from the Td, TD, T-star and quote
  * operators. No font CMaps, no layout: bytes shown are decoded as
  * UTF-8. That covers the
  * "digitally-born simple document" slice; scanned/complex PDFs stay
  * on the reference's quarantine path ("File format not allowed").
  *
  * Tolerance contract: [[extractText]] NEVER throws — malformed input
  * (bad header, truncated stream, corrupt deflate, unbalanced strings)
  * returns None and the caller quarantines the row. A distributed
  * ingest of millions of files must treat every parse failure as data,
  * not as a job abort.
  *
  * Both directions are deterministic pure functions of their input, so
  * a generate→extract roundtrip is oracle-checkable (q49): the oracle
  * simply chunks the ORIGINAL text — extraction must be exact.
  */
object Pdf {

  // ------------------------------------------------------------- generate

  /** Escape one text line into a PDF literal string body. CR must be
    * escaped (a raw end-of-line inside a literal string reads back as
    * \n per the PDF spec); parens and backslash per the escape table.
    */
  private def escape(line: String): String =
    line.flatMap {
      case '\\' => "\\\\"
      case '('  => "\\("
      case ')'  => "\\)"
      case '\r' => "\\r"
      case c    => c.toString
    }

  /** A minimal single-page PDF showing `text` (one Tj per line, T*
    * between lines) — the deterministic fixture generator for the
    * roundtrip gate and specs. Uncompressed content stream, correct
    * xref offsets.
    */
  def minimalPdf(text: String): Array[Byte] = {
    val lines = text.split("\n", -1).toSeq
    val shows = lines.zipWithIndex.map { case (l, i) =>
      (if (i == 0) "" else "T*\n") + "(" + escape(l) + ") Tj\n"
    }.mkString
    val content = "BT\n/F1 12 Tf\n72 720 Td\n14 TL\n" + shows + "ET\n"
    val contentBytes = content.getBytes(UTF_8)

    val objs = Seq(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
      s"<< /Length ${contentBytes.length} >>\nstream\n" +
        new String(contentBytes, ISO_8859_1) + "\nendstream",
      "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    val out = new StringBuilder("%PDF-1.4\n")
    val offsets = objs.zipWithIndex.map { case (o, i) =>
      val off = out.length
      out.append(s"${i + 1} 0 obj\n$o\nendobj\n")
      off
    }
    val xrefOff = out.length
    out.append(s"xref\n0 ${objs.size + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => out.append(f"$o%010d 00000 n \n"))
    out.append(s"trailer\n<< /Size ${objs.size + 1} /Root 1 0 R >>\n" +
               s"startxref\n$xrefOff\n%%EOF\n")
    out.toString.getBytes(ISO_8859_1)
  }

  // -------------------------------------------------------------- extract

  /** Inflate a FlateDecode stream; None on corrupt input. */
  private def inflate(data: Array[Byte]): Option[Array[Byte]] =
    try {
      val inf = new java.util.zip.Inflater()
      inf.setInput(data)
      val out = new ByteArrayOutputStream(data.length * 4)
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (n == 0 && !inf.finished()) return None // stuck: corrupt
      }
      inf.end()
      Some(out.toByteArray)
    } catch { case _: Throwable => None }

  /** Parse the text-show operators of one decoded content stream,
    * appending shown bytes line-wise. A tiny state machine, not a
    * regex: literal strings nest balanced parens and carry escapes.
    *
    * PDF content is postfix — string operands precede their operator —
    * so parsed strings buffer in `pending` until the operator decides:
    * Tj/TJ show on the current line, '/" break then show, any other
    * operator consumes its operands unshown.
    */
  private def parseContent(s: String, lines: ByteArrayOutputStream): Unit = {
    var i = 0
    val n = s.length
    val cur = new ByteArrayOutputStream()     // current output line
    val pending = new ByteArrayOutputStream() // operand strings awaiting their op
    var shown = false          // a show op happened since the last break
    var any = lines.size() > 0 // something already committed overall

    def commit(): Unit = {
      if (any) lines.write('\n')
      cur.writeTo(lines); any = true
      cur.reset()
    }
    def breakLine(): Unit = if (shown) { commit(); shown = false }
    def show(): Unit = { pending.writeTo(cur); pending.reset(); shown = true }

    // literal string: cursor on '('; returns index after closing ')'
    def literal(start: Int): Int = {
      var j = start + 1
      var depth = 1
      while (j < n && depth > 0) {
        s.charAt(j) match {
          case '\\' if j + 1 < n =>
            s.charAt(j + 1) match {
              case 'n' => pending.write('\n'); j += 2
              case 'r' => pending.write('\r'); j += 2
              case 't' => pending.write('\t'); j += 2
              case 'b' => pending.write('\b'); j += 2
              case 'f' => pending.write('\f'); j += 2
              case '\n' => j += 2                       // line continuation
              case '\r' => j += (if (j + 2 < n && s.charAt(j + 2) == '\n') 3 else 2)
              case d if d >= '0' && d <= '7' =>         // \ddd octal, 1-3 digits
                var k = j + 1; var v = 0
                while (k < n && k < j + 4 && s.charAt(k) >= '0' && s.charAt(k) <= '7') {
                  v = v * 8 + (s.charAt(k) - '0'); k += 1
                }
                pending.write(v & 0xff); j = k
              case c => pending.write(c.toInt & 0xff); j += 2 // \( \) \\ and unknown
            }
          case '(' => depth += 1; pending.write('('); j += 1
          case ')' =>
            depth -= 1
            if (depth > 0) pending.write(')')
            j += 1
          case '\r' =>                                   // raw EOL → \n per spec
            pending.write('\n'); j += (if (j + 1 < n && s.charAt(j + 1) == '\n') 2 else 1)
          case c => pending.write(c.toInt & 0xff); j += 1
        }
      }
      j
    }

    // hex string: cursor on '<'; returns index after '>'
    def hexString(start: Int): Int = {
      var j = start + 1
      var hi = -1
      while (j < n && s.charAt(j) != '>') {
        val c = s.charAt(j)
        val d = Character.digit(c, 16)
        if (d >= 0) { if (hi < 0) hi = d else { pending.write(hi * 16 + d); hi = -1 } }
        j += 1
      }
      if (hi >= 0) pending.write(hi * 16) // odd digit count: pad 0
      j + 1
    }

    while (i < n) {
      val c = s.charAt(i)
      if (c == '(') i = literal(i)
      else if (c == '<' && i + 1 < n && s.charAt(i + 1) != '<') i = hexString(i)
      else if (c == '<') i += 2                        // '<<' dict open
      else if (c == '\'' || c == '"') { breakLine(); show(); i += 1 }
      else if (c.isLetter || c == '*') {
        var j = i
        while (j < n && (s.charAt(j).isLetter || s.charAt(j) == '*' ||
                         s.charAt(j).isDigit)) j += 1
        s.substring(i, j) match {
          case "Tj" | "TJ" => show()
          case "Td" | "TD" | "T*" => breakLine(); pending.reset()
          case _ => pending.reset()                    // operand sink (Tf, Tm, ...)
        }
        i = j
      }
      else i += 1
    }
    if (shown || cur.size() > 0) commit()
  }

  /** Extract the shown text of a simple PDF; None when the input is not
    * a parseable text PDF (missing header, no decodable content
    * stream). Never throws.
    */
  def extractText(bytes: Array[Byte]): Option[String] =
    try {
      if (bytes == null) return None
      val s = new String(bytes, ISO_8859_1)
      if (!s.startsWith("%PDF-")) return None
      val out = new ByteArrayOutputStream()
      var found = false
      var i = s.indexOf("stream")
      while (i >= 0) {
        // dict immediately preceding this stream keyword
        val dictStart = s.lastIndexOf("<<", i)
        val dict = if (dictStart >= 0) s.substring(dictStart, i) else ""
        // data begins after the EOL that follows the keyword
        var dataStart = i + "stream".length
        if (dataStart < s.length && s.charAt(dataStart) == '\r') dataStart += 1
        if (dataStart < s.length && s.charAt(dataStart) == '\n') dataStart += 1
        val end = s.indexOf("endstream", dataStart)
        if (end >= 0) {
          var data = s.substring(dataStart, end).getBytes(ISO_8859_1)
          // trailing EOL before 'endstream' is not stream data
          if (data.nonEmpty && data.last == '\n') data = data.dropRight(1)
          if (data.nonEmpty && data.last == '\r') data = data.dropRight(1)
          val decoded =
            if (dict.contains("/FlateDecode")) inflate(data)
            else if (dict.contains("/Filter")) None      // unsupported filter
            else Some(data)
          decoded.foreach { d =>
            found = true
            parseContent(new String(d, ISO_8859_1), out)
          }
          i = s.indexOf("stream", end + "endstream".length)
        } else i = -1                                    // truncated: stop, keep what we have
      }
      if (!found) None else Some(new String(out.toByteArray, UTF_8))
    } catch { case _: Throwable => None }

  // ------------------------------------------------------------- columns

  /** Column wrapper: binary PDF → extracted text (null = quarantine).
    * A Scala UDF — per-row imperative parsing has no Catalyst
    * equivalent; the surrounding plan (pruning, partitioning) stays
    * declarative and the UDF is a narrow map, no shuffle.
    */
  def extract(pdf: Column): Column = {
    val f = udf((b: Array[Byte]) => extractText(b).orNull)
    f(pdf)
  }

  /** Column wrapper: text → minimal PDF bytes (fixture generation). */
  def wrap(text: Column): Column = {
    val f = udf((t: String) => if (t == null) null else minimalPdf(t))
    f(text)
  }
}
