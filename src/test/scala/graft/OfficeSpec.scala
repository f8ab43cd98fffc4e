package graft

import graft.ingest.{Ingest, Office}

/** Office Open XML extraction: exact roundtrips for all three formats,
  * XML-escape handling, malformed-zip/XML tolerance (None, never
  * throw), XXE hardening, and conversion routing.
  */
class OfficeSpec extends SparkSpec {
  import spark.implicits._

  private val gnarly = Seq(
    "plain words",
    "xml specials: <tag> & \"quoted\" 'single' ]]>",
    "multi\nline\nwith\n\nblank",
    "trailing\n",
    "  leading and trailing spaces  ",
    "unicode: café 中文")

  test("docx/pptx/xlsx roundtrips are exact incl. escapes and blank lines") {
    gnarly.foreach { t =>
      assert(Office.docxText(Office.docxBytes(t)) === Some(t), s"docx: $t")
      assert(Office.pptxText(Office.pptxBytes(t)) === Some(t), s"pptx: $t")
      assert(Office.xlsxText(Office.xlsxBytes(t)) === Some(t), s"xlsx: $t")
    }
  }

  test("malformed inputs: None, never thrown") {
    val junk: Seq[Array[Byte]] = Seq(
      null, Array.emptyByteArray, "not a zip".getBytes("UTF-8"),
      Office.docxBytes("ok").take(30),                    // truncated zip
      graft.ingest.Pdf.minimalPdf("a pdf, not a docx"))
    junk.foreach { b =>
      assert(Office.docxText(b).forall(_.length < 10000))
      assert(Office.pptxText(b).forall(_.length < 10000))
      assert(Office.xlsxText(b).forall(_.length < 10000))
    }
    assert(Office.docxText("junk".getBytes) === None)
    // valid zip but wrong parts: docx extractor refuses a pptx
    assert(Office.docxText(Office.pptxBytes("slide")) === None)
  }

  test("XXE: doctype-carrying document.xml is rejected, not resolved") {
    val evil =
      ("""<?xml version="1.0"?><!DOCTYPE w:document [<!ENTITY x SYSTEM "file:///etc/passwd">]>""" +
       """<w:document xmlns:w="ns"><w:body><w:p><w:r><w:t>&x;</w:t></w:r></w:p></w:body></w:document>""")
        .getBytes("UTF-8")
    // hand-build a zip holding the hostile part
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    z.putNextEntry(new java.util.zip.ZipEntry("word/document.xml"))
    z.write(evil); z.closeEntry(); z.close()
    assert(Office.docxText(bos.toByteArray) === None)
  }

  test("convertDocuments routes docx/pptx/xlsx through the real extractors") {
    import org.apache.spark.sql.functions._
    val b64 = java.util.Base64.getEncoder
    val rows = Seq(
      ("d1", "a.docx", b64.encodeToString(Office.docxBytes("word text"))),
      ("d2", "b.pptx", b64.encodeToString(Office.pptxBytes("slide text"))),
      ("d3", "c.xlsx", b64.encodeToString(Office.xlsxBytes("cell text"))),
      ("d4", "bad.docx", b64.encodeToString("corrupt".getBytes("UTF-8"))))
      .toDF("doc_id", "filename", "content_b64")
      .withColumn("content_type", lit("application/zip"))
      .withColumn("status", lit("pending"))
      .withColumn("error_message", lit(null).cast("string"))
    val out = Ingest.convertDocuments(rows)
      .select($"doc_id", $"text", $"status", $"error_message")
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getString(2), r.getString(3))))
      .toMap
    assert(out("d1") === (("word text", "pending", null)))
    assert(out("d2") === (("slide text", "pending", null)))
    assert(out("d3") === (("cell text", "pending", null)))
    assert(out("d4") === ((null, "failed", "Conversion failed")))
  }
}
