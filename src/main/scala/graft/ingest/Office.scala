package graft.ingest

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf
import org.w3c.dom.{Document, Element, Node}

/** Office Open XML text extraction (S9 — the reference's DoclingService
  * converts DOCX/XLSX/PPTX to markdown,
  * solaius/data_pipeline2 `services/docling_service.py:173-295`). The
  * formats are zip containers of XML parts, so extraction is JDK-only:
  * `java.util.zip` + `javax.xml` DOM (namespace handling + entity
  * unescaping for free; external entities disabled — XXE).
  *
  * Scope: text runs — `w:t` per paragraph `w:p` (DOCX), `a:t` per
  * slide (PPTX), shared strings `t` (XLSX). Layout, tables-as-grids,
  * and embedded media stay out; that matches the "digitally-born
  * simple document" slice, like [[Pdf]].
  *
  * Tolerance contract (same as [[Pdf]]): malformed zip or XML → None,
  * never a thrown exception.
  */
object Office {

  // ---------------------------------------------------------------- zip

  private def zipEntries(bytes: Array[Byte]): Option[Map[String, Array[Byte]]] =
    try {
      if (bytes == null) return None
      val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
      val out = mutable.Map.empty[String, Array[Byte]]
      var e: ZipEntry = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory) out(e.getName) = zin.readAllBytes()
        e = zin.getNextEntry
      }
      if (out.isEmpty) None else Some(out.toMap)
    } catch { case _: Throwable => None }

  private def zipOf(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    entries.foreach { case (name, data) =>
      z.putNextEntry(new ZipEntry(name)); z.write(data); z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  // ---------------------------------------------------------------- xml

  private def parseXml(bytes: Array[Byte]): Option[Document] =
    try {
      val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      // XXE hardening: no DTDs, no external entities
      f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
      f.setExpandEntityReferences(false)
      Some(f.newDocumentBuilder().parse(new ByteArrayInputStream(bytes)))
    } catch { case _: Throwable => None }

  private def xmlEscape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c   => c.toString
    }

  /** Concatenated text of all descendant elements whose local/qualified
    * name matches, in document order.
    */
  private def textsOf(root: Element, tag: String): Seq[String] = {
    val nodes = root.getElementsByTagName(tag)
    (0 until nodes.getLength).map(i => nodes.item(i).getTextContent)
  }

  private def childElements(n: Node): Seq[Element] = {
    val c = n.getChildNodes
    (0 until c.getLength).map(c.item).collect { case e: Element => e }
  }

  // --------------------------------------------------------------- docx

  /** Minimal valid DOCX: one `w:p` per input line. */
  def docxBytes(text: String): Array[Byte] = {
    val paras = text.split("\n", -1).map { line =>
      s"""<w:p><w:r><w:t xml:space="preserve">${xmlEscape(line)}</w:t></w:r></w:p>"""
    }.mkString
    val doc =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">""" +
      s"<w:body>$paras</w:body></w:document>"
    val types =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
      """<Default Extension="xml" ContentType="application/xml"/></Types>"""
    zipOf(Seq("[Content_Types].xml" -> types.getBytes(UTF_8),
              "word/document.xml" -> doc.getBytes(UTF_8)))
  }

  /** DOCX text: paragraphs joined with \n, each paragraph the concat of
    * its `w:t` runs (`w:br`/`w:tab` within runs are out of scope).
    */
  def docxText(bytes: Array[Byte]): Option[String] =
    for {
      entries <- zipEntries(bytes)
      xml <- entries.get("word/document.xml")
      doc <- parseXml(xml)
    } yield {
      val paras = doc.getDocumentElement.getElementsByTagName("w:p")
      (0 until paras.getLength).map { i =>
        textsOf(paras.item(i).asInstanceOf[Element], "w:t").mkString
      }.mkString("\n")
    }

  // --------------------------------------------------------------- pptx

  /** Minimal valid PPTX: one slide per input line (slide text = line). */
  def pptxBytes(text: String): Array[Byte] = {
    val slides = text.split("\n", -1).zipWithIndex.map { case (line, i) =>
      val xml =
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<p:sld xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" """ +
        """xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main">""" +
        s"""<p:cSld><a:t>${xmlEscape(line)}</a:t></p:cSld></p:sld>"""
      s"ppt/slides/slide${i + 1}.xml" -> xml.getBytes(UTF_8)
    }
    zipOf(slides.toSeq)
  }

  /** PPTX text: slides in numeric order joined with \n, each slide the
    * concat of its `a:t` runs.
    */
  def pptxText(bytes: Array[Byte]): Option[String] =
    zipEntries(bytes).flatMap { entries =>
      val SlideName = raw"ppt/slides/slide(\d+)\.xml".r
      val slides = entries.keys.collect { case n @ SlideName(i) => (i.toInt, n) }
        .toSeq.sortBy(_._1)
      if (slides.isEmpty) None
      else Some(slides
        .flatMap { case (_, name) => parseXml(entries(name)) }
        .map(d => textsOf(d.getDocumentElement, "a:t").mkString)
        .mkString("\n"))
    }

  // --------------------------------------------------------------- xlsx

  /** Minimal valid XLSX: the shared-strings part, one string per line. */
  def xlsxBytes(text: String): Array[Byte] = {
    val strings = text.split("\n", -1).map { line =>
      s"""<si><t xml:space="preserve">${xmlEscape(line)}</t></si>"""
    }.mkString
    val sst =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
      s"$strings</sst>"
    zipOf(Seq("xl/sharedStrings.xml" -> sst.getBytes(UTF_8)))
  }

  /** XLSX text: shared strings in order joined with \n. Each `si` item
    * contributes the concat of its `t` descendants (covers both plain
    * and rich-text runs).
    */
  def xlsxText(bytes: Array[Byte]): Option[String] =
    for {
      entries <- zipEntries(bytes)
      xml <- entries.get("xl/sharedStrings.xml")
      doc <- parseXml(xml)
    } yield {
      childElements(doc.getDocumentElement)
        .filter(e => e.getTagName == "si" || e.getLocalName == "si")
        .map(si => textsOf(si, "t").mkString)
        .mkString("\n")
    }

  // ------------------------------------------------------------- columns

  def docxOf(text: Column): Column = {
    val f = udf((t: String) => if (t == null) null else docxBytes(t)); f(text)
  }
  def pptxOf(text: Column): Column = {
    val f = udf((t: String) => if (t == null) null else pptxBytes(t)); f(text)
  }
  def xlsxOf(text: Column): Column = {
    val f = udf((t: String) => if (t == null) null else xlsxBytes(t)); f(text)
  }
  def docxTextOf(bytes: Column): Column = {
    val f = udf((b: Array[Byte]) => docxText(b).orNull); f(bytes)
  }
  def pptxTextOf(bytes: Column): Column = {
    val f = udf((b: Array[Byte]) => pptxText(b).orNull); f(bytes)
  }
  def xlsxTextOf(bytes: Column): Column = {
    val f = udf((b: Array[Byte]) => xlsxText(b).orNull); f(bytes)
  }
}
