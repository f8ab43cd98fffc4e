package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingestion operators (reference S1–S3, P1, SURVEY.md §2.1/§2.2).
  *
  * The reference's upload path reads client bytes + filename +
  * content-type (solaius/data_pipeline2 `api/routes/documents.py:26-43`),
  * sniffs MIME from magic bytes when absent
  * (`services/docling_service.py:53-55`), rewrites `.txt` → `.md`
  * (:188-191), base64-encodes content for storage
  * (`services/document_processor.py:50-51`), and assigns ids/status.
  * Spark-first: the "upload" is a `binaryFile` scan over a directory —
  * the distributed analogue of N clients POSTing files.
  */
object Ingest {

  /** S1 — directory of raw files → (path, modificationTime, length,
    * content:binary).
    */
  def readBinaryDir(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(dir)

  /** S2 — MIME sniffing from magic bytes, the cases the reference's
    * tests pin (`tests/test_docling_service.py:9-16`): `%PDF` →
    * application/pdf, zip magic → docx-family container, plus the
    * image formats the reference accepts for conversion
    * (`README.md:8-20` format list; PNG/JPEG/GIF magics). Pure column
    * expressions — no UDF.
    */
  def detectMime(content: Column): Column =
    when(substring(content, 1, 4) === lit("%PDF".getBytes("US-ASCII")), "application/pdf")
      .when(substring(content, 1, 4) === lit(Array[Byte](0x50, 0x4b, 0x03, 0x04)),
            "application/zip")
      .when(substring(content, 1, 4) ===
              lit(Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47)), "image/png")
      .when(substring(content, 1, 3) ===
              lit(Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte)), "image/jpeg")
      .when(substring(content, 1, 6) === lit("GIF87a".getBytes("US-ASCII")) ||
              substring(content, 1, 6) === lit("GIF89a".getBytes("US-ASCII")),
            "image/gif")
      .otherwise("text/plain")

  /** P1 — `.txt` → `.md` filename rewrite (`docling_service.py:188-191`). */
  def txtToMd(filename: Column): Column =
    when(lower(filename).endsWith(".txt"),
         concat(filename.substr(lit(1), length(filename) - 4), lit(".md")))
      .otherwise(filename)

  /** S1+S2+S3 — full ingest projection: binaryFile scan output →
    * document rows. doc_id is content-derived (sha256 of bytes +
    * filename) instead of the reference's uuid4
    * (`document_processor.py:54`) so results are oracle-comparable
    * (SURVEY §7.4 risk 5); content stored base64 like the reference
    * (`document_processor.py:50-51`).
    */
  def toDocuments(binary: DataFrame, now: Column = current_timestamp()): DataFrame = {
    val filename = regexp_extract(col("path"), "[^/]+$", 0)
    binary.select(
      sha2(concat(base64(col("content")), filename), 256).as("doc_id"),
      txtToMd(filename).as("filename"),
      detectMime(col("content")).as("content_type"),
      // MIME-chunking stripped for cross-engine stability (RFC 4648)
      regexp_replace(base64(col("content")), "[\\r\\n]", "").as("content_b64"),
      lit("pending").as("status"),
      lit("{}").as("metadata_json"),
      now.as("created_at"),
      now.as("updated_at"),
      lit(null).cast("string").as("error_message"))
  }

  /** S3 — decode stored content back to text
    * (`models/document.py:38-47` decode_content).
    */
  def decodeContent(contentB64: Column): Column =
    unbase64(contentB64).cast("string")

  /** Formats the engine accepts natively (reference enumerates its
    * supported set in `README.md:8-20`; its DoclingService raises
    * "File format not allowed" otherwise,
    * `tests/test_docling_service.py:52-60`).
    */
  val SupportedExtensions: Seq[String] = Seq("md", "txt", "markdown")

  /** Every extension the conversion pipeline accepts — the engine's
    * analogue of the reference's allowed-format list (`README.md:8-20`:
    * markdown/text, PDF, Office, images).
    */
  def allowedExtensions: Seq[String] =
    SupportedExtensions ++ Seq("pdf", "docx", "pptx", "xlsx") ++ ImageExtensions

  /** S9 error path — the batch-idiomatic form of the reference's
    * ConversionError: unsupported rows are FLAGGED failed with the
    * reference's message rather than thrown (a distributed pipeline
    * quarantines, it doesn't abort the job for one bad file).
    */
  def validateFormat(docs: DataFrame): DataFrame = {
    val ext = lower(regexp_extract(col("filename"), "\\.([^.]+)$", 1))
    docs
      .withColumn("status",
        when(ext.isInCollection(allowedExtensions), col("status"))
          .otherwise(lit("failed")))
      .withColumn("error_message",
        when(ext.isInCollection(allowedExtensions), col("error_message"))
          .otherwise(lit("File format not allowed")))
  }

  /** Image formats routed through the real JDK codec
    * ([[graft.multimodal.Codecs]]); mirrors the reference's accepted
    * image set (`docling_service.py:193-206`).
    */
  val ImageExtensions: Seq[String] = Seq("png", "jpg", "jpeg", "gif", "bmp")

  /** S9 — format conversion to text (reference
    * `docling_service.py:173-295` converts to markdown; here: native
    * text passes through, PDFs go through [[Pdf]]'s content-stream
    * extractor, DOCX/PPTX/XLSX through [[Office]]'s zip+XML
    * extractors, and images are REALLY decoded
    * ([[graft.multimodal.Codecs]], JDK ImageIO) into a markdown image
    * stub carrying the decoded facts — dimensions, MIME, mean color.
    * The reference OCRs images via its Docling ML model; an ML text
    * model is out of scope in this sandbox (documented in README), so
    * the conversion contract here is decode-and-describe: a corrupt
    * image still fails exactly like any other convertible. Everything
    * else — and any file its extractor cannot decode — is quarantined
    * with the reference's error contract. Adds a `text` column; failed
    * rows have null text.
    */
  def convertDocuments(docs: DataFrame): DataFrame = {
    val ext = lower(regexp_extract(col("filename"), "\\.([^.]+)$", 1))
    val isText = ext.isInCollection(SupportedExtensions)
    val isPdf = col("content_type") === "application/pdf" || ext === "pdf"
    val isDocx = ext === "docx"
    val isPptx = ext === "pptx"
    val isXlsx = ext === "xlsx"
    val isImage = col("content_type").startsWith("image/") ||
      ext.isInCollection(ImageExtensions)
    val convertible = isPdf || isDocx || isPptx || isXlsx || isImage
    val bytes = unbase64(col("content_b64"))
    // decode ONCE in its own projection: the meta struct is referenced
    // five times below, and CollapseProject would otherwise inline the
    // (non-cheap) decode per reference.
    val withImg = docs.withColumn("__img",
      when(isImage, graft.multimodal.Codecs.imageMetaOf(bytes))
        .otherwise(lit(null)))
    val img = col("__img")
    // the stub's MIME label: sniffed type when it is an image one, else
    // derived from the extension (BMP has no sniffed magic — a 2-byte
    // "BM" check would false-positive on text)
    val imageMime = when(col("content_type").startsWith("image/"), col("content_type"))
      .when(ext.isin("jpg", "jpeg"), "image/jpeg")
      .otherwise(concat(lit("image/"), ext))
    val imageText = when(img.isNotNull,
      concat(lit("!["), col("filename"), lit("]("), col("filename"), lit(")\n\n"),
             img.getField("width"), lit("x"), img.getField("height"),
             lit(" "), imageMime,
             lit(", mean rgb("), img.getField("r"), lit(","),
             img.getField("g"), lit(","), img.getField("b"), lit(")")))
    val converted = withImg.withColumn("text",
      // Unicode NFC at the conversion boundary: everything stored
      // downstream (dedup shingles, vocab induction, chunk hashes) sees
      // ONE canonical encoding of visually-equal text. Identity fast
      // path on ASCII/composed input ([[graft.functions
      // .NormalizeExpressions]]), so already-clean corpora pay a scan.
      // PARITY NOTE — deliberate deviation from the reference: the
      // reference stores decoded text verbatim (no normalize call
      // anywhere in solaius/data_pipeline2), so stored text here is NOT
      // byte-identical to a decomposed-Unicode upload. Pinned by
      // TablesJobsIngestSpec (decomposed upload → composed stored); any
      // byte-level round-trip expectation on converted text must
      // normalize first. Query strings are normalized the same way at
      // every search entry point (Search/Embedding) so probe and store
      // always agree.
      graft.functions.NormalizeExpressions.nfcNormalize(
        when(isText, decodeContent(col("content_b64")))
          .when(isPdf, Pdf.extract(bytes))
          .when(isDocx, Office.docxTextOf(bytes))
          .when(isPptx, Office.pptxTextOf(bytes))
          .when(isXlsx, Office.xlsxTextOf(bytes))
          .when(isImage, imageText)
          .otherwise(lit(null).cast("string"))))
      .drop("__img")
    converted
      .withColumn("status",
        when(col("text").isNotNull, col("status")).otherwise(lit("failed")))
      .withColumn("error_message",
        when(col("text").isNotNull, col("error_message"))
          .when(convertible, lit("Conversion failed"))
          .otherwise(lit("File format not allowed")))
  }
}
