package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.Schemas.{JobStatus, JobType}
import graft.ingest.Ingest
import graft.io.Tables
import graft.jobs.JobLedger

class TablesJobsIngestSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("latestByKey keeps exactly the newest row per key (ES upsert idiom)") {
    val df = Seq(
      ("d1", 1, ts("2025-01-01 00:00:00")),
      ("d1", 2, ts("2025-01-02 00:00:00")),
      ("d2", 3, ts("2025-01-01 00:00:00"))).toDF("id", "v", "updated_at")
    val got = Tables.latestByKey(df, Seq("id"), Seq(col("updated_at")))
      .select("id", "v").as[(String, Int)].collect().toMap
    assert(got == Map("d1" -> 2, "d2" -> 3))
  }

  test("upsert = union + latest-wins") {
    val existing = Seq(("d1", "old", ts("2025-01-01 00:00:00"))).toDF("id", "s", "updated_at")
    val updates = Seq(("d1", "new", ts("2025-01-02 00:00:00")),
                      ("d2", "fresh", ts("2025-01-02 00:00:00"))).toDF("id", "s", "updated_at")
    val got = Tables.upsert(existing, updates, Seq("id"), Seq(col("updated_at")))
      .select("id", "s").as[(String, String)].collect().toMap
    assert(got == Map("d1" -> "new", "d2" -> "fresh"))
  }

  test("upsert: an update WINS a version tie (ES replace semantics — a re-delivered key must never serve its stale row)") {
    val existing = Seq(("d1", "stale", ts("2025-01-01 00:00:00")))
      .toDF("id", "s", "updated_at")
    val updates = Seq(("d1", "fresh", ts("2025-01-01 00:00:00"))) // SAME version
      .toDF("id", "s", "updated_at")
    val got = Tables.upsert(existing, updates, Seq("id"), Seq(col("updated_at")))
      .select("id", "s").as[(String, String)].collect().toMap
    assert(got == Map("d1" -> "fresh"),
      "a version tie must resolve to the update, deterministically")
    // constant-version tables (the chunks/signatures convention) are
    // exactly this tie on every re-delivery
    val gotConst = Tables.upsert(existing, updates, Seq("id"), Seq(lit(1)))
      .select("id", "s").as[(String, String)].collect().toMap
    assert(gotConst == Map("d1" -> "fresh"))
  }

  test("events ts normalization: nanos long → micros timestamp") {
    val ev = Tables.load(spark, Sf001, "events")
    assert(ev.schema("ts").dataType.typeName == "timestamp")
    assert(ev.limit(1).count() == 1)
  }

  test("job state machine: legal path queued→running→completed sets timestamps") {
    val j0 = JobLedger.newJob("j1", JobType.DocumentProcessing, ts("2025-01-01 00:00:00"))
    val j1 = JobLedger.transition(j0, JobStatus.Running, ts("2025-01-01 00:01:00"))
    assert(j1.started_at.contains(ts("2025-01-01 00:01:00")))
    val j2 = JobLedger.transition(j1, JobStatus.Completed, ts("2025-01-01 00:02:00"))
    assert(j2.completed_at.contains(ts("2025-01-01 00:02:00")) && j2.progress == 1.0)
  }

  test("job state machine rejects illegal transitions (ST3)") {
    val j0 = JobLedger.newJob("j1", JobType.DocumentProcessing, ts("2025-01-01 00:00:00"))
    val done = JobLedger.transition(
      JobLedger.transition(j0, JobStatus.Running, ts("2025-01-01 00:01:00")),
      JobStatus.Completed, ts("2025-01-01 00:02:00"))
    assertThrows[IllegalArgumentException](
      JobLedger.transition(done, JobStatus.Running, ts("2025-01-01 00:03:00")))
    assertThrows[IllegalArgumentException](
      JobLedger.transition(j0, JobStatus.Completed, ts("2025-01-01 00:01:00")))
  }

  test("mime detection: %PDF, zip magic, image magics, text (test_docling_service.py:9-16)") {
    val df = Seq(
      ("pdf", "%PDF-1.4 rest".getBytes("US-ASCII")),
      ("zip", Array[Byte](0x50, 0x4b, 0x03, 0x04, 0x00)),
      ("png", Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a)),
      ("jpg", Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte)),
      ("gif", "GIF89a-rest".getBytes("US-ASCII")),
      ("txt", "plain text".getBytes("US-ASCII"))).toDF("id", "content")
    val got = df.select($"id", Ingest.detectMime($"content").as("mime"))
      .as[(String, String)].collect().toMap
    assert(got == Map("pdf" -> "application/pdf", "zip" -> "application/zip",
                      "png" -> "image/png", "jpg" -> "image/jpeg",
                      "gif" -> "image/gif", "txt" -> "text/plain"))
  }

  test("images convert through the real codec into a metadata stub (S9 image slice)") {
    import org.apache.spark.sql.functions._
    val b64 = java.util.Base64.getEncoder
    val bmp = {
      val img = new java.awt.image.BufferedImage(4, 3,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 3; x <- 0 until 4) img.setRGB(x, y, 0x112233)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "bmp", bos)
      bos.toByteArray
    }
    val rows = Seq(
      ("i1", "img.png", b64.encodeToString(
        graft.multimodal.Codecs.pngSolid(4, 3, 0x112233))),
      ("i2", "bad.png", b64.encodeToString("not an image".getBytes("UTF-8"))),
      ("i3", "img.bmp", b64.encodeToString(bmp)))
      .toDF("doc_id", "filename", "content_b64")
      .withColumn("content_type", Ingest.detectMime(unbase64($"content_b64")))
      .withColumn("status", lit("pending"))
      .withColumn("error_message", lit(null).cast("string"))
    val out = Ingest.convertDocuments(rows)
      .select($"doc_id", $"text", $"status", $"error_message")
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getString(2), r.getString(3))))
      .toMap
    // real decode: dims and mean channels recovered from the PNG bytes
    assert(out("i1") === (("![img.png](img.png)\n\n4x3 image/png, mean rgb(17,34,51)",
                           "pending", null)))
    // corrupt image fails like any other convertible, not as unsupported
    assert(out("i2") === ((null, "failed", "Conversion failed")))
    // BMP has no sniffed magic → the stub's MIME comes from the extension
    assert(out("i3") === (("![img.bmp](img.bmp)\n\n4x3 image/bmp, mean rgb(17,34,51)",
                           "pending", null)))
  }

  test("conversion normalizes text to Unicode NFC at the boundary") {
    import org.apache.spark.sql.functions._
    // decomposed e + COMBINING ACUTE in the uploaded bytes; the stored
    // text must carry the precomposed form, so downstream shingle/vocab
    // hashes see one canonical encoding of visually-equal text
    val decomposed = "re\u0301sume\u0301 body"
    val rows = Seq(("n1", "note.md",
        java.util.Base64.getEncoder.encodeToString(decomposed.getBytes("UTF-8"))))
      .toDF("doc_id", "filename", "content_b64")
      .withColumn("content_type", lit("text/markdown"))
      .withColumn("status", lit("pending"))
      .withColumn("error_message", lit(null).cast("string"))
    val got = Ingest.convertDocuments(rows)
      .select($"text").as[String].head()
    assert(got == "r\u00e9sum\u00e9 body", s"expected NFC-composed text, got: $got")
  }

  test("txt→md rename only rewrites .txt (docling_service.py:188-191)") {
    val df = Seq("notes.txt", "README.md", "Upper.TXT", "data.csv").toDF("f")
    val got = df.select(Ingest.txtToMd($"f")).as[String].collect().toSeq
    assert(got == Seq("notes.md", "README.md", "Upper.md", "data.csv"))
  }

  test("unsupported format is quarantined with the reference's message (S9 error path)") {
    val docs = Seq(
      ("d1", "notes.md", "pending", null: String),
      ("d2", "binary.exe", "pending", null: String),
      ("d3", "report.pdf", "pending", null: String),
      ("d4", "photo.png", "pending", null: String))
      .toDF("doc_id", "filename", "status", "error_message")
    val byId = Ingest.validateFormat(docs).collect().map(r =>
      r.getAs[String]("doc_id") -> (r.getAs[String]("status"), r.getAs[String]("error_message"))).toMap
    assert(byId("d1") == ("pending", null))
    assert(byId("d2") == ("failed", "File format not allowed"))
    // the full allowed set (reference README format list): convertibles pass
    assert(byId("d3") == ("pending", null))
    assert(byId("d4") == ("pending", null))
  }

  test("JSONL shards: gzip write → schema'd read roundtrips; corrupt lines quarantine") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    val docs = Seq((1L, "alpha text", "en"), (2L, "beta \"quoted\" text", "fr"))
      .toDF("doc_id", "text", "lang")
    graft.io.Tables.writeJsonl(docs.repartition(2), s"$dir/shards")
    // shards are really gzip JSONL files
    val parts = new java.io.File(s"$dir/shards").listFiles()
      .filter(_.getName.startsWith("part-"))
    assert(parts.nonEmpty && parts.forall(_.getName.endsWith(".json.gz")))
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("lang", StringType)))
    val back = graft.io.Tables.readJsonl(spark, s"$dir/shards", schema).cache()
    assert(back.filter($"corrupt_record".isNotNull).count() == 0)
    assert(back.select($"doc_id", $"text", $"lang").as[(Long, String, String)]
      .collect().sortBy(_._1).toSeq ==
      Seq((1L, "alpha text", "en"), (2L, "beta \"quoted\" text", "fr")))
    // a malformed shard line quarantines instead of failing the job
    val badDir = s"$dir/bad"
    new java.io.File(badDir).mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$badDir/shard-0.json"),
      """{"doc_id": 3, "text": "ok", "lang": "en"}
        |not json at all
        |""".stripMargin)
    val mixed = graft.io.Tables.readJsonl(spark, badDir, schema).cache()
    assert(mixed.filter($"corrupt_record".isNull).count() == 1)
    assert(mixed.filter($"corrupt_record".isNotNull).count() == 1)
  }

  test("ingest round-trip: content base64-encoded then decoded intact (S3)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ingest").toFile
    val f = new java.io.File(dir, "doc.txt")
    java.nio.file.Files.writeString(f.toPath, "# Title\nBody text here.")
    val docs = Ingest.toDocuments(Ingest.readBinaryDir(spark, dir.getAbsolutePath),
                                  now = lit(ts("2025-01-01 00:00:00")))
    val row = docs.collect().head
    assert(row.getAs[String]("filename") == "doc.md")
    assert(row.getAs[String]("content_type") == "text/plain")
    assert(row.getAs[String]("status") == "pending")
    val decoded = docs.select(Ingest.decodeContent($"content_b64")).as[String].collect().head
    assert(decoded == "# Title\nBody text here.")
  }

  test("compact: shard count drops to the size target, content identical") {
    import org.apache.spark.sql.functions.{concat_ws, md5, sum, conv, substring}
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val df = (1L to 2000L).map(i => (i, s"row content number $i"))
      .toDF("id", "text")
    def contentHash(d: org.apache.spark.sql.DataFrame): Long =
      d.select(conv(substring(md5(concat_ws("|", $"id", $"text")), 1, 8), 16, 10)
        .cast("long").as("h"))
        .agg(sum($"h")).as[Long].head() // order-independent content fingerprint

    // parquet: 16 small shards → one fat one
    df.repartition(16).write.parquet(s"$dir/t")
    val h0 = contentHash(spark.read.parquet(s"$dir/t"))
    val (before, after) = graft.io.Tables.compact(spark, s"$dir/t",
                                                  targetBytes = 1L << 30)
    assert(before == 16 && after == 1, s"($before, $after)")
    assert(contentHash(spark.read.parquet(s"$dir/t")) == h0)
    assert(!new java.io.File(s"$dir/t.tmp").exists())
    assert(!new java.io.File(s"$dir/t.trash").exists())

    // a tiny target yields multiple shards (ceil(total/target))
    val (_, many) = graft.io.Tables.compact(spark, s"$dir/t", targetBytes = 4096)
    assert(many > 1)
    assert(contentHash(spark.read.parquet(s"$dir/t")) == h0)

    // gzip JSONL shards (the unsplittable-format case compaction exists for)
    graft.io.Tables.writeJsonl(df.repartition(16), s"$dir/j")
    val (jb, ja) = graft.io.Tables.compact(spark, s"$dir/j",
                                           targetBytes = 1L << 30, format = "json")
    assert(jb == 16 && ja == 1)
    assert(contentHash(spark.read.json(s"$dir/j")) == h0)
  }

  test("snapshotDiff classifies added/removed/changed/unchanged (q77)") {
    val oldSnap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val newSnap = Seq((2L, "b"), (3L, "C"), (4L, "d")).toDF("doc_id", "text")
    val got = graft.io.Tables.snapshotDiff(oldSnap, newSnap, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
                      3L -> "changed", 4L -> "added"))
  }
}
