package graft

import org.apache.spark.sql.functions._

import graft.io.Wds

/** WebDataset-style tar shards: format round-trip, POSIX header
  * validity, streaming shard writer determinism and assignment.
  */
class WdsSpec extends SparkSpec {
  import spark.implicits._

  test("tar round-trip: names, sizes, and bytes survive; 512-byte framing holds") {
    val entries = Seq(
      "a.txt" -> "hello world".getBytes("UTF-8"),
      "a.json" -> """{"k":1}""".getBytes("UTF-8"),
      // exactly one block, and an empty member
      "b.bin" -> Array.fill[Byte](512)(7),
      "c.txt" -> Array.empty[Byte])
    val out = new java.io.ByteArrayOutputStream()
    entries.foreach { case (n, b) =>
      out.write(Wds.header(n, b.length.toLong)); out.write(b)
      out.write(new Array[Byte]((512 - b.length % 512) % 512))
    }
    out.write(new Array[Byte](1024))
    val back = Wds.readTar(out.toByteArray)
    assert(back.map(_._1) == entries.map(_._1))
    assert(back.zip(entries).forall { case ((_, g), (_, e)) => g.sameElements(e) })
  }

  test("header: POSIX checksum recomputes; magic/typeflag present; oversized names fail loudly") {
    val h = Wds.header("sample.png", 1234L)
    assert(h.length == 512)
    // recompute the checksum with the field blanked to spaces
    val blanked = h.clone()
    java.util.Arrays.fill(blanked, 148, 156, ' '.toByte)
    val expect = blanked.map(_ & 0xff).sum
    val stored = Integer.parseInt(
      new String(h, 148, 8, "UTF-8").takeWhile(c => c >= '0' && c <= '7'), 8)
    assert(stored == expect, s"checksum $stored vs $expect")
    assert(new String(h, 257, 5, "UTF-8") == "ustar")
    assert(h(156) == '0'.toByte)
    assert(new String(h, 124, 12, "UTF-8").startsWith("00000002322")) // 1234 octal
    intercept[IllegalArgumentException] { Wds.header("x" * 101, 1L) }
  }

  test("writeShards: md5-bucket assignment, in-shard key order, null members skipped, re-export byte-identical") {
    val rows = (1L to 40L).map { i =>
      (i, s"doc$i",
       Array.fill[Byte](i.toInt)(i.toByte),
       if (i % 3 == 0) null else s"text $i")
    }.toDF("id", "key", "payload", "text")
      .withColumn("shard", graft.dedup.Dedup.hashBucket(col("key"), 4))
    val dir = java.nio.file.Files.createTempDirectory("graft_wds").toString
    val stats = Wds.writeShards(spark, rows, "shard", "key",
                                Seq("payload" -> "bin", "text" -> "txt"),
                                dir, nShards = 4)
    assert(stats.map(_._2).sum == 40L, stats.toString)
    // driver twin of the bucket assignment + per-shard key order
    def bucket(k: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md.digest(k.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString,
        16) % 4
    }
    val byShard = (1L to 40L).map(i => s"doc$i").groupBy(bucket)
    byShard.foreach { case (shard, keys) =>
      val tar = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, f"shard-$shard%05d.tar"))
      val names = Wds.readTar(tar).map(_._1)
      val gotKeys = names.filter(_.endsWith(".bin")).map(_.stripSuffix(".bin"))
      assert(gotKeys == keys.sorted, s"shard $shard: $gotKeys vs ${keys.sorted}")
      // a null text column means NO .txt member for that key
      val txtKeys = names.filter(_.endsWith(".txt")).map(_.stripSuffix(".txt")).toSet
      keys.foreach { k =>
        val i = k.stripPrefix("doc").toLong
        assert(txtKeys.contains(k) == (i % 3 != 0), s"$k txt presence")
      }
    }
    // byte-identical determinism
    val dir2 = java.nio.file.Files.createTempDirectory("graft_wds2").toString
    Wds.writeShards(spark, rows, "shard", "key",
                    Seq("payload" -> "bin", "text" -> "txt"), dir2, nShards = 4)
    byShard.keys.foreach { shard =>
      val a = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, f"shard-$shard%05d.tar"))
      val b = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir2, f"shard-$shard%05d.tar"))
      assert(a.sameElements(b), s"shard $shard must re-export byte-identical")
    }
    // commit protocol left no attempt-tmp residue behind the finals
    Seq(dir, dir2).foreach { d =>
      val residue = new java.io.File(d).list().filter(_.contains(".tmp-"))
      assert(residue.isEmpty, s"stale tmp shards in $d: ${residue.mkString(",")}")
    }
  }

  test("writeShards commit protocol: failed attempt leaves nothing final-named; no tmp residue") {
    // The oversized key trips header()'s require MID-SHARD, after a
    // good row has already streamed into the attempt's tmp file — the
    // crash shape a reader must never observe as a final-named shard.
    val rows = Seq(
      (0L, "aaa", "first".getBytes("UTF-8")),
      (0L, "x" * 101, "boom".getBytes("UTF-8"))
    ).toDF("shard", "key", "payload")
    val dir = java.nio.file.Files.createTempDirectory("graft_wds_fail").toString
    intercept[org.apache.spark.SparkException] {
      Wds.writeShards(spark, rows, "shard", "key",
                      Seq("payload" -> "bin"), dir, nShards = 1)
    }
    val left = new java.io.File(dir).list().toSeq
    assert(!left.exists(_.matches("shard-\\d{5}\\.tar")),
      s"failed attempt must not publish a final-named shard: $left")
    assert(!left.exists(_.contains(".tmp-")),
      s"failed attempt must delete its tmp file: $left")
  }

  test("writeShards commit protocol: duplicate attempt over existing finals commits byte-identically; stale twin tmp never trusted") {
    val rows = (1L to 12L).map(i => (i % 2, s"doc$i", s"payload $i"))
      .toDF("shard", "key", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_wds_dup").toString
    Wds.writeShards(spark, rows, "shard", "key", Seq("text" -> "txt"), dir, 2)
    val before = (0L to 1L).map { s =>
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, f"shard-$s%05d.tar"))
    }
    // plant a partial tmp from a "crashed twin attempt" — a reader and
    // a re-export must both ignore it
    val stale = new java.io.File(dir, "shard-00000.tar.tmp-99999")
    java.nio.file.Files.write(stale.toPath, Array[Byte](1, 2, 3))
    // a speculative duplicate is exactly a second attempt renaming its
    // own tmp onto an already-published final — run the export again
    // into the SAME dir and require the finals stay intact
    Wds.writeShards(spark, rows, "shard", "key", Seq("text" -> "txt"), dir, 2)
    (0L to 1L).foreach { s =>
      val after = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, f"shard-$s%05d.tar"))
      assert(after.sameElements(before(s.toInt)),
        s"shard $s corrupted by duplicate-attempt commit")
      // still a well-formed tar with all six samples
      assert(Wds.readTar(after).size == 6)
    }
    // the re-export's start-of-job sweep GARBAGE-COLLECTS the dead twin
    // (a hard-killed JVM's residue would otherwise accumulate forever —
    // in-process failures clean up via the task's finally, but nothing
    // else ever deletes a foreign attempt id); it was never adopted:
    // the finals above are byte-identical to the pre-plant export
    assert(!stale.exists(),
      "stale twin tmp swept at the next export's start, never adopted")
  }
}
