package graft

import java.io.ByteArrayOutputStream

import graft.multimodal.Codecs

/** Real JDK codec operators: lossless roundtrips, lossy-format decode,
  * resize, and the malformed-input tolerance contract (None, never
  * throw — same as PDF).
  */
class CodecsSpec extends SparkSpec {
  import spark.implicits._

  test("png solid roundtrip: exact dims and channel means") {
    val png = Codecs.pngSolid(37, 21, 0xAB40FE)
    assert(Codecs.decodeImage(png) ===
      Some(Codecs.ImageMeta(37, 21, 0xAB, 0x40, 0xFE)))
  }

  test("jpeg decodes (lossy: dims exact, color approximate)") {
    System.setProperty("java.awt.headless", "true")
    val img = new java.awt.image.BufferedImage(40, 30,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 30; x <- 0 until 40) img.setRGB(x, y, 0x808080)
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    val m = Codecs.decodeImage(out.toByteArray)
    assert(m.isDefined)
    assert(m.get.width === 40 && m.get.height === 30)
    assert(math.abs(m.get.r - 0x80) <= 4, s"jpeg gray drifted: ${m.get}")
  }

  test("resize of a solid image keeps the color, hits target dims") {
    val png = Codecs.pngSolid(64, 48, 0x123456)
    assert(Codecs.resizeImage(png, 16, 12) ===
      Some(Codecs.ImageMeta(16, 12, 0x12, 0x34, 0x56)))
  }

  test("wav ramp roundtrip: frames, rate, channels, |sample| sum exact") {
    val n = 250
    val expectedSum = (0 until n).map(i => math.abs((i.toLong * 37) % 20001 - 10000)).sum
    assert(Codecs.decodeWav(Codecs.wavRamp(n)) ===
      Some(Codecs.AudioMeta(n.toLong, 8000L, 1, expectedSum)))
  }

  test("avi container roundtrip: frames and dims recovered by the real parser") {
    assert(Codecs.decodeAvi(Codecs.aviStub(24, 1920, 1080)) ===
      Some(Codecs.VideoMeta(24L, 1920L, 1080L)))
    assert(Codecs.decodeAvi(Codecs.aviStub(1, 64, 64)) ===
      Some(Codecs.VideoMeta(1L, 64L, 64L)))
  }

  test("avi parser walks past unknown chunks before hdrl") {
    import java.nio.{ByteBuffer, ByteOrder}
    // RIFF('AVI ' JUNK(6 bytes, odd→padded) LIST('hdrl' avih))
    val inner = Codecs.aviStub(7, 320, 240).drop(12) // the LIST..avih tail
    val junkData = "abcde".getBytes("US-ASCII") // odd size: exercises padding
    val buf = ByteBuffer
      .allocate(12 + 8 + junkData.length + 1 + inner.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
      .putInt(4 + 8 + junkData.length + 1 + inner.length)
      .put("AVI ".getBytes("US-ASCII"))
    buf.put("JUNK".getBytes("US-ASCII")).putInt(junkData.length).put(junkData)
      .put(0.toByte) // pad to even
    buf.put(inner)
    assert(Codecs.decodeAvi(buf.array()) === Some(Codecs.VideoMeta(7L, 320L, 240L)))
  }

  test("malformed inputs: None, never thrown") {
    val junk: Seq[Array[Byte]] = Seq(
      null, Array.emptyByteArray, "not an image".getBytes("UTF-8"),
      Codecs.pngSolid(8, 8, 0).take(20), Codecs.wavRamp(100).take(10),
      Codecs.aviStub(5, 100, 100).take(30), // truncated mid-header
      "RIFF1234WAVE".getBytes("US-ASCII")) // RIFF but not AVI
    junk.foreach { b =>
      assert(Codecs.decodeImage(b).forall(_.width > 0))
      assert(Codecs.decodeWav(b).forall(_.frames >= 0))
      assert(Codecs.decodeAvi(b) === None)
    }
    assert(Codecs.decodeImage("x".getBytes) === None)
    assert(Codecs.decodeWav("x".getBytes) === None)
  }

  test("dhash: brightness- and resolution-invariant, formula-exact, quarantines off-contract") {
    // the formula dhash8 must land on, computed independently here
    def expected(p: Int): Long = {
      def g(bx: Int, by: Int) = ((p * 7 + bx * 13 + by * 31 + bx * by * 3) % 29) * 8
      (for (by <- 0 until 8; bx <- 0 until 7 if g(bx + 1, by) > g(bx, by))
        yield 1L << (by * 7 + bx)).sum
    }
    for (p <- 0 until 16) {
      val base = Codecs.dhash8(Codecs.pngPattern(16, 16, p, 0))
      assert(base === Some(expected(p)), s"pattern $p diverged from the formula")
      // brightness shift cancels (same pattern, byte-wise different file)
      assert(Codecs.dhash8(Codecs.pngPattern(16, 16, p, 4)) === base)
      // resolution cancels (box means of uniform blocks are exact)
      assert(Codecs.dhash8(Codecs.pngPattern(40, 24, p, 2)) === base)
      // a different pattern must not collide with ITS brightness variants
      assert(Codecs.dhash8(Codecs.pngPattern(16, 16, p, 3)) ===
             Codecs.dhash8(Codecs.pngPattern(32, 32, p, 1)))
    }
    // 56-bit contract: non-negative in every engine
    assert((0 until 16).forall(p => expected(p) >= 0L && expected(p) < (1L << 56)))
    // off-contract dims (not multiples of 8) and malformed bytes quarantine
    assert(Codecs.dhash8(Codecs.pngSolid(15, 16, 0x112233)) === None)
    assert(Codecs.dhash8("not a png".getBytes("UTF-8")) === None)
    assert(Codecs.dhash8(null) === None)
  }

  test("audio fingerprint: gain-invariant, formula-exact, quarantines off-contract") {
    def expected(p: Int): Long = {
      val w = new Array[Long](16)
      for (i <- 0 until 320)
        w(i / 20) += math.abs((i.toLong * (61 + 97 * p)) % 20001 - 10000)
      (for (j <- 0 until 15 if w(j + 1) > w(j)) yield 1L << j).sum
    }
    for (p <- 0 until 12) {
      val base = Codecs.audioFingerprint(Codecs.wavPattern(320, p, 1))
      assert(base === Some(expected(p)), s"pattern $p diverged from the formula")
      // volume change cancels (byte-wise different file, same identity)
      assert(Codecs.audioFingerprint(Codecs.wavPattern(320, p, 2)) === base)
      assert(Codecs.audioFingerprint(Codecs.wavPattern(320, p, 3)) === base)
    }
    assert((0 until 12).map(expected).distinct.size === 12,
           "the 12 patterns must be perceptually distinct")
    // off-contract (frames not divisible by 16) and malformed quarantine
    assert(Codecs.audioFingerprint(Codecs.wavPattern(321, 0, 1)) === None)
    assert(Codecs.audioFingerprint("not a wav".getBytes("UTF-8")) === None)
    assert(Codecs.audioFingerprint(null) === None)
  }

  test("column wrappers: spark roundtrip on a small table") {
    import org.apache.spark.sql.functions._
    val df = (1L to 20L).toDF("id")
      .select(col("id"), Codecs.pngOf(lit(10) + (col("id") % 5).cast("int"),
                                      lit(10), (col("id") % 256).cast("int")).as("png"))
      .select(col("id"), Codecs.imageMetaOf(col("png")).as("m"))
      .select(col("id"), col("m.width").as("w"), col("m.b").as("b"))
      .as[(Long, Int, Long)].collect()
    df.foreach { case (id, w, b) =>
      assert(w === 10 + (id % 5).toInt)
      assert(b === id % 256)
    }
  }
}
