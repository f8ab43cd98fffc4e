package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** REAL image/audio/video-container codecs for the multimodal
  * operators — JDK-only (javax.imageio: PNG/JPEG/BMP/GIF;
  * javax.sound.sampled: WAV PCM; ByteBuffer RIFF/AVI header walking
  * for video container metadata), so they run in this container with
  * zero external libraries. The JDK ships no video frame CODEC — only
  * the container metadata tier is implemented ([[decodeAvi]]).
  *
  * Decode tolerance mirrors the PDF contract: malformed bytes → None,
  * never a thrown exception — a 100 TB ingest quarantines bad files.
  *
  * Fixture generation (solid-color PNG, ramp-PCM WAV) is deterministic
  * from scalar parameters, so a generate→decode roundtrip is
  * oracle-checkable: the oracle recomputes the parameters in SQL and
  * the REAL codec must recover them exactly (PNG and PCM are
  * lossless).
  */
object Codecs {

  locally { System.setProperty("java.awt.headless", "true") }

  /** Decoded image facts: exact dimensions + mean channel values
    * (means of a solid-color image are the color itself).
    */
  case class ImageMeta(width: Int, height: Int, r: Long, g: Long, b: Long)

  /** Decoded WAV facts: exact frame count, rate, channels, and the sum
    * of absolute sample amplitudes (PCM 16-bit is lossless, so this is
    * bit-exact against the generator's arithmetic).
    */
  case class AudioMeta(frames: Long, sample_rate: Long, channels: Int, sum_abs: Long)

  // ------------------------------------------------------------- generate

  /** Solid-color PNG, `rgb` as 0xRRGGBB. */
  def pngSolid(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Mono 16-bit little-endian PCM WAV; sample i = ((i·37) mod 20001) − 10000
    * — a deterministic ramp whose |·|-sum the oracle can recompute.
    */
  def wavRamp(nFrames: Int, sampleRate: Int = 8000): Array[Byte] = {
    val pcm = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      val s = ((i.toLong * 37) % 20001 - 10000).toShort
      pcm(i * 2) = (s & 0xff).toByte
      pcm(i * 2 + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** 8×8 block-pattern gray PNG for the perceptual-hash gate: the
    * image is a grid of 8×8 uniform blocks (block size w/8 × h/8; w and
    * h must be multiples of 8), block (bx, by) filled with gray level
    *
    *   g(bx, by) = ((p·7 + bx·13 + by·31 + bx·by·3) mod 29) · 8 + offset
    *
    * so the pixel content is a pure function of (p, offset) the oracle
    * can recompute in SQL, while the bytes still go through a REAL PNG
    * encode→decode cycle. `p` selects the pattern (the perceptual
    * identity); `offset` is a uniform brightness shift and `w`/`h` a
    * resolution choice — BOTH of which [[dhash8]] must cancel, which is
    * exactly the near-duplicate property a perceptual hash exists for.
    */
  def pngPattern(w: Int, h: Int, p: Int, offset: Int): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0, s"dims must be multiples of 8: ${w}x$h")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val bw = w / 8; val bh = h / 8
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = ((p * 7 + (x / bw) * 13 + (y / bh) * 31 + (x / bw) * (y / bh) * 3) % 29) * 8 + offset
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Difference hash (dHash) over a real image decode: box-average the
    * pixels to an 8×8 gray grid (exact integer mean per cell — w and h
    * must be multiples of 8, the generate-side contract; anything else
    * → None, the quarantine path), then one bit per horizontal
    * neighbour comparison, bit (by·7 + bx) = [g(bx+1,by) > g(bx,by)].
    * 8 rows × 7 comparisons = 56 bits — deliberately under 63 so the
    * hash is a non-negative BIGINT in both engines (no two's-complement
    * or HUGEINT edge).
    *
    * The comparisons cancel uniform brightness shifts, and the box
    * means cancel resolution: two images with the same underlying
    * pattern at different sizes/exposures hash IDENTICALLY — byte-wise
    * distinct files, one perceptual identity. Dedup is then a plain
    * groupBy on a 56-bit key: one shuffle, no pairwise compare.
    */
  def dhash8(bytes: Array[Byte]): Option[Long] =
    try {
      if (bytes == null) return None
      Option(ImageIO.read(new ByteArrayInputStream(bytes))).flatMap { img =>
        val w = img.getWidth; val h = img.getHeight
        if (w % 8 != 0 || h % 8 != 0) return None
        val bw = w / 8; val bh = h / 8
        val cell = Array.ofDim[Long](8, 8)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val px = img.getRGB(x, y)
            cell(y / bh)(x / bw) +=
              ((px >> 16) & 0xff) + ((px >> 8) & 0xff) + (px & 0xff)
            x += 1
          }
          y += 1
        }
        val n = 3L * bw * bh
        var hash = 0L
        var by = 0
        while (by < 8) {
          var bx = 0
          while (bx < 7) {
            if (cell(by)(bx + 1) / n > cell(by)(bx) / n)
              hash |= 1L << (by * 7 + bx)
            bx += 1
          }
          by += 1
        }
        Some(hash)
      }
    } catch { case _: Throwable => None }

  /** Patterned mono 16-bit PCM WAV for the audio-fingerprint gate:
    * sample i = ((i·(61+97p)) mod 20001 − 10000) · gain — the same ramp
    * family as [[wavRamp]] but with a per-pattern step (the perceptual
    * identity; 61+97p wraps the ramp many times within a few hundred
    * frames, so window energies vary non-degenerately) and a uniform
    * volume `gain` (1..3 keeps |s| ≤ 30000, inside 16-bit) that
    * [[audioFingerprint]] must cancel. Pure function of (p, gain), so
    * the oracle recomputes it in SQL while the bytes go through a REAL
    * WAV encode→decode cycle.
    */
  def wavPattern(nFrames: Int, p: Int, gain: Int): Array[Byte] = {
    val pcm = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      val s = (((i.toLong * (61 + 97 * p)) % 20001 - 10000) * gain).toShort
      pcm(i * 2) = (s & 0xff).toByte
      pcm(i * 2 + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Audio perceptual fingerprint over a real WAV decode: split the
    * PCM into 16 equal windows (frame count must divide by 16 — the
    * generate-side contract; else None, the quarantine path), sum
    * |sample| per window, one bit per adjacent-window comparison —
    * bit j = [w(j+1) > w(j)], 15 bits. A uniform volume change scales
    * every window sum by the same factor, so the comparisons — and the
    * fingerprint — are GAIN-INVARIANT: re-encoded/re-normalized copies
    * of one recording collapse to one identity, and dedup is a plain
    * groupBy on the fingerprint (one shuffle, no pairwise compare) —
    * the same shape as [[dhash8]]'s image dedup.
    */
  def audioFingerprint(bytes: Array[Byte]): Option[Long] =
    try {
      if (bytes == null) return None
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      if (fmt.getChannels != 1 || fmt.getSampleSizeInBits != 16) return None
      val data = ais.readAllBytes()
      val n = data.length / 2
      if (n == 0 || n % 16 != 0) return None
      val win = new Array[Long](16)
      val per = n / 16
      var i = 0
      val le = !fmt.isBigEndian
      while (i < n) {
        val lo = data(if (le) i * 2 else i * 2 + 1) & 0xff
        val hi = data(if (le) i * 2 + 1 else i * 2)
        win(i / per) += math.abs(((hi << 8) | lo).toShort.toLong)
        i += 1
      }
      var fp = 0L
      var j = 0
      while (j < 15) {
        if (win(j + 1) > win(j)) fp |= 1L << j
        j += 1
      }
      Some(fp)
    } catch { case _: Throwable => None }

  /** Decoded video-container facts (RIFF/AVI main header). */
  case class VideoMeta(n_frames: Long, width: Long, height: Long)

  /** Minimal RIFF/AVI container: `RIFF('AVI ' LIST('hdrl' avih(56)))`
    * with a REAL 56-byte MainAVIHeader (dwTotalFrames at data offset
    * 16, dwWidth/dwHeight at 32/36 — the layout every AVI muxer
    * writes). No frame payloads: this is the metadata tier, the same
    * generate→decode contract as [[wavRamp]]/[[pngSolid]] (the JDK
    * ships no video CODEC, but the CONTAINER header is plain bytes).
    */
  def aviStub(nFrames: Int, w: Int, h: Int, microSecPerFrame: Int = 33367): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    val buf = ByteBuffer.allocate(12 + 12 + 8 + 56).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(4 + 12 + 8 + 56)
      .put("AVI ".getBytes("US-ASCII"))
    buf.put("LIST".getBytes("US-ASCII")).putInt(4 + 8 + 56)
      .put("hdrl".getBytes("US-ASCII"))
    buf.put("avih".getBytes("US-ASCII")).putInt(56)
    buf.putInt(microSecPerFrame) // dwMicroSecPerFrame
      .putInt(0)                 // dwMaxBytesPerSec
      .putInt(0)                 // dwPaddingGranularity
      .putInt(0x10)              // dwFlags (AVIF_HASINDEX)
      .putInt(nFrames)           // dwTotalFrames
      .putInt(0)                 // dwInitialFrames
      .putInt(1)                 // dwStreams
      .putInt(0)                 // dwSuggestedBufferSize
      .putInt(w)                 // dwWidth
      .putInt(h)                 // dwHeight
    // 16 reserved bytes stay zero (allocate() zero-fills)
    buf.array()
  }

  /** Real RIFF/AVI metadata parse: walk the chunk tree (fourcc + LE
    * size, chunks padded to even offsets) to `LIST hdrl` → `avih`, read
    * dwTotalFrames/dwWidth/dwHeight. Malformed bytes → None, same
    * quarantine contract as every other decoder here. Works on any
    * muxer's AVI, not just [[aviStub]]'s (the walker skips unknown
    * chunks rather than assuming fixed offsets).
    */
  def decodeAvi(bytes: Array[Byte]): Option[VideoMeta] =
    try {
      if (bytes == null || bytes.length < 12) return None
      import java.nio.{ByteBuffer, ByteOrder}
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      def fourcc(): String = {
        val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
      }
      if (fourcc() != "RIFF") return None
      buf.getInt() // riff size (trust the walker's bounds, not this)
      if (fourcc() != "AVI ") return None
      // find `avih` inside any `LIST hdrl` at this level
      def walk(end: Int): Option[VideoMeta] = {
        while (buf.position() + 8 <= end) {
          val id = fourcc()
          val size = buf.getInt()
          if (size < 0 || buf.position() + size > end) return None
          val next = buf.position() + size + (size & 1) // even padding
          if (id == "LIST") {
            val listType = fourcc()
            if (listType == "hdrl") {
              val found = walk(buf.position() + size - 4)
              if (found.isDefined) return found
            }
          } else if (id == "avih" && size >= 40) {
            val base = buf.position()
            return Some(VideoMeta(
              n_frames = buf.getInt(base + 16).toLong & 0xffffffffL,
              width = buf.getInt(base + 32).toLong & 0xffffffffL,
              height = buf.getInt(base + 36).toLong & 0xffffffffL))
          }
          buf.position(next)
        }
        None
      }
      walk(bytes.length)
    } catch { case _: Throwable => None }

  // --------------------------------------------------------------- decode

  /** Real image decode; mean channels computed over every pixel. */
  def decodeImage(bytes: Array[Byte]): Option[ImageMeta] =
    try {
      if (bytes == null) return None
      Option(ImageIO.read(new ByteArrayInputStream(bytes))).map { img =>
        imageMeta(img)
      }
    } catch { case _: Throwable => None }

  private def imageMeta(img: BufferedImage): ImageMeta = {
    val w = img.getWidth
    val h = img.getHeight
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    ImageMeta(w, h, sr / n, sg / n, sb / n)
  }

  /** Real resize (Graphics2D resample to exactly (targetW, targetH)),
    * then re-decode facts from the resized pixels.
    */
  def resizeImage(bytes: Array[Byte], targetW: Int, targetH: Int): Option[ImageMeta] =
    try {
      if (bytes == null) return None
      Option(ImageIO.read(new ByteArrayInputStream(bytes))).map { img =>
        val dst = new BufferedImage(targetW, targetH, BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        try g.drawImage(img, 0, 0, targetW, targetH, null)
        finally g.dispose()
        imageMeta(dst)
      }
    } catch { case _: Throwable => None }

  /** Real WAV decode (16-bit signed PCM assumed, as produced above). */
  def decodeWav(bytes: Array[Byte]): Option[AudioMeta] =
    try {
      if (bytes == null) return None
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      val frames = ais.getFrameLength
      val data = ais.readAllBytes()
      var sum = 0L
      var i = 0
      val le = !fmt.isBigEndian
      while (i + 1 < data.length) {
        val lo = data(if (le) i else i + 1) & 0xff
        val hi = data(if (le) i + 1 else i)
        val s = ((hi << 8) | lo).toShort
        sum += math.abs(s.toLong)
        i += 2
      }
      Some(AudioMeta(frames, fmt.getSampleRate.toLong, fmt.getChannels, sum))
    } catch { case _: Throwable => None }

  // -------------------------------------------------------------- columns

  /** (w, h, rgb) → PNG bytes. */
  def pngUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((w: Int, h: Int, rgb: Int) => pngSolid(w, h, rgb))

  /** PNG/JPEG/BMP/GIF bytes → ImageMeta struct (null on malformed). */
  def decodeImageUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((b: Array[Byte]) => decodeImage(b).orNull)

  /** bytes × (w, h) → resized ImageMeta struct (null on malformed). */
  def resizeImageUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((b: Array[Byte], w: Int, h: Int) => resizeImage(b, w, h).orNull)

  /** nFrames → WAV bytes. */
  def wavUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((n: Int) => wavRamp(n))

  /** WAV bytes → AudioMeta struct (null on malformed). */
  def decodeWavUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((b: Array[Byte]) => decodeWav(b).orNull)

  /** (w, h, pattern, offset) → block-pattern PNG bytes. */
  def pngPatternUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((w: Int, h: Int, p: Int, off: Int) => pngPattern(w, h, p, off))

  /** image bytes → 56-bit dHash (null on malformed/off-contract). */
  def dhashUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((b: Array[Byte]) => dhash8(b).map(Long.box).orNull)

  /** (nFrames, pattern, gain) → patterned WAV bytes. */
  def wavPatternUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((n: Int, p: Int, g: Int) => wavPattern(n, p, g))

  /** WAV bytes → 15-bit gain-invariant fingerprint (null on malformed). */
  def audioFingerprintUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((b: Array[Byte]) => audioFingerprint(b).map(Long.box).orNull)

  /** (nFrames, w, h) → AVI container bytes. */
  def aviUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((n: Int, w: Int, h: Int) => aviStub(n, w, h))

  /** AVI bytes → VideoMeta struct (null on malformed). */
  def decodeAviUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((b: Array[Byte]) => decodeAvi(b).orNull)

  def pngOf(w: Column, h: Column, rgb: Column): Column = pngUdf(w, h, rgb)
  def pngPatternOf(w: Column, h: Column, p: Column, off: Column): Column =
    pngPatternUdf(w, h, p, off)
  def dhashOf(bytes: Column): Column = dhashUdf(bytes)
  def wavPatternOf(n: Column, p: Column, g: Column): Column =
    wavPatternUdf(n, p, g)
  def audioFingerprintOf(bytes: Column): Column = audioFingerprintUdf(bytes)
  def imageMetaOf(bytes: Column): Column = decodeImageUdf(bytes)
  def resizedMetaOf(bytes: Column, w: Column, h: Column): Column =
    resizeImageUdf(bytes, w, h)
  def wavOf(nFrames: Column): Column = wavUdf(nFrames)
  def audioMetaOf(bytes: Column): Column = decodeWavUdf(bytes)
  def aviOf(nFrames: Column, w: Column, h: Column): Column = aviUdf(nFrames, w, h)
  def videoMetaOf(bytes: Column): Column = decodeAviUdf(bytes)
}
