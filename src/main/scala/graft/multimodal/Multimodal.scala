package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata.
  *
  * The real pipeline shape a 100 TB multimodal corpus needs: binary
  * payloads never leave the executors, metadata is typed columns
  * (prunable, pushdown-able), and decode/resize/frame-sample run
  * per-partition over the binary column. REAL image (PNG/JPEG/BMP/GIF
  * via JDK ImageIO) and audio (WAV PCM via javax.sound) codecs live in
  * [[Codecs]] and are oracle-gated by q52/q53 roundtrips; video has no
  * JDK CODEC (frame decode stays out of scope, README), but its
  * CONTAINER metadata is really parsed — [[decodeStub]] routes the
  * frame count through a RIFF/AVI generate→parse roundtrip
  * ([[Codecs.decodeAvi]]), and everything Spark-level — schema, batch
  * shape, partitioning, explode semantics — is real and oracle-checked.
  */
object Multimodal {

  /** Wrap a text/binary source into the multimodal layout:
    * (id, payload: binary, mime, byte_len). The payload column is what
    * a real pipeline would carry for images/audio/video.
    */
  def toBinaryTable(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      encode(col(textCol), "UTF-8").as("payload"),
      graft.ingest.Ingest.detectMime(encode(col(textCol), "UTF-8")).as("mime"),
      octet_length(col(textCol)).cast("long").as("byte_len"))

  /** Video metadata through a REAL container parse — the q53 WAV
    * treatment applied to video: each row's deterministic synthetic
    * parameters (width = 64 + byte_len mod 1856 ≤ 1920, height = 64 +
    * 7·byte_len mod 1016 ≤ 1080, n_frames = 1 + byte_len mod 30) are
    * written into a RIFF/AVI container ([[Codecs.aviStub]]) and read
    * BACK by the real chunk-walking parser ([[Codecs.decodeAvi]]) —
    * the columns are container data (`avih.dwTotalFrames` etc.), not
    * arithmetic. The JDK ships no video CODEC (decode stays out of
    * scope, README), but the container header is plain bytes.
    */
  def decodeStub(df: DataFrame): DataFrame = {
    val avi = Codecs.aviOf(
      (lit(1) + col("byte_len") % 30).cast("int"),
      (lit(64) + col("byte_len") % 1856).cast("int"),
      (lit(64) + (col("byte_len") * 7) % 1016).cast("int"))
    df.withColumn("__v", Codecs.videoMetaOf(avi))
      .withColumn("width", col("__v.width"))
      .withColumn("height", col("__v.height"))
      .withColumn("n_frames", col("__v.n_frames"))
      .drop("__v")
  }

  /** STUB resize — aspect-preserving fit into (maxW, maxH).
    * floor(a·b/c) on these magnitudes is exact in IEEE double (the true
    * quotient is ≥ 1/c away from any integer it isn't equal to), and
    * both engines evaluate it identically.
    */
  def resizePlan(df: DataFrame, maxW: Int, maxH: Int): DataFrame =
    df.withColumn("fit_w",
        least(col("width"),
              floor(col("width") * maxH / greatest(col("height"), lit(1))),
              lit(maxW.toLong)).cast("long"))
      .withColumn("fit_h",
        least(col("height"),
              floor(col("height") * maxW / greatest(col("width"), lit(1))),
              lit(maxH.toLong)).cast("long"))

  /** Frame sampling: one row per sampled frame index (1, 1+step, …) —
    * the video-to-training-examples explode. At scale this is the row
    * multiplier stage; it stays narrow (no shuffle).
    */
  def sampleFrames(df: DataFrame, step: Int = 5): DataFrame =
    df.withColumn("frame_no",
        explode(sequence(lit(1L), col("n_frames"), lit(step.toLong))))

  /** STUB feature extraction — a deterministic low-dim feature vector
    * from metadata (stand-in for a vision encoder; the downstream
    * embedding-table contract is what matters).
    */
  def featureStub(df: DataFrame): DataFrame =
    df.withColumn("features",
      array(col("byte_len"), col("width"), col("height"), col("n_frames"),
            col("byte_len") % 256, (col("width") * col("height")) % 9973)
        .cast("array<long>"))

  /** Decoded-image batch row. `real` marks whether the dimensions came
    * from the REAL codec ([[Codecs.decodeImage]]) or the deterministic
    * fallback arithmetic (non-image payloads, e.g. text/video bytes).
    */
  case class DecodedImage(id: Long, width: Int, height: Int, n_pixels: Long,
                          real: Boolean)

  /** Batched decode over the binary column — the `mapPartitions` shape
    * a production codec needs (amortized per-batch init, bounded batch
    * memory), mirroring how a Python pipeline would use `mapInPandas`.
    * Image payloads (PNG/JPEG/BMP/GIF magic) go through the REAL JDK
    * codec; everything else falls back to the labeled deterministic
    * arithmetic so the batch shape stays total.
    */
  def decodeBatches(df: DataFrame, idCol: String, batchSize: Int = 32)
      : org.apache.spark.sql.Dataset[DecodedImage] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, bytes) =>
            Codecs.decodeImage(bytes) match {
              case Some(m) =>
                DecodedImage(id, m.width, m.height, m.width.toLong * m.height,
                             real = true)
              case None => // non-image payload: deterministic fallback
                val n = bytes.length.toLong
                val w = (64 + n % 1856).toInt
                val h = (64 + (n * 7) % 1016).toInt
                DecodedImage(id, w, h, w.toLong * h, real = false)
            }
          }
        }
      }
  }
}
