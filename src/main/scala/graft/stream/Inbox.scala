package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.Main
import graft.ingest.Ingest

/** Streaming ingestion (reference ST1–ST2, SURVEY.md §2.12).
  *
  * The reference's "queue" is an in-process asyncio FIFO with one
  * consumer task (solaius/data_pipeline2
  * `services/document_processor.py:14,72,76-94`); Structured Streaming's
  * file source is the distributed equivalent: drop files into an inbox
  * directory, each micro-batch drains the queue. The poison-pill
  * shutdown (:35,:82-84) maps to `query.stop()`; graceful drain is
  * Spark's own micro-batch completion guarantee.
  *
  * `foreachBatch` routes every micro-batch through the EXACT batch
  * stages ([[graft.Main.ingestBatch]]): format conversion for all
  * supported formats, the incremental signature probe + keep-one
  * demotion, cache-aside embedding, and the bucketed-store swap commit
  * — one pipeline definition, two execution modes, which is the
  * Spark-first answer to the reference running the same service code on
  * queue items (`services/document_processor.py:96-132`). A duplicate
  * arriving in a LATER micro-batch is demoted/skipped exactly as in
  * the batch path.
  */
object Inbox {

  /** The binaryFile source's fixed schema — streaming file sources
    * require it declared up front (only `text` infers).
    */
  private val BinarySchema = StructType(Seq(
    StructField("path", StringType),
    StructField("modificationTime", TimestampType),
    StructField("length", LongType),
    StructField("content", BinaryType)))

  /** ST1 — streaming scan of an inbox directory of raw files (any
    * supported format — the streaming analogue of
    * [[Ingest.readBinaryDir]]).
    */
  def readInbox(spark: SparkSession, dir: String,
                maxFilesPerTrigger: Int = 50): DataFrame =
    spark.readStream
      .format("binaryFile")
      .schema(BinarySchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(dir)

  /** LIVE INBOX MONITORS riding the drain — the product surface of the
    * distinct-count and heavy-hitter sketches ([[InboxMonitor]], which
    * folds BOTH through the standalone monitors' own kernels in one
    * stateful stream): per micro-batch, per scope (the sniffed content
    * type), one distinct-count line and one line per heavy hitter,
    * keyed by the CONTENT digest — the live "is this inbox feeding me
    * duplicates/spam right now" answer (a repeated payload is a heavy
    * hitter whatever it is named; n_seen − est_distinct ≈ duplicate
    * mass). Estimates are bit-identical to the batch sketches over
    * everything the stream has seen (the monitors' mergeability
    * contract), and state is bounded: 256 registers + d·w counters + a
    * capped candidate list per scope, checkpointed — a `--follow`
    * consumer runs forever without growth.
    *
    * ONE monitor stream beside the ingest stream (two source reads of
    * each file total, not three): both sketches share the single
    * (scope, digest) projection, while staying a separate query from
    * the ingest so a monitor emission can never stall the drain.
    * Emission goes through `emit` (stdout in the CLI; a collector in
    * specs), driver-side from `foreachBatch` — scope-count-sized per
    * batch, never file-sized.
    */
  def startMonitors(spark: SparkSession, inboxDir: String, storeDir: String,
                    emit: String => Unit,
                    trigger: Trigger = Trigger.AvailableNow(),
                    maxFilesPerTrigger: Int = 50): Seq[StreamingQuery] = {
    import org.apache.spark.sql.Dataset
    import spark.implicits._
    val arrivals = readInbox(spark, inboxDir, maxFilesPerTrigger).select(
        Ingest.detectMime(col("content")).as("scope"),
        sha2(col("content"), 256).as("key"))
      .as[InboxMonitor.Arrival]
    val q = InboxMonitor.run(arrivals).writeStream
      .option("checkpointLocation", s"$storeDir/_monitor_checkpoint")
      .outputMode("update").trigger(trigger)
      .foreachBatch { (ds: Dataset[InboxMonitor.MonitorLine], batchId: Long) =>
        val rows = ds.collect().sortBy(_.sortKey)
        rows.foreach(r => emit(r.line))
        // persist each micro-batch's monitor lines to the store runlog
        // (the appendRunlog discipline, monitor-scoped metric keys) —
        // "was the inbox spamming us last Tuesday" must survive the
        // console. Bounded rows per batch: scopes × (1 + candidate cap).
        // IDEMPOTENT on replay (batchId-markered — a restart that
        // re-executes a committed batch must not double-count it), and
        // BEST-EFFORT: a failed append (runlog lease held past timeout
        // by a concurrent compact, transient I/O) is emitted as a line,
        // never allowed to kill the monitor stream — the live emission
        // is the primary surface, the runlog a durable convenience.
        if (rows.nonEmpty)
          try {
            val sess = ds.sparkSession
            import sess.implicits._
            Main.appendRunlogFrameOnce(storeDir,
              rows.toSeq.map(r => ("watch_monitor", r.metric, r.value))
                .toDF("stage", "metric", "value")
                .withColumn("run_at", current_timestamp()),
              s"$storeDir/_monitor_checkpoint/_runlog_committed", batchId)
          } catch {
            case scala.util.control.NonFatal(e) =>
              emit(s"""{"monitor":"runlog_append_failed","batch":$batchId,""" +
                s""""detail":"${Main.jsonEscape(
                  Option(e.getMessage).getOrElse(e.getClass.getSimpleName))}"}""")
          }
        ()
      }.start()
    Seq(q)
  }

  /** ST1+ST3 — full streaming pipeline: for each micro-batch, run the
    * batch convert → ledger → dedup/demote → chunk → embed → store
    * stages against the SAME store layout as `Main ingest` (bucketed
    * chunks/embeddings, signature table, jobs ledger, run log).
    * Checkpointed so restarts resume exactly-once per input file;
    * `nowFn` is injectable so tests get deterministic ledger stamps.
    */
  def start(spark: SparkSession, inboxDir: String, storeDir: String,
            providerName: String = "nomic",
            trigger: Trigger = Trigger.AvailableNow(),
            maxFilesPerTrigger: Int = 50,
            nowFn: () => Timestamp = () => new Timestamp(System.currentTimeMillis()))
      : StreamingQuery =
    readInbox(spark, inboxDir, maxFilesPerTrigger).writeStream
      .option("checkpointLocation", s"$storeDir/_checkpoint")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val now = nowFn()
          Main.ingestBatch(spark,
            Ingest.convertDocuments(Ingest.toDocuments(batch, lit(now))),
            storeDir, providerName, now, streaming = true)
        }
        ()
      }
      .start()
}
