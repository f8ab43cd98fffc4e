package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.chunk.Chunkers
import graft.embed.Embedding
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
  * `foreachBatch` reuses the exact BATCH operators (ingest → chunk →
  * embed) — one pipeline definition, two execution modes, which is the
  * Spark-first answer to the reference running the same service code on
  * queue items.
  */
object Inbox {

  /** ST1 — streaming scan of an inbox directory of text/markdown files. */
  def readInbox(spark: SparkSession, dir: String,
                maxFilesPerTrigger: Int = 50): DataFrame =
    spark.readStream
      .format("text")
      .option("wholetext", "true")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(dir)
      .withColumn("path", input_file_name())

  /** ST1+ST3 — full streaming pipeline: for each micro-batch, run the
    * batch ingest → chunk → embed operators and append results as
    * parquet tables under `outDir` (documents/, chunks/, embeddings/).
    * Checkpointed so restarts resume exactly-once per input file.
    */
  def start(spark: SparkSession, inboxDir: String, outDir: String,
            config: Chunkers.ChunkerConfig = Chunkers.ChunkerConfig(),
            providerName: String = "nomic",
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    readInbox(spark, inboxDir).writeStream
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val docs = batch.select(
            sha2(concat(col("value"), col("path")), 256).as("doc_id"),
            regexp_extract(col("path"), "[^/]+$", 0).as("filename"),
            col("value").as("text"))
          val chunks = Chunkers.chunkDocuments(docs, "doc_id", "text", config)
            .withColumn("chunk_id", concat(col("doc_id"), lit("_"), col("chunk_id")))
          val emb = Embedding.embedChunks(chunks, providerName).toDF()
          docs.drop("text").withColumn("status", lit("completed"))
            .write.mode("append").parquet(s"$outDir/documents")
          chunks.write.mode("append").parquet(s"$outDir/chunks")
          emb.write.mode("append").parquet(s"$outDir/embeddings")
        }
        ()
      }
      .start()
}
