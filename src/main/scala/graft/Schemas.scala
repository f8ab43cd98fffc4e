package graft

import java.sql.Timestamp

/** Entity model — the Spark analogue of the reference's Pydantic models
  * (solaius/data_pipeline2 `models/document.py:14-56`, `models/job.py:20-44`).
  *
  * The reference stores chunk/embedding metadata as `dict[str, Any]`; here
  * the known keys are typed columns (Spark-idiomatic — a typed schema lets
  * Parquet prune/push down, while a map<string,string> column would not),
  * and anything truly dynamic stays in `metadata_json`.
  */
object Schemas {

  /** `models/document.py:7-12` DocumentStatus (enum-as-string). */
  object DocumentStatus {
    val Pending    = "pending"
    val Processing = "processing"
    val Completed  = "completed"
    val Failed     = "failed"
    val Cancelled  = "cancelled"
    // engine extensions beyond models/document.py:7-12: near-dup
    // keep-one demotion, and the `Main delete` takedown tombstone
    val Duplicate  = "duplicate"
    val Removed    = "removed"
    val all: Set[String] = Set(Pending, Processing, Completed, Failed, Cancelled,
                               Duplicate, Removed)
    /** Statuses whose docs must have NO serving-tier presence (no
      * chunks/embeddings/signatures/postings/index rows) — the filter
      * every export/search/audit path shares.
      */
    val Dead: Seq[String] = Seq(Failed, Duplicate, Removed)
  }

  /** `models/job.py:6-12` JobStatus. */
  object JobStatus {
    val Queued    = "queued"
    val Pending   = "pending"
    val Running   = "running"
    val Completed = "completed"
    val Failed    = "failed"
    val Cancelled = "cancelled"
    val all: Set[String] = Set(Queued, Pending, Running, Completed, Failed, Cancelled)
    /** Legal transitions of the reference's processor state machine
      * (`services/document_processor.py:96-132`): queued/pending → running →
      * completed|failed|cancelled; terminal states absorb.
      */
    val transitions: Map[String, Set[String]] = Map(
      Queued    -> Set(Pending, Running, Cancelled),
      Pending   -> Set(Running, Cancelled),
      Running   -> Set(Completed, Failed, Cancelled),
      Completed -> Set.empty,
      Failed    -> Set.empty,
      Cancelled -> Set.empty
    )
  }

  /** `models/job.py:14-18` JobType. */
  object JobType {
    val DocumentProcessing  = "document_processing"
    val EmbeddingGeneration = "embedding_generation"
    val IndexUpdate         = "index_update"
    val BatchProcessing     = "batch_processing"
  }

  /** Document row (`models/document.py:23-47`); content base64-encoded on
    * ingest exactly like `services/document_processor.py:50-51`.
    */
  case class Document(
      doc_id: String,
      filename: String,
      content_type: String,
      content_b64: String,
      status: String,
      metadata_json: String,
      created_at: Timestamp,
      updated_at: Timestamp,
      error_message: Option[String])

  /** One chunk row — the flattened form of the reference's nested
    * `Document.chunks` (`models/document.py:14-21`), metadata keys from
    * `services/docling_service.py:229-235,246-253,264-270,284-291` lifted
    * to typed columns.
    */
  case class ChunkRow(
      doc_id: String,
      chunk_id: String,
      content: String,
      page_number: Int,
      chunk_number: Int,
      total_chunks: Int,
      headings: Seq[String],
      chunk_type: String,
      strategy: String,
      is_fallback: Boolean)

  /** Embedding row (`models/document.py:49-56`); composite identity
    * (chunk_id, embedding_provider) mirrors the ES `_id` `{chunk_id}_{provider}`
    * (`services/vector_storage.py:65`).
    */
  case class EmbeddingRow(
      chunk_id: String,
      embedding_provider: String,
      embedding: Array[Float],
      model: String,
      created_at: Timestamp)

  /** Job ledger row (`models/job.py:20-35`). */
  case class JobRow(
      job_id: String,
      job_type: String,
      status: String,
      priority: Int,
      created_at: Timestamp,
      updated_at: Timestamp,
      started_at: Option[Timestamp],
      completed_at: Option[Timestamp],
      error_message: Option[String],
      progress: Double,
      total_items: Long,
      processed_items: Long)
}
