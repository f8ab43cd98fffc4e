package graft.jobs

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Schemas.{JobRow, JobStatus, JobType}
import graft.io.Tables

/** Job ledger + status state machine (reference ST3–ST5, S6,
  * SURVEY.md §2.12).
  *
  * The reference keeps one job row per submission in an ES `jobs` index
  * upserted by `_id` (solaius/data_pipeline2 `services/job_storage.py:55-75`)
  * and drives it through the processor state machine
  * (`services/document_processor.py:96-132`). Here the ledger is a
  * DataFrame; transitions are appended as new versions and the current
  * state is the latest row per job_id (`Tables.latestByKey`) — the ES
  * upsert idiom. Invalid transitions are rejected eagerly.
  */
object JobLedger {

  def newJob(jobId: String, jobType: String, now: Timestamp,
             priority: Int = 0, totalItems: Long = 0): JobRow =
    JobRow(jobId, jobType, JobStatus.Queued, priority, now, now,
           None, None, None, 0.0, totalItems, 0L)

  /** ST3 — validated single-row transition. */
  def transition(job: JobRow, to: String, now: Timestamp,
                 error: Option[String] = None): JobRow = {
    val allowed = JobStatus.transitions.getOrElse(job.status, Set.empty)
    require(allowed.contains(to),
            s"illegal job transition ${job.status} -> $to for ${job.job_id}")
    job.copy(
      status = to,
      updated_at = now,
      started_at = if (to == JobStatus.Running) Some(now) else job.started_at,
      completed_at =
        if (to == JobStatus.Completed || to == JobStatus.Failed) Some(now)
        else job.completed_at,
      error_message = error.orElse(job.error_message),
      progress = if (to == JobStatus.Completed) 1.0 else job.progress)
  }

  /** ST4 — apply a batch of transitions to the ledger: append new
    * versions, current state = latest per job_id. One shuffle on
    * job_id; bucket the ledger by job_id at scale to remove it.
    */
  def applyTransitions(ledger: DataFrame, updates: DataFrame): DataFrame =
    Tables.upsert(ledger, updates, Seq("job_id"), Seq(col("updated_at")))

  /** ST5 — status polling: latest status row for one job
    * (`api/routes/documents.py:59-71` shape).
    */
  def status(ledger: DataFrame, jobId: String): DataFrame =
    Tables.latestByKey(ledger.filter(col("job_id") === jobId),
                       Seq("job_id"), Seq(col("updated_at")))
      .select("job_id", "job_type", "status", "progress", "error_message")

  /** A6 — progress ratio per job (`models/job.py:33-35`). */
  def progressReport(ledger: DataFrame): DataFrame =
    Tables.latestByKey(ledger, Seq("job_id"), Seq(col("updated_at")))
      .withColumn("progress_ratio",
        when(col("total_items") > 0,
             col("processed_items").cast("double") / col("total_items"))
          .otherwise(col("progress")))
}
