package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.Schemas.JobStatus

/** ST3 strict-streaming variant: the reference's document/job status
  * state machine (solaius/data_pipeline2
  * `services/document_processor.py:96-132`) as a
  * `mapGroupsWithState` operator — one state row per job_id, illegal
  * transitions dropped (the reference logs-and-continues), terminal
  * states absorbing.
  *
  * Scale: state is partitioned by job_id across executors and
  * checkpointed by Structured Streaming — the 100 TB-posture answer to
  * the reference's single-process in-memory dict.
  */
object StatusStream {

  case class StatusUpdate(job_id: String, to_status: String, at: Timestamp,
                          error: Option[String])

  case class JobState(job_id: String, status: String, updated_at: Timestamp,
                      started_at: Option[Timestamp], completed_at: Option[Timestamp],
                      error_message: Option[String], n_transitions: Long)

  /** Pure per-group fold — also unit-testable without a stream. Applies
    * updates in timestamp order; illegal transitions are skipped.
    */
  def applyUpdates(jobId: String, updates: Iterator[StatusUpdate],
                   prior: Option[JobState]): JobState = {
    val sorted = updates.toVector.sortBy(u => (u.at.getTime, u.to_status))
    sorted.foldLeft(prior.getOrElse(
      JobState(jobId, JobStatus.Queued, new Timestamp(0), None, None, None, 0L))) {
      (st, u) =>
        val legal = JobStatus.transitions.getOrElse(st.status, Set.empty)
        if (!legal.contains(u.to_status)) st // drop illegal, like the reference's log-and-continue
        else JobState(
          jobId, u.to_status, u.at,
          if (u.to_status == JobStatus.Running) Some(u.at) else st.started_at,
          if (u.to_status == JobStatus.Completed || u.to_status == JobStatus.Failed)
            Some(u.at) else st.completed_at,
          u.error.orElse(st.error_message),
          st.n_transitions + 1)
    }
  }

  private def stateFunc(jobId: String, updates: Iterator[StatusUpdate],
                        state: GroupState[JobState]): JobState = {
    val next = applyUpdates(jobId, updates, state.getOption)
    state.update(next)
    next
  }

  /** Streaming entry: updates stream → current state per job. Use with
    * `.writeStream.outputMode("update")`.
    */
  def run(updates: Dataset[StatusUpdate]): Dataset[JobState] = {
    implicit val se = Encoders.product[JobState]
    implicit val ue = Encoders.product[StatusUpdate]
    implicit val ke = Encoders.STRING
    updates.groupByKey(_.job_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(stateFunc)
  }
}
