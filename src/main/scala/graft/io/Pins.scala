package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Caller-owned lifecycle for `localCheckpoint` pins.
  *
  * Several operators ([[graft.text.TextStats.dedupParagraphs]],
  * [[graft.text.TextStats.oovSignals]],
  * [[graft.text.TextStats.tokenizeToIds]],
  * [[graft.text.TextStats.tfidfTopTerms]],
  * [[graft.text.Curation.temperatureSample]]) pin a shared intermediate
  * with `localCheckpoint(true)` so two aggregation branches read ONE
  * scan instead of two. The pin is MEMORY_AND_DISK storage owned by the
  * session; without an explicit release every invocation leaks it for
  * the session's lifetime. Contract (same shape as
  * `Dedup.connectedComponents`'s per-round unpersist): run your
  * terminal action, then release.
  */
object Pins {

  /** Unpersist every localCheckpoint pin embedded in `df`'s plan — the
    * targeted release for a single operator result. Only call AFTER the
    * terminal action: the pinned blocks ARE the data (a local
    * checkpoint cannot be recomputed once dropped).
    * `foreachWithSubqueries` also descends into subquery-expression
    * plans (a plain foreach would silently leave a pin reachable only
    * through a ScalarSubquery/InSubquery pinned forever).
    */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreachWithSubqueries {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Run `body`, then unpersist every RDD pinned DURING it — the
    * transaction-scratch sweep the ingest and delete paths share: a
    * long-lived session running repeated store transactions must not
    * accumulate their localCheckpoint pins (each transaction's scratch
    * — id sets, pre-prune captures — is dead once it returns).
    */
  def sweepingNew[A](spark: SparkSession)(body: => A): A = {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    try body
    finally spark.sparkContext.getPersistentRDDs
      .filterNot { case (id, _) => before.contains(id) }
      .values.foreach(_.unpersist(blocking = false))
  }

  /** Unpersist everything pinned in the session — the between-queries
    * sweep for harnesses (Verify/Bench) whose queries are isolated and
    * fully consumed before the next starts. Pass `blocking = true` from
    * timing harnesses: an async teardown overlaps (and noises) the next
    * timed sample.
    */
  def sweepAll(spark: SparkSession, blocking: Boolean = false): Unit =
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking))
}
