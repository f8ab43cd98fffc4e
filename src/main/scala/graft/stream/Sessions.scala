package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming sessionization — the resident-consumer twin of the batch
  * gap-based sessionizer (q31 computes sessions with a lag-window over
  * the archive; a live pipeline cannot wait for the archive). Spark's
  * `session_window` keeps per-key session state in the state store,
  * MERGES sessions a bridging event joins, and finalizes a session
  * once the watermark passes its close — so state is bounded by the
  * watermark horizon, the same contract as the streaming dedup.
  *
  * At scale the state store shards by the grouping key: per-user
  * session state distributes across executors, and a finalized session
  * leaves the store — a day of 100 TB events holds only the open
  * sessions inside the watermark, never the archive.
  */
object Sessions {

  /** Per-(key, session) event counts with session bounds, append-mode
    * finalized by the watermark. `gap` is the inactivity timeout that
    * closes a session (q31 uses the same 30-minute default in batch).
    */
  def sessionCounts(events: DataFrame, tsCol: String, keyCol: String,
                    gap: String = "30 minutes",
                    watermark: String = "10 minutes"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
              col("session_window.start").as("session_start"),
              col("session_window.end").as("session_end"),
              col("n_events"))
}
