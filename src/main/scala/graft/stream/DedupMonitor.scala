package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Live DUPLICATE-RATE monitoring over a stream — the ingest-health
  * dashboard feed: per event-time window, how many records arrived and
  * how many were first-seen (the gap is the duplicate mass). Batch
  * dedup answers this after the fact; an operator feeding an alert
  * needs it per window, while the stream runs.
  */
object DedupMonitor {

  /** Two streaming frames over one watermarked source:
    *   - `totals`: arrivals per tumbling window,
    *   - `uniques`: first-seen-only arrivals per window — the stream
    *     is deduplicated on `keyCol` BEFORE the windowed count, the
    *     classic dedup→window chain (dedup emits exactly the first
    *     occurrence immediately, so the downstream count is an
    *     ordinary append-mode window aggregate).
    * duplicate mass in a window = totals − uniques; both finalize at
    * the same watermark. State: `dropDuplicatesWithinWatermark` —
    * NOT plain `dropDuplicates`, whose key state never ages out when
    * the key omits the event-time column — so the dedup key set is
    * genuinely bounded by the watermark horizon (a re-send later than
    * the watermark counts as new, the standard trade-off); window
    * state is bounded by the window × watermark horizon.
    */
  def windowCounts(events: DataFrame, tsCol: String, keyCol: String,
                   windowLen: String = "15 minutes",
                   watermark: String = "10 minutes"): (DataFrame, DataFrame) = {
    val wm = events.withWatermark(tsCol, watermark)
    val totals = wm
      .groupBy(window(col(tsCol), windowLen))
      .agg(count(lit(1)).as("n_total"))
      .select(col("window.start").as("window_start"), col("n_total"))
    val uniques = wm
      .dropDuplicatesWithinWatermark(keyCol)
      .groupBy(window(col(tsCol), windowLen))
      .agg(count(lit(1)).as("n_unique"))
      .select(col("window.start").as("window_start"), col("n_unique"))
    (totals, uniques)
  }
}
