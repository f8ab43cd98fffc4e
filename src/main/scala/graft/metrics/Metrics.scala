package graft.metrics

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Pipeline observability — the Spark answer to the reference's
  * Prometheus instruments (solaius/data_pipeline2 `utils/metrics.py`,
  * `services/embedding_service.py:14-23`):
  *
  *  - counters by dimension (A3/A4: chunks by strategy/status,
  *    embedding requests by provider/status) = groupBy over a run-log
  *    table — exact, mergeable across jobs;
  *  - in-flight stage metrics (A2/A5: chunk sizes, stage volumes) =
  *    `df.observe` — collected DURING the action with zero extra scan,
  *    the executor-side analogue of a histogram observation;
  *  - stage latency (A5) = wall-time wrapper emitting a metrics row.
  *
  * At 100 TB the `observe` path matters: a separate metrics aggregation
  * would re-read the input; observation metrics ride the existing job.
  */
object Metrics {

  /** A3/A4 counter idiom: exact counts by dimension columns. */
  def counters(runLog: DataFrame, dims: String*): DataFrame =
    runLog.groupBy(dims.map(col): _*).agg(count(lit(1)).as("n"))

  /** Attach chunk-size observation metrics (A2) to a chunks DataFrame;
    * read `obs.get` after the first action completes.
    */
  def observeChunkSizes(chunks: DataFrame, obs: Observation): DataFrame =
    chunks.observe(obs,
      count(lit(1)).as("n_chunks"),
      min(length(col("content"))).as("min_len"),
      max(length(col("content"))).as("max_len"),
      avg(length(col("content"))).as("avg_len"))

  /** Attach embedding-volume observation (A4 success path). DISTINCT
    * aggregates are not allowed in observed metrics (they'd need a
    * second shuffle inside the observation), so provider cardinality
    * uses the mergeable HLL sketch — exact for the handful of
    * providers any real run has.
    */
  def observeEmbedding(embeddings: DataFrame, obs: Observation): DataFrame =
    embeddings.observe(obs,
      count(lit(1)).as("n_embedded"),
      approx_count_distinct(col("embedding_provider")).as("n_providers"))

  /** A5 — latency distribution per stage over the run-log table:
    * count / mean / p50 / p95 / max. `percentile_approx` is a
    * mergeable sketch (exact below the accuracy threshold), so this
    * aggregates across millions of runs with one shuffle — the
    * scalable analogue of Prometheus histogram buckets.
    */
  def latencySummary(runLog: DataFrame): DataFrame =
    runLog.filter(col("metric") === "seconds")
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("n"),
           avg(col("value")).as("mean_s"),
           percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50_s"),
           percentile_approx(col("value"), lit(0.95), lit(10000)).as("p95_s"),
           max(col("value")).as("max_s"))

  /** A5 latency: run `action`, return (result, seconds). Callers append
    * `(stage, seconds)` rows to a latency table — percentiles over that
    * table replace the reference's Prometheus histogram buckets.
    */
  def timed[A](action: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = action
    (r, (System.nanoTime() - t0) / 1e9)
  }
}
