package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.Pipeline

/** Incremental aggregate maintenance (q106): union-of-partials merge
  * ≡ direct recompute; merges chain associatively.
  */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private val Day = 86400000000L

  private def ev(day: Long, typ: String, value: Double) =
    (new Timestamp(day * Day / 1000 + 3600000L), typ, value)

  private def direct(events: DataFrame) = events
    .withColumn("day", expr("unix_micros(ts) div 86400000000"))
    .groupBy(col("day"), col("event_type"))
    .agg(count(lit(1)).as("n"),
         sum(round(col("value") * lit(100.0)).cast("long")).as("sum_value_cents"))

  private def rows(df: DataFrame) = df
    .orderBy("day", "event_type")
    .as[(Long, String, Long, Long)].collect().toSeq

  test("merge of stored partials + newest batch equals the direct aggregate") {
    val events = Seq(
      ev(1, "click", 1.25), ev(1, "click", 2.50), ev(1, "view", 0.10),
      ev(2, "click", 3.00), ev(2, "purchase", 9.99),
      ev(3, "click", 1.00), ev(3, "click", 0.01))
      .toDF("ts", "event_type", "value")
    assert(rows(Pipeline.incrementalEventAgg(events)) == rows(direct(events)))
  }

  test("increments chain: absorbing days one at a time matches the total") {
    val all = (1L to 4L).flatMap(d =>
      Seq(ev(d, "click", d * 1.11), ev(d, "view", 0.07 * d)))
    // fold day by day: stored(d) = merge(stored(d-1), partials(day d))
    val stored = (1L to 4L).foldLeft(Option.empty[DataFrame]) { (acc, d) =>
      val batch = direct(all.filter(_._1.getTime < (d + 1) * Day / 1000)
        .filter(_._1.getTime >= d * Day / 1000)
        .toDF("ts", "event_type", "value"))
      Some(acc.fold(batch)(prev => prev.union(batch)
        .groupBy(col("day"), col("event_type"))
        .agg(sum(col("n")).as("n"),
             sum(col("sum_value_cents")).as("sum_value_cents"))))
    }.get
    assert(rows(stored) == rows(direct(all.toDF("ts", "event_type", "value"))))
  }

  test("plan: partial aggregation map-side combines before the merge") {
    val events = Seq(ev(1, "click", 1.0)).toDF("ts", "event_type", "value")
    val plan = Pipeline.incrementalEventAgg(events)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
           s"no map-side combine:\n$plan")
    assert(!plan.contains("UDF("), s"must be codegen-native:\n$plan")
  }
}
