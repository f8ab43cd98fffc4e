package graft.learn

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed model training primitives — the pieces of the
  * training-data pipeline that LEARN from the corpus rather than
  * score it. Everything here is exact integer algebra: training runs
  * are bit-reproducible across engines and partitionings, the same
  * contract as the rest of the library (no float summation order, no
  * RNG the oracle can't replay).
  */
object Learn {

  /** EXACT DECISION-STUMP TRAINING — the optimal (feature, threshold,
    * direction) split by training error, found by sorted prefix sums:
    * the distributed inner loop of decision-tree/GBDT training (the
    * "exact greedy" split finder), as a report over every candidate.
    *
    * For each feature the candidate thresholds are its OBSERVED
    * values; for threshold t the rule `x >= t → +1` misclassifies the
    * positives below t and the negatives at-or-above it, both of which
    * fall out of one cumulative sum over the per-(feature, value)
    * class counts — no per-candidate rescan, the classic prefix-sum
    * identity. The flipped rule `x < t → +1` comes from the same
    * cumulants. Output: ONE row per feature — its best (threshold,
    * direction, err) under the deterministic tie-break (err, then
    * threshold, then direction); the caller's best stump is the min-err
    * row. A feature with no signal reports its least-bad constant-ish
    * rule, which is itself the useful diagnostic (err ≈ minority-class
    * count = "this feature is noise").
    *
    * Scale posture: the corpus is touched ONCE — a map-side explode to
    * (feature, value, label) and a map-side-combined count aggregate;
    * everything after runs on the (feature, distinct-value) histogram,
    * which the caller bounds by quantizing continuous features
    * (`cents div 100`-style binning — exactly LightGBM's histogram
    * trick). One shuffle on (feat, v); the per-feature windows and the
    * final rank reuse the feat partitioning. Labels: +1 is positive,
    * anything else counts negative. Counts in LongType — headroom to
    * ~9·10^18 rows per (feature, value) cell.
    */
  def trainStump(df: DataFrame, features: Seq[String],
                 labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(features.nonEmpty, "trainStump needs at least one feature")
    val pairs = features.flatMap(f => Seq(lit(f), col(f).cast("long")))
    val stacked = df.select(col(labelCol).cast("long").as("y"),
                            explode(map(pairs: _*)).as(Seq("feat", "v")))
    val grouped = stacked.groupBy(col("feat"), col("v"))
      .agg(sum(when(col("y") === 1, 1L).otherwise(0L)).as("np"),
           sum(when(col("y") === 1, 0L).otherwise(1L)).as("nn"))
    val byV = Window.partitionBy(col("feat")).orderBy(col("v"))
    val whole = Window.partitionBy(col("feat"))
    val cum = grouped
      .withColumn("cpLe", sum(col("np")).over(byV))
      .withColumn("cnLe", sum(col("nn")).over(byV))
      .withColumn("tp", sum(col("np")).over(whole))
      .withColumn("tn", sum(col("nn")).over(whole))
    // err(x>=t → +1) = pos below t + neg at-or-above t;
    // err(x< t → +1) = pos at-or-above t + neg below t
    val scored = cum.select(col("feat"), col("v").as("threshold"),
      explode(map(
        lit("ge"),
        (col("cpLe") - col("np")) + (col("tn") - col("cnLe") + col("nn")),
        lit("lt"),
        (col("tp") - col("cpLe") + col("np")) + (col("cnLe") - col("nn"))
      )).as(Seq("direction", "err")))
    val rank = Window.partitionBy(col("feat"))
      .orderBy(col("err"), col("threshold"), col("direction"))
    scored.withColumn("__rn", row_number().over(rank))
      .filter(col("__rn") === 1)
      .select(col("feat"), col("threshold"), col("direction"), col("err"))
  }
}
