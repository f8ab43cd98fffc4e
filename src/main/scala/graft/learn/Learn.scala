package graft.learn

import org.apache.spark.sql.{Column, DataFrame}
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
    * anything else counts negative. Rows with a NULL feature value are
    * EXCLUDED from that feature's histogram (Spark windows sort nulls
    * first, SQL engines last — a null row would silently shift every
    * cumulant between engines, and a null threshold is a rule no
    * caller can apply). Counts in LongType — headroom to ~9·10^18 rows
    * per (feature, value) cell.
    */
  def trainStump(df: DataFrame, features: Seq[String],
                 labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(features.nonEmpty, "trainStump needs at least one feature")
    val pairs = features.flatMap(f => Seq(lit(f), col(f).cast("long")))
    val stacked = df.select(col(labelCol).cast("long").as("y"),
                            explode(map(pairs: _*)).as(Seq("feat", "v")))
      .filter(col("v").isNotNull)
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

  /** EXACT REGRESSION-STUMP TRAINING — the variance-reduction split,
    * the regression-tree/GBDT counterpart of [[trainStump]]: for each
    * feature, the threshold t splitting rows into L = {x < t} and
    * R = {x ≥ t} that minimizes SSE_L + SSE_R. Since the total Σy² is
    * split-invariant, minimizing SSE is maximizing the GAIN
    * G(t) = S_L²/n_L + S_R²/n_R, and both S and n at every candidate
    * fall out of ONE strict-prefix cumulative sum over the per-(feature,
    * value) (count, Σy) histogram — the same no-rescan identity as the
    * classification stump.
    *
    * G is rational; it is compared in FIXED-POINT: gain_fp =
    * (S_L²·SCALE) div n_L + (S_R²·SCALE) div n_R in decimal(38,0) —
    * deterministic truncating algebra both engines share, so the
    * argmax (tie-break: gain desc, then threshold asc) is
    * bit-reproducible. Candidates within the same SCALE quantum tie to
    * the lower threshold — a defined answer, not a float race. The
    * t = min(v) candidate has n_L = 0 and degrades to the no-split
    * baseline S²·SCALE div n (its term is defined 0 at n=0), so "don't
    * split" competes on equal footing. Output per feature: the best
    * threshold, its gain, and the fitted leaf values (scaled truncated
    * means) — the numbers a boosting round consumes.
    *
    * Scale posture: identical to [[trainStump]] — one map-side corpus
    * pass, histogram-bounded everything after. Rows with a NULL
    * feature value or NULL target are EXCLUDED from that feature's
    * histogram (Spark windows sort nulls first, SQL engines last — a
    * null row would silently shift every cumulant between engines).
    *
    * Headroom — the honest bound: `div` yields BIGINT, so each gain
    * term (S²·scale) div n ≤ n·y_max²·scale must stay under 9.2·10^18.
    * At the default scale=10^6 that is ~10^6 rows of ¦y¦ ≤ 3·10^3;
    * larger corpora LOWER `scale` (the resolution↔headroom knob:
    * scale=1 reaches ~10^10 rows of 10^4-magnitude targets). The S²
    * intermediate itself is decimal(38,0) and never overflows first.
    */
  def trainRegressionStump(df: DataFrame, features: Seq[String],
                           targetCol: String,
                           scale: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(features.nonEmpty, "trainRegressionStump needs at least one feature")
    val dec = "decimal(38,0)"
    val pairs = features.flatMap(f => Seq(lit(f), col(f).cast("long")))
    val stacked = df.select(col(targetCol).cast("long").as("y"),
                            explode(map(pairs: _*)).as(Seq("feat", "v")))
      .filter(col("v").isNotNull && col("y").isNotNull)
    val grouped = stacked.groupBy(col("feat"), col("v"))
      .agg(count(lit(1)).as("cnt"), sum(col("y")).as("sy"))
    val below = Window.partitionBy(col("feat")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val whole = Window.partitionBy(col("feat"))
    val cum = grouped
      .withColumn("nL", coalesce(sum(col("cnt")).over(below), lit(0L)))
      .withColumn("sL", coalesce(sum(col("sy")).over(below), lit(0L)))
      .withColumn("n", sum(col("cnt")).over(whole))
      .withColumn("s", sum(col("sy")).over(whole))
      .withColumn("nR", col("n") - col("nL"))
      .withColumn("sR", col("s") - col("sL"))
    def term(sCol: String, nCol: String) =
      when(col(nCol) === 0L, lit(0L).cast("long")).otherwise(
        expr(s"CAST(CAST($sCol AS $dec) * $sCol * $scale div $nCol AS BIGINT)"))
    def meanFp(sCol: String, nCol: String) =
      when(col(nCol) === 0L, lit(0L).cast("long")).otherwise(
        expr(s"CAST(CAST($sCol AS $dec) * $scale div $nCol AS BIGINT)"))
    val scored = cum
      .withColumn("gain_fp", term("sL", "nL") + term("sR", "nR"))
      .withColumn("mean_left_fp", meanFp("sL", "nL"))
      .withColumn("mean_right_fp", meanFp("sR", "nR"))
    val rank = Window.partitionBy(col("feat"))
      .orderBy(col("gain_fp").desc, col("v"))
    scored.withColumn("__rn", row_number().over(rank))
      .filter(col("__rn") === 1)
      .select(col("feat"), col("v").as("threshold"), col("gain_fp"),
              col("nL").as("n_left"), col("nR").as("n_right"),
              col("mean_left_fp"), col("mean_right_fp"))
  }

  /** GRADIENT BOOSTING over regression stumps — the L2 boosting loop
    * itself, exact: start from the truncated global mean, then each
    * round (a) trains [[trainRegressionStump]] on the CURRENT
    * RESIDUALS, (b) picks the globally best stump under the
    * deterministic tie-break (gain desc, feature, threshold), (c) fits
    * its two leaf values as truncated residual means, and (d) updates
    * every row's prediction — exactly XGBoost/LightGBM's outer loop
    * with shrinkage 1 and depth 1, in integer algebra both engines
    * replay: all residuals stay integers (truncated means), so every
    * round is bit-reproducible. Output: one row per round — the chosen
    * split, fitted leaves, and the post-round training SSE (the
    * monitoring trace; SSE is non-increasing up to mean truncation).
    *
    * Scale posture: per round, ONE histogram pass (the stump trainer),
    * ONE two-sided leaf aggregate, ONE map-side prediction update —
    * the driver only collects the 1-row best-stump and leaf-sum
    * aggregates (the allowed k-row pattern). `rounds` is a small
    * constant. `gainScale` is the stump trainer's resolution↔headroom
    * knob — residual sums grow with the target range, so the default
    * here is 10^3, an order below the single-stump default.
    */
  def boostStumps(df: DataFrame, features: Seq[String], targetCol: String,
                  rounds: Int = 2, gainScale: Long = 1000L): DataFrame =
    boostCore(df, features, targetCol, rounds, gainScale)._1

  /** The one shared training core behind [[boostStumps]] and
    * [[boostFittedValues]]: returns (trace, p0, the cleaned feature
    * frame) so inference never re-runs the null-filter prologue or the
    * global-mean aggregate on its own drifting copy.
    */
  private def boostCore(df: DataFrame, features: Seq[String],
                        targetCol: String, rounds: Int, gainScale: Long)
      : (DataFrame, Long, DataFrame) = {
    require(rounds >= 1)
    val sp = df.sparkSession
    import sp.implicits._
    // pinned: the boosting loop drives 1 + 3·rounds driver actions
    // (global mean, then per round stump train / leaf means / SSE)
    // over this frame — unpinned, every action re-runs the caller's
    // whole feature pipeline (r17). At 100 TB this is "write the
    // training table once"; the loop then scans it.
    val clean = df.select(
        features.map(f => col(f).cast("long").as(f)) :+
          col(targetCol).cast("long").as("__y"): _*)
      .filter(features.map(f => col(f).isNotNull).reduce(_ && _) &&
              col("__y").isNotNull)
      .localCheckpoint()
    val first = clean.agg(sum(col("__y")).as("s"), count(lit(1)).as("n")).head()
    require(first.getLong(1) > 0, "boostStumps needs at least one row")
    val p0 = first.getLong(0) / first.getLong(1) // truncating, = div / //
    var cur = clean.withColumn("__pred", lit(p0))
    val trace = scala.collection.mutable.ListBuffer
      .empty[(Long, String, Long, Long, Long, Long, Long, Long)]
    for (r <- 1 to rounds) {
      val resid = cur.withColumn("__r", col("__y") - col("__pred"))
      val best = trainRegressionStump(resid, features, "__r", gainScale)
        .orderBy(col("gain_fp").desc, col("feat"), col("threshold"))
        .limit(1).head()
      val (feat, thr) = (best.getString(0), best.getLong(1))
      // leaf values recomputed directly as truncated residual means —
      // never derived from the trainer's scaled mean columns, so the
      // oracle replays S div n with no double-truncation subtlety
      val leaf = resid.agg(
        sum(when(col(feat) < thr, col("__r"))).as("sL"),
        count(when(col(feat) < thr, lit(1))).as("nL"),
        sum(when(col(feat) >= thr, col("__r"))).as("sR"),
        count(when(col(feat) >= thr, lit(1))).as("nR")).head()
      val nL = leaf.getLong(1); val nR = leaf.getLong(3)
      val meanL = if (nL == 0) 0L else leaf.getLong(0) / nL
      val meanR = if (nR == 0) 0L else leaf.getLong(2) / nR
      cur = cur.withColumn("__pred",
        col("__pred") + when(col(feat) < thr, meanL).otherwise(meanR))
      val sse = cur.agg(sum((col("__y") - col("__pred")) *
                            (col("__y") - col("__pred"))).as("sse"))
        .head().getLong(0)
      trace += ((r.toLong, feat, thr, nL, nR, meanL, meanR, sse))
    }
    (trace.toSeq.toDF("round", "feat", "threshold", "n_left", "n_right",
                      "mean_left", "mean_right", "sse_after"),
     p0, clean)
  }

  /** BOOSTED-MODEL FITTED VALUES — the inference half that closes the
    * train→score loop [[boostStumps]] opens: train the additive stump
    * model, then fold its trace into ONE codegen'd prediction column
    * (p0 + Σ per-round leaf value) and report per feature-cell the
    * fitted prediction and the exact residual SSE. The prediction
    * depends only on the features, so the per-cell grouping loses
    * nothing and gives the output a stable key. Inference is a
    * broadcast-free scan — the model is `rounds` rows of driver state,
    * folded into a literal when-chain; at 100 TB scoring costs one
    * map-side pass + one feature-cell aggregation.
    */
  def boostFittedValues(df: DataFrame, features: Seq[String],
                        targetCol: String, rounds: Int = 2,
                        gainScale: Long = 1000L): DataFrame = {
    val (trace, p0, clean) =
      boostCore(df, features, targetCol, rounds, gainScale)
    scoreCells(clean, features,
               foldPred(collectModel(trace.withColumn("p0", lit(p0)))))
  }

  /** THE TRAINED MODEL AS DATA — [[boostStumps]]'s trace plus the base
    * prediction `p0` on every row, self-contained for persistence: at
    * 100 TB training is the expensive corpus pass you run ONCE, scoring
    * the map-side pass you run per batch, so the artifact must carry
    * everything inference needs (the tokenizer.parquet convention).
    * Rounds-sized — a driver list by construction.
    */
  def boostTrainModel(df: DataFrame, features: Seq[String],
                      targetCol: String, rounds: Int = 2,
                      gainScale: Long = 1000L): DataFrame = {
    val (trace, p0, _) = boostCore(df, features, targetCol, rounds, gainScale)
    trace.withColumn("p0", lit(p0))
  }

  /** Score under a STORED model — the serving half of the
    * train→persist→serve loop: `model` is a persisted
    * [[boostTrainModel]] frame (rounds-sized; collecting it is the
    * allowed k-row pattern), folded into ONE literal when-chain, so
    * inference is a broadcast-free map-side pass + one feature-cell
    * aggregation. A correct stored model is indistinguishable from
    * inline training: output ≡ [[boostFittedValues]] bit-for-bit.
    */
  def boostScoreCells(df: DataFrame, features: Seq[String],
                      targetCol: String, model: DataFrame): DataFrame = {
    val rows = collectModel(model)
    val clean = df.select(
        features.map(f => col(f).cast("long").as(f)) :+
          col(targetCol).cast("long").as("__y"): _*)
      .filter(features.map(f => col(f).isNotNull).reduce(_ && _) &&
              col("__y").isNotNull)
    scoreCells(clean, features, foldPred(rows))
  }

  /** (p0, per-round (feat, threshold, mean_left, mean_right)) off a
    * model frame, round order.
    */
  private def collectModel(model: DataFrame)
      : (Long, Seq[(String, Long, Long, Long)]) = {
    val rows = model.orderBy(col("round"))
      .select(col("feat"), col("threshold"),
              col("mean_left"), col("mean_right"), col("p0"))
      .collect()
    require(rows.nonEmpty, "boost model is empty")
    (rows.head.getLong(4),
     rows.toSeq.map(r =>
       (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))))
  }

  private def foldPred(m: (Long, Seq[(String, Long, Long, Long)])): Column =
    m._2.foldLeft(lit(m._1)) { case (acc, (feat, thr, mL, mR)) =>
      acc + when(col(feat) < thr, mL).otherwise(mR)
    }

  private def scoreCells(clean: DataFrame, features: Seq[String],
                         pred: Column): DataFrame =
    clean.withColumn("__p", pred)
      .groupBy(features.map(col): _*)
      .agg(count(lit(1)).as("n_rows"), max(col("__p")).as("pred"),
           sum((col("__y") - col("__p")) * (col("__y") - col("__p")))
             .as("sse"))
}
