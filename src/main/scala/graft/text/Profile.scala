package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus profiling via MERGEABLE histogram sketches — the length /
  * size distribution statistics every training-data pipeline reports
  * per source (none in the reference, which stops at chunking —
  * solaius/data_pipeline2 `services/docling_service.py`; these are the
  * standard corpus-QA summaries, cf. Gopher/RefinedWeb dataset cards).
  *
  * Exact quantiles at 100 TB need a full sort per group; Spark's
  * `percentile_approx` (Greenwald-Khanna) is the usual answer but its
  * result depends on merge order — not reproducible, not
  * oracle-checkable. This module takes the other classical route: a
  * FIXED log₂-binned histogram. Bin id = bit-length of the value
  * (⌊log₂ v⌋ + 1), so the sketch is
  *
  *  - bounded: ≤ 64 bins per group regardless of data volume,
  *  - mergeable: bin counts add — partial aggregation is exact, any
  *    merge order gives the same sketch (the property GK lacks),
  *  - deterministic: the p-th quantile is resolved to its bin's lower
  *    bound 2^(bin−1) by pure integer algebra (first bin whose
  *    cumulative count reaches ⌈p·n/100⌉), identical in any engine.
  *
  * Scale shape: the heavy input sees ONE map-side-combined groupBy on
  * (group, bin) — a key space of #groups × ≤64, so the shuffle carries
  * kilobytes at any corpus size. The window cumsum then runs over that
  * tiny sketch table, never over rows.
  */
object Profile {

  /** value → log₂ bin id (bit length: 1→1, 2..3→2, 4..7→3, …; 0→bin 1,
    * sharing the v=1 bin — lengths are non-negative and tiny docs all
    * land in the bottom bin). Column algebra only (`bin()` = binary
    * string, same function DuckDB ships), codegen-friendly.
    */
  private def log2Bin(c: org.apache.spark.sql.Column) =
    length(bin(greatest(c, lit(1)))).cast("long")

  /** The sketch: one row per (group, bin) with its count. */
  def lengthHistogram(df: DataFrame, groupCol: String, lenCol: String): DataFrame =
    df.groupBy(col(groupCol), log2Bin(col(lenCol)).as("bin"))
      .agg(count(lit(1)).as("cnt"))

  /** Resolve quantiles (percent, e.g. Seq(50, 90, 99)) from the sketch:
    * per group, the p-th quantile's bin is the first whose cumulative
    * count cum satisfies 100·cum ≥ p·n (⟺ cum ≥ ⌈p·n/100⌉ in exact
    * integers), reported as the bin's lower bound 2^(bin−1). One
    * window over the ≤64-row-per-group sketch.
    */
  def histogramQuantiles(hist: DataFrame, groupCol: String,
                         quantiles: Seq[Int]): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col("bin"))
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col(groupCol))))
    val qBins = quantiles.map { p =>
      min(when(col("cum") * 100 >= col("n") * p, col("bin"))).as(s"_qbin$p")
    }
    val aggs = max(col("n")).cast("long").as("n_docs") +: qBins
    val agged = cum.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
    agged.select(col(groupCol) +: col("n_docs") +: quantiles.map { p =>
      expr(s"shiftleft(CAST(1 AS BIGINT), CAST(_qbin$p AS INT) - 1)").as(s"p${p}_lb")
    }: _*)
  }

  /** The composed per-source document-length profile. */
  def lengthProfile(docs: DataFrame, groupCol: String, lenCol: String,
                    quantiles: Seq[Int] = Seq(50, 90, 99)): DataFrame =
    histogramQuantiles(lengthHistogram(docs, groupCol, lenCol), groupCol, quantiles)
}
