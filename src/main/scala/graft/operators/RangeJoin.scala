package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval-containment) join — match each point to every
  * interval containing it on the same key. The naive formulation is an
  * inequality join, which Spark can only plan as a broadcast
  * nested-loop / cartesian — O(|P|·|I|) per key and a non-starter at
  * 100 TB.
  *
  * Scalable plan: quantize the numeric domain into fixed-width bins;
  * each interval EXPLODES into the bins it covers (⌈len/width⌉ rows —
  * bounded, intervals are short relative to the domain), each point
  * maps to exactly one bin, and the match becomes an EQUI-join on
  * (key, bin) followed by the exact containment filter. One shuffle on
  * (key, bin), skew bounded by bin width. The same trick underlies
  * interval indexes in genomics (bin/UCSC scheme) and time-window
  * attribution joins.
  */
object RangeJoin {

  /** @param points    DataFrame with `keyCol` and numeric `ptCol`
    * @param intervals DataFrame with `keyCol`, numeric `startCol`/`endCol`
    *                  (inclusive ends)
    * @param binWidth  bin size in domain units; choose ≈ the typical
    *                  interval length so most intervals explode into
    *                  1-2 bins
    */
  def binJoin(points: DataFrame, intervals: DataFrame, keyCol: String,
              ptCol: String, startCol: String, endCol: String,
              binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val binnedPts = points
      .withColumn("__bin", floor(col(ptCol) / binWidth).cast("long"))
    val binnedIvs = intervals
      .withColumn("__bin", explode(sequence(
        floor(col(startCol) / binWidth).cast("long"),
        floor(col(endCol) / binWidth).cast("long"))))
    binnedPts.join(binnedIvs, Seq(keyCol, "__bin"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__bin")
  }
}
