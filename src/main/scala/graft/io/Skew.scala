package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting — the manual fallback when AQE's
  * skew-join split doesn't apply (e.g. skewed aggregation keys).
  *
  * Two-phase aggregate: phase 1 groups on (key, salt) so a hot key's
  * rows spread over `buckets` reducers; phase 2 merges the partials on
  * the bare key. Correct for any associative aggregate expressed as
  * (partial, merge) column pairs. At 100 TB a single hot key (null
  * join keys, default enum values, bot user_ids) otherwise pins one
  * reducer while the rest idle.
  */
object Skew {

  /** Random-ish but DETERMINISTIC salt derived from the row's full
    * content hash would break associativity of sums only if keyed —
    * here it only has to spread rows, so a hash of a distinguishing
    * column works; pass the finest-grained column available.
    */
  def salt(distinguisher: Column, buckets: Int): Column =
    pmod(hash(distinguisher), lit(buckets))

  /** Salted two-phase count per key: semantically identical to
    * `df.groupBy(key).count()`, but no reducer sees more than ~1/buckets
    * of a hot key's rows in phase 1.
    */
  def saltedCount(df: DataFrame, keyCol: String, distinguisher: String,
                  buckets: Int = 16): DataFrame =
    df.groupBy(col(keyCol), salt(col(distinguisher), buckets).as("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("__partial")).as("n"))

  /** Salted two-phase sum of a numeric column per key. */
  def saltedSum(df: DataFrame, keyCol: String, valueCol: String,
                distinguisher: String, buckets: Int = 16): DataFrame =
    df.groupBy(col(keyCol), salt(col(distinguisher), buckets).as("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("__partial")).as("sum_" + valueCol))
}
