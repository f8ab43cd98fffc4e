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

  /** Salted equi-join — the skew-safe shuffle join for when the small
    * side is too big to broadcast AND the big side's join keys skew
    * (null-key dumps, default enum values, bot users): a plain shuffle
    * join sends every row of a hot key to ONE reducer. Salting the big
    * side spreads each key over `buckets` reducers and REPLICATES the
    * small side once per salt, so the join runs on (keys, salt) with no
    * partition larger than ~1/buckets of the hot key. Result-identical
    * to `big.join(small, keys)` by construction: every big row carries
    * exactly one salt and every small row exists at every salt, so each
    * matching pair meets exactly once. Cost: small side × buckets —
    * choose buckets by the skew factor, not larger. (AQE's skew split
    * handles sort-merge joins after the fact; this is the explicit
    * form that also covers hash joins and pins the layout.)
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 distinguisher: String, buckets: Int = 16): DataFrame = {
    val salted = big.withColumn("__salt", salt(col(distinguisher), buckets))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
