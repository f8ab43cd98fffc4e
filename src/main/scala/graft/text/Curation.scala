package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation sampling operators — the mixture-shaping passes a
  * training-data pipeline runs after cleaning/dedup and before
  * packing (none present in the reference, which stops at chunking —
  * solaius/data_pipeline2 `services/docling_service.py`; these are the
  * standard web-corpus recipes, e.g. CCNet/RefinedWeb-style source
  * caps and per-language balancing).
  *
  * Both operators are deterministic (no rand()): reproducible across
  * runs, partitionings and cluster sizes, and oracle-checkable.
  */
object Curation {

  /** PER-GROUP CAP — keep at most `cap` rows per group (domain/source),
    * best-first: the "no single domain dominates the corpus" rule.
    * Rank is total (score desc, id asc) so the kept set is unique.
    *
    * Scale shape: one shuffle on the group key. The rank<=cap filter is
    * pushed map-side by WindowGroupLimit (Spark ≥3.5), so a hot domain
    * never materializes more than `cap` rows per map task — the reduce
    * side sees at most `cap`·tasks rows per group, not the group's full
    * population.
    */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String,
                  scoreCol: String, cap: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    df.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= cap)
  }

  /** STRATIFIED deterministic sampling — per-stratum keep rates in
    * percent (language/source balancing). A row survives when its
    * id's md5 bucket ([[graft.dedup.Dedup.hashBucket]], 0..99) falls
    * under its stratum's rate; strata not in `rates` get
    * `defaultRate`. Pure map-side column algebra: no shuffle, no
    * state, linear scan — at 100 TB this is a filter fused into the
    * parquet scan.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       rates: Map[String, Int], defaultRate: Int): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, r)) =>
      when(col(strataCol) === k, lit(r)).otherwise(acc)
    }
    df.withColumn("bucket", graft.dedup.Dedup.hashBucket(col(idCol), 100))
      .filter(col("bucket") < rate)
  }
}
