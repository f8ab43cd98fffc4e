package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * Aggregates the query registry from every operator module; each entry
  * is a named `(SparkSession, sfDir) => DataFrame` with (where the
  * semantics are SQL-expressible) a DuckDB oracle in [[oracleSql]].
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q05_revenue_by_nation")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++ graft.queries.Pipeline.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (sequential chunker folds, hashing-trick embeddings, LSH probes) —
    * the driver records a rows-only check for those.
    */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++ graft.queries.Pipeline.oracles
}
