package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left ("query") row, the single most recent
  * right ("build") row with `build.ts <= query.ts` on the same key.
  * The event-time lookup every feature/training pipeline needs
  * (point-in-time joins, slowly-changing dimensions); neither Spark
  * nor the reference has it as a primitive.
  *
  * Spark-first plan (SURVEY §4.2 escalation ladder step (a): compose
  * existing ops): a naive formulation is an inequality join —
  * O(|L|·|R|) per key and un-plannable as an equi-join. Instead both
  * sides are UNIONED, tagged, and sorted per key by
  * (ts, side, tiebreak); a running `last(build_value, ignoreNulls)`
  * window then carries the latest build row forward into each query
  * row. ONE shuffle on the key, linear scan per partition — the same
  * plan that handles 100 TB of events, and skew-safe because the
  * window is per key-partition, not per key.
  *
  * Tie semantics: a build row AT the query timestamp matches
  * (`<=`, ASOF-join convention); among build rows sharing a timestamp
  * the largest tiebreak wins.
  */
object AsOf {

  /** @param queries    left side; columns `keyCol`, `tsCol`, plus payload
    * @param builds     right side; same key/ts columns
    * @param matchCols  build columns carried onto each query row
    *                   (emitted as `asof_<name>`, null when no build
    *                   row is at-or-before the query row)
    * @param tieBreak   build-side column ordering ties on equal ts
    */
  def join(queries: DataFrame, builds: DataFrame, keyCol: String, tsCol: String,
           matchCols: Seq[String], tieBreak: String): DataFrame = {
    val qCols = queries.columns
    val payload = qCols.filterNot(c => c == keyCol || c == tsCol).toSeq
    // side 0 = build, 1 = query: at equal ts the build sorts FIRST so
    // the window (rows unbounded-preceding .. current) sees it.
    val b = builds.select(
      Seq(col(keyCol), col(tsCol), lit(0).as("__side"),
          col(tieBreak).cast("long").as("__tie"),
          struct(matchCols.map(col): _*).as("__m")) ++
        payload.map(c => lit(null).cast(queries.schema(c).dataType).as(c)): _*)
    val q = queries.select(
      Seq(col(keyCol), col(tsCol), lit(1).as("__side"),
          lit(Long.MaxValue).as("__tie"),
          lit(null).cast(b.schema("__m").dataType).as("__m")) ++
        payload.map(col): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.unionByName(q)
      .withColumn("__last", last(col("__m"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(qCols.map(col) ++
              matchCols.map(m => col(s"__last.$m").as(s"asof_$m")): _*)
  }

  /** FORWARD as-of — the symmetric primitive: match each query row to
    * the EARLIEST build row at-or-after it (the "next quote"/"next
    * event" join backward as-of cannot express). Same union-tag-window
    * plan mirrored: one shuffle on the key, a `first(…, ignoreNulls)`
    * window over (current row .. unbounded FOLLOWING) ordered by
    * (ts, side, tie) with the QUERY side sorting before an equal-ts
    * build — so a build AT the query timestamp matches (`>=`
    * convention), and among builds sharing a timestamp the SMALLEST
    * tiebreak wins (the first one the forward scan meets).
    */
  def joinForward(queries: DataFrame, builds: DataFrame, keyCol: String,
                  tsCol: String, matchCols: Seq[String],
                  tieBreak: String): DataFrame = {
    val qCols = queries.columns
    val payload = qCols.filterNot(c => c == keyCol || c == tsCol).toSeq
    // side 0 = query, 1 = build: at equal ts the build sorts AFTER the
    // query row, inside its forward frame.
    val b = builds.select(
      Seq(col(keyCol), col(tsCol), lit(1).as("__side"),
          col(tieBreak).cast("long").as("__tie"),
          struct(matchCols.map(col): _*).as("__m")) ++
        payload.map(c => lit(null).cast(queries.schema(c).dataType).as(c)): _*)
    val q = queries.select(
      Seq(col(keyCol), col(tsCol), lit(0).as("__side"),
          lit(Long.MinValue).as("__tie"),
          lit(null).cast(b.schema("__m").dataType).as("__m")) ++
        payload.map(col): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"), col("__tie"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    b.unionByName(q)
      .withColumn("__next", first(col("__m"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .select(qCols.map(col) ++
              matchCols.map(m => col(s"__next.$m").as(s"asof_$m")): _*)
  }

  /** Convenience: match each query row to the latest at-or-before
    * build row and emit the event-time gap in microseconds.
    */
  def joinWithGap(queries: DataFrame, builds: DataFrame, keyCol: String,
                  tsCol: String, idCol: String): DataFrame =
    join(queries, builds, keyCol, tsCol, Seq(idCol, tsCol), tieBreak = idCol)
      .withColumn("gap_us",
        unix_micros(col(tsCol)) - unix_micros(col(s"asof_$tsCol")))
}
