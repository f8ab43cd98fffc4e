package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton) clustering — the multi-dimensional layout key: a
  * file layout sorted by one column prunes min/max on that column
  * only; sorted by the bit-interleave of BOTH columns, every
  * contiguous block of rows spans a narrow range in EACH dimension,
  * so footer min/max statistics prune scans on either predicate.
  * The write-side half of partition pruning at 100 TB: cluster by
  * z-value, then any `x BETWEEN` / `y BETWEEN` scan skips most files.
  */
object ZOrder {

  /** The Morton interleave of two non-negative ints confined to
    * `bits` bits each: bit i of x lands at 2i, bit i of y at 2i+1.
    * A pure static-shift expression — 2·bits codegen'd terms, no UDF;
    * the same sum-of-terms algebra an external oracle can replay.
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x.cast("long"), i).bitwiseAND(1L), 2 * i) +
        shiftleft(shiftright(y.cast("long"), i).bitwiseAND(1L), 2 * i + 1)
    }.reduce(_ + _)

  /** The SQL form of [[zValue]] for an external engine — generated
    * from the same loop so the two can never drift.
    */
  def zValueSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")

  /** Per-block layout statistics under z-order: assign each row to a
    * block of `blockSize` consecutive z-values (the file a writer
    * would emit) and report both dimensions' min/max — exactly the
    * footer statistics a reader prunes on. Narrow ranges in BOTH
    * columns are the whole point; the spec quantifies it against a
    * single-column sort.
    */
  def blockStats(df: DataFrame, xCol: String, yCol: String,
                 bits: Int = 16, blockSize: Int = 4096): DataFrame =
    df.withColumn("__z", zValue(col(xCol), col(yCol), bits))
      .withColumn("block", expr(s"__z div $blockSize"))
      .groupBy(col("block"))
      .agg(count(lit(1)).as("n_rows"),
           min(col(xCol)).as("x_min"), max(col(xCol)).as("x_max"),
           min(col(yCol)).as("y_min"), max(col(yCol)).as("y_max"))
}
