package graft

import org.apache.spark.sql.functions._

import graft.operators.ZOrder

/** Z-order clustering (q107): Morton interleave + per-block layout
  * statistics.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def morton(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.sum

  test("zValue matches the driver-side interleave bit for bit") {
    val pairs = for (x <- Seq(0L, 1L, 5L, 63L, 200L, 255L);
                     y <- Seq(0L, 2L, 7L, 128L, 255L)) yield (x, y)
    val got = pairs.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zValue(col("x"), col("y"), 8).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z == morton(x, y, 8), s"($x,$y)") }
  }

  test("every 4096-z block of the full 256x256 grid is a 64x64 tile") {
    val grid = (for (x <- 0L until 256L; y <- 0L until 256L) yield (x, y))
      .toDF("xb", "yb")
    val stats = ZOrder.blockStats(grid, "xb", "yb", bits = 8, blockSize = 4096)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(stats.length == 16)
    stats.foreach { case (b, n, xmin, xmax, ymin, ymax) =>
      assert(n == 4096L, s"block $b")
      assert(xmax - xmin == 63L && ymax - ymin == 63L,
             s"block $b spans x[$xmin,$xmax] y[$ymin,$ymax] — not a 64x64 tile")
    }
  }

  test("contrast: an x-sorted layout cannot bound y") {
    // first 4096 rows of the x-sorted grid: x in [0,15], y spans all 256
    val grid = (for (x <- 0L until 256L; y <- 0L until 256L) yield (x, y))
      .sortBy(identity).take(4096)
    val ySpan = grid.map(_._2).max - grid.map(_._2).min
    assert(ySpan == 255L, "single-column sort leaves the other dim unbounded")
  }

  test("plan: static shifts only — codegen, no UDF") {
    val plan = ZOrder.blockStats(
        Seq((1L, 2L)).toDF("xb", "yb"), "xb", "yb", bits = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("UDF("), s"must be codegen-native:\n$plan")
  }
}
