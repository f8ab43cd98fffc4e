package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF surface (SURVEY §2.13 reserved this for extension ops):
  * element-wise sum of integer-quantized vectors — the partial-
  * aggregable core of a centroid computation. Buffers are primitive
  * long arrays, merged associatively, so Spark runs it partial/final
  * like any built-in aggregate (map-side combine at scale). Division by
  * the group count happens outside (exactness: the oracle compares the
  * integer sums, not a float mean).
  */
object VectorAggregates {

  final class VecSumAgg(dims: Int) extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    override def zero: Array[Long] = new Array[Long](dims)
    override def reduce(b: Array[Long], a: Seq[Long]): Array[Long] = {
      var i = 0
      val n = math.min(dims, a.length)
      while (i < n) { b(i) += a(i); i += 1 }
      b
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < dims) { x(i) += y(i); i += 1 }
      x
    }
    override def finish(r: Array[Long]): Seq[Long] = r.toSeq
    override def bufferEncoder = ExpressionEncoder[Array[Long]]()
    override def outputEncoder = ExpressionEncoder[Seq[Long]]()
  }

  /** Element-wise vector sum aggregate over an array<bigint> column. */
  def vecSum(dims: Int)(col: Column): Column = {
    implicit val inEnc = ExpressionEncoder[Seq[Long]]()
    udaf(new VecSumAgg(dims)).apply(col)
  }
}
