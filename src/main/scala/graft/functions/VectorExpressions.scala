package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native vector kernels as Catalyst expressions.
  *
  * WHY (measured, not speculative): Spark's higher-order functions
  * (`zip_with`, `aggregate`) are CodegenFallback — evaluated
  * interpreted, one boxed lambda call per element. For a 768-dim cosine
  * over tens of thousands of vectors that interpretation dominated the
  * whole query (q36_pipeline_search was ~19 s at sf0.1, almost all in
  * the kernel). These expressions generate a primitive `while` loop
  * inside whole-stage codegen — the Spark-idiomatic escalation the
  * SURVEY (§4.2) reserved for exactly this case. The reference's
  * equivalent kernel is the ES Painless `cosineSimilarity` script
  * (solaius/data_pipeline2 `services/vector_storage.py:88`).
  *
  * Registered through [[graft.GraftExtensions]] (SparkSessionExtensions
  * — the public injection point); invoked via `call_function`.
  * Contract: inputs must be array<float> (cosine) / array<bigint>
  * (dot) — the engine's embedding schema guarantees it.
  */
object VectorExpressions {

  /** cosine(a, b) over two array<float> columns, double result.
    * One pass accumulates dot, |a|², |b|²; 0-norm inputs yield NaN
    * (same as the division-composed form).
    */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression with Serializable {

    override def checkInputDataTypes(): TypeCheckResult =
      GraftTypeChecks.expect2(prettyName, left.dataType, right.dataType,
                              ArrayType(FloatType))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "cosine_similarity"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val xi = x.getFloat(i).toDouble
        val yi = y.getFloat(i).toDouble
        dot += xi * yi; na += xi * xi; nb += yi * yi
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $xi = (double) $a.getFloat($i);
           |  double $yi = (double) $b.getFloat($i);
           |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
           |}
           |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Exact integer dot product over two array<bigint> columns (the
    * quantized-vector kernel used by the oracle-exact similarity ops).
    */
  case class LongVecDot(left: Expression, right: Expression)
      extends BinaryExpression with Serializable {

    override def checkInputDataTypes(): TypeCheckResult =
      GraftTypeChecks.expect2(prettyName, left.dataType, right.dataType,
                              ArrayType(LongType))
    override def dataType: DataType = LongType
    override def prettyName: String = "long_vec_dot"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0L
      var i = 0
      while (i < n) { dot += x.getLong(i) * y.getLong(i); i += 1 }
      dot
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |long $dot = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  $dot += $a.getLong($i) * $b.getLong($i);
           |}
           |${ev.value} = $dot;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  // ------------------------------------------------------ Column wrappers
  // (resolved through the session's function registry — sessions must be
  // built with GraftExtensions; see graft.GraftExtensions.)

  def cosineSim(a: Column, b: Column): Column =
    call_function("cosine_similarity", a, b)

  def longDot(a: Column, b: Column): Column =
    call_function("long_vec_dot", a, b)
}
