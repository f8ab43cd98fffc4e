package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.DataType

/** Shared analysis-time input-type gate for the registry's native
  * expressions ([[VectorExpressions]], [[ShingleExpressions]],
  * [[CdcExpressions]], [[NormalizeExpressions]]).
  *
  * Spark's idiomatic vehicle is `ExpectsInputTypes`, but its
  * `inputTypes: Seq[AbstractDataType]` signature names a private[sql]
  * type an external package cannot write, so each expression overrides
  * `checkInputDataTypes()` through this helper instead. Same user
  * outcome: a wrong-typed SQL call (`cdc_cuts(42, 16, 64)`) fails at
  * analysis with a typed message, never at runtime with a
  * ClassCastException (interpreted) or a Janino compile error (codegen).
  * Comparison is by `catalogString` — nullability-insensitive like
  * ExpectsInputTypes' acceptsType/sameType semantics (which are
  * private[sql] too): "array<string>" prints identically whatever its
  * containsNull flag, and these kernels read nulls defensively anyway.
  */
object GraftTypeChecks {

  // NullType is accepted everywhere: `fn(NULL)` (a literal NULL, a
  // CASE branch that is void) evaluated to NULL through the null-safe
  // eval path before this gate existed, and Spark's own
  // ExpectsInputTypes functions admit it via ImplicitTypeCasts —
  // rejecting it here would turn a working query into an analysis
  // error.
  private def same(a: DataType, b: DataType): Boolean =
    a.catalogString == "void" || a.catalogString == b.catalogString

  def expect(fn: String, actual: DataType, expected: DataType): TypeCheckResult =
    if (same(actual, expected)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$fn requires ${expected.catalogString}, got ${actual.catalogString}")

  def expect2(fn: String, actualL: DataType, actualR: DataType,
              expected: DataType): TypeCheckResult =
    if (!same(actualL, expected))
      TypeCheckResult.TypeCheckFailure(
        s"$fn requires ${expected.catalogString} arguments, " +
        s"got ${actualL.catalogString} on the left")
    else if (!same(actualR, expected))
      TypeCheckResult.TypeCheckFailure(
        s"$fn requires ${expected.catalogString} arguments, " +
        s"got ${actualR.catalogString} on the right")
    else TypeCheckResult.TypeCheckSuccess
}
