package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.DataType

/** Identity expression that REPORTS non-deterministic — the optimizer fence
  * for expensive expressions (optimization guide §4.4, applied JVM-side).
  *
  * Catalyst freely duplicates a deterministic expression: predicate pushdown
  * substitutes a filter's reference to a projected column with the column's
  * DEFINING EXPRESSION below the project, and projection collapse inlines it
  * into every consumer. For a cheap expression that is the right call; for
  * an expensive one (a full JSON parse per row, say) it multiplies the
  * per-row cost by the number of consuming references — measured on
  * `metric_parse`, the null-check filter pushed below the parse projection
  * re-evaluated the whole to_json→from_json chain twice per row in an
  * INTERPRETED Filter node (from_json blocks whole-stage codegen), tripling
  * the query.
  *
  * Marking the expression non-deterministic is the documented cure (the
  * Python side spells it `udf.asNondeterministic()`): both rules refuse to
  * reorder past or duplicate it, so the value is computed exactly once per
  * row and consumers read the materialized column. The expression is in
  * truth deterministic — a task retry recomputes identical values, so the
  * repartition-retry hazard that makes genuinely random expressions unsafe
  * does not apply; the flag only disables optimizations. Trade-off (same as
  * the guide's): OTHER filters also stop pushing past the fence, so apply
  * it to expensive expressions only, never blanket.
  */
case class EvalOnceFence(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): EvalOnceFence =
    copy(child = newChild)
}

object Fence {
  /** Wrap a column so the optimizer computes it exactly once per row. */
  def evalOnce(c: Column): Column =
    ColumnBridge.column(EvalOnceFence(ColumnBridge.expression(c)))
}
