package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.DataType

/** Evaluation-count barrier: a transparent wrapper that reports
  * `deterministic = false` so the optimizer treats the wrapped
  * expression as not-inlinable.
  *
  * Why it exists: an expensive kernel computed in a Project and
  * consumed several times by a Filter above it does NOT evaluate once
  * — predicate pushdown substitutes the alias into the condition (one
  * kernel copy per field access; measured 5x for the quality-filter
  * stats kernel, `QualityFilters.apply`), and whole-stage codegen's
  * subexpression elimination does not cover short-circuiting filter
  * predicates. Catalyst's `With` common-expression mechanism gets
  * dissolved the same way before `RewriteWithExpression` can anchor
  * it. Declaring the alias non-deterministic is the one signal every
  * relevant rule honors (`PushPredicateThroughNonJoin` and
  * `CollapseProject` both require deterministic projections), and it
  * is semantically safe here: the child IS deterministic, so any
  * evaluation count yields the same value — the flag only pessimizes
  * the optimizer's freedom to duplicate.
  *
  * The wrapper itself is free: eval and codegen delegate directly to
  * the child.
  */
case class OncePerRow(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
