package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.DataType

/** Identity wrapper that opts its enclosing OPERATOR out of whole-stage
  * codegen while leaving every other expression in that operator compiled.
  *
  * Whole-stage codegen inlines an operator's full expression volume into
  * one `processNext()` method, and the per-element splitting that
  * `CreateArray` / `CreateNamedStruct` normally do
  * (`splitExpressionsWithCurrentInputs`) is a NO-OP inside whole-stage
  * (the inputs are Java locals that cannot cross method boundaries) — so
  * a projection whose literal-heavy kernel exceeds Janino's 64 KB method
  * limit fails compilation on every run and executes fully interpreted,
  * paying the failed compile each time (measured on the PQ encode: 0.9 s
  * codegen-split row-mode vs 4.5 s whole-stage-failed interpreted).
  * Wrapping ONE CHEAP column of the projection with this marker makes
  * `CollapseCodegenStages` skip the operator (CodegenFallback is
  * unsupported inside whole-stage), so the row-mode projection compiles
  * each expression with working splits. Only the wrapped expression
  * itself evaluates interpreted — wrap an attribute reference, never the
  * heavy kernel.
  */
case class WscgFence(child: Expression) extends UnaryExpression with CodegenFallback {
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = child.dataType
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def withNewChildInternal(newChild: Expression): WscgFence =
    copy(child = newChild)
}

object WscgFence {
  def apply(c: Column): Column = Bridge.column(WscgFence(Bridge.expression(c)))
}
