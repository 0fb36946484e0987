package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.DataType

/** Identity wrapper that pins an EXPENSIVE projected expression to exactly
  * one evaluation per row.
  *
  * Catalyst assumes expressions are cheap to re-evaluate: a Filter above a
  * deterministic Project is pushed through it with the alias INLINED into
  * the predicate (`PushPredicateThroughNonJoin`), and `FilterExec`
  * generates its conjuncts without cross-conjunct subexpression
  * elimination — so an O(len²)-per-row kernel referenced by both the
  * output and a selectivity filter ends up evaluated two or three times
  * per row (measured: the banded Levenshtein kernel ran once in the join
  * condition per conjunct and again in the project). Marking the wrapper
  * non-deterministic makes the inlining illegal — the optimizer must keep
  * the Filter ABOVE the Project and reference the materialized column —
  * while evaluation semantics are untouched: this node generates its
  * child's code verbatim.
  *
  * Use ONLY on expressions that are in fact pure functions of their row
  * (the non-determinism flag is a cost annotation here, not a semantic
  * one): wrapping a genuinely cheap expression just disables legitimate
  * optimizations.
  */
case class MaterializeOnce(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = child.dataType
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): MaterializeOnce =
    copy(child = newChild)
}

object MaterializeOnce {
  def apply(c: Column): Column = Bridge.column(MaterializeOnce(Bridge.expression(c)))
}
