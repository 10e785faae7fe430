package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{And, BinaryExpression, EqualTo, Expression, GreaterThanOrEqual, LessThanOrEqual, Length}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `inet_contains(prefix_string, addr_binary)` — the Postgres `>>=`/`&&`
  * containment operator (F3; `1_base.sql:75`, `2_aggregations.sql:263`,
  * `8_views.sql:76`) as a first-class predicate, plus the optimizer rule
  * that makes it *plannable*.
  *
  * Why a Rule: evaluated as an opaque boolean, a containment join can
  * only execute as a nested loop over raw strings (prefix re-parsed per
  * comparison). [[RewriteInetContains]] rewrites every occurrence into
  *
  *   inet_start(p) <= addr AND inet_end(p) >= addr
  *
  * so (a) the per-side subexpressions are computed once per row on
  * their own side of a join before the join executes, and (b) the
  * condition becomes two simple binary-comparison conjuncts — the exact
  * shape range-join planning and filter pushdown understand. Users
  * write the natural predicate; the optimizer produces the plan the
  * hand-tuned queries use (SURVEY §2.4 J5/J6, §7.3).
  */
case class InetContains(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "inet_contains(prefix string, addr binary) expected")
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  override def nullSafeEval(p: Any, a: Any): Any = {
    val start = InetOps.prefixStart(p.asInstanceOf[UTF8String])
    val end   = InetOps.prefixEnd(p.asInstanceOf[UTF8String])
    val addr  = a.asInstanceOf[Array[Byte]]
    if (start == null || end == null) null
    // mixed families never contain each other (Postgres >>= semantics);
    // length check also keeps the lexicographic compare numeric
    else start.length == addr.length &&
      java.util.Arrays.compareUnsigned(start, addr) <= 0 &&
      java.util.Arrays.compareUnsigned(end, addr) >= 0
  }

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, a) => {
      // freshName, not fixed locals: two instances of this expression in
      // one generated method (e.g. an OR of two containment predicates
      // over a non-nullable child, where nullSafeExec omits its braces)
      // would otherwise declare `start`/`end` twice — janino compile
      // error → silent interpreted fallback
      val start = ctx.freshName("inetStart")
      val end   = ctx.freshName("inetEnd")
      s"""
      byte[] $start = graft.plans.InetOps.prefixStart($p);
      byte[] $end = graft.plans.InetOps.prefixEnd($p);
      if ($start == null || $end == null) { ${ev.isNull} = true; }
      else {
        ${ev.value} = $start.length == $a.length &&
          java.util.Arrays.compareUnsigned($start, $a) <= 0 &&
          java.util.Arrays.compareUnsigned($end, $a) >= 0;
      }
    """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(newLeft, newRight)
}

/** Optimizer rule: containment predicate → range-conjunct form (with
  * the same-family length guard — mixed v4/v6 never contain).
  */
object RewriteInetContains extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions { case InetContains(p, a) =>
      And(
        EqualTo(Length(InetStart(p)), Length(a)),
        And(
          LessThanOrEqual(InetStart(p), a),
          GreaterThanOrEqual(InetEnd(p), a)))
    }
}
