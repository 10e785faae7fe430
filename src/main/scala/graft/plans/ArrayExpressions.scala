package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd vector arithmetic for the similarity/ANN operators.
  *
  * The composable form — `aggregate(zip_with(a, b, x·y), 0.0, +)` — runs
  * as INTERPRETED higher-order lambdas: one closure invocation and one
  * boxed java.lang.Double per element per row. At ANN scale (every
  * query×candidate pair evaluates a dim-64 dot product, millions of
  * pairs per batch) that interpretation overhead dominates the math by
  * ~10×. This expression generates a tight primitive `double` loop
  * inline in the enclosing WholeStageCodegen stage instead.
  *
  * Result semantics are IDENTICAL to the lambda form (and to the DuckDB
  * oracle's `list_sum(list_transform(...))`): left-to-right summation in
  * IEEE double, null if either array is null, any element is null, or
  * the lengths differ (zip_with pads the shorter side with null, which
  * poisons the lambda sum to null — the explicit length check mirrors
  * that).
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double> arguments, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "array_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (xa, xb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = xa.numElements()
    if (n != xb.numElements()) return null
    val (ta, tb) = (elemType(left), elemType(right))
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (xa.isNullAt(i) || xb.isNullAt(i)) return null
      val va = ta match {
        case FloatType => xa.getFloat(i).toDouble
        case _ => xa.getDouble(i)
      }
      val vb = tb match {
        case FloatType => xb.getFloat(i).toDouble
        case _ => xb.getDouble(i)
      }
      sum += va * vb
      i += 1
    }
    sum
  }

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(t: DataType, arr: String, i: String): String = t match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $sum = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
            $sum += (${getter(elemType(left), a, i)}) * (${getter(elemType(right), b, i)});
          }
          if (!${ev.isNull}) ${ev.value} = $sum;
        }
      """
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArrayFunctions {
  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      ("array_dot", (c: Seq[Expression]) => {
        require(c.length == 2, s"array_dot takes 2 arguments, got ${c.length}")
        ArrayDotProduct(c(0), c(1)): Expression
      })
    ).map { case (name, builder) =>
      (FunctionIdentifier(name),
        new ExpressionInfo("graft.plans.ArrayExpressions", name),
        builder)
    }
}
