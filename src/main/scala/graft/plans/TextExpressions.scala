package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd whitespace token counting for the text-analysis
  * scan stage.
  *
  * The composable form — `size(split(lower(trim(t)), "\s+"))` with a
  * blank guard — allocates a lowercased copy of the string plus an
  * array of substring objects per row just to COUNT separators. Over a
  * 100 TB documents scan (token counting runs inline in quality
  * scoring, packing, profiling) that allocation is the dominant cost.
  * This expression is one branch-free byte scan: no regex, no copies,
  * no array.
  *
  * Result semantics are IDENTICAL to the composable form (and to the
  * DuckDB oracle's `len(regexp_split_to_array(lower(trim(text)),
  * '\s+'))` with the blank guard):
  *  - SQL trim strips 0x20 spaces ONLY, so other whitespace at the
  *    ends survives into split, which (limit −1) keeps the resulting
  *    empty edge pieces. Piece count for non-blank input is therefore
  *    exactly (whitespace runs) + 1, counting edge runs of non-space
  *    whitespace.
  *  - Java's `\s` is ASCII-only ([ \t\n\x0B\f\r]) — multi-byte UTF-8
  *    never matches, so the byte scan needs no decoding.
  *  - lowercasing never creates or removes whitespace, so it cannot
  *    change the count and is skipped entirely.
  */
case class TokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${dt.simpleString}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_count"

  override def nullSafeEval(input: Any): Any =
    TokenCount.count(input.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TokenCount.count($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(newChild)
}

object TokenCount {
  private def isWs(b: Byte): Boolean = // Java regex \s (ASCII-only)
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** See [[TokenCount]] for the semantics contract. */
  def count(s: UTF8String): Int = {
    val n = s.numBytes()
    // SQL trim: strip 0x20 spaces only
    var i0 = 0
    while (i0 < n && s.getByte(i0) == ' ') i0 += 1
    var i1 = n - 1
    while (i1 >= i0 && s.getByte(i1) == ' ') i1 -= 1
    if (i1 < i0) return 0 // blank → 0 (the guard branch)
    // pieces = whitespace runs + 1 (split with limit -1 keeps the empty
    // edge pieces produced by non-space whitespace at the ends)
    var runs = 0
    var inWs = false
    var i = i0
    while (i <= i1) {
      val ws = isWs(s.getByte(i))
      if (ws && !inWs) runs += 1
      inWs = ws
      i += 1
    }
    runs + 1
  }
}

/** Registry for the text expressions (merged into [[GraftFunctions]] /
  * [[GraftExtensions]]).
  */
object TextExpressionFunctions {
  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      ("token_count", (c: Seq[Expression]) => TokenCount(c.head): Expression)
    ).map { case (name, builder) =>
      (FunctionIdentifier(name),
        new ExpressionInfo("graft.plans.TextExpressions", name),
        builder)
    }
}
