package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native codegen'd 2-D Hilbert-curve index for the data-layout family
  * (the locality-preserving alternative to [[graft.operators.Layout]]'s
  * Morton key: Hilbert has no diagonal jumps, so consecutive keys are
  * always grid-adjacent — each output file covers ONE contiguous curve
  * segment, i.e. a tighter hyper-rectangle than Z-order's split
  * quadrant seams; measurably better min/max skipping on range
  * predicates over either dimension).
  *
  * Standard iterative xy→d conversion (the public-domain algorithm on
  * the Hilbert-curve literature's reference implementation): per bit
  * level s = 2^(bits−1)..1, accumulate the quadrant offset
  * s²·((3·rx) XOR ry) and rotate/reflect the frame. The reflection
  * `N−1−v` is a pure bitwise complement within the grid (no borrows),
  * so the whole computation is branch-light integer arithmetic —
  * whole-stage-codegen-friendly, reproducible anywhere, and exactly
  * replayable as a DuckDB recursive CTE (the gate's oracle).
  *
  * Inputs must be pre-bucketed to [0, 2^bits) by the caller (same
  * contract as `Layout.zOrderKey`); values outside truncate to their
  * low `bits` bits. 2·bits ≤ 62 keeps d in a positive long.
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"bits ($bits) must be in [1, 31]")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override def nullSafeEval(x: Any, y: Any): Any =
    HilbertIndex.index(x.asInstanceOf[Long], y.asInstanceOf[Long], bits)

  protected override def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y) => s"graft.plans.HilbertIndex.index($x, $y, $bits)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  /** See [[HilbertIndex]] for the semantics contract. */
  def index(x0: Long, y0: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1
    var x = x0 & mask
    var y = y0 & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { // complement within the grid — borrow-free
          x = mask - x
          y = mask - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}
