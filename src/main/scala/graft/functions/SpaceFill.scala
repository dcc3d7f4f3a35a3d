package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Space-filling-curve kernels for [[graft.operators.Layout]]. Pure
  * JVM (dependency-free) so the Catalyst expression can call straight
  * into it from generated code.
  */
object SpaceFill {

  /** Hilbert curve index of (x, y) on a 2^bits × 2^bits grid — the
    * classic xy2d bit-level walk (Warren, Hacker's Delight §16-1 /
    * the Wikipedia reference form): at each scale s the quadrant pair
    * (rx, ry) contributes s²·((3·rx) xor ry) and the lower bits are
    * reflected/swapped into the quadrant's local frame. Inputs are
    * masked to their low `bits` bits. Unlike the Morton code, EVERY
    * consecutive pair of Hilbert indices is a grid-neighbour
    * (manhattan distance 1) — no quadrant-boundary jumps — which is
    * why equal-width index ranges give tighter per-file bounding
    * boxes on adversarial query shapes.
    */
  def hilbert2d(x0: Long, y0: Long, bits: Int): Long = {
    val n = 1L << bits
    var x = x0 & (n - 1)
    var y = y0 & (n - 1)
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** Codegen'd Hilbert index of two long columns (`bits` low bits each). */
case class Hilbert2D(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits > 0 && 2 * bits <= 62, s"bits=$bits out of range")
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert2d"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (bigint, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def nullSafeEval(x: Any, y: Any): Any =
    SpaceFill.hilbert2d(x.asInstanceOf[Long], y.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y) => s"graft.functions.SpaceFill.hilbert2d($x, $y, $bits)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Hilbert2D =
    copy(left = newLeft, right = newRight)
}

object SpaceFillFunctions {
  def hilbert2d(x: Column, y: Column, bits: Int = 16): Column =
    GraftShim.column(Hilbert2D(
      GraftShim.expression(x.cast("long")), GraftShim.expression(y.cast("long")), bits))
}
