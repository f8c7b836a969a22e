package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) bit interleave of two long columns' LOW 32 bits:
  * bit i of `left` lands at result bit 2i, bit i of `right` at 2i+1, so
  * lexicographic order on the result is Z-curve order over the (left,
  * right) grid — the multi-dimensional clustering key behind
  * [[graft.ops.Layout.zOrderWrite]]'s data-skipping layout.
  *
  * Implementation is the classic mask-shift bit spread (5 shift/mask
  * rounds per operand, no loop, no branch), emitted straight into
  * whole-stage codegen; the builtins-only 32-term fold it must equal
  * bit-for-bit lives in `Layout.zValueRef` (spec-asserted).
  *
  * Inputs are expected in [0, 2^32): the high 32 bits are ignored
  * (callers bucket into ranks first — [[graft.ops.Layout.rankBucket]]).
  */
case class InterleaveBits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two bigint arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "interleave_bits"

  @inline private def spread(v0: Long): Long = {
    var v = v0 & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    spread(l.asInstanceOf[Long]) | (spread(r.asInstanceOf[Long]) << 1)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val spreadFn = ctx.addNewFunction("graftSpreadBits",
        s"""
           |private long graftSpreadBits(long v) {
           |  v &= 0xFFFFFFFFL;
           |  v = (v | (v << 16)) & 0x0000FFFF0000FFFFL;
           |  v = (v | (v << 8)) & 0x00FF00FF00FF00FFL;
           |  v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL;
           |  v = (v | (v << 2)) & 0x3333333333333333L;
           |  v = (v | (v << 1)) & 0x5555555555555555L;
           |  return v;
           |}
         """.stripMargin)
      s"${ev.value} = $spreadFn($a) | ($spreadFn($b) << 1);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
