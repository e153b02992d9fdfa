package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Space-filling-curve keys for multi-dimensional data layout
  * (see [[graft.operators.Layout]]).
  */
object LayoutExprs {

  /** Java source for the Morton spread (classic bit-twiddling dilation);
    * shared by eval and codegen so the two cannot drift. Inputs are
    * masked to 31 bits: with full 32-bit inputs, the odd-position key's
    * bit 31 would land on bit 63 after the interleave's `<< 1`, flipping
    * the SIGN of the z-key and breaking curve monotonicity under the
    * signed long sort.
    */
  private val SpreadBody =
    """x &= 0x7FFFFFFFL;
      |x = (x | (x << 16)) & 0x0000FFFF0000FFFFL;
      |x = (x | (x << 8))  & 0x00FF00FF00FF00FFL;
      |x = (x | (x << 4))  & 0x0F0F0F0F0F0F0F0FL;
      |x = (x | (x << 2))  & 0x3333333333333333L;
      |x = (x | (x << 1))  & 0x5555555555555555L;
      |return x;""".stripMargin

  private[functions] def spread(v: Long): Long = {
    var x = v & 0x7FFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** 2-D Morton (Z-order) key: interleave the low 31 bits of two bigint
    * keys, `a` on even bit positions, `b` on odd. Sorting by the result
    * clusters rows that are close in BOTH dimensions — the layout key
    * behind multi-dimensional file skipping. Keys wider than 31 bits
    * must be normalized first (the curve uses the low bits only); the
    * 31-bit mask keeps the interleaved key non-negative so the signed
    * long sort preserves curve order.
    */
  case class ZValue(left: Expression, right: Expression)
      extends BinaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType == LongType && right.dataType == LongType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"z_value expects (bigint, bigint), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    override def dataType: DataType = LongType
    override def prettyName: String = "z_value"

    override def nullSafeEval(a: Any, b: Any): Any =
      spread(a.asInstanceOf[Long]) | (spread(b.asInstanceOf[Long]) << 1)

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val fn = ctx.addNewFunction("graftMortonSpread",
        s"""private long graftMortonSpread(long x) {
           |  $SpreadBody
           |}""".stripMargin)
      defineCodeGen(ctx, ev,
        (a, b) => s"$fn($a) | ($fn($b) << 1)")
    }

    override protected def withNewChildrenInternal(newLeft: Expression,
        newRight: Expression): ZValue = copy(left = newLeft, right = newRight)
  }

  def zValue(a: Column, b: Column): Column =
    Bridge.column(ZValue(Bridge.expression(a), Bridge.expression(b)))
}
