package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Morton (Z-order) code of two ints: interleaves the low 21 bits of
  * each input (x in even positions, y in odd) into one long, so
  * sorting by the result clusters rows that are close in BOTH
  * dimensions. The locality is what a Z-ordered data layout rides for
  * multi-dimensional file/row-group pruning (see
  * `graft.operators.ZOrder`). Inputs are masked to 21 bits — callers
  * normalize to [0, 2²¹) first.
  */
case class InterleaveBits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "interleave_bits"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two int arguments, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Int].toLong & 0x1FFFFFL
    val y = b.asInstanceOf[Int].toLong & 0x1FFFFFL
    var z = 0L
    var i = 0
    while (i < 21) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val i = ctx.freshName("i")
      s"""
         |long $x = ((long) $a) & 0x1FFFFFL;
         |long $y = ((long) $b) & 0x1FFFFFL;
         |${ev.value} = 0L;
         |for (int $i = 0; $i < 21; $i++) {
         |  ${ev.value} |= (($x >> $i) & 1L) << (2 * $i);
         |  ${ev.value} |= (($y >> $i) & 1L) << (2 * $i + 1);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterleaveBits =
    copy(left = newLeft, right = newRight)
}

object InterleaveBits {
  def apply(a: Column, b: Column): Column =
    Bridge.column(InterleaveBits(Bridge.expression(a), Bridge.expression(b)))
}
