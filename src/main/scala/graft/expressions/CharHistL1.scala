package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Histogram kernel for [[CharHistL1]] — a separate object with no
  * companion class so Scala emits a static forwarder the generated
  * Java can call directly. */
object CharHist {
  /** L1 distance between the two strings' character histograms,
    * binned by UTF-8 LEADING byte (continuation bytes 10xxxxxx are
    * skipped), so every code point lands in exactly one bin for any
    * UTF-8 input. */
  def l1(a: UTF8String, b: UTF8String): Int = {
    val h = new Array[Int](256)
    val na = a.numBytes
    var i = 0
    while (i < na) {
      val x = a.getByte(i) & 0xff
      if ((x & 0xc0) != 0x80) h(x) += 1
      i += 1
    }
    val nb = b.numBytes
    i = 0
    while (i < nb) {
      val x = b.getByte(i) & 0xff
      if ((x & 0xc0) != 0x80) h(x) -= 1
      i += 1
    }
    var s = 0
    i = 0
    while (i < 256) {
      val v = h(i)
      s += (if (v < 0) -v else v)
      i += 1
    }
    s
  }
}

/** Native Catalyst expression: L1 distance between two strings'
  * character histograms — a cheap LOWER BOUND on (twice) their edit
  * distance, used to prune Levenshtein candidates before the DP runs.
  *
  * Bound: one substitution moves one code point between two bins
  * (L1 contribution ≤ 2); one insert/delete touches one bin
  * (contribution 1) — so `l1(a,b) ≤ 2·levenshtein(a,b)` for ANY
  * UTF-8 input (leading-byte binning gives each code point exactly
  * one bin; bin collisions only shrink the L1, keeping the bound
  * valid). Filtering pairs at `l1 ≤ 2·maxDist` is therefore lossless,
  * and costs O(|a|+|b|+256) per pair instead of the banded DP's
  * O(maxDist·|a|). Property-tested in EditDistSpec, including
  * multibyte input.
  */
case class CharHistL1(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def prettyName: String = "char_hist_l1"

  override def nullSafeEval(a: Any, b: Any): Any =
    CharHist.l1(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.CharHist.l1($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CharHistL1 =
    copy(left = newLeft, right = newRight)
}

object CharHistL1 {
  def charL1(a: Column, b: Column): Column =
    Bridge.column(CharHistL1(Bridge.expression(a), Bridge.expression(b)))
}
