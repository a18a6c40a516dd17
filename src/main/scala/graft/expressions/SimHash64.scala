package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: 64-bit SimHash of a string array
  * (features → per-feature 64-bit hash → 64 signed bit counters →
  * sign bits packed into one BIGINT).
  *
  * The HOF formulation (aggregate × zip_with over 64 counters) costs
  * |features| × 64 interpreted lambda evaluations per row — measured
  * ~55 s for 5000 docs at sf0.1 — while this fused loop is native and
  * codegen'd. Bit `i` of the result is the sign of counter `i`; band
  * extraction stays in plain SQL (`shiftright(sig, b*8) & 255`).
  *
  * The per-feature hash is two murmur3_32 passes (seeds 41, 42)
  * combined into 64 bits — deterministic, implementation-specific
  * (SimHash signatures carry no cross-engine oracle).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash64"

  @inline private def hash64(s: UTF8String): Long = {
    val lo = Murmur3_x86_32.hashUnsafeBytes(
      s.getBaseObject, s.getBaseOffset, s.numBytes(), 41)
    val hi = Murmur3_x86_32.hashUnsafeBytes(
      s.getBaseObject, s.getBaseOffset, s.numBytes(), 42)
    (hi.toLong << 32) | (lo.toLong & 0xffffffffL)
  }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val counters = new Array[Int](64)
    var j = 0
    while (j < arr.numElements()) {
      if (!arr.isNullAt(j)) {
        val h = hash64(arr.getUTF8String(j))
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) counters(i) += 1 else counters(i) -= 1
          i += 1
        }
      }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (counters(i) >= 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val counters = ctx.freshName("counters")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val s = ctx.freshName("s")
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val sig = ctx.freshName("sig")
      s"""
         |int[] $counters = new int[64];
         |for (int $j = 0; $j < $arr.numElements(); $j++) {
         |  if (!$arr.isNullAt($j)) {
         |    UTF8String $s = $arr.getUTF8String($j);
         |    int $lo = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
         |      $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 41);
         |    int $hi = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
         |      $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42);
         |    long $h = (((long) $hi) << 32) | (((long) $lo) & 0xffffffffL);
         |    for (int $i = 0; $i < 64; $i++) {
         |      if ((($h >>> $i) & 1L) == 1L) $counters[$i]++; else $counters[$i]--;
         |    }
         |  }
         |}
         |long $sig = 0L;
         |for (int $i = 0; $i < 64; $i++) {
         |  if ($counters[$i] >= 0) $sig |= (1L << $i);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Column-level entry point (array<string> in, bigint out). */
  def apply(features: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(features)))
}
