package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Winnowing fingerprint selection (the MOSS rule) over a per-token
  * FEATURE array, in one codegen'd pass: polynomial k-gram hashes
  * (((f_i·31 + f_{i+1})·…)·31 + f_{i+k−1}) mod 1e9+7, then the minimum
  * of every `w` consecutive hashes, deduplicated in first-occurrence
  * order.
  *
  * Equivalent to the declarative zip_with chain in q_text_winnow
  * (kept there as the asserted reference formulation — ExpressionSpec
  * pins bit-parity at (k=3, w=4) including the prefix-truncation
  * boundary cases); exists for the usual reason: each zip_with stage
  * evaluates an interpreted lambda per element AND allocates an
  * intermediate array per row per stage (five array materializations
  * per document), where one generated loop touches the feature array
  * once and allocates only the output. The FEATURE array stays an
  * input rather than being fused in, so the cross-engine feature
  * formula (length·131 + ascii) keeps a single definition shared with
  * the DuckDB oracle.
  *
  * Documents with fewer than k+w−1 grams' worth of tokens yield the
  * empty array — exactly the zip_with chain's truncated-prefix
  * behavior. Null feature elements never occur with the intended
  * inputs (the feature transform is null-intolerant by construction),
  * and a stray one fails LOUDLY rather than hashing garbage; a null
  * array yields null.
  */
case class WinnowPrints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1 && w >= 1, s"k and w must be >= 1, got k=$k w=$w")

  private val Mod = 1000000007L
  private val Mult = 31L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "winnow_prints"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.catalogString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val fs = a.asInstanceOf[ArrayData]
    val n = fs.numElements()
    val grams = n - k + 1
    val prints = grams - w + 1
    val set = new java.util.LinkedHashSet[java.lang.Long]()
    if (prints > 0) {
      val hs = new Array[Long](grams)
      var i = 0
      while (i < grams) {
        var h = 0L
        var j = 0
        while (j < k) {
          if (fs.isNullAt(i + j)) throw new IllegalArgumentException(
            s"$prettyName: null feature element at ${i + j} — feature " +
              "transforms feeding winnowing must be null-intolerant")
          h = h * Mult + fs.getLong(i + j); j += 1
        }
        hs(i) = h % Mod
        i += 1
      }
      i = 0
      while (i < prints) {
        var m = hs(i)
        var j = 1
        while (j < w) { if (hs(i + j) < m) m = hs(i + j); j += 1 }
        set.add(m): Unit
        i += 1
      }
    }
    new GenericArrayData(set.toArray[AnyRef](new Array[AnyRef](set.size())))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, fs => {
      val n = ctx.freshName("n")
      val grams = ctx.freshName("grams")
      val prints = ctx.freshName("prints")
      val hs = ctx.freshName("hs")
      val set = ctx.freshName("set")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val m = ctx.freshName("m")
      s"""
         |int $n = $fs.numElements();
         |int $grams = $n - $k + 1;
         |int $prints = $grams - $w + 1;
         |java.util.LinkedHashSet<Long> $set = new java.util.LinkedHashSet<Long>();
         |if ($prints > 0) {
         |  long[] $hs = new long[$grams];
         |  for (int $i = 0; $i < $grams; $i++) {
         |    long $h = 0L;
         |    for (int $j = 0; $j < $k; $j++) {
         |      if ($fs.isNullAt($i + $j)) {
         |        throw new IllegalArgumentException(
         |          "winnow_prints: null feature element — feature transforms " +
         |          "feeding winnowing must be null-intolerant");
         |      }
         |      $h = $h * ${Mult}L + $fs.getLong($i + $j);
         |    }
         |    $hs[$i] = $h % ${Mod}L;
         |  }
         |  for (int $i = 0; $i < $prints; $i++) {
         |    long $m = $hs[$i];
         |    for (int $j = 1; $j < $w; $j++) {
         |      if ($hs[$i + $j] < $m) $m = $hs[$i + $j];
         |    }
         |    $set.add($m);
         |  }
         |}
         |${ev.value} = new $gad($set.toArray());
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowPrints =
    copy(child = newChild)
}

object WinnowPrints {
  def apply(features: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowPrints(Bridge.expression(features), k, w))
}
