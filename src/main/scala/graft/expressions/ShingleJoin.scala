package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct n-token shingles of a token array, space-joined, in one
  * codegen'd pass — the feature extractor under every shingle-based
  * dedup operator (n-gram Jaccard, SimHash, shingle-MinHash, the e2e
  * pipeline).
  *
  * Equivalent to the declarative formulation in `TextOps.shingleArray`
  * {{{
  *   array_distinct(
  *     when(size(toks) >= n,
  *       transform(sequence(1, size(toks) - (n-1)),
  *         i => array_join(slice(toks, i, n), " ")))
  *       .otherwise(fallback))
  * }}}
  * — same windows, same separator, same first-occurrence distinct
  * order (LinkedHashSet) — asserted against the HOF form in
  * ExpressionSpec. Exists for the usual reason: the nested
  * transform/slice/array_join lambdas evaluate interpreted per window
  * and get re-inlined wherever the optimizer moves them; one generated
  * loop makes the cost placement-independent.
  *
  * `shortToUnigrams` selects the fallback for docs with fewer than `n`
  * tokens: their distinct unigrams (every doc keeps a signature — the
  * SimHash configuration) or the empty array (short docs drop out of
  * shingle similarity — the Jaccard/MinHash configuration). Null
  * tokens (never produced by split()) are skipped. A null array yields
  * null in both modes.
  */
case class ShingleJoin(child: Expression, n: Int, shortToUnigrams: Boolean)
    extends UnaryExpression {

  require(n >= 2, "shingle width must be at least 2")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "shingle_join"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val toks = a.asInstanceOf[ArrayData]
    val m = toks.numElements()
    val set = new java.util.LinkedHashSet[UTF8String]()
    if (m < n) {
      if (shortToUnigrams) {
        var i = 0
        while (i < m) {
          if (!toks.isNullAt(i)) set.add(toks.getUTF8String(i)): Unit
          i += 1
        }
      }
    } else {
      val buf = new Array[UTF8String](n)
      var i = 0
      while (i + n <= m) {
        var j = 0
        while (j < n) {
          buf(j) = if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
          j += 1
        }
        set.add(UTF8String.concatWs(ShingleJoin.Space, buf: _*)): Unit
        i += 1
      }
    }
    new GenericArrayData(set.toArray[AnyRef](new Array[AnyRef](set.size())))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gad = classOf[GenericArrayData].getName
    val utf8 = classOf[UTF8String].getName
    val spaceRef = ctx.addReferenceObj("space", ShingleJoin.Space, utf8)
    nullSafeCodeGen(ctx, ev, toks => {
      val m = ctx.freshName("m")
      val set = ctx.freshName("set")
      val buf = ctx.freshName("buf")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val uniBody = if (shortToUnigrams)
        s"""
           |for (int $i = 0; $i < $m; $i++) {
           |  if (!$toks.isNullAt($i)) $set.add($toks.getUTF8String($i));
           |}
         """.stripMargin
      else ""
      s"""
         |int $m = $toks.numElements();
         |java.util.LinkedHashSet<$utf8> $set = new java.util.LinkedHashSet<$utf8>();
         |if ($m < $n) {
         |  $uniBody
         |} else {
         |  $utf8[] $buf = new $utf8[$n];
         |  for (int $i = 0; $i + $n <= $m; $i++) {
         |    for (int $j = 0; $j < $n; $j++) {
         |      $buf[$j] = $toks.isNullAt($i + $j) ? null : $toks.getUTF8String($i + $j);
         |    }
         |    $set.add($utf8.concatWs($spaceRef, $buf));
         |  }
         |}
         |${ev.value} = new $gad($set.toArray());
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleJoin =
    copy(child = newChild)
}

object ShingleJoin {
  private[expressions] val Space: UTF8String = UTF8String.fromString(" ")

  def apply(toks: Column, n: Int, shortToUnigrams: Boolean): Column =
    Bridge.column(ShingleJoin(Bridge.expression(toks), n, shortToUnigrams))
}
