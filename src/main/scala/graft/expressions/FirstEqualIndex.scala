package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** First index (0-based) at which two long-array columns hold equal
  * values; -1 when no position matches (or lengths differ at every
  * shared position — comparison runs over the shorter length).
  *
  * Purpose-built for banded-LSH pair deduplication: a candidate pair
  * that shares k of the band hashes is generated k times by the
  * band-bucket self-join; filtering on
  * `band === first_equal_index(a.bhs, b.bhs)` keeps exactly one copy
  * INSIDE the join stage — replacing a full `.distinct()` shuffle of
  * the raw pair stream (the dominant cost of MinHash dedup at scale:
  * measured 22 s for a 41.8M-pair distinct at sf0.1, local[32]).
  * Codegen'd for the same reason as [[CosineSimilarity]]: it runs once
  * per raw candidate pair, the hottest loop of the query.
  */
case class FirstEqualIndex(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def prettyName: String = "first_equal_index"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<bigint> arguments, got " +
            s"${l.catalogString} and ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) return i
      i += 1
    }
    -1
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |${ev.value} = -1;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.getLong($i) == $y.getLong($i)) { ${ev.value} = $i; break; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FirstEqualIndex =
    copy(left = newLeft, right = newRight)
}

object FirstEqualIndex {
  def apply(a: Column, b: Column): Column =
    Bridge.column(FirstEqualIndex(Bridge.expression(a), Bridge.expression(b)))
}
