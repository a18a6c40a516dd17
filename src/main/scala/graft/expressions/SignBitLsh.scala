package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Multi-table sign-bit LSH bucket ids in one fused codegen'd pass:
  * float embedding in, `tables` packed bucket ids out.
  *
  * Bit-for-bit equivalent to the declarative formulation in
  * `SimOps.lshBucketsHof` — per (table, plane) a sequential left fold
  * `aggregate(zip_with(emb, lit(coeffs), (x, c) -> dbl(x) * c), 0.0, +)`
  * whose sign becomes one bucket bit, bits packed MSB-first by
  * `reduceLeft(acc * 2 + bit)`. Floating-point accumulation order is
  * identical (strictly left-to-right adds), so buckets are identical —
  * asserted in ExpressionSpec.
  *
  * Exists for the same reason as [[MinHashBands]] / [[SimHash64]]: HOF
  * lambdas never enter whole-stage codegen, and `planes × tables`
  * separate folds re-walk the embedding once per plane interpreted
  * (measured: bucket computation dominated q_sim_ann_lsh at sf0.1).
  * One native loop reads the embedding once per plane in generated
  * code, immune to where the optimizer inlines it.
  *
  * Hyperplane coefficients are a pure function of (dim, planes,
  * tables): the fixed-seed PRNG stream every engine instance
  * regenerates identically — no state is shipped with plans.
  *
  * Degenerate inputs mirror the HOF form with ONE deliberate
  * divergence: a length-mismatched array or one containing a null
  * element makes every HOF projection fold null, so every sign bit
  * takes the `otherwise(0)` branch — all-zero buckets — and the native
  * form matches that. A NULL array, though, yields null here (the HOF
  * form's otherwise-branch would file every null row into bucket 0 of
  * every table — a junk mega-bucket; null-in → null-out drops such
  * rows from candidate generation instead).
  */
case class SignBitLsh(child: Expression, dim: Int, planes: Int, tables: Int)
    extends UnaryExpression {

  require(dim > 0 && planes > 0 && planes < 63 && tables > 0,
    "need dim > 0, 0 < planes < 63, tables > 0")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "sign_bit_lsh"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${t.catalogString}")
  }

  // The exact PRNG stream of the HOF reference formulation:
  // Random(42), table-major, then plane, then dimension.
  private lazy val coeffs: Array[Double] = SignBitLsh.coefficients(dim, planes, tables)

  private def zeros: GenericArrayData = new GenericArrayData(new Array[Long](tables))

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() != dim) return zeros
    var i = 0
    while (i < dim) {
      if (x.isNullAt(i)) return zeros
      i += 1
    }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < planes) {
        val base = (t * planes + p) * dim
        var proj = 0.0
        var j = 0
        while (j < dim) {
          proj += x.getFloat(j).toDouble * coeffs(base + j)
          j += 1
        }
        // Spark's >= orders NaN greater than everything, so a NaN
        // projection takes the 1-bit in the HOF form — mirror that
        // (Java primitive NaN >= 0 is false)
        bucket = bucket * 2 + (if (proj >= 0 || proj.isNaN) 1L else 0L)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gad = classOf[GenericArrayData].getName
    val coeffsRef = ctx.addReferenceObj("coeffs", coeffs, "double[]")
    nullSafeCodeGen(ctx, ev, x => {
      val out = ctx.freshName("out")
      val ok = ctx.freshName("ok")
      val i = ctx.freshName("i")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val base = ctx.freshName("base")
      val proj = ctx.freshName("proj")
      val bucket = ctx.freshName("bucket")
      s"""
         |long[] $out = new long[$tables];
         |boolean $ok = $x.numElements() == $dim;
         |if ($ok) {
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($x.isNullAt($i)) { $ok = false; break; }
         |  }
         |}
         |if ($ok) {
         |  for (int $t = 0; $t < $tables; $t++) {
         |    long $bucket = 0L;
         |    for (int $p = 0; $p < $planes; $p++) {
         |      int $base = ($t * $planes + $p) * $dim;
         |      double $proj = 0.0;
         |      for (int $j = 0; $j < $dim; $j++) {
         |        $proj += (double) $x.getFloat($j) * $coeffsRef[$base + $j];
         |      }
         |      $bucket = $bucket * 2 + (($proj >= 0 || Double.isNaN($proj)) ? 1L : 0L);
         |    }
         |    $out[$t] = $bucket;
         |  }
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SignBitLsh =
    copy(child = newChild)
}

object SignBitLsh {
  /** Fixed-seed hyperplane coefficients, flat `(t·planes + p)·dim + i`
    * layout — the same Random(42) draw order as the HOF reference. */
  def coefficients(dim: Int, planes: Int, tables: Int): Array[Double] = {
    val rng = new scala.util.Random(42)
    Array.fill(tables * planes * dim)(rng.nextDouble() - 0.5)
  }

  def apply(emb: Column, dim: Int, planes: Int, tables: Int): Column =
    Bridge.column(SignBitLsh(Bridge.expression(emb), dim, planes, tables))
}
