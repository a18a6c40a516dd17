package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Banded MinHash in one fused pass: token array in, `bands` LSH band
  * hashes out.
  *
  * Bit-for-bit equivalent to the declarative formulation
  * {{{
  *   sig = transform(sequence(0, numHashes-1),
  *           i -> array_min(transform(toks, t -> xxhash64(i, t))))
  *   bhs = transform(sequence(0, bands-1),
  *           b -> xxhash64(slice(sig, b*rows+1, rows)))
  * }}}
  * by replicating Spark's xxhash64 chaining exactly: per-hash seed is
  * `XXH64.hashInt(i, 42)` (the folded int literal child), token hashes
  * are `XXH64.hashUTF8String(t, seed)`, min is SIGNED long min
  * (array_min on BIGINT), and each band hash chains
  * `XXH64.hashLong(sig[j], ·)` from seed 42 over its signature rows —
  * asserted against the HOF form in ExpressionSpec.
  *
  * Exists for the same reason as [[SimHash64]]: the HOF form is a
  * triple-nested lambda that (a) evaluates interpreted, and (b) gets
  * inlined by CollapseProject into downstream per-band lambdas, where
  * it recomputes the whole `numHashes × |toks|` signature once per
  * band (measured: the inlined interpreted form costs ~8× the
  * signature pass per row at 8 bands). One codegen'd pass makes the
  * signature cost immune to where the optimizer moves the expression.
  *
  * Null handling: a null token contributes its per-hash seed
  * (xxhash64 skips null children, leaving the seed — HOF parity); a
  * null or empty token array yields null.
  */
case class MinHashBands(child: Expression, numHashes: Int, bands: Int)
    extends UnaryExpression {

  require(bands > 0 && numHashes % bands == 0, "bands must divide numHashes")

  private val rows = numHashes / bands

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // null also for empty (not just null) token arrays
  override def nullable: Boolean = true

  override def prettyName: String = "minhash_bands"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  // seeds are constant: the hash-index child folds to a literal
  private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(i => XXH64.hashInt(i, 42L))

  override def nullSafeEval(a: Any): Any = {
    val toks = a.asInstanceOf[ArrayData]
    val n = toks.numElements()
    if (n == 0) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      var i = 0
      if (toks.isNullAt(j)) {
        while (i < numHashes) {
          if (seeds(i) < mins(i)) mins(i) = seeds(i)
          i += 1
        }
      } else {
        val t = toks.getUTF8String(j)
        while (i < numHashes) {
          val h = XXH64.hashUTF8String(t, seeds(i))
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
      j += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 42L
      var r = b * rows
      while (r < (b + 1) * rows) {
        h = XXH64.hashLong(mins(r), h)
        r += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    val gad = classOf[GenericArrayData].getName
    val seedsRef = ctx.addReferenceObj("seeds", seeds, "long[]")
    nullSafeCodeGen(ctx, ev, toks => {
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      val r = ctx.freshName("r")
      val h = ctx.freshName("h")
      val t = ctx.freshName("t")
      s"""
         |int $n = $toks.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $mins = new long[$numHashes];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $j = 0; $j < $n; $j++) {
         |    if ($toks.isNullAt($j)) {
         |      for (int $i = 0; $i < $numHashes; $i++) {
         |        if ($seedsRef[$i] < $mins[$i]) $mins[$i] = $seedsRef[$i];
         |      }
         |    } else {
         |      org.apache.spark.unsafe.types.UTF8String $t = $toks.getUTF8String($j);
         |      for (int $i = 0; $i < $numHashes; $i++) {
         |        long $h = $xxh.hashUTF8String($t, $seedsRef[$i]);
         |        if ($h < $mins[$i]) $mins[$i] = $h;
         |      }
         |    }
         |  }
         |  long[] $out = new long[$bands];
         |  for (int $b = 0; $b < $bands; $b++) {
         |    long $h = 42L;
         |    for (int $r = $b * $rows; $r < ($b + 1) * $rows; $r++) {
         |      $h = $xxh.hashLong($mins[$r], $h);
         |    }
         |    $out[$b] = $h;
         |  }
         |  ${ev.value} = new $gad($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

object MinHashBands {
  def apply(toks: Column, numHashes: Int, bands: Int): Column =
    Bridge.column(MinHashBands(Bridge.expression(toks), numHashes, bands))
}
