package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed length of a string's UTF-8 bytes, codegen'd —
  * the primitive under the compressibility quality signal
  * (q_text_compress): highly repetitive text compresses far below
  * natural prose, making deflate_len/octet_length the cheap
  * repetition screen the Gopher/FineWeb curation rules apply before
  * any n-gram analysis. One static JVM-zlib call per row (level 6,
  * zlib framing), embarrassingly parallel; the deflater (native zlib
  * stream) and output buffer are ThreadLocal and reset per row, so
  * the only per-row allocation is the input's UTF-8 byte copy.
  * Deterministic for a
  * given input on a given JVM's zlib — which is why the consuming
  * query is a declared no-oracle row (DuckDB carries no zlib UDF, and
  * cross-LIBRARY deflate output is not specified byte-stable); the
  * spec pins known plaintexts, the repetitive≪random ordering, and
  * partitioning invariance.
  */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def prettyName: String = "deflate_len"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }

  override def nullSafeEval(s: Any): Any =
    DeflateLen.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.DeflateLen.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}

object DeflateLen {

  // Native zlib stream init dominates the per-row cost if a Deflater
  // is constructed per call (round-12 ADVICE) — Deflater is reusable
  // via reset() but not thread-safe, so one per task thread. The
  // thread-lifetime native handle is released by the JDK's cleaner.
  private val deflaters = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, false)
  }
  private val buffers = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  /** Compressed size of the string's UTF-8 bytes (zlib level 6). */
  def compute(s: UTF8String): Int = {
    val d = deflaters.get()
    d.reset()
    d.setInput(s.getBytes)
    d.finish()
    val buf = buffers.get()
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  def apply(c: Column): Column = Bridge.column(DeflateLen(Bridge.expression(c)))
}
