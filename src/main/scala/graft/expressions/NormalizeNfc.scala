package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — the
  * canonicalization pass a text pipeline runs before hashing, exact
  * dedup, or tokenization: the same visible string can arrive as
  * precomposed (U+00E9) or decomposed (e + U+0301) code points from
  * different crawls, and every hash-based operator in this repo
  * (q_dedup_exact's struct hash, minhash shingles, winnow
  * fingerprints) treats those as DIFFERENT documents unless the
  * corpus is normalized first.
  *
  * Rides `java.text.Normalizer` (JDK ICU subset — stable, standard
  * NFC). The fast path matters at corpus scale: real text is
  * overwhelmingly already-NFC, and `isNormalized` is a cheap scan that
  * skips the allocating normalize call, so the common case costs one
  * pass and zero allocations beyond the UTF8String→String bridge.
  * Codegen'd (this is a per-row string op on the hot curation path —
  * the CosineSimilarity/SimHash64 rationale); null-in → null-out.
  *
  * Oracle-checkable: DuckDB's `nfc_normalize` implements the same
  * Unicode normalization, so q_text_normalize is a hash-matched row,
  * not a spec-only one — rare for a custom Expression.
  */
case class NormalizeNfc(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def prettyName: String = "normalize_nfc"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"normalize_nfc needs a string column, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      s"""
         |String $s = $c.toString();
         |${ev.value} =
         |  java.text.Normalizer.isNormalized($s, java.text.Normalizer.Form.NFC)
         |    ? $c
         |    : org.apache.spark.unsafe.types.UTF8String.fromString(
         |        java.text.Normalizer.normalize($s, java.text.Normalizer.Form.NFC));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NormalizeNfc =
    copy(child = newChild)
}

object NormalizeNfc {
  /** Column-level entry point (string in, string out). */
  def apply(text: Column): Column =
    Bridge.column(NormalizeNfc(Bridge.expression(text)))
}
