package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC helpers shared by [[NfcNormalize]]'s interpreted and
  * generated paths. `java.text.Normalizer` is stateless and thread-safe;
  * the ASCII fast path skips the String round-trip entirely — the common
  * case for machine text, and exactly when NFC is the identity.
  */
object Nfc {
  def nfc(s: UTF8String): UTF8String = {
    if (s.isFullAscii) s // NFC is the identity on ASCII; skip the decode
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC))
  }
}

/** Unicode NFC normalization of a STRING column — the dedup-correctness
  * primitive Spark lacks natively: "café" composed (U+00E9) and
  * decomposed (e + U+0301) are different byte strings that every
  * hash-based operator in this engine (exact dedup, MinHash, content
  * fingerprints) would treat as distinct documents. A multilingual corpus
  * mixes both encodings freely (different OCR/browser/OS producers), so
  * canonicalizing BEFORE hashing is the difference between a dedup pass
  * that works on English and one that works on a web crawl.
  *
  * Mirrors DuckDB's `nfc_normalize` (both implement the Unicode standard
  * algorithm, so results are engine-identical). Codegen keeps the scan →
  * normalize → hash pipeline inside Tungsten, with an ASCII fast path
  * that avoids the UTF8String→String→UTF8String round-trip entirely.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    Nfc.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Nfc.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object UnicodeExprs {
  /** Column API for [[NfcNormalize]] (expects a STRING input). */
  def nfcNormalize(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}
