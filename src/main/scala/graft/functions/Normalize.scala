package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC (canonical composition) normalization — the first
  * pass of any multilingual text pipeline: crawl text arrives with
  * the SAME grapheme in both composed ("é" U+00E9) and decomposed
  * ("e"+U+0301) forms, so exact dedup, shingle hashing, vocabulary
  * building, and boilerplate DF counting all silently fracture on
  * byte-unequal equal-looking strings until the corpus is
  * normalized. NFC is canonical — it never changes what a string
  * MEANS, only which codepoint sequence spells it (unlike NFKC,
  * which folds compatibility forms like ﬁ→fi and is a policy
  * decision, not offered here).
  *
  * The kernel is the JDK's `java.text.Normalizer` (ICU4J-derived,
  * Unicode-standard canonical composition — the same algorithm
  * DuckDB's `nfc_normalize` implements, which is what makes the
  * oracle row possible). `isNormalized` is a cheap scan that lets
  * already-NFC text — in a web corpus, the overwhelming majority,
  * and ASCII trivially — return the input buffer with zero
  * allocation, so the hot path is a read-only pass. */
object NormalizeKernel {

  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

/** Native codegen expression for [[NormalizeKernel.nfc]] — a pure
  * per-row projection (no UDF, stays inside whole-stage codegen). */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string argument, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    NormalizeKernel.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeKernel.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
