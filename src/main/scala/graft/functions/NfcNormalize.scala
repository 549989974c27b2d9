package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC canonical normalization as a native codegen'd expression —
  * the canonicalization step BYTE-level cleaning (`doc_normalize`,
  * TextQueries) cannot do: a composed "é" (U+00E9) and its decomposed
  * twin "e"+U+0301 are different byte strings but the SAME text, so an
  * exact-dedup key built on raw bytes misses the duplicate. Spark ships
  * no normalization function (Spark 4's collation support normalizes for
  * COMPARISON, not as a value transform), hence the custom expression;
  * DuckDB's built-in `nfc_normalize` is the oracle twin — NFC is a
  * single standardized algorithm (UAX #15), so the two engines agree by
  * construction on any input.
  *
  * Fast path: a pure-ASCII string (the overwhelming case in a real
  * pretraining corpus, and ALL of this synthetic one) is returned
  * UNCHANGED with a byte scan and no allocation — NFC is the identity on
  * ASCII. Only strings with a non-ASCII byte pay the String round-trip
  * through java.text.Normalizer. Stays inside WholeStageCodegen via the
  * static-call pattern of [[Hash60]].
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires STRING input, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.eval(input.asInstanceOf[UTF8String])

  // module-instance call: scalac emits no static forwarder for `eval`
  // on the companion (the Hash60 Janino lesson)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NfcNormalize$$.MODULE$$.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** NFC-normalize; ASCII inputs short-circuit to the input reference. */
  def eval(s: UTF8String): UTF8String = {
    val n = s.numBytes
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var i = 0L
    var ascii = true
    while (ascii && i < n) {
      if ((org.apache.spark.unsafe.Platform.getByte(base, off + i) & 0x80) != 0)
        ascii = false
      i += 1
    }
    if (ascii) s
    else {
      val str = s.toString
      if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
      else UTF8String.fromString(
        java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
    }
  }
}
