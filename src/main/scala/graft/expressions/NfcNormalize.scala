package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for [[NfcNormalize]] — shared by interpreted eval and
  * generated code. */
object NfcFuncs {
  /** Unicode NFC (canonical composition). The common fast path —
    * already-normalized ASCII/For-most-text — is a cheap
    * `isNormalized` check with NO allocation; only strings that
    * actually carry decomposed sequences pay the normalize pass. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Unicode NFC normalization as a native Catalyst expression — the
  * curation pass that makes byte-level dedup sound: "café" composed
  * and "cafe" + U+0301 are the SAME text but different bytes, so
  * content-hash dedup (dd1), MinHash shingles, and SimHash signatures
  * all silently miss un-normalized duplicates. Spark has no built-in
  * Unicode normalizer; this stays inside whole-stage codegen via a
  * static call (same pattern as [[SimHash64]]), never a UDF.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc"

  override protected def nullSafeEval(input: Any): Any =
    NfcFuncs.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.NfcFuncs.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Column-API entry point. */
  def nfc(c: Column): Column =
    ColumnBridge.toColumn(NfcNormalize(ColumnBridge.toExpression(c)))

  /** SQL registration: `SELECT nfc(text) FROM docs`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc", exprs => {
        require(exprs.length == 1,
          s"nfc(text) takes exactly one argument, got ${exprs.length}")
        NfcNormalize(exprs.head)
      }, "scala_udf")
    ()
  }
}
