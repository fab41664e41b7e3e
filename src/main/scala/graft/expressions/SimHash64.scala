package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for [[SimHash64]] — called from both interpreted eval
  * and generated code. */
object SimHash64Funcs {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** One-pass 64-bit simhash over whitespace tokens: bit j of the
    * result is the sign of Σ_tokens (bit j of md5(token) ? +1 : −1),
    * bits taken MSB-first from the digest's first 8 bytes. Exactly the
    * semantics of the composed-builtin 16-bit form in
    * [[graft.text.SimHash]], widened to 64 bits and computed in a
    * single traversal with zero array materialization. */
  def compute(text: UTF8String): Long = {
    val counts = new Array[Int](64)
    val digest = md.get()
    val s = text.toString
    val n = s.length
    // token segmentation identical to split(text, " "): every
    // delimiter-bounded segment INCLUDING empties — leading, doubled,
    // and trailing (split("a ") = ["a",""], split("") = [""]). The
    // `start <= n` bound is what yields the trailing/empty segment.
    var start = 0
    while (start <= n) {
      var end = s.indexOf(' ', start)
      if (end < 0) end = n
      digest.reset()
      val bytes = digest.digest(
        s.substring(start, end).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var j = 0
      while (j < 64) {
        if (((bytes(j >> 3) >> (7 - (j & 7))) & 1) == 1) counts(j) += 1
        else counts(j) -= 1
        j += 1
      }
      start = end + 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) out |= (1L << (63 - j))
      j += 1
    }
    out
  }
}

/** Native Catalyst expression for 64-bit SimHash (SURVEY.md §2.8 notes
  * the reference needs no custom expressions — this one exists for the
  * engine's *extension* surface, where the composed-builtin form costs
  * 64 higher-order-function traversals per row and a 16-bit hash has
  * too many collisions for corpus-scale near-dup bucketing).
  *
  * Codegen'd via a static call — stays inside whole-stage codegen, no
  * fallback path. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64Funcs.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.SimHash64Funcs.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Column-API entry point. */
  def simhash64(c: Column): Column =
    ColumnBridge.toColumn(SimHash64(ColumnBridge.toExpression(c)))

  /** SQL registration: `SELECT simhash64(text) FROM docs`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "scala_udf")
    ()
  }
}
