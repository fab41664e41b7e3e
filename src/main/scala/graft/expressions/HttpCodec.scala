package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Static deflate/inflate kernels for HTTP `Content-Encoding` — called
  * from both interpreted eval and generated code. Spark ships no SQL
  * inflate, and a crawl pipeline meets compressed response bodies
  * constantly (`Content-Encoding: gzip` on most of the real web), so
  * this is the one genuinely-new primitive the t36 decode layer needs;
  * everything else (de-chunking, charset decode) is built-in Column
  * algebra ([[graft.text.HttpDecode]]).
  *
  * [[inflate]] SNIFFS the container the way browsers do: gzip magic →
  * RFC 1952 member (CRC32 + ISIZE verified — the
  * [[graft.sources.WarcFile.GzipMemberIterator]] contract at
  * column grain), 0x78 first byte → zlib (RFC 1950), anything else →
  * raw deflate — real servers send all three under the two
  * `Content-Encoding` tokens (`deflate` is SUPPOSED to mean zlib per
  * RFC 9110 §8.4.1.1 but is raw on a large fraction of deployments).
  */
object HttpCodecFuncs {

  /** RFC 1952 gzip member: fixed header (MTIME 0, OS 255), raw-deflate
    * body, CRC32 + ISIZE trailer. Deterministic for a fixed JVM zlib —
    * the generator side of the t36 battery (outputs are never hashed
    * across engines; only the round-tripped TEXT is). */
  def gzip(payload: Array[Byte]): Array[Byte] =
    graft.sources.WarcFile.gzipMember(payload)

  /** RFC 1950 zlib container — the nominal `Content-Encoding: deflate`. */
  def zlib(payload: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, false)
    d.setInput(payload); d.finish()
    val out = new java.io.ByteArrayOutputStream(payload.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Container-sniffing inflate: gzip (verified trailer), zlib, or raw
    * deflate. Truncated or corrupt streams refuse loudly — a crawl
    * record whose body does not decode is data loss, not noise. */
  def inflate(b: Array[Byte]): Array[Byte] = {
    require(b.length >= 1, "inflate: empty compressed body")
    if (b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b) {
      val it = new graft.sources.WarcFile.GzipMemberIterator(
        new java.io.ByteArrayInputStream(b))
      val out = it.next()
      require(!it.hasNext, "inflate: multi-member gzip body")
      out
    } else {
      // zlib: CMF low nibble 8 (deflate) and (CMF<<8|FLG) % 31 == 0
      val isZlib = b.length >= 2 && (b(0) & 0x0f) == 8 &&
        (((b(0) & 0xff) << 8 | (b(1) & 0xff)) % 31 == 0)
      val inf = new java.util.zip.Inflater(!isZlib)
      inf.setInput(b)
      val out = new java.io.ByteArrayOutputStream(b.length * 3 + 64)
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        require(n > 0 || inf.finished(),
          "inflate: truncated or corrupt deflate stream")
        out.write(buf, 0, n)
      }
      inf.end()
      out.toByteArray
    }
  }
}

/** `inflate(binary) -> binary` — codegen'd via a static call, stays
  * inside whole-stage codegen. */
case class InflateBytes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "inflate_bytes"

  override protected def nullSafeEval(input: Any): Any =
    HttpCodecFuncs.inflate(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.HttpCodecFuncs.inflate($c)")

  override protected def withNewChildInternal(newChild: Expression): InflateBytes =
    copy(child = newChild)
}

/** `deflate_bytes(binary) -> binary` in one of the two HTTP container
  * framings — the GENERATOR side (tests and corpus writers; the decode
  * path never compresses). */
case class DeflateBytes(child: Expression, gzipFraming: Boolean)
  extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = if (gzipFraming) "gzip_bytes" else "zlib_bytes"

  override protected def nullSafeEval(input: Any): Any =
    if (gzipFraming) HttpCodecFuncs.gzip(input.asInstanceOf[Array[Byte]])
    else HttpCodecFuncs.zlib(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (gzipFraming) "gzip" else "zlib"
    defineCodeGen(ctx, ev, c => s"graft.expressions.HttpCodecFuncs.$fn($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): DeflateBytes =
    copy(child = newChild)
}

object HttpCodec {
  /** Column API: sniffing inflate (gzip / zlib / raw deflate). */
  def inflate(c: Column): Column =
    ColumnBridge.toColumn(InflateBytes(ColumnBridge.toExpression(c)))

  /** Column API: RFC 1952 gzip member. */
  def gzipCompress(c: Column): Column =
    ColumnBridge.toColumn(
      DeflateBytes(ColumnBridge.toExpression(c), gzipFraming = true))

  /** Column API: RFC 1950 zlib container. */
  def zlibCompress(c: Column): Column =
    ColumnBridge.toColumn(
      DeflateBytes(ColumnBridge.toExpression(c), gzipFraming = false))
}
