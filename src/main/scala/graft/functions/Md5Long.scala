package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** `md5_long60(s)` — the first 60 bits of md5(s) as a non-negative BIGINT,
  * equal by construction to `cast(conv(substring(md5(s),1,15),16,10) as
  * bigint)` and to DuckDB's `('0x' || substring(md5(s),1,15))::BIGINT`:
  * 15 hex chars = bytes 0..6 (56 bits) followed by the high nibble of
  * byte 7.
  *
  * Why: the composed form materializes a 32-char hex string per call, then
  * substrings and string-parses it — and Spark's `md5` allocates a fresh
  * MessageDigest per row. This expression goes digest-bytes → long with a
  * thread-local digest instance, no intermediate strings. It is the hot
  * inner hash of every dedup/fingerprint operator (|grams| ≈ 300 × |docs|
  * calls per query).
  */
case class Md5Long(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_long60"

  protected override def nullSafeEval(input: Any): Any =
    Md5Long.hash60(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Long.hash60($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Md5Long =
    copy(child = newChild)
}

object Md5Long {
  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5(bytes): ((bytes 0..6) << 4) | (byte7 >>> 4). */
  def hash60(bytes: Array[Byte]): Long = hash60(bytes, 0, bytes.length)

  /** Slice form — hashes bytes[off, off+len) without copying (the gram hot
    * loop hashes every k-byte window of one shared buffer). */
  def hash60(bytes: Array[Byte], off: Int, len: Int): Long = {
    val md = digests.get()
    md.reset()
    md.update(bytes, off, len)
    val d = md.digest()
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }
}
