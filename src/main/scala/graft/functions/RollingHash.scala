package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** `rolling_hash_8(s)` — Rabin–Karp rolling hash of every 8-char window of
  * `s`, as `ARRAY<BIGINT>` of `length(s) − 7` values in `[0, P)`:
  *
  *   h(i) = Σ_{j<8} code(s[i+j]) · B^{7−j}   (mod P),  B = 257, P = 1e9+7
  *
  * One O(n) pass: each next window reuses the previous hash
  * (`h' = (h − c_out·B^7)·B + c_in  mod P`) instead of rehashing k chars —
  * the classic fingerprinting primitive the md5-per-gram form approximates
  * at k× the cost. The DuckDB oracle computes the congruent DIRECT form
  * (termwise `(code·B^j) % P` sums); both land on the same canonical
  * representative mod P, so results are bit-identical.
  *
  * Characters are Unicode code points below 0x10000 (UTF-16 code units
  * match code points on the BMP; the corpus is ASCII). Inputs shorter than
  * 8 chars return an empty array — callers filter `length(text) >= 8`.
  */
case class RollingHash8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_hash_8"

  protected override def nullSafeEval(input: Any): Any =
    RollingHash8.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash8.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash8 =
    copy(child = newChild)
}

object RollingHash8 {
  final val K = 8
  final val B = 257L
  final val P = 1000000007L
  /** B^(K-1) mod P — the weight of the outgoing character. */
  final val BK1: Long = {
    var v = 1L
    for (_ <- 0 until K - 1) v = v * B % P
    v
  }

  def compute(s: UTF8String): ArrayData = {
    val str = s.toString
    val n = str.length
    if (n < K) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n - K + 1)
    var h = 0L
    var i = 0
    while (i < K) { h = (h * B + str.charAt(i)) % P; i += 1 }
    out(0) = h
    i = K
    while (i < n) {
      val t = (h - str.charAt(i - K) * BK1 % P + P) % P
      h = (t * B + str.charAt(i)) % P
      out(i - K + 1) = h
      i += 1
    }
    new GenericArrayData(out)
  }
}
