package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** `md5_grams(s, k)` — the md5-60-bit hash of every k-char window of `s` as
  * `ARRAY<BIGINT>`, equal position-for-position to
  * `md5_long60(substring(s, i, k))` for `i = 1 .. greatest(length(s)−k+1, 1)`
  * (a document shorter than `k` yields its ONE truncated gram, the
  * winnowing convention — so the array is never empty).
  *
  * Why: the winnowing fingerprint query hashed its grams under an explode —
  * one row per char position, a substring allocation per row, and the
  * (doc, pos, hash) rows then fed a per-doc window. This expression keeps
  * the whole gram pass on the document's own row: ONE `getBytes` per doc
  * (ASCII path hashes k-byte windows of the shared buffer in place; any
  * multi-byte char falls back to per-window substring+UTF-8, the documented
  * BMP semantics), one digest per gram, no row-grain materialization. The
  * DuckDB oracle keeps its row-local `list_transform` form unchanged.
  */
case class Md5Grams(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1 && k <= 64, s"gram size $k out of range")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_grams"

  protected override def nullSafeEval(input: Any): Any =
    Md5Grams.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Grams.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Md5Grams =
    copy(child = newChild)
}

object Md5Grams {
  def compute(s: UTF8String, k: Int): ArrayData = {
    val bytes = s.getBytes
    val nb = bytes.length
    var ascii = true
    var j = 0
    while (ascii && j < nb) { if (bytes(j) < 0) ascii = false; j += 1 }
    if (!ascii) return computeChars(s.toString, k)
    val n = math.max(nb - k + 1, 1)
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = Md5Long.hash60(bytes, i, math.min(k, nb - i))
      i += 1
    }
    new GenericArrayData(out)
  }

  private def computeChars(str: String, k: Int): ArrayData = {
    val nc = str.length
    val n = math.max(nc - k + 1, 1)
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = Md5Long.hash60(
        str.substring(i, math.min(i + k, nc)).getBytes("UTF-8"))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `winnow(garr, w)` — the DISTINCT sliding-window minima of a gram-hash
  * array, sorted ascending: `sort(distinct(min(garr[j .. j+w−1])))` for
  * `j = 1 .. greatest(len(garr)−w+1, 1)` (an array shorter than one window
  * yields the min of what's there; an empty array yields an empty result).
  * This IS the winnowing fingerprint set (Schleimer et al. 2003) of a
  * document, computed in one O(n) monotonic-deque pass on the document's
  * own row.
  *
  * Replaces the explode → per-doc window min → distinct plan: that shape
  * shuffles |corpus|·|positions| rows into a per-doc sort to compute
  * something each row can compute alone. With this expression both
  * fingerprint queries are pure projections — zero shuffles before the
  * output sort.
  */
case class Winnow(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1 && w <= 1024, s"window size $w out of range")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow"

  protected override def nullSafeEval(input: Any): Any =
    Winnow.compute(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Winnow.compute($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)
}

object Winnow {
  def compute(garr: ArrayData, w: Int): ArrayData = {
    val n = garr.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val m = math.max(n - w + 1, 1)
    val mins = new Array[Long](m)
    // monotonic deque of indices, front = argmin of the current window
    val dq = new Array[Int](n)
    var head = 0
    var tail = 0
    var i = 0
    while (i < n) {
      val v = garr.getLong(i)
      while (tail > head && garr.getLong(dq(tail - 1)) >= v) tail -= 1
      dq(tail) = i
      tail += 1
      val j = i - w + 1 // window [j, i] is complete once j >= 0
      if (j >= 0) {
        while (dq(head) < j) head += 1
        mins(j) = garr.getLong(dq(head))
      }
      i += 1
    }
    // short array (< one window): the single truncated window's min is the
    // global min, which is what the deque front holds after the full pass
    if (n < w) mins(0) = garr.getLong(dq(head))
    java.util.Arrays.sort(mins)
    var distinct = 0
    i = 0
    while (i < m) {
      if (i == 0 || mins(i) != mins(i - 1)) distinct += 1
      i += 1
    }
    if (distinct == m) return new GenericArrayData(mins)
    val out = new Array[Long](distinct)
    var k = -1
    i = 0
    while (i < m) {
      if (i == 0 || mins(i) != mins(i - 1)) { k += 1; out(k) = mins(i) }
      i += 1
    }
    new GenericArrayData(out)
  }
}
