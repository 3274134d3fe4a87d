package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** `sorted_intersect_count(a, b)` — |A ∩ B| for two SORTED, DISTINCT
  * `ARRAY<BIGINT>` columns via a single merge walk, whole-stage codegen.
  *
  * The exact-Jaccard verify's hot kernel: the built-in
  * `size(array_intersect(ha, hb))` builds an `SQLOpenHashSet` PER ROW
  * (one hash insert per left element, one probe per right element, plus
  * the result array it then only measures) — profiled as the dominant
  * executor frame in the near-dup verify at the 100×-slice. For arrays
  * the caller has already made distinct and sorted (the per-doc gram-set
  * projection does both once per DOC, amortized over every pair the doc
  * appears in), the intersection size is one allocation-free two-pointer
  * walk per PAIR.
  *
  * Contract: both inputs ascending-sorted, duplicate-free `ARRAY<BIGINT>`
  * (the caller's `array_sort(array_distinct(...))` projection over BIGINT
  * gram hashes). Like `vector_dot`/`vector_l2q`, the expression does no
  * input-type validation (ExpectsInputTypes is not accessible from outside
  * Catalyst's package in this build): calling it with ARRAY<INT> reads
  * garbage via `getLong` and returns a silently wrong count rather than an
  * analysis error, and unsorted input undercounts — this is a private
  * kernel for the dedup chain, property-tested equal to
  * `size(array_intersect(...))` on its contract inputs (PropertySpec).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}
