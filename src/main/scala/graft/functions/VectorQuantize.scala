package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** `vector_quantize(arr, scale)` — quantize a FLOAT/DOUBLE array to
  * `ARRAY<BIGINT>` of `round(x · scale)` in one native pass.
  *
  * Replaces the last corpus-wide interpreted lambda in the similarity
  * family: `transform(embedding, v -> cast(round(cast(v as double) *
  * scale, 0) as bigint))` evaluates a boxed lambda per element (64 calls
  * per row over the whole corpus in sim_kmeans / sim_ivfpq / sim_twostage
  * / sim_drift); this is one static call per row writing a primitive
  * long[].
  *
  * Rounding replicates Spark's `round(double, 0)` (BigDecimal HALF_UP =
  * half-AWAY-FROM-ZERO on the exact binary value) — NOT `Math.round`
  * (floor(x+0.5)), which disagrees on negative .5 ties. The DuckDB twin
  * stays `round(CAST(v AS DOUBLE) * scale, 0)`, unchanged.
  */
case class VectorQuantize(child: Expression, scale: Long) extends UnaryExpression {

  private lazy val fromFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"vector_quantize expects ARRAY<FLOAT|DOUBLE>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "vector_quantize"

  protected override def nullSafeEval(input: Any): Any =
    VectorQuantize.compute(input.asInstanceOf[ArrayData], scale, fromFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VectorQuantize.compute($c, ${scale}L, $fromFloat)")

  override protected def withNewChildInternal(newChild: Expression): VectorQuantize =
    copy(child = newChild)
}

object VectorQuantize {
  /** Spark `round(x, 0)` semantics: half away from zero on the exact
    * binary double (BigDecimal(x).setScale(0, HALF_UP) agrees with this
    * for every double — the shortest decimal repr preserves the value). */
  private def roundHalfAway(x: Double): Long =
    if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong

  def compute(a: ArrayData, scale: Long, fromFloat: Boolean): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val v = if (fromFloat) a.getFloat(i).toDouble else a.getDouble(i)
      out(i) = roundHalfAway(v * scale)
      i += 1
    }
    new GenericArrayData(out)
  }
}
