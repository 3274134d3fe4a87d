package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** `vector_dot(a, b)` — native Catalyst dot product over
  * `ArrayType(DoubleType)` with whole-stage codegen.
  *
  * Why a custom Expression (SURVEY §4 "custom Expression beats a Scala
  * UDF"): Spark's higher-order functions (`aggregate(zip_with(...))`) are
  * evaluated INTERPRETED, one lambda call per element with boxing — for a
  * 64-dim embedding that is 128 virtual calls per row. This expression
  * compiles to a tight primitive `double` loop inside the generated code,
  * no allocation, no boxing.
  *
  * Semantics match the interpreted form and DuckDB's `list_dot_product`
  * bit-for-bit: left-to-right sequential sum of pairwise products over the
  * common prefix length.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must be ArrayType(DoubleType) — `AbstractDataType` is
  // private[sql], so the usual ExpectsInputTypes declaration can't be
  // written outside Spark; call sites (SimilarityQueries) cast explicitly
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/** `vector_l2q(a, b)` — native Catalyst squared-L2 distance over
  * `ArrayType(LongType)` (quantized-integer vectors) with whole-stage
  * codegen.
  *
  * The quantized distance kernel behind sim_kmeans / sim_ivfpq argmin: the
  * `aggregate(zip_with(...))` form runs interpreted (two boxed lambda calls
  * per element — for an 8-subvector PQ pass over the corpus that is the
  * dominant cost); this compiles to a primitive `long` loop. Sum over the
  * common prefix length, exact (integer addition is order-free, so there is
  * no float-congruence caveat — the DuckDB twin is `list_sum` of the
  * squared diffs).
  */
case class VectorL2Q(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "vector_l2q"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { val d = x.getLong(i) - y.getLong(i); s += d * d; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("sum")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $d = $a.getLong($i) - $b.getLong($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorL2Q =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  private val vectorDotInfo = new ExpressionInfo(
    classOf[VectorDot].getName, null, "vector_dot",
    "vector_dot(a, b) - dot product of two DOUBLE arrays (codegen'd)", "")

  /** Resolution-time extraction of a foldable, non-null integer literal
    * argument. The registry builders run during analysis, so a column or
    * NULL argument must surface as an AnalysisException naming the
    * function — not as the bare NullPointerException/ClassCastException
    * that `exprs(1).eval().asInstanceOf[Number]` produced. */
  private[functions] def literalIntArg(fn: String, param: String,
      e: Expression): Long = {
    if (!e.foldable)
      throw new org.apache.spark.sql.AnalysisException("NON_FOLDABLE_ARGUMENT",
        Map("funcName" -> s"`$fn`", "paramName" -> s"`$param`",
          "paramType" -> "\"INT\""))
    e.eval() match {
      case n: Number => n.longValue()
      case null =>
        throw new org.apache.spark.sql.AnalysisException(
          "INVALID_PARAMETER_VALUE.NULL",
          Map("parameter" -> s"`$param`", "functionName" -> s"`$fn`"))
      case _ =>
        throw new org.apache.spark.sql.AnalysisException("NON_FOLDABLE_ARGUMENT",
          Map("funcName" -> s"`$fn`", "paramName" -> s"`$param`",
            "paramType" -> "\"INT\""))
    }
  }

  /** Idempotently register the engine's SQL functions on a session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vector_dot", exprs => VectorDot(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vector_l2q", exprs => VectorL2Q(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "md5_long60", exprs => Md5Long(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash", exprs =>
        RollingHash(exprs(0), literalIntArg("rolling_hash", "window", exprs(1)).toInt), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sigs", exprs => MinHashSigs(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash_sig", exprs => SimHashSig(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hash_hist", exprs => HashHist(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "md5_grams", exprs =>
        Md5Grams(exprs(0), literalIntArg("md5_grams", "n", exprs(1)).toInt), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow", exprs =>
        Winnow(exprs(0), literalIntArg("winnow", "window", exprs(1)).toInt), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vector_quantize", exprs =>
        VectorQuantize(exprs(0), literalIntArg("vector_quantize", "scale", exprs(1))), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_count",
      exprs => SortedIntersectCount(exprs(0), exprs(1)), "built-in")
    // Spark ships BloomFilterMightContain for its own runtime filters but
    // does not expose it in SQL; the builder makes the bloom PREFILTER
    // pattern (tx_decontam_bloom) expressible without a UDF. Arg 0 must be
    // a foldable BINARY (a serialized util.sketch.BloomFilter), arg 1 the
    // LONG probe value — putLong/mightContainLong symmetry with
    // DataFrameStatFunctions.bloomFilter.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_might_contain",
      exprs => org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(exprs(0), exprs(1)), "built-in")
  }
}

/** `--conf spark.sql.extensions=graft.functions.GraftExtensions` for
  * cluster deployments: injects the function into every session without a
  * register() call. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, null, "vector_dot"),
      (exprs: Seq[Expression]) => VectorDot(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("vector_l2q"),
      new ExpressionInfo(classOf[VectorL2Q].getName, null, "vector_l2q"),
      (exprs: Seq[Expression]) => VectorL2Q(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("md5_long60"),
      new ExpressionInfo(classOf[Md5Long].getName, null, "md5_long60"),
      (exprs: Seq[Expression]) => Md5Long(exprs.head)))
    // same literal-window-arg builder as GraftFunctions.register — the two
    // registration paths must stay equivalent or a cluster deploy relying on
    // spark.sql.extensions loses the dedup/fingerprint queries
    ext.injectFunction((
      FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, null, "rolling_hash"),
      (exprs: Seq[Expression]) =>
        RollingHash(exprs(0), GraftFunctions.literalIntArg("rolling_hash", "window", exprs(1)).toInt)))
    ext.injectFunction((
      FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[MinHashSigs].getName, null, "minhash_sigs"),
      (exprs: Seq[Expression]) => MinHashSigs(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("simhash_sig"),
      new ExpressionInfo(classOf[SimHashSig].getName, null, "simhash_sig"),
      (exprs: Seq[Expression]) => SimHashSig(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("hash_hist"),
      new ExpressionInfo(classOf[HashHist].getName, null, "hash_hist"),
      (exprs: Seq[Expression]) => HashHist(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("md5_grams"),
      new ExpressionInfo(classOf[Md5Grams].getName, null, "md5_grams"),
      (exprs: Seq[Expression]) =>
        Md5Grams(exprs(0), GraftFunctions.literalIntArg("md5_grams", "n", exprs(1)).toInt)))
    ext.injectFunction((
      FunctionIdentifier("winnow"),
      new ExpressionInfo(classOf[Winnow].getName, null, "winnow"),
      (exprs: Seq[Expression]) =>
        Winnow(exprs(0), GraftFunctions.literalIntArg("winnow", "window", exprs(1)).toInt)))
    ext.injectFunction((
      FunctionIdentifier("vector_quantize"),
      new ExpressionInfo(classOf[VectorQuantize].getName, null, "vector_quantize"),
      (exprs: Seq[Expression]) =>
        VectorQuantize(exprs(0), GraftFunctions.literalIntArg("vector_quantize", "scale", exprs(1)))))
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, null,
        "sorted_intersect_count"),
      (exprs: Seq[Expression]) => SortedIntersectCount(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        null, "bloom_might_contain"),
      (exprs: Seq[Expression]) => org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(exprs(0), exprs(1))))
  }
}
