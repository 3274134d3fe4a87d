package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, MapType}

import graft.llm.LlmHash

/** `minhash_sigs(garr)` — all 16 per-seed MinHash minima of a document's
  * gram-hash array in ONE row-local pass.
  *
  * Input: the raw `rolling_hash` array (values in `[0, P)`). The loop
  * applies the quadratic avalanche `(h² + C) % P` (see
  * `graft.llm.DedupQueries.shingles` for why linear hashes collapse LSH
  * precision) and then the 16 affine per-seed rehashes, tracking minima —
  * 17 multiplications per gram, zero allocation per gram, no explode.
  *
  * Why this beats the explode + groupBy form it replaces: signature
  * building becomes a PROJECTION — the gram multiset never exists as rows,
  * so building signatures for the whole corpus costs NO shuffle at all
  * (the old shape map-side-combined to |docs| rows, which is already
  * small, but still materialized |grams| rows through the aggregate
  * operator). MinHash minima over a multiset equal minima over the
  * distinct set, so the DuckDB oracle (list_min over hset) is unchanged.
  */
case class MinHashSigs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sigs"

  protected override def nullSafeEval(input: Any): Any =
    MinHashSigs.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSigs.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

object MinHashSigs {
  final val P = LlmHash.P
  final val AvalancheC = 987654321L
  private val nSeeds = 16
  private val A: Array[Long] = LlmHash.A.take(nSeeds).toArray
  private val B: Array[Long] = LlmHash.B.take(nSeeds).toArray

  def compute(garr: ArrayData): ArrayData = {
    val n = garr.numElements()
    val mins = Array.fill(nSeeds)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val g = garr.getLong(i)
      val h = (g * g + AvalancheC) % P // g < P keeps g*g < 2^63
      var s = 0
      while (s < nSeeds) {
        val v = (A(s) * h + B(s)) % P
        if (v < mins(s)) mins(s) = v
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** `simhash_sig(garr)` — 60-bit SimHash of a document's gram-hash array in
  * one row-local pass: per bit, sum ±1 weighted by the bit of an affine
  * rehash (seeds 16..75), then pack signs. Replaces a 60-aggregate groupBy
  * over exploded grams with a projection — same zero-shuffle argument as
  * [[MinHashSigs]]. Oracle congruence: the DuckDB twin sums over the raw
  * gram MULTISET (garr), exactly what this loop sees.
  *
  * 60 bits (up from the original 32) so the banded candidate join stays
  * sparse as the corpus grows: 4×15-bit bands give 32768 buckets per band
  * vs 256, and the third-decade scaling run showed the 8-bit buckets
  * densifying toward a quadratic self-join (~195 docs/bucket at 50k docs).
  * 60 (not 64) keeps the signature and every band chunk positive, so no
  * sign-extension/floor-division divergence between engines can exist.
  */
case class SimHashSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"

  protected override def nullSafeEval(input: Any): Any =
    SimHashSig.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashSig.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

/** `hash_hist(garr)` — per-document (gram-hash → count) histogram of a
  * `rolling_hash` array as `MAP<BIGINT, BIGINT>`, built row-locally in one
  * pass (sort + run-length encode over a primitive long array — no boxing,
  * no per-element hash-table probe).
  *
  * The gram-histogram stance (same argument as [[MinHashSigs]]): queries
  * that need per-doc n-gram counts (language-ID profiles, rare-bigram
  * scoring) previously exploded ONE ROW PER CHAR POSITION and rebuilt the
  * histogram in a hash aggregate — |chars| rows materialized through the
  * operator, a per-position substring allocation, and a hash-agg probe per
  * gram. `explode(hash_hist(rolling_hash(lower(text), k)))` starts the
  * query at |docs × distinct-grams-per-doc| rows instead. For k ≤ 3 over
  * ASCII text the polynomial hash is INJECTIVE (max value ≈ 127·(257²+257+1)
  * < P), so the hash IS the gram identity; the DuckDB oracle computes the
  * congruent direct polynomial per position and aggregates — identical
  * histograms, engine-exact.
  */
case class HashHist(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    MapType(LongType, LongType, valueContainsNull = false)
  override def prettyName: String = "hash_hist"

  protected override def nullSafeEval(input: Any): Any =
    HashHist.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashHist.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): HashHist =
    copy(child = newChild)
}

object HashHist {
  def compute(garr: ArrayData): MapData = {
    val a = garr.toLongArray() // defensive copy — sort must not mutate input
    java.util.Arrays.sort(a)
    val n = a.length
    var distinct = 0
    var i = 0
    while (i < n) { // count runs
      if (i == 0 || a(i) != a(i - 1)) distinct += 1
      i += 1
    }
    val keys = new Array[Long](distinct)
    val counts = new Array[Long](distinct)
    i = 0
    var k = -1
    while (i < n) {
      if (i == 0 || a(i) != a(i - 1)) { k += 1; keys(k) = a(i) }
      counts(k) += 1
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(counts))
  }
}

object SimHashSig {
  final val P = LlmHash.P
  private val nBits = 60
  private val A: Array[Long] = LlmHash.A.slice(16, 16 + nBits).toArray
  private val B: Array[Long] = LlmHash.B.slice(16, 16 + nBits).toArray

  def compute(garr: ArrayData): Long = {
    val n = garr.numElements()
    val w = new Array[Long](nBits)
    var i = 0
    while (i < n) {
      val g = garr.getLong(i)
      val h = (g * g + MinHashSigs.AvalancheC) % P
      var b = 0
      while (b < nBits) {
        if ((A(b) * h + B(b)) % P % 2 == 1) w(b) += 1 else w(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < nBits) { if (w(b) > 0) sig |= 1L << b; b += 1 }
    sig
  }
}
