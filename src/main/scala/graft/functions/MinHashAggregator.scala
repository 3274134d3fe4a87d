package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import graft.llm.LlmHash

/** MinHash signature as a sketch `Aggregator` (SURVEY §4/§7.5.5: "sketch
  * aggregators need correct merge semantics for partial aggregation").
  *
  * Input: a gram hash already folded to `[0, P)` (see
  * `graft.llm.LlmHash`). Buffer: the running per-seed minima. `merge` is
  * elementwise min — associative and commutative, so Catalyst's
  * partial→final aggregation (and any AQE re-planning) is correct by
  * construction; the shuffle carries one `nSeeds`-long buffer per group,
  * never the gram stream.
  *
  * The relational twin (16 `min(affine(h))` columns,
  * `graft.llm.DedupQueries.minhashSigs`) stays the preferred plan-native
  * form — built-in `min` is codegen'd; this Aggregator is the same sketch
  * for callers that need a single reusable UDAF (`functions.udaf(new
  * MinHashAggregator(k))`) or typed `Dataset` pipelines.
  */
class MinHashAggregator(nSeeds: Int = 16)
    extends Aggregator[Long, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(nSeeds)(Long.MaxValue)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var i = 0
    while (i < nSeeds) {
      val hs = (LlmHash.A(i) * h + LlmHash.B(i)) % LlmHash.P
      if (hs < buf(i)) buf(i) = hs
      i += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < nSeeds) { if (y(i) < x(i)) x(i) = y(i); i += 1 }
    x
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
