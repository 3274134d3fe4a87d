package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** W3 — the reference's `AggregateFunction[IN, ACC, OUT]` UDAF surface
  * (`chapter6/WindowFunctions.scala:87-105`, `AvgTempFunction`): an explicit
  * createAccumulator/add/merge/getResult contract. Spark's analog is
  * `Aggregator[IN, BUF, OUT]` registered through `functions.udaf`, which
  * Catalyst executes as a partial→final aggregate pair — `reduce` runs
  * map-side, `merge` combines partial buffers after the shuffle, exactly the
  * distributed-combine contract the reference's `merge` exists for.
  */
case class AvgAcc(sum: Double, count: Long)

object AvgTempAggregator extends Aggregator[Double, AvgAcc, Double] {
  def zero: AvgAcc = AvgAcc(0.0, 0L)
  def reduce(b: AvgAcc, a: Double): AvgAcc = AvgAcc(b.sum + a, b.count + 1)
  def merge(x: AvgAcc, y: AvgAcc): AvgAcc = AvgAcc(x.sum + y.sum, x.count + y.count)
  def finish(b: AvgAcc): Double = if (b.count == 0) Double.NaN else b.sum / b.count
  def bufferEncoder: Encoder[AvgAcc] = Encoders.product[AvgAcc]
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
