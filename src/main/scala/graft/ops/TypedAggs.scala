package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregates (`Aggregator[IN, BUF, OUT]`) for Dataset pipelines —
  * the type-safe counterpart of the Column aggregates in [[Agg]] and the
  * raw TypedImperativeAggregate in org.apache.spark.sql.graft.TopKAgg.
  * Buffers are case classes → Catalyst Encoders, so partial aggregation and
  * codegen'd serialization work exactly like built-in aggregates.
  */
object TypedAggs {

  /** Exact weighted mean: Σ(w·x)/Σw as two exact partial sums and one final
    * division. Used e.g. for quantity-weighted unit prices on
    * Dataset[LineItem] with compile-time field access.
    */
  final case class WSum(wx: Double, w: Double)

  class WeightedMean[IN](x: IN => Double, w: IN => Double)
      extends Aggregator[IN, WSum, Double] {
    override def zero: WSum = WSum(0.0, 0.0)
    override def reduce(b: WSum, a: IN): WSum =
      WSum(b.wx + x(a) * w(a), b.w + w(a))
    override def merge(a: WSum, b: WSum): WSum = WSum(a.wx + b.wx, a.w + b.w)
    override def finish(r: WSum): Double = if (r.w == 0.0) 0.0 else r.wx / r.w
    override def bufferEncoder: Encoder[WSum] = Encoders.product[WSum]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
