package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate via `Aggregator[IN, BUF, OUT]` (SURVEY §2.6 UDAF
  * surface): weighted mean with an exact associative buffer —
  * (Σ w·x, Σ w) — so partial aggregation (map-side combine) remains
  * correct under any merge order. Registered per-session with
  * `udaf(WeightedMean)` (see SparkEntry's `agg_weighted_discount`);
  * oracle-expressible as sum(x*w)/sum(w). */
object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
  override def zero: (Double, Double) = (0.0, 0.0)
  override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
    (b._1 + in._1 * in._2, b._2 + in._2)
  override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(r: (Double, Double)): Double =
    if (r._2 == 0.0) 0.0 else r._1 / r._2
  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
