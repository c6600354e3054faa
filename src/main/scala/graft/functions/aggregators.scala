package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregators — the Spark form of the reference's imperative
  * UDF surface (SURVEY.md §2.11):
  *
  *  - `AggregateFunction<T, ACC>` (flink-table-common/.../functions/
  *    AggregateFunction.java:193: createAccumulator / accumulate /
  *    merge / getValue) ↦ `Aggregator[IN, BUF, OUT]` — same lifecycle,
  *    and `merge` makes it map-side combinable exactly like Flink's
  *    two-phase agg.
  *  - `TableAggregateFunction` (TableAggregateFunction.java:157, the
  *    canonical Top2 example) ↦ an Aggregator returning a Seq that the
  *    caller explodes — emit-multiple-rows semantics without custom
  *    physical operators.
  */
object Aggregators {

  /** Weighted average — Flink's canonical AggregateFunction example. */
  case class WAcc(var sum: Double, var weight: Double)
  object WeightedAvg extends Aggregator[(Double, Double), WAcc, Double] {
    override def zero: WAcc = WAcc(0.0, 0.0)
    override def reduce(b: WAcc, a: (Double, Double)): WAcc = {
      b.sum += a._1 * a._2; b.weight += a._2; b
    }
    override def merge(x: WAcc, y: WAcc): WAcc = {
      x.sum += y.sum; x.weight += y.weight; x
    }
    override def finish(b: WAcc): Double =
      if (b.weight == 0.0) 0.0 else b.sum / b.weight
    override def bufferEncoder: Encoder[WAcc] = Encoders.product[WAcc]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Top-2 values per group — Flink's canonical TableAggregateFunction
    * example; callers `explode` the result to emit multiple rows.
    */
  case class Top2Acc(var first: Double, var second: Double)
  object Top2 extends Aggregator[Double, Top2Acc, Seq[Double]] {
    override def zero: Top2Acc = Top2Acc(Double.MinValue, Double.MinValue)
    override def reduce(b: Top2Acc, v: Double): Top2Acc = {
      if (v > b.first) { b.second = b.first; b.first = v }
      else if (v > b.second) { b.second = v }
      b
    }
    override def merge(x: Top2Acc, y: Top2Acc): Top2Acc = {
      reduce(x, y.first); reduce(x, y.second); x
    }
    override def finish(b: Top2Acc): Seq[Double] =
      Seq(b.first, b.second).filter(_ != Double.MinValue)
    override def bufferEncoder: Encoder[Top2Acc] = Encoders.product[Top2Acc]
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }
}
