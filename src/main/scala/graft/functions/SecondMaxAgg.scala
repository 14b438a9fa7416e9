package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed fold (SURVEY.md §2.9: the reference's reducer-script
  * surface — a fold over a group's values that built-in aggregates don't
  * provide): second-largest DISTINCT value. Buffer is the top-2 distinct
  * values seen; merge is associative/commutative, so Spark runs it as
  * partial+final aggregation (map-side combine the reference never had).
  */
object SecondMaxAgg extends Aggregator[Double, (Double, Double), Double] {
  private val None2 = Double.NegativeInfinity

  def zero: (Double, Double) = (None2, None2)

  private def add(b: (Double, Double), v: Double): (Double, Double) =
    if (v == b._1 || v == b._2) b
    else if (v > b._1) (v, b._1)
    else if (v > b._2) (b._1, v)
    else b

  def reduce(b: (Double, Double), v: Double): (Double, Double) = add(b, v)

  def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
    add(add(a, b._1), b._2)

  def finish(b: (Double, Double)): Double = b._2

  def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
