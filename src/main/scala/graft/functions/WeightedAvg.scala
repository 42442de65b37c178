package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` UDAF: exact weighted average. Sums run in
  * BigDecimal so the result is independent of partitioning and
  * accumulation order (cross-engine exact, unlike a double fold).
  * Registered via `udaf(...)` — the Dataset-API aggregation surface,
  * complementing the native-Expression route ([[DotLong]]) and the
  * mapPartitions route ([[Parity.chainedMd5]]).
  */
object WeightedAvg extends Aggregator[(Double, Double), (BigDecimal, BigDecimal), Double] {

  private val Scale = 6

  private def dec(x: Double): BigDecimal =
    BigDecimal(x).setScale(Scale, BigDecimal.RoundingMode.HALF_UP)

  override def zero: (BigDecimal, BigDecimal) = (BigDecimal(0), BigDecimal(0))

  override def reduce(b: (BigDecimal, BigDecimal), a: (Double, Double)): (BigDecimal, BigDecimal) =
    (b._1 + dec(a._1) * dec(a._2), b._2 + dec(a._2))

  override def merge(x: (BigDecimal, BigDecimal), y: (BigDecimal, BigDecimal)): (BigDecimal, BigDecimal) =
    (x._1 + y._1, x._2 + y._2)

  // the sums are exact decimals; converting each to double and doing
  // ONE IEEE division makes the result bit-identical to any engine
  // that forms the same two sums (a decimal division would instead
  // expose engine-specific scale/rounding rules)
  override def finish(r: (BigDecimal, BigDecimal)): Double =
    if (r._2 == BigDecimal(0)) Double.NaN
    else r._1.toDouble / r._2.toDouble

  override def bufferEncoder: Encoder[(BigDecimal, BigDecimal)] =
    Encoders.product[(BigDecimal, BigDecimal)]

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
