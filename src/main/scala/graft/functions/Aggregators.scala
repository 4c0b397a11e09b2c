package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed `Aggregator` UDAF surface (the third extension point next to
  * the native `DotF32` expression and the `RangeJoinBinning` rule).
  *
  * Geometric mean of a positive integer-cents column, accumulated in
  * FIXED-POINT LOG SPACE: each row contributes floor(ln(cents)·1e6) as
  * an exact integer, so partial sums merge order-independently across
  * any partitioning — the double math happens once, in finish(). The
  * DuckDB oracle mirrors the same expression tree.
  */
object GeoMeanE2 extends Aggregator[Long, (Long, Long), Long] {
  override def zero: (Long, Long) = (0L, 0L)
  override def reduce(b: (Long, Long), cents: Long): (Long, Long) =
    (b._1 + math.floor(math.log(cents.toDouble) * 1e6).toLong, b._2 + 1L)
  override def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
    (x._1 + y._1, x._2 + y._2)
  override def finish(r: (Long, Long)): Long =
    if (r._2 == 0L) 0L
    else math.floor(math.exp((r._1.toDouble / 1e6) / r._2) * 100.0).toLong
  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
