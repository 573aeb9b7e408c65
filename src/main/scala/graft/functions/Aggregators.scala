package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed aggregates (SURVEY.md §2.11 — the reference has no
  * user-extensible function surface at all; Spark's Aggregator gives us one
  * for free). These are UDAF-registered and usable from both the DataFrame
  * API and SQL.
  */
object Aggregators {

  /** Geometric mean via sum-of-logs (stable for price-like data). */
  object GeometricMean extends Aggregator[Double, (Double, Long), Double] {
    override def zero: (Double, Long) = (0.0, 0L)
    override def reduce(b: (Double, Long), a: Double): (Double, Long) =
      if (a > 0) (b._1 + math.log(a), b._2 + 1) else b
    override def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(r: (Double, Long)): Double =
      if (r._2 == 0) Double.NaN else math.exp(r._1 / r._2)
    override def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  def geometric_mean(c: Column): Column = udaf(GeometricMean).apply(c)

  /** Bounded top-k distinct values (small-k exact heavy-hitter style). */
  final case class TopK(k: Int) extends Aggregator[Long, Map[Long, Long], Seq[Long]] {
    override def zero: Map[Long, Long] = Map.empty
    override def reduce(b: Map[Long, Long], a: Long): Map[Long, Long] =
      b.updated(a, b.getOrElse(a, 0L) + 1)
    override def merge(x: Map[Long, Long], y: Map[Long, Long]): Map[Long, Long] = {
      val m = y.foldLeft(x) { case (acc, (k2, v)) =>
        acc.updated(k2, acc.getOrElse(k2, 0L) + v)
      }
      // keep the heaviest 4k keys to bound the buffer
      m.toSeq.sortBy { case (key, n) => (-n, key) }.take(k * 4).toMap
    }
    override def finish(r: Map[Long, Long]): Seq[Long] =
      r.toSeq.sortBy { case (key, n) => (-n, key) }.take(k).map(_._1)
    override def bufferEncoder: Encoder[Map[Long, Long]] =
      Encoders.kryo[Map[Long, Long]]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  def top_k(c: Column, k: Int): Column = udaf(TopK(k)).apply(c)
}
