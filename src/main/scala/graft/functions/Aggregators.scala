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

  /** Geometric mean via a 10^-9 fixed-point sum of logs. Per row, ln is one
    * double op floored to an integer; LONG addition is associative, so the
    * aggregate is reduction-order independent — a plain double ln-sum drifts
    * with shuffle order and can never be oracle-checked. Cross-engine, a
    * 1-ulp ln difference flips a row's floor with probability ~1e-12, so the
    * mean drifts far less than one fp unit — any presentation rounding
    * absorbs it. Envelope: |ln| <= 30 (values up to ~1e13) supports ~3e8
    * rows per group before the long sum can overflow; shard groups beyond
    * that (at which point a two-stage groupBy is the right plan anyway).
    */
  object GeometricMean extends Aggregator[Double, (Long, Long), Double] {
    val Scale = 1e9
    override def zero: (Long, Long) = (0L, 0L)
    override def reduce(b: (Long, Long), a: Double): (Long, Long) =
      if (a > 0) (b._1 + math.floor(math.log(a) * Scale).toLong, b._2 + 1) else b
    override def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(r: (Long, Long)): Double =
      // floorDiv matches SQL floor division on the (exact) fixed-point mean
      if (r._2 == 0) Double.NaN
      else math.exp(Math.floorDiv(r._1, r._2).toDouble / Scale)
    override def bufferEncoder: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  def geometric_mean(c: Column): Column = udaf(GeometricMean).apply(c)

  /** Exact top-k values by frequency (ties broken by ascending key —
    * deterministic and oracle-checkable). The buffer holds the full distinct
    * key space of the group: exact frequency top-k cannot truncate partials
    * without becoming merge-order dependent. For high-cardinality keys use
    * the relational idiom instead (groupBy count + row_number window),
    * which shuffles once and never buffers a whole group.
    */
  final case class TopK(k: Int) extends Aggregator[Long, Map[Long, Long], Seq[Long]] {
    override def zero: Map[Long, Long] = Map.empty
    override def reduce(b: Map[Long, Long], a: Long): Map[Long, Long] =
      b.updated(a, b.getOrElse(a, 0L) + 1)
    override def merge(x: Map[Long, Long], y: Map[Long, Long]): Map[Long, Long] =
      y.foldLeft(x) { case (acc, (k2, v)) =>
        acc.updated(k2, acc.getOrElse(k2, 0L) + v)
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
