package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsofJoin

/** Composed-operator semantics: as-of join (latest right row at-or-before
  * each left row per key, left-outer).
  */
class OperatorsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("range join equals a plain BETWEEN theta join") {
    import org.apache.spark.sql.functions._
    val points = (1 to 200).map(i => (i.toLong % 5, i.toLong * 13 % 997)).toDF("k", "t")
      .withColumn("t", timestamp_seconds(col("t")))
    val intervals = (1 to 40).map(i =>
      (i.toLong % 5, i.toLong * 20 % 900, i.toLong * 20 % 900 + 50)).toDF("k", "s", "e")
      .withColumn("s", timestamp_seconds(col("s")))
      .withColumn("e", timestamp_seconds(col("e")))
      .withColumn("iid", monotonically_increasing_id())
    val viaBucket = graft.operators.RangeJoin
      .intervalJoin(points, "t", intervals, "s", "e", Seq("k"), 30L)
      .select(col("t"), col("r_iid")).collect().map(_.toSeq).toSet
    val viaTheta = points.join(intervals,
        points("k") === intervals("k") && points("t") >= col("s") && points("t") < col("e"))
      .select(points("t"), col("iid")).collect().map(_.toSeq).toSet
    assert(viaBucket == viaTheta && viaBucket.nonEmpty)
  }

  test("asof join picks the latest at-or-before right row per key") {
    val trades = Seq(
      (1L, 100L, 10L), // key 1, ts 100
      (1L, 205L, 11L),
      (2L, 150L, 12L),
      (3L, 50L, 13L)) // key 3 has no quote at all
      .toDF("k", "t", "trade_id")
    val quotes = Seq(
      (1L, 90L, 1.0),
      (1L, 100L, 2.0), // equal ts: inclusive
      (1L, 300L, 3.0), // future: never matched
      (2L, 100L, 4.0))
      .toDF("k", "t", "px")
    val out = AsofJoin.asof(trades, quotes, "k", "t", "t")
      .select("trade_id", "r_px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out == Map(
      10L -> Some(2.0), // ts 100 matches the equal-ts quote, not 90
      11L -> Some(2.0), // ts 205: latest at-or-before is still 100
      12L -> Some(4.0),
      13L -> None)) // no quote for key 3
  }
}
