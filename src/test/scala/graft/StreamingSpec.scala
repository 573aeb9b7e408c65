package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.store.Tables
import graft.streaming.EventStreams

/** Structured Streaming correctness: the streaming windowed aggregate over
  * the events table must equal its batch equivalent once the (single) file
  * batch is processed; sessionization exercises flatMapGroupsWithState.
  */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"

  test("streaming windowed agg equals batch on one file batch") {
    val stage = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Path.of(sfDir, "events.parquet"),
      stage.resolve("events.parquet"))
    val stream = EventStreams.readStream(spark, stage.toString)
    val agg = EventStreams.windowedStats(stream)
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("win_out")
      .select("window_start", "event_type", "n")
      .collect().map(_.toSeq).toSet
    val batch = EventStreams.windowedStatsBatch(Tables.load(spark, sfDir, "events"))
      .select("window_start", "event_type", "n")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming dedup keeps one event per fingerprint, matching batch keys") {
    val stage = java.nio.file.Files.createTempDirectory("events_dedup")
    java.nio.file.Files.copy(
      java.nio.file.Path.of(sfDir, "events.parquet"),
      stage.resolve("events.parquet"))
    val stream = EventStreams.readStream(spark, stage.toString)
    val deduped = EventStreams.dedupStream(stream, Seq("user_id", "event_type"))
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try q.processAllAvailable() finally q.stop()
    val streamedKeys = spark.table("dedup_out")
      .select("user_id", "event_type").collect().map(_.toSeq)
    val batchKeys = EventStreams.dedupBatch(
        Tables.load(spark, sfDir, "events"), Seq("user_id", "event_type"))
      .select("user_id", "event_type").collect().map(_.toSeq)
    // exactly one survivor per (user, type): same key set, no duplicates
    assert(streamedKeys.length == streamedKeys.toSet.size)
    assert(streamedKeys.toSet == batchKeys.toSet && streamedKeys.nonEmpty)
  }

  test("sessionize groups events by gap") {
    import spark.implicits._
    val events = Seq(
      EventStreams.Event(1, java.sql.Timestamp.valueOf("2026-01-01 10:00:00"), 1, "a", 1.0),
      EventStreams.Event(2, java.sql.Timestamp.valueOf("2026-01-01 10:10:00"), 1, "a", 1.0),
      EventStreams.Event(3, java.sql.Timestamp.valueOf("2026-01-01 12:00:00"), 1, "a", 1.0),
      EventStreams.Event(4, java.sql.Timestamp.valueOf("2026-01-01 10:05:00"), 2, "b", 1.0)
    ).toDS()
    val sessions = EventStreams.sessionize(events).collect()
    assert(sessions.count(_.user_id == 1) == 2) // 30-min gap splits user 1
    assert(sessions.count(_.user_id == 2) == 1)
    val first = sessions.filter(_.user_id == 1).minBy(_.session_start.getTime)
    assert(first.n_events == 2)
  }
}
