package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface — absent from the reference entirely
  * (SURVEY.md §2.10); built Spark-native: file-source streams over the
  * events table, watermarked sliding/tumbling windows, and custom session
  * state via flatMapGroupsWithState. The same transforms run identically on
  * a Kafka source at cluster scale (only `read` changes).
  */
object EventStreams {

  /** Raw parquet schema of the events table: ts is TIMESTAMP(NANOS), which
    * Spark reads as long (nanosAsLong) — converted to a micros timestamp.
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** `dir` must be a DIRECTORY of parquet files (Spark's file stream source
    * rejects bare file paths) — stage the events file into one.
    */
  def readStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(rawSchema)
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  /** Watermarked tumbling-window aggregate per event type. */
  def windowedStats(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Batch equivalent of windowedStats for correctness comparison. */
  def windowedStatsBatch(events: DataFrame, window_ : String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming exact dedup: drop events whose normalized content
    * fingerprint was already seen, with a watermark bounding the dedup
    * state (the streaming face of Dedup.exact — the ingestion-time dedup a
    * training-data pipeline runs before anything lands). State size is
    * bounded by the watermark horizon, not the stream length.
    */
  def dedupStream(events: DataFrame, fingerprintCols: Seq[String],
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(fingerprintCols)

  /** Batch equivalent (first event per fingerprint) for comparison. */
  def dedupBatch(events: DataFrame, fingerprintCols: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(fingerprintCols.map(col): _*)
      .orderBy(col("ts"), col("event_id"))
    events.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
  }

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class SessionState(start: Long, last: Long, n: Long)
  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long)

  /** Custom stateful operator: gap-based sessionization per user via
    * flatMapGroupsWithState (KeyValueGroupedDataset custom state — the
    * pattern a reference-style engine cannot express).
    */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) => {
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val out = Seq.newBuilder[Session]
          var cur = state.getOption
          sorted.foreach { e =>
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.last <= gapMs =>
                cur = Some(s.copy(last = t, n = s.n + 1))
              case Some(s) =>
                out += Session(userId, new java.sql.Timestamp(s.start),
                  new java.sql.Timestamp(s.last), s.n)
                cur = Some(SessionState(t, t, 1))
              case None => cur = Some(SessionState(t, t, 1))
            }
          }
          // flush the trailing session at end of (this batch's) input; a
          // production stream would keep it in state and use a timeout
          cur.foreach { s =>
            out += Session(userId, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.last), s.n)
          }
          state.remove()
          out.result().iterator
        })
  }
}
