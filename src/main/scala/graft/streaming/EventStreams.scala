package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
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

  /** Raw parquet schema of the events table with `tsType` as written by
    * the generator: TIMESTAMP(NANOS) surfaces as long (nanosAsLong),
    * timestamp[us] without UTC adjustment as TIMESTAMP_NTZ. A streaming
    * source needs the schema declared up front, so the batch reader
    * sniffs the actual file type first (one footer read) — declaring
    * long against a timestamp[us] file silently corrupts the column.
    */
  private def rawSchema(tsType: org.apache.spark.sql.types.DataType): StructType =
    StructType(Seq(
      StructField("event_id", LongType), StructField("ts", tsType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))

  /** `dir` must be a DIRECTORY of parquet files (Spark's file stream source
    * rejects bare file paths) — stage the events file into one.
    * `maxFilesPerTrigger` > 0 caps files per micro-batch (0 = unlimited),
    * forcing a multi-file directory through multiple batches — the way to
    * prove an aggregate's result is independent of batch cut points.
    */
  def readStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 0): DataFrame = {
    val tsType = spark.read.parquet(dir).schema("ts").dataType
    val reader = spark.readStream.schema(rawSchema(tsType))
    val limited = if (maxFilesPerTrigger > 0)
      reader.option("maxFilesPerTrigger", maxFilesPerTrigger.toString) else reader
    val raw = limited.parquet(dir)
    // same normalization as Tables.load: micros TimestampType either way,
    // session-zone-independent (the bare cast subtracts the session
    // offset; from_utc_timestamp adds it back, leaving the instant whose
    // UTC wall clock is the stored naive value)
    tsType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", from_utc_timestamp(
          col("ts").cast(org.apache.spark.sql.types.TimestampType),
          spark.conf.get("spark.sql.session.timeZone")))
      case _ => raw
    }
  }

  /** Watermarked tumbling-window aggregate per event type. The sum
    * accumulates in decimal so the result is independent of both the
    * shuffle reduction order AND the micro-batch cut points — a stream
    * sliced into any number of batches produces bit-identical windows
    * (doubles would drift with batch boundaries; exact accumulation is
    * what makes the streaming result oracle-checkable at all).
    */
  def windowedStats(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Batch equivalent of windowedStats for correctness comparison. */
  def windowedStatsBatch(events: DataFrame, window_ : String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming distinct-cardinality sketch per window — the g40
    * integer-pure HLL as a windowed MAX-aggregation: each event
    * contributes one (register j, lowbit rank lb) pair from h32 of its
    * user id, and the per-(window, register) state is a single long
    * merged by MAX — 16 rows of state per open window REGARDLESS of user
    * volume, and batch-cut-insensitive by construction (max is
    * order-free). Finish the estimate with [[finishCardinality]] over
    * the (tiny) sketch relation; the arithmetic is the same
    * exact-integer form as `GraphAlgorithms.neighborhoodFunction`, so
    * the streamed sketch hashes against a batch SQL oracle.
    */
  def windowedCardinalitySketch(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .withColumn("x", graft.pipeline.TextHash.h32(
        concat(lit("hll|"), col("user_id").cast("string"))))
      .withColumn("j", expr("x % 16"))
      .withColumn("y", expr("(x div 16) + 1"))
      .withColumn("lb", expr("y & -y"))
      .groupBy(window(col("ts"), window_), col("j"))
      .agg(max(col("lb")).as("lb"))
      .select(col("window.start").as("window_start"), col("j"), col("lb"))

  /** Batch finisher for [[windowedCardinalitySketch]]: per window,
    * register count and the exact-integer HLL estimate (≤16 input rows
    * per window — driver-scale work presented as one aggregate).
    */
  def finishCardinality(regs: DataFrame): DataFrame =
    regs.groupBy(col("window_start"))
      .agg(count(lit(1)).as("n_regs"),
        sum(expr("4294967296 div lb")).as("harm_p"))
      .withColumn("est_users", expr(
        "(172288 * 4294967296) div (1000 * (harm_p + (16 - n_regs) * 4294967296))"))
      .select(col("window_start"), col("n_regs"), col("est_users"))

  /** Streaming Count-Min sketch over the event user stream — t18's
    * depth×width counters as cross-batch streaming state (the x34 HLL
    * pattern): counter (r, b) = number of events whose
    * h32(r + "|" + user_id) lands in bucket b (mod width). State is
    * depth·width counter rows REGARDLESS of user cardinality; counts are
    * order-free integer sums, so the streamed sketch is bit-exact
    * against the batch construction no matter where the micro-batch
    * cuts fall. Finish heavy-hitter estimates batch-side with
    * [[finishCountMin]] over the (tiny) sketch relation. The build
    * parameters ride along as literal columns so the finisher can
    * reject ANY shape mismatch — including a narrower build, which
    * counter positions alone cannot reveal (r15 ADVICE).
    */
  def countMinSketch(events: DataFrame, depth: Int = 4,
      width: Int = 256): DataFrame =
    events
      .select(explode(array((0 until depth).map(lit): _*)).as("r"),
        col("user_id").cast("string").as("tok"))
      .select(col("r"), (graft.pipeline.TextHash.h32(
        concat(col("r").cast("string"), lit("|"), col("tok"))) % width).as("b"))
      .groupBy(col("r"), col("b")).agg(count(lit(1)).as("c"))
      .withColumn("depth", lit(depth))
      .withColumn("width", lit(width))

  /** Batch finisher for [[countMinSketch]]: the exact top-k users (by
    * count, tie-broken on the id string) with the sketch's MIN-estimate
    * in-row, so the collision margin is visible — the t18 read-off shape
    * over the streamed counters. `events` supplies the exact side; the
    * estimate never understates.
    */
  def finishCountMin(sketch: DataFrame, events: DataFrame, topK: Int = 10,
      depth: Int = 4, width: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // depth/width MUST match the sketch's build parameters or the bucket
    // lookup joins foreign counters and min() can UNDERSTATE — the one
    // guarantee Count-Min makes. The sketch relation records its build
    // shape as literal columns (r15 ADVICE), so the finisher requires an
    // EXACT match — catching a narrower build too, which counter
    // positions alone cannot reveal (max(r)/max(b) only bound from
    // below). min==max also rejects a union of differently-shaped
    // sketches masquerading as one.
    require(sketch.columns.contains("depth") && sketch.columns.contains("width"),
      "finishCountMin: sketch relation lacks its recorded depth/width " +
        "build parameters — build it with countMinSketch")
    val shape = sketch.agg(min(col("depth")), max(col("depth")),
      min(col("width")), max(col("width")),
      max(col("r")), max(col("b"))).head()
    require(!shape.isNullAt(0), "finishCountMin: the sketch is empty")
    require(shape.getInt(0) == depth && shape.getInt(1) == depth,
      s"finishCountMin: sketch depth ${shape.getInt(0)} != $depth")
    require(shape.getInt(2) == width && shape.getInt(3) == width,
      s"finishCountMin: sketch width ${shape.getInt(2)} != $width")
    // the positional checks stay ALONGSIDE the recorded shape (r16
    // review): a row-mutated sketch with intact metadata — e.g. a filter
    // that dropped one counter row's worth of depth — must still fail
    // loudly, since every event increments all depth rows
    require(shape.getInt(4) == depth - 1,
      s"finishCountMin: counter rows reach depth ${shape.getInt(4) + 1}, " +
        s"recorded depth $depth — the sketch lost rows after the build")
    require(shape.getLong(5) < width,
      s"finishCountMin: sketch has bucket ${shape.getLong(5)} >= width $width")
    val depthRows = array((0 until depth).map(lit): _*)
    def bucket(r: Column, tok: Column): Column =
      graft.pipeline.TextHash.h32(
        concat(r.cast("string"), lit("|"), tok)) % width
    val exact = events.select(col("user_id").cast("string").as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("exact_n"))
    val top = exact.orderBy(col("exact_n").desc, col("tok")).limit(topK)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("exact_n").desc, col("tok"))))
    top
      .select(col("rank"), col("tok"), col("exact_n"),
        explode(depthRows).as("r"))
      .withColumn("b", bucket(col("r"), col("tok")))
      .join(sketch, Seq("r", "b"))
      .groupBy(col("rank"), col("tok"), col("exact_n"))
      .agg(min(col("c")).as("cm_est"))
      .select(col("rank").cast("long").as("rank"), col("tok"),
        col("exact_n").cast("long").as("exact_n"),
        col("cm_est").cast("long").as("cm_est"))
  }

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

  /** Stream-static enrichment join — the canonical streaming lookup
    * pattern (dimension enrichment before anything lands): each streamed
    * event joins its user's STATIC customer dimension row. Catalyst plans
    * the stream-static equi-join per micro-batch exactly like batch, and
    * no join state is kept because the static side is complete at every
    * batch. The dim-side broadcast is gated on a MEASURED row count (the
    * static side is a batch relation, so the count is one cheap job at
    * plan time): Spark honors a user broadcast hint regardless of size —
    * an unconditional hint on a huge dim fails at the 8 GB broadcast
    * limit rather than falling back — so past the ceiling the join is
    * hinted shuffle-hash instead (the algorithms' small()/
    * BroadcastVertexRows pattern). The per-nation aggregate then
    * accumulates ACROSS batches in decimal, so the final table is
    * bit-independent of batch cut points and oracle-checkable against
    * the plain batch join.
    */
  def enrichedNationStats(events: DataFrame, customers: DataFrame): DataFrame = {
    val dim = customers.select(col("c_custkey"), col("c_nationkey"))
    val gated =
      if (dim.count() <= graft.algorithms.GraphAlgorithms.BroadcastVertexRows)
        broadcast(dim)
      else dim.hint("shuffle_hash")
    events.join(gated, events("user_id") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
  }

  /** Label ids for the streamed event graph (own namespace, clear of the
    * TPC-H projection's 1-22).
    */
  val UserLab = 201; val EventLab = 202; val DidLab = 212

  /** Streaming graph ingestion — the streaming face of bulk import (S6/S9):
    * each event becomes a User->Event DID edge row in the GraphStore edge
    * schema (id, src, dst, props). Write with `edgeIngest(...).writeStream
    * .format("parquet")` into `store/edges/DID` and `GraphStore.load` sees
    * a continuously growing graph; the file sink's commit log gives
    * exactly-once appends, so a crashed ingest never double-writes edges.
    */
  def edgeIngest(events: DataFrame): DataFrame =
    events.select(
      graft.model.Graphid.packCol(DidLab, col("event_id")).as("id"),
      graft.model.Graphid.packCol(UserLab, col("user_id")).as("src"),
      graft.model.Graphid.packCol(EventLab, col("event_id")).as("dst"),
      col("event_type"), col("ts").as("at"))

  /** Stream-stream interval join: clicks matched to the same user's
    * purchases within the following hour — both sides watermarked so join
    * state is bounded by the watermark horizon (the streaming face of
    * operators.RangeJoin). Inner join; output arrives once both sides pass
    * the watermark.
    */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame,
      watermark: String = "2 hours"): DataFrame = {
    val c = clicks.select(col("event_id").as("click_id"),
        col("user_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val p = purchases.select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    c.join(p,
      col("user_id") === col("p_user_id") &&
        col("click_ts") >= col("purchase_ts") &&
        col("click_ts") < col("purchase_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("click_id"), col("user_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"))
  }

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class SessionState(start: Long, last: Long, n: Long)
  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long)

  private def micros(t: java.sql.Timestamp): Long =
    (t.getTime / 1000L) * 1000000L + (t.getNanos / 1000L)

  private def fromMicros(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(us / 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  /** Cross-batch gap sessionization — the production form of `sessionize`
    * below: the trailing (still-open) session stays IN STATE between
    * micro-batches instead of being flushed per batch, so a session
    * spanning a batch boundary is ONE session; a session is emitted only
    * when a later event (beyond the gap) closes it. All arithmetic is in
    * MICROseconds — millisecond truncation could flip a boundary that
    * straddles the gap by under 1 ms against the SQL oracle. Open
    * sessions at stream end stay unemitted (state); replays punctuate
    * with a far-future flush event per key to close them — the x28 gate's
    * staging shows the pattern.
    */
  def sessionizeStream(events: Dataset[Event],
      gapMs: Long = 30 * 60 * 1000L): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMs * 1000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) => {
          val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          val out = Seq.newBuilder[Session]
          var cur = state.getOption
          sorted.foreach { e =>
            val t = micros(e.ts)
            cur match {
              case Some(s) if t - s.last <= gapUs =>
                cur = Some(s.copy(last = t, n = s.n + 1))
              case Some(s) =>
                out += Session(userId, fromMicros(s.start), fromMicros(s.last), s.n)
                cur = Some(SessionState(t, t, 1))
              case None => cur = Some(SessionState(t, t, 1))
            }
          }
          cur match {
            case Some(s) => state.update(s)
            case None => state.remove()
          }
          out.result().iterator
        })
  }

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
