package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-provided deterministic parquet tables
  * (/root/repo/TESTDATA.md). All queries take the sf directory as input and
  * read through this single entry point so that partition pruning / column
  * pruning behavior is uniform.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Events with `ts < cutoff` (cutoff = UTC wall clock, "yyyy-MM-dd
    * HH:mm:ss"), the predicate applied to the RAW column in the file's own
    * encoding — a long-nanos or TIMESTAMP_NTZ comparison against a literal
    * is a plain pushable filter, whereas filtering the normalized column
    * wraps `ts` in timestamp_micros()/from_utc_timestamp() and the scan
    * reads every row group. At 100 TB the pushed range predicate IS the
    * partition/row-group pruning; normalization happens after.
    */
  def loadEventsBefore(spark: SparkSession, sfDir: String, cutoff: String): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val wall = java.time.LocalDateTime.parse(cutoff.replace(' ', 'T'))
    import org.apache.spark.sql.functions.{col, lit}
    val filtered = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // TIMESTAMP(NANOS) as long
        raw.where(col("ts") <
          lit(wall.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000000L +
            wall.getNano))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.where(col("ts") < lit(wall)) // NTZ literal, same naive space
      case _ =>
        raw.where(col("ts") < lit(java.sql.Timestamp.from(
          wall.toInstant(java.time.ZoneOffset.UTC))))
    }
    normalizeEvents(spark, filtered)
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeEvents(spark, df) else df
  }

  private def normalizeEvents(spark: SparkSession, df: DataFrame): DataFrame = {
    // events.ts normalizes to a micros TimestampType column whatever the
    // generator wrote:
    //  - TIMESTAMP(NANOS) parquet surfaces as a long
    //    (spark.sql.legacy.parquet.nanosAsLong=true, set in Verify/Bench
    //    sessions); `div` (integer division) keeps full precision — `/`
    //    would go through double and lose sub-ms precision past 2^53
    //  - timestamp[us] with isAdjustedToUTC=false (pandas-written) reads
    //    as TIMESTAMP_NTZ; the naive value must become the instant with
    //    the SAME UTC wall clock on any session timezone (DuckDB's oracle
    //    reads the naive value as-is). The bare cast alone interprets it
    //    in the session zone (instant = W - offset(zone)) — correct only
    //    on UTC sessions — so from_utc_timestamp adds the same session
    //    offset back (it renders its input's UTC wall clock in the target
    //    zone, i.e. +offset), leaving the session-independent instant
    //    whose UTC wall clock is the stored naive value. Pinned by the
    //    StreamingSpec three-zone test.
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", org.apache.spark.sql.functions.from_utc_timestamp(
          df("ts").cast(org.apache.spark.sql.types.TimestampType),
          spark.conf.get("spark.sql.session.timeZone")))
      case _ => df
    }
  }

  /** Register every table as a temp view (for spark.sql paths / tests). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
