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

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
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
    if (name == "events") df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", org.apache.spark.sql.functions.from_utc_timestamp(
          df("ts").cast(org.apache.spark.sql.types.TimestampType),
          spark.conf.get("spark.sql.session.timeZone")))
      case _ => df
    } else df
  }

  /** Register every table as a temp view (for spark.sql paths / tests). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
